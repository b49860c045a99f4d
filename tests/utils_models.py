"""Shared test helpers: tiny random HF checkpoints on disk.

The reference's exactness contract makes HF the oracle for AR decoding
(SURVEY §4); tests create small random-weight Llama/Qwen checkpoints with
transformers and compare token-for-token.
"""

import numpy as np


def make_tiny_llama(path, vocab=128, hidden=64, layers=2, heads=4, kv_heads=2,
                    intermediate=128, max_pos=512, seed=0, tie=False):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=intermediate,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        max_position_embeddings=max_pos,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=tie,
        # Large init separates logits so fp32 argmax is numerically robust
        # across frameworks.
        initializer_range=0.4,
        attention_bias=False,
        eos_token_id=2,
        bos_token_id=1,
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    model.save_pretrained(path, safe_serialization=True)
    return cfg


def make_tiny_qwen3(path, vocab=128, hidden=64, layers=2, heads=4, kv_heads=2,
                    intermediate=128, max_pos=512, head_dim=16, seed=0):
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(seed)
    cfg = Qwen3Config(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=intermediate,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        head_dim=head_dim,
        max_position_embeddings=max_pos,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        initializer_range=0.4,
        eos_token_id=2,
        bos_token_id=1,
    )
    model = Qwen3ForCausalLM(cfg)
    model.eval()
    model.save_pretrained(path, safe_serialization=True)
    return cfg


def hf_greedy(path, prompt_ids, max_new_tokens):
    """Reference greedy continuation via transformers (fp32, CPU)."""
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(path, torch_dtype=torch.float32)
    model.eval()
    with torch.no_grad():
        out = model.generate(
            torch.tensor([prompt_ids]),
            max_new_tokens=max_new_tokens,
            min_new_tokens=max_new_tokens,
            do_sample=False,
            eos_token_id=None,
            pad_token_id=0,
        )
    return out[0, len(prompt_ids):].tolist()


def random_prompt(rng, lo, hi, vocab=128):
    return rng.integers(3, vocab, size=int(rng.integers(lo, hi))).tolist()


def rng(seed=0):
    return np.random.default_rng(seed)


def make_tiny_eagle(path, target_hidden=64, draft_hidden=64, vocab=128,
                    draft_vocab=None, heads=4, kv_heads=2, intermediate=128,
                    num_taps=3, with_embed=True, seed=0):
    """Write a tiny EAGLE-3 draft checkpoint in the reference's key format
    (midlayer.*, hidden_norm, fc, d2t/t2d; see loader.py:64-183 remaps)."""
    import json
    import os

    import torch
    from safetensors.torch import save_file

    draft_vocab = draft_vocab or vocab
    torch.manual_seed(seed)
    D, Dt = draft_hidden, target_hidden
    hd = D // heads

    def w(*shape):
        return (torch.randn(*shape) * 0.05).contiguous()

    tensors = {
        "fc.weight": w(D, num_taps * Dt),
        "midlayer.self_attn.q_proj.weight": w(heads * hd, 2 * D),
        "midlayer.self_attn.k_proj.weight": w(kv_heads * hd, 2 * D),
        "midlayer.self_attn.v_proj.weight": w(kv_heads * hd, 2 * D),
        "midlayer.self_attn.o_proj.weight": w(D, heads * hd),
        "midlayer.mlp.gate_proj.weight": w(intermediate, D),
        "midlayer.mlp.up_proj.weight": w(intermediate, D),
        "midlayer.mlp.down_proj.weight": w(D, intermediate),
        "midlayer.input_layernorm.weight": torch.ones(D),
        "midlayer.hidden_norm.weight": torch.ones(D),
        "midlayer.post_attention_layernorm.weight": torch.ones(D),
        "norm.weight": torch.ones(D),
        "lm_head.weight": w(draft_vocab, D),
    }
    if draft_vocab != vocab:
        # Map draft slot i -> target token via sorted subset offsets.
        subset = torch.sort(torch.randperm(vocab)[:draft_vocab]).values
        tensors["d2t"] = subset - torch.arange(draft_vocab)
        t2d = torch.zeros(vocab, dtype=torch.bool)
        t2d[subset] = True
        tensors["t2d"] = t2d
    if with_embed:
        tensors["embed_tokens.weight"] = w(vocab, D)

    os.makedirs(path, exist_ok=True)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({
            "model_type": "llama",
            "vocab_size": vocab,
            "draft_vocab_size": draft_vocab,
            "hidden_size": D,
            "intermediate_size": intermediate,
            "num_hidden_layers": 1,
            "num_attention_heads": heads,
            "num_key_value_heads": kv_heads,
            "head_dim": hd,
            "max_position_embeddings": 512,
            "rms_norm_eps": 1e-5,
            "rope_theta": 10000.0,
            "eos_token_id": 2,
        }, f)


def make_tiny_qwen3_moe(path, vocab=128, hidden=64, layers=2, heads=4,
                        kv_heads=2, head_dim=16, num_experts=4, top_k=2,
                        moe_intermediate=96, norm_topk_prob=True, seed=0):
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(seed)
    cfg = Qwen3MoeConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=moe_intermediate,  # dense size unused (all sparse)
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        head_dim=head_dim,
        num_experts=num_experts,
        num_experts_per_tok=top_k,
        moe_intermediate_size=moe_intermediate,
        norm_topk_prob=norm_topk_prob,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        initializer_range=0.4,
        eos_token_id=2,
        bos_token_id=1,
    )
    model = Qwen3MoeForCausalLM(cfg)
    model.eval()
    model.save_pretrained(path, safe_serialization=True)
    return cfg
