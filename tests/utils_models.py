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
