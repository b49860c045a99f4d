"""Scheduler tests: prefill admission, decode lookahead, preemption, AR
postprocess, and speculative postprocess with KV rollback.

The Config dependency is satisfied with a tiny on-disk model config (no
weights needed for scheduler logic).
"""

import json

import pytest

from ssd_tpu.config import Config
from ssd_tpu.engine.scheduler import Scheduler
from ssd_tpu.engine.sequence import Sequence, SequenceStatus
from ssd_tpu.sampling_params import SamplingParams

BLOCK = 16


@pytest.fixture
def model_dir(tmp_path):
    d = tmp_path / "tiny"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "model_type": "llama",
        "vocab_size": 128,
        "hidden_size": 32,
        "intermediate_size": 64,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "max_position_embeddings": 512,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "eos_token_id": 2,
    }))
    return str(d)


def make_config(model_dir, **kw):
    defaults = dict(
        max_num_batched_tokens=512,
        max_model_len=256,
        kvcache_block_size=BLOCK,
        num_kvcache_blocks=16,
        max_num_seqs=4,
    )
    defaults.update(kw)
    cfg = Config(model=model_dir, **defaults)
    Sequence.block_size = cfg.kvcache_block_size
    return cfg


def seq_of(n, **kw):
    return Sequence(list(range(3, 3 + n)), SamplingParams(**kw))


def test_prefill_then_decode(model_dir):
    sched = Scheduler(make_config(model_dir))
    s1, s2 = seq_of(20), seq_of(10)
    sched.add(s1)
    sched.add(s2)
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [s1, s2]
    assert all(s.status == SequenceStatus.RUNNING for s in seqs)
    sched.postprocess(seqs, [5, 6], is_prefill=True)
    assert s1.num_tokens == 21 and s1.last_token == 5
    assert s1.num_cached_tokens == 20

    seqs, is_prefill = sched.schedule()
    assert not is_prefill and seqs == [s1, s2]


def test_eos_finishes_sequence(model_dir):
    cfg = make_config(model_dir)
    sched = Scheduler(cfg)
    s = seq_of(4, max_new_tokens=10)
    sched.add(s)
    seqs, _ = sched.schedule()
    sched.postprocess(seqs, [cfg.eos], is_prefill=True)
    assert s.is_finished
    assert sched.is_finished()
    assert s.block_table == []


def test_max_new_tokens_finishes(model_dir):
    sched = Scheduler(make_config(model_dir))
    s = seq_of(4, max_new_tokens=1, ignore_eos=True)
    sched.add(s)
    seqs, _ = sched.schedule()
    sched.postprocess(seqs, [7], is_prefill=True)
    assert s.is_finished


def test_preemption_absorbs_completion(model_dir):
    # 4 blocks total; two sequences competing for decode lookahead.
    cfg = make_config(model_dir, num_kvcache_blocks=4, max_num_seqs=2)
    sched = Scheduler(cfg)
    s1, s2 = seq_of(BLOCK), seq_of(BLOCK)
    sched.add(s1)
    sched.add(s2)
    seqs, is_prefill = sched.schedule()
    assert is_prefill and len(seqs) == 2
    sched.postprocess(seqs, [9, 9], is_prefill=True)

    # Each seq now has BLOCK+1 tokens => needs a 2nd block on decode; only 2
    # free blocks exist, so both can fit... consume them via decode rounds
    # until a preemption occurs.
    seqs, is_prefill = sched.schedule()
    assert not is_prefill and len(seqs) == 2
    # Fill both sequences up to 2 full blocks.
    for _ in range(BLOCK - 1):
        sched.postprocess(seqs, [9, 9], is_prefill=False)
        seqs, is_prefill = sched.schedule()
        assert not is_prefill
        if len(seqs) < 2:
            break
    # At 2*BLOCK tokens each, a decode needs a 3rd block each; with 0 free
    # blocks one sequence must be preempted.
    assert len(sched.waiting) >= 1 or len(seqs) == 2
    preempted = sched.waiting[0] if sched.waiting else None
    if preempted is not None:
        # Preempted sequence absorbed its completion into the prompt.
        assert preempted.num_prompt_tokens == preempted.num_tokens
        assert preempted.block_table == []
        assert preempted.status == SequenceStatus.WAITING


def _spec_sched(model_dir, k=2):
    cfg = make_config(model_dir, speculate=True, speculate_k=k, draft=model_dir,
                      num_kvcache_blocks=32)
    draft_cfg = cfg.create_draft_config()
    draft_cfg.num_kvcache_blocks = 32
    sched = Scheduler(cfg, draft_cfg=draft_cfg)
    return cfg, sched


def test_postprocess_speculate_rollback(model_dir):
    cfg, sched = _spec_sched(model_dir, k=2)
    s = seq_of(BLOCK - 1, ignore_eos=True, max_new_tokens=64)
    sched.add(s)
    seqs, is_prefill = sched.schedule()
    assert is_prefill
    s.recovery_token_id = 7
    s.num_cached_tokens = s.num_prompt_tokens
    s.num_draft_cached_tokens = s.num_prompt_tokens

    seqs, is_prefill = sched.schedule()
    assert not is_prefill
    # Spec lookahead K+1=3 tokens from BLOCK-1 => crosses into a 2nd block.
    assert len(s.block_table) == 2 and len(s.draft_block_table) == 2

    # Accept only the recovery token: suffix length 1 => rollback to 1 block.
    sched.postprocess_speculate([s], [[7]], [11])
    assert s.num_tokens == BLOCK
    assert len(s.block_table) == 1 and len(s.draft_block_table) == 1
    assert s.last_spec_step_accepted_len == 1
    assert s.recovery_token_id == 11
    # The completed block was finalized into the prefix cache.
    assert sched.block_manager.blocks[s.block_table[0]].hash != -1


def test_postprocess_speculate_eos_truncation(model_dir):
    cfg, sched = _spec_sched(model_dir, k=2)
    s = seq_of(8, max_new_tokens=64)
    sched.add(s)
    sched.schedule()
    s.recovery_token_id = 7
    s.num_cached_tokens = s.num_prompt_tokens
    s.num_draft_cached_tokens = s.num_prompt_tokens
    sched.schedule()

    suffix = [7, cfg.eos, 9]  # eos mid-suffix => truncate after eos
    sched.postprocess_speculate([s], [suffix], [11])
    assert s.is_finished
    assert s.token_ids[-1] == cfg.eos
    assert s.block_table == [] and s.draft_block_table == []


def test_postprocess_speculate_max_new_tokens_truncation(model_dir):
    cfg, sched = _spec_sched(model_dir, k=2)
    s = seq_of(8, max_new_tokens=2, ignore_eos=True)
    sched.add(s)
    sched.schedule()
    s.recovery_token_id = 7
    s.num_cached_tokens = s.num_prompt_tokens
    s.num_draft_cached_tokens = s.num_prompt_tokens
    sched.schedule()

    sched.postprocess_speculate([s], [[7, 8, 9]], [11])
    assert s.is_finished
    assert s.num_completion_tokens == 2
