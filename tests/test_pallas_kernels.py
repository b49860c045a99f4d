"""Pallas kernel numerics vs the jnp reference path (interpret mode on CPU).

Each kernel must match ops/attention.py's gather-based oracle to fp32
tolerance across decode (Q=1), verify/glue (Q=K+1), prefill (qeff < Q
padding), GQA grouping, ragged context lengths, and tree-mask steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu.ops import attention as att
from ssd_tpu.ops import pallas_attention as patt


def make_case(seed, B, Q, Hq, Hkv, hd, block_size, max_blocks, ctx_lens):
    rng = np.random.default_rng(seed)
    S = block_size * max_blocks * B + block_size
    kv = rng.normal(size=(Hkv, S, 2 * hd)).astype(np.float32)
    q = rng.normal(size=(B, Q, Hq, hd)).astype(np.float32)
    # Disjoint, shuffled block tables per sequence.
    all_blocks = rng.permutation(S // block_size - 1) + 1
    bt = np.full((B, max_blocks), -1, dtype=np.int32)
    for b in range(B):
        n = (ctx_lens[b] + block_size - 1) // block_size
        bt[b, :n] = all_blocks[b * max_blocks: b * max_blocks + n]
    return jnp.asarray(q), jnp.asarray(kv), jnp.asarray(bt), jnp.asarray(
        np.asarray(ctx_lens, dtype=np.int32)
    )


@pytest.mark.parametrize("Q,Hq,Hkv,ctx_lens", [
    (1, 4, 2, [5, 33]),          # decode, GQA
    (4, 4, 4, [17, 64]),         # verify multi-query, MHA
    (4, 8, 2, [9, 31]),          # verify, GQA 4x
    (1, 2, 1, [16, 16]),         # exact block boundary
])
def test_paged_attention_matches_reference(Q, Hq, Hkv, ctx_lens):
    B, hd, block_size, max_blocks = 2, 16, 16, 8
    q, kv, bt, ctx = make_case(0, B, Q, Hq, Hkv, hd, block_size, max_blocks, ctx_lens)
    ctx_pad = 128
    scale = hd ** -0.5

    want = att.paged_attention(q, kv, bt, ctx, block_size, ctx_pad, scale)
    got = patt.paged_attention(
        q, kv, bt, ctx, jnp.full((B,), Q, jnp.int32), block_size, ctx_pad,
        scale, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_paged_attention_prefill_qeff():
    """Prefill: Q padded beyond the true new-token count; real rows match."""
    B, Q, Hq, Hkv, hd = 1, 16, 4, 2, 16
    block_size, max_blocks = 16, 8
    num_new = 11
    ctx_lens = [40]  # 29 cached + 11 new
    q, kv, bt, ctx = make_case(3, B, Q, Hq, Hkv, hd, block_size, max_blocks, ctx_lens)
    ctx_pad = 64
    scale = hd ** -0.5

    want = att.prefill_attention(
        q, kv, bt, jnp.int32(ctx_lens[0]), jnp.int32(num_new),
        block_size, ctx_pad, scale,
    )
    got = patt.paged_attention(
        q, kv, bt, ctx, jnp.asarray([num_new], jnp.int32), block_size,
        ctx_pad, scale, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got)[0, :num_new], np.asarray(want)[0, :num_new],
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("Q,num_new,ctx_lens", [
    (64, [64, 37], [64, 37]),     # fresh prompts, ragged
    (64, [23, 64], [87, 100]),    # prefix-cached + new, ragged
])
def test_paged_attention_prefill_dense_wrapper(Q, num_new, ctx_lens):
    """The dense-gather large-tile prefill wrapper matches the oracle on
    ragged, prefix-cached batches (including tile sizes > one page)."""
    B, Hq, Hkv, hd = 2, 4, 2, 16
    block_size, max_blocks = 16, 8
    q, kv, bt, ctx = make_case(11, B, Q, Hq, Hkv, hd, block_size, max_blocks,
                               ctx_lens)
    ctx_pad = 128
    scale = hd ** -0.5
    qeff = jnp.asarray(num_new, jnp.int32)

    want = att.paged_attention(q, kv, bt, ctx, block_size, ctx_pad, scale,
                               qeff=qeff)
    got = patt.paged_attention_prefill(
        q, kv, bt, ctx, qeff, block_size, ctx_pad, scale, interpret=True,
    )
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(got)[b, :num_new[b]], np.asarray(want)[b, :num_new[b]],
            rtol=2e-5, atol=2e-5,
        )


@pytest.mark.parametrize("step", [0, 1, 2])
def test_tree_attention_matches_reference(step):
    B, Hq, Hkv, hd = 2, 4, 2, 16
    K, MQ = 3, 8
    block_size, max_blocks = 16, 16
    base = np.asarray([20, 7], dtype=np.int32)  # num_tokens - 1
    ctx_lens = (base + (K + 1) + (step + 1) * MQ).tolist()
    q, kv, bt, ctx = make_case(7 + step, B, MQ, Hq, Hkv, hd, block_size,
                               max_blocks, ctx_lens)
    fan = jnp.asarray(
        np.stack([np.repeat(np.arange(K + 1), 2),
                  np.repeat(np.arange(K + 1), 2)]), jnp.int32
    )  # [B, MQ] fan_out_list = [2,2,2,2]
    ctx_pad = 128
    scale = hd ** -0.5

    want = att.tree_attention(q, kv, bt, ctx, fan, step, K, block_size, ctx_pad, scale)
    got = patt.tree_attention(
        q, kv, bt, ctx, fan, jnp.int32(step), K, block_size, ctx_pad, scale,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_paged_attention_bf16():
    """bf16 inputs with fp32 accumulation stay close to the fp32 oracle."""
    B, Q, Hq, Hkv, hd = 2, 2, 4, 2, 32
    block_size, max_blocks = 16, 8
    q, kv, bt, ctx = make_case(11, B, Q, Hq, Hkv, hd, block_size, max_blocks, [19, 42])
    qb, kvb = q.astype(jnp.bfloat16), kv.astype(jnp.bfloat16)
    ctx_pad = 64
    scale = hd ** -0.5

    want = att.paged_attention(qb, kvb, bt, ctx, block_size, ctx_pad, scale)
    got = patt.paged_attention(
        qb, kvb, bt, ctx, jnp.full((B,), Q, jnp.int32), block_size, ctx_pad,
        scale, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("kernel_name", ["v2", "v3"])
@pytest.mark.parametrize("Q,Hq,Hkv,ctx_lens", [
    (1, 8, 2, [70, 200, 33]),     # decode, GQA, ragged (group over-copy path)
    (5, 8, 8, [64, 128, 100]),    # verify multi-query, MHA
    (1, 4, 4, [256, 256, 256]),   # equal lengths, exact chunk boundary
])
def test_paged_attention_v2_v3_match_reference(kernel_name, Q, Hq, Hkv,
                                               ctx_lens):
    """The manual-DMA pipelined kernels (v2: per-seq grid steps; v3: NB
    sequences per grid step) vs the oracle at the PRODUCTION head_dim (64 —
    the router only sends 128-lane-aligned 2*hd to these kernels, so the
    hd=16 tiny-model tests never reach them)."""
    B, hd, block_size, max_blocks = 3, 64, 64, 8
    q, kv, bt, ctx = make_case(21, B, Q, Hq, Hkv, hd, block_size, max_blocks,
                               ctx_lens)
    ctx_pad = 512
    scale = hd ** -0.5
    qeff = jnp.full((B,), Q, jnp.int32)

    want = att.paged_attention(q, kv, bt, ctx, block_size, ctx_pad, scale)
    if kernel_name == "v2":
        got = patt.paged_attention_v2(
            q, kv, bt, ctx, qeff, block_size, ctx_pad, scale, interpret=True)
    else:
        got = patt.paged_attention_v3(
            q, kv, bt, ctx, qeff, block_size, ctx_pad, scale,
            seqs_per_step=2, interpret=True)  # 2 -> exercises a ragged group
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_attention_v3_single_group():
    """All sequences in one group (NB >= B) still matches."""
    B, Q, Hq, Hkv, hd = 4, 1, 8, 4, 64
    block_size, max_blocks = 64, 8
    q, kv, bt, ctx = make_case(5, B, Q, Hq, Hkv, hd, block_size, max_blocks,
                               [100, 64, 250, 1])
    ctx_pad = 512
    scale = hd ** -0.5
    want = att.paged_attention(q, kv, bt, ctx, block_size, ctx_pad, scale)
    got = patt.paged_attention_v3(
        q, kv, bt, ctx, jnp.full((B,), Q, jnp.int32), block_size, ctx_pad,
        scale, seqs_per_step=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("step", [0, 2])
def test_tree_attention_v2_matches_reference(step):
    """Pipelined tree kernel at production head_dim vs oracle."""
    B, Hq, Hkv, hd = 2, 8, 2, 64
    K, MQ = 3, 8
    block_size, max_blocks = 64, 16
    base = np.asarray([120, 77], dtype=np.int32)
    ctx_lens = (base + (K + 1) + (step + 1) * MQ).tolist()
    q, kv, bt, ctx = make_case(9 + step, B, MQ, Hq, Hkv, hd, block_size,
                               max_blocks, ctx_lens)
    fan = jnp.asarray(
        np.stack([np.repeat(np.arange(K + 1), 2)] * B), jnp.int32)
    ctx_pad = 512
    scale = hd ** -0.5
    want = att.tree_attention(q, kv, bt, ctx, fan, step, K, block_size,
                              ctx_pad, scale)
    got = patt.tree_attention_v2(
        q, kv, bt, ctx, fan, jnp.int32(step), K, block_size, ctx_pad, scale,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("step", [0, 2])
def test_tree_attention_v3_matches_reference(step):
    """NB-grouped tree kernel vs oracle (ragged groups, production hd)."""
    B, Hq, Hkv, hd = 3, 8, 2, 64
    K, MQ = 3, 8
    block_size, max_blocks = 64, 16
    base = np.asarray([120, 77, 30], dtype=np.int32)
    ctx_lens = (base + (K + 1) + (step + 1) * MQ).tolist()
    q, kv, bt, ctx = make_case(13 + step, B, MQ, Hq, Hkv, hd, block_size,
                               max_blocks, ctx_lens)
    fan = jnp.asarray(
        np.stack([np.repeat(np.arange(K + 1), 2)] * B), jnp.int32)
    ctx_pad = 512
    scale = hd ** -0.5
    want = att.tree_attention(q, kv, bt, ctx, fan, step, K, block_size,
                              ctx_pad, scale)
    got = patt.tree_attention_v3(
        q, kv, bt, ctx, fan, jnp.int32(step), K, block_size, ctx_pad, scale,
        seqs_per_step=2, interpret=True)  # 2 -> exercises a ragged group
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_v3_geometry_vmem_budget():
    """The double-buffered KV scratch must stay within the 8 MB budget for
    EVERY geometry — at head_dim 128 a 256-token page is 1 MB, so NB must
    shrink, not just the chunk size (review finding: NB=8 would claim the
    entire 16 MB v5e VMEM and fail Mosaic allocation on-chip)."""
    for Hkv, hd2, bs, B in [(8, 256, 256, 8),   # Qwen3/Llama-3B geometry
                            (8, 128, 256, 8),   # 1B geometry
                            (8, 256, 64, 5),    # small pages, odd batch
                            (4, 256, 512, 16)]:
        kv = jnp.zeros((Hkv, 4 * bs, hd2), jnp.bfloat16)
        NB, C = patt._v3_geometry(kv, bs, B, 8, 8, 2048)
        page_bytes = Hkv * bs * hd2 * 2
        assert 2 * NB * C * page_bytes <= (8 << 20), (Hkv, hd2, bs, B, NB, C)
        assert 1 <= NB <= B and C >= 1


def test_paged_attention_v3_hd128_geometry():
    """v3 end-to-end at the hd=128 geometry that forces NB < B."""
    B, Q, Hq, Hkv, hd = 4, 1, 16, 8, 128
    block_size, max_blocks = 64, 8
    q, kv, bt, ctx = make_case(31, B, Q, Hq, Hkv, hd, block_size, max_blocks,
                               [100, 64, 250, 30])
    ctx_pad = 512
    scale = hd ** -0.5
    want = att.paged_attention(q, kv, bt, ctx, block_size, ctx_pad, scale)
    got = patt.paged_attention_v3(
        q, kv, bt, ctx, jnp.full((B,), Q, jnp.int32), block_size, ctx_pad,
        scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kernel_name", ["v2", "v3"])
def test_paged_attention_overshoot_ctx_beyond_pad(kernel_name):
    """context_lens > ctx_pad (sync-SD/AR context-limit overshoot: the
    overshoot rows are ghost-slotted and host-truncated). Regression for the
    review finding: the manual-DMA kernels' final-write guard never fired for
    such a sequence (garbage output) and the prefetch walked a nonexistent
    chunk into the NEXT sequence's first buffer (corrupting a sequence
    nowhere near its limit)."""
    B, Q, Hq, Hkv, hd = 3, 4, 8, 2, 64
    block_size, max_blocks = 64, 4
    ctx_pad = 256  # == max_blocks * block_size: table is full
    ctx_lens = [258, 100, 256]  # seq 0 overshoots by 2; seq 1 follows it
    q, kv, bt, ctx = make_case(41, B, Q, Hq, Hkv, hd, block_size, max_blocks,
                               [min(c, ctx_pad) for c in ctx_lens])
    ctx = jnp.asarray(np.asarray(ctx_lens, np.int32))  # true (overshot) lens
    scale = hd ** -0.5
    qeff = jnp.full((B,), Q, jnp.int32)

    want = att.paged_attention(q, kv, bt, ctx, block_size, ctx_pad, scale,
                               qeff=qeff)
    fn = (patt.paged_attention_v2 if kernel_name == "v2"
          else patt.paged_attention_v3)
    got = fn(q, kv, bt, ctx, qeff, block_size, ctx_pad, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def _flat_meta(ctx_lens, qeffs, block_size, T_pad):
    """Flat-packed prefill metadata: per-seq page runs concatenated, and each
    new token's half-open attention interval in flat context coordinates."""
    pages_per = [(c + block_size - 1) // block_size for c in ctx_lens]
    page_off = np.concatenate([[0], np.cumsum(pages_per)])[:-1]
    lo, hi = [], []
    for s, (c, qe) in enumerate(zip(ctx_lens, qeffs)):
        base = page_off[s] * block_size
        for i in range(qe):
            lo.append(base)
            hi.append(base + (c - qe + i) + 1)
    pad = T_pad - len(lo)
    lo += [0] * pad
    hi += [0] * pad
    return (np.asarray(lo, np.int32), np.asarray(hi, np.int32),
            page_off, pages_per)


def test_flat_prefill_attention_matches_oracles():
    """The one-dispatch flat ragged prefill matches (a) the interval-mask jnp
    oracle and (b) the per-sequence paged-attention oracle — proving both the
    kernel and the interval metadata encoding."""
    B, Hq, Hkv, hd = 3, 8, 2, 64
    block_size, max_blocks = 16, 8
    ctx_lens = [9, 12, 19]
    qeffs = [5, 12, 3]   # seqs 0/2 are prefix-cached, 1 is fresh
    q_dummy, kv, bt, ctx = make_case(51, B, max(qeffs), Hq, Hkv, hd,
                                     block_size, max_blocks, ctx_lens)
    T = sum(qeffs)
    T_pad = 32
    rng_l = np.random.default_rng(52)
    qflat = jnp.asarray(rng_l.normal(size=(T_pad, Hq, hd)).astype(np.float32))
    scale = hd ** -0.5

    lo, hi, page_off, pages_per = _flat_meta(ctx_lens, qeffs, block_size,
                                             T_pad)
    flat_pages = np.concatenate(
        [np.asarray(bt)[s, :pages_per[s]] for s in range(B)])
    P_pad = 8
    flat_pages = np.pad(flat_pages, (0, P_pad - len(flat_pages)),
                        constant_values=-1).astype(np.int32)

    got = patt.flat_prefill_attention(
        qflat, kv, jnp.asarray(flat_pages), jnp.asarray(lo), jnp.asarray(hi),
        block_size, scale, tq=16, tk=32, interpret=True)

    # (a) interval-mask jnp oracle on the same packed stream.
    dense = np.asarray(kv).reshape(Hkv, -1, block_size, 2 * hd)[
        :, np.clip(flat_pages, 0, None)
    ].reshape(Hkv, P_pad * block_size, 2 * hd)
    want = att.flat_prefill_attention(
        qflat, jnp.asarray(dense), jnp.asarray(lo), jnp.asarray(hi), scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # (b) per-sequence paged oracle: each seq's rows must equal a [1, qeff]
    # multi-query paged attention over its own block table.
    off = 0
    for s in range(B):
        qe = qeffs[s]
        qs = qflat[off:off + qe][None]                      # [1, qe, Hq, hd]
        want_s = att.paged_attention(
            qs, kv, jnp.asarray(np.asarray(bt)[s:s + 1]),
            jnp.asarray([ctx_lens[s]], jnp.int32), block_size, 128, scale,
            qeff=jnp.asarray([qe], jnp.int32))
        np.testing.assert_allclose(
            np.asarray(got)[off:off + qe], np.asarray(want_s)[0],
            rtol=2e-5, atol=2e-5, err_msg=f"seq {s}")
        off += qe
