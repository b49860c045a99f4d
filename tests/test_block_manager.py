"""Unit tests for the paged block allocator + prefix cache.

Covers the reference's semantics (block_manager.py): allocation, refcounted
prefix-cache hits, deallocation, lookahead append, and the draft/target table
switch.
"""

from ssd_tpu.engine.block_manager import BlockManager
from ssd_tpu.engine.sequence import Sequence
from ssd_tpu.sampling_params import SamplingParams


def make_seq(n_tokens, block_size=4):
    Sequence.block_size = block_size
    return Sequence(list(range(n_tokens)), SamplingParams(max_new_tokens=64))


def test_allocate_and_deallocate():
    bm = BlockManager(num_blocks=10, block_size=4, max_model_len=64)
    seq = make_seq(10)  # 3 blocks (2 full + 1 partial)
    assert bm.can_allocate(seq)
    bm.allocate(seq)
    assert len(seq.block_table) == 3
    assert len(bm.free_block_ids) == 7
    bm.deallocate(seq)
    assert len(bm.free_block_ids) == 10
    assert seq.block_table == []


def test_prefix_cache_hit():
    bm = BlockManager(num_blocks=10, block_size=4, max_model_len=64)
    seq1 = make_seq(8)  # 2 full blocks
    bm.allocate(seq1)
    assert seq1.num_cached_tokens == 0

    # Identical prompt: both full blocks should hit after seq1's blocks were
    # hashed during allocate (full blocks are hashed on allocation).
    seq2 = make_seq(8)
    bm.allocate(seq2)
    assert seq2.num_cached_tokens == 8
    assert seq2.block_table == seq1.block_table
    # Shared blocks are refcounted.
    for bid in seq2.block_table:
        assert bm.blocks[bid].ref_count == 2

    bm.deallocate(seq1)
    # Blocks still held by seq2.
    for bid in seq2.block_table:
        assert bm.blocks[bid].ref_count == 1
    bm.deallocate(seq2)
    assert len(bm.free_block_ids) == 10


def test_prefix_cache_partial_tail_not_cached():
    bm = BlockManager(num_blocks=10, block_size=4, max_model_len=64)
    seq1 = make_seq(10)
    bm.allocate(seq1)
    seq2 = make_seq(10)
    bm.allocate(seq2)
    # Only the 2 full blocks hit; the partial tail gets a fresh block.
    assert seq2.num_cached_tokens == 8
    assert seq2.block_table[:2] == seq1.block_table[:2]
    assert seq2.block_table[2] != seq1.block_table[2]


def test_freed_cached_block_rehit():
    bm = BlockManager(num_blocks=10, block_size=4, max_model_len=64)
    seq1 = make_seq(8)
    bm.allocate(seq1)
    table = list(seq1.block_table)
    bm.deallocate(seq1)
    # Freed but hash-mapped blocks can be resurrected from the free list.
    seq2 = make_seq(8)
    bm.allocate(seq2)
    assert seq2.num_cached_tokens == 8
    assert seq2.block_table == table


def test_can_append_and_may_append():
    bm = BlockManager(num_blocks=3, block_size=4, max_model_len=64)
    seq = make_seq(4)  # exactly 1 block
    bm.allocate(seq)
    assert bm.can_append(seq, 1)          # needs a second block; 2 free
    bm.may_append(seq, 1)
    assert len(seq.block_table) == 2
    assert bm.can_append(seq, 4)          # 4 ahead = tokens 5..8, fits block 2
    assert bm.can_append(seq, 5)          # needs a third block; 1 free
    bm.may_append(seq, 5)
    assert len(seq.block_table) == 3
    assert not bm.can_append(seq, 9)      # would need a 4th block; none free


def test_can_append_respects_max_model_len():
    bm = BlockManager(num_blocks=10, block_size=4, max_model_len=8)
    seq = make_seq(7)
    bm.allocate(seq)
    assert bm.can_append(seq, 1)
    assert not bm.can_append(seq, 2)  # 7+2 > 8


def test_draft_table_switch():
    target = BlockManager(num_blocks=5, block_size=4, max_model_len=64, is_draft=False)
    draft = BlockManager(num_blocks=5, block_size=4, max_model_len=64, is_draft=True)
    seq = make_seq(6)
    target.allocate(seq)
    draft.allocate(seq)
    assert len(seq.block_table) == 2 and len(seq.draft_block_table) == 2
    draft.deallocate(seq)
    assert seq.draft_block_table == [] and len(seq.block_table) == 2
    assert seq.num_draft_cached_tokens == 0
