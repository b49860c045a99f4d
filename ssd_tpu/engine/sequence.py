"""Per-request sequence state.

Parity: /root/reference/ssd/engine/sequence.py:14-120 — same fields and
bookkeeping (dual target/draft block tables, spec-step bookkeeping, EAGLE
carries). EAGLE activations are carried as numpy arrays instead of torch
tensors so the host engine stays framework-free.
"""

from copy import copy
from enum import Enum, auto
from itertools import count

from ssd_tpu.sampling_params import SamplingParams


class SequenceStatus(Enum):
    WAITING = auto()
    RUNNING = auto()
    FINISHED = auto()


class Sequence:
    counter = count()
    block_size = 256  # overwritten from Config at engine init

    _ATTRIBUTES = [
        "seq_id", "status", "token_ids", "last_token", "num_tokens",
        "num_prompt_tokens", "orig_num_prompt_tokens", "num_cached_tokens",
        "block_table",
        "last_spec_step_accepted_len", "draft_block_table",
        "num_draft_cached_tokens", "temperature", "draft_temperature",
        "max_new_tokens", "ignore_eos", "recovery_token_id",
        "last_target_hidden_state", "extend_eagle_acts", "extend_token_ids",
        "extend_count",
    ]

    def __init__(self, token_ids: list[int], sampling_params: SamplingParams | None = None):
        sampling_params = sampling_params or SamplingParams()
        self.seq_id = next(Sequence.counter)
        self.status = SequenceStatus.WAITING
        self.token_ids = list(token_ids)
        self.last_token = token_ids[-1]
        self.num_tokens = len(self.token_ids)
        # num_prompt_tokens is the scheduler's re-prefill boundary and moves
        # on preemption (completions are absorbed as "new prompt", reference
        # scheduler.py:141); orig_num_prompt_tokens is the REQUEST's prompt
        # boundary and never moves, so outputs and max_new_tokens accounting
        # survive preemption (the reference silently drops pre-preemption
        # completions and over-generates).
        self.num_prompt_tokens = len(token_ids)
        self.orig_num_prompt_tokens = len(token_ids)
        self.num_cached_tokens = 0
        self.block_table: list[int] = []
        # -1 on the first request forces a draft tree-cache miss.
        self.last_spec_step_accepted_len = -1

        self.draft_block_table: list[int] = []
        self.num_draft_cached_tokens = 0

        self.temperature = sampling_params.temperature
        self.draft_temperature = sampling_params.draft_temperature
        self.max_new_tokens = sampling_params.max_new_tokens
        self.ignore_eos = sampling_params.ignore_eos

        self.recovery_token_id: int | None = None
        self.last_target_hidden_state = None  # np.ndarray [3*D_target] (EAGLE)

        self.extend_eagle_acts = None   # np.ndarray [n_ext, 3*D_target] (EAGLE)
        self.extend_token_ids = None    # np.ndarray [n_ext]
        self.extend_count = 0

    def __len__(self):
        return self.num_tokens

    def __getitem__(self, key):
        return self.token_ids[key]

    @property
    def is_finished(self):
        return self.status == SequenceStatus.FINISHED

    @property
    def num_completion_tokens(self):
        return self.num_tokens - self.orig_num_prompt_tokens

    @property
    def prompt_token_ids(self):
        return self.token_ids[: self.orig_num_prompt_tokens]

    @property
    def completion_token_ids(self):
        return self.token_ids[self.orig_num_prompt_tokens:]

    @property
    def num_cached_blocks(self):
        return (self.num_cached_tokens + self.block_size - 1) // self.block_size

    @property
    def num_blocks(self):
        return (self.num_tokens + self.block_size - 1) // self.block_size

    @property
    def num_draft_cached_blocks(self):
        return (self.num_draft_cached_tokens + self.block_size - 1) // self.block_size

    @property
    def last_block_num_tokens(self):
        return self.num_tokens - (self.num_cached_blocks - 1) * self.block_size

    @property
    def last_block_num_tokens_draft(self):
        return self.num_tokens - (self.num_draft_cached_blocks - 1) * self.block_size

    def block(self, i: int) -> list[int]:
        assert 0 <= i < self.num_blocks
        return self.token_ids[i * self.block_size: (i + 1) * self.block_size]

    def append_token(self, token_id: int):
        self.token_ids.append(token_id)
        self.last_token = token_id
        self.num_tokens += 1

    def clone_spec(self) -> "Sequence":
        cloned = Sequence.__new__(Sequence)
        for attr in self._ATTRIBUTES:
            setattr(cloned, attr, copy(getattr(self, attr)))
        return cloned

    def __getstate__(self):
        return {attr: getattr(self, attr) for attr in self._ATTRIBUTES}

    def __setstate__(self, state):
        for attr in self._ATTRIBUTES:
            setattr(self, attr, state.get(attr))
