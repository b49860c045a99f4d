"""Per-request sampling parameters.

Parity: /root/reference/ssd/sampling_params.py:4-9 (same four fields), plus
top-p / top-k filtering (beyond reference; requires the engine to be built
with Config.enable_top_sampling so the warp compiles into the programs).
"""

from dataclasses import dataclass


@dataclass
class SamplingParams:
    temperature: float = 1.0
    draft_temperature: float | None = None
    max_new_tokens: int = 256
    ignore_eos: bool = False
    top_p: float = 1.0   # nucleus filtering; 1.0 = off
    top_k: int = 0       # keep the k highest-probability tokens; 0 = off
