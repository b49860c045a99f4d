"""ssd_tpu — TPU-native asynchronous tree-based speculative decoding engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`tanishqkumar/ssd` (reference mounted at /root/reference): autoregressive,
synchronous speculative, and asynchronous speculative (SSD) decoding with paged
KV caches, prefix caching, continuous batching, tensor parallelism over a
device mesh, and a disaggregated draft model.
"""

from ssd_tpu.config import Config, ModelConfig
from ssd_tpu.sampling_params import SamplingParams
from ssd_tpu.engine.sequence import Sequence, SequenceStatus

__all__ = [
    "Config",
    "ModelConfig",
    "SamplingParams",
    "Sequence",
    "SequenceStatus",
    "LLM",
    "LLMEngine",
    "METRICS",
]


def __getattr__(name):
    # Lazy import: keep `import ssd_tpu` light for host-only unit tests.
    if name == "LLM":
        from ssd_tpu.llm import LLM

        return LLM
    if name in ("LLMEngine", "METRICS"):
        from ssd_tpu.engine import llm_engine

        return getattr(llm_engine, name)
    raise AttributeError(name)
