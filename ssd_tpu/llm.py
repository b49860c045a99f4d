"""Public entry point. Parity: /root/reference/ssd/llm.py:4-5."""

from ssd_tpu.engine.llm_engine import LLMEngine


class LLM(LLMEngine):
    pass
