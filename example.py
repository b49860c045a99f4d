"""Minimal usage example (the reference's example.py-style entry).

Runs whatever checkpoints you have locally; defaults to the HF-cache
Llama-3.1 pair resolved by ssd_tpu.paths.

  python example.py                               # AR
  python example.py --spec                        # sync speculative decoding
  python example.py --spec --async                # async SSD (flagship)
  python example.py --model /path/to/target --draft /path/to/draft --spec --async
"""

import argparse

from ssd_tpu import LLM, SamplingParams
from ssd_tpu.paths import DEFAULT_DRAFT, DEFAULT_TARGET


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=DEFAULT_TARGET)
    p.add_argument("--draft", default=DEFAULT_DRAFT)
    p.add_argument("--spec", action="store_true")
    p.add_argument("--async", dest="draft_async", action="store_true")
    p.add_argument("--chips", type=int, default=1)
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--f", type=int, default=3)
    p.add_argument("--temp", type=float, default=0.0)
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--prompt", default="Explain how paged KV caches work.")
    args = p.parse_args()

    llm = LLM(
        args.model,
        num_devices=args.chips,
        speculate=args.spec,
        draft_async=args.draft_async,
        draft=args.draft,
        speculate_k=args.k,
        async_fan_out=args.f,
    )
    prompt = args.prompt
    if llm.tokenizer is None:
        # Tokenizer-less checkpoint (e.g. a random-weight smoke dir): run a
        # fixed token-id prompt and print ids instead of text.
        prompt = [3, 11, 7, 25, 4, 9, 30, 2, 17]
    elif hasattr(llm.tokenizer, "apply_chat_template"):
        prompt = llm.tokenizer.apply_chat_template(
            [{"role": "user", "content": args.prompt}], add_generation_prompt=True
        )
    outs, metrics = llm.generate(
        [prompt],
        SamplingParams(temperature=args.temp, max_new_tokens=args.max_new_tokens),
    )
    print("\n--- completion ---\n"
          + (outs[0]["text"] or str(outs[0]["token_ids"])))
    llm.exit()


if __name__ == "__main__":
    main()
