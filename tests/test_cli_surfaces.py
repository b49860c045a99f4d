"""Drive the user-facing CLIs end-to-end on the CPU backend.

compare_outputs is the reference's de-facto exactness test
(/root/reference/bench/compare_outputs.py); chat.py is the interactive
surface (/root/reference/bench/chat.py). Neither had a test before: the
former is exercised across all four decode modes on a tiny checkpoint, the
latter through a scripted stdin session (engine mode) and a streaming stub
server (baseline mode).
"""

import builtins
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from tests.utils_models import make_tiny_llama


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_target")
    make_tiny_llama(d, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_draft")
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, seed=7)
    return str(d)


def test_compare_outputs_all_modes_exact(target_dir, draft_dir, monkeypatch, capsys):
    """AR / sync SD / fused SD / async SSD greedy outputs agree via the CLI."""
    from bench import compare_outputs

    monkeypatch.setattr(sys, "argv", [
        "compare_outputs",
        "--model-path", target_dir,
        "--draft", draft_dir,
        "--prompt-ids", "3", "17", "42", "9", "55",
        "--max_new_tokens", "12",
        "--k", "3",
        "--max_model_len", "256",
        "--block_sz", "16",
    ])
    rc = compare_outputs.main()
    out = capsys.readouterr().out
    assert rc == 0, out
    assert out.count("EXACT MATCH") == 3, out  # sd, sd-fused, ssd vs ar


class _DummyTokenizer:
    eos_token_id = 2

    def apply_chat_template(self, history, add_generation_prompt=True):
        # Deterministic short prompt from the chat history.
        seed = sum(len(m["content"]) for m in history) % 40
        return [1, 3 + seed, 5, 7]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)

    def encode(self, text):
        return [1, 5, 9]


def test_chat_engine_mode_streams(target_dir, monkeypatch, capsys):
    """One scripted chat turn through the real engine: the stream callback
    fires, TTFT/tok-s are reported, and the session exits cleanly on EOF."""
    from bench import chat as chat_cli
    import ssd_tpu.engine.llm_engine as eng

    monkeypatch.setattr(eng, "load_tokenizer", lambda path: _DummyTokenizer())
    lines = iter(["hello there"])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr(builtins, "input", fake_input)
    monkeypatch.setattr(sys, "argv", [
        "chat",
        "--model-path", target_dir,
        "--max_new_tokens", "8",
        "--max_model_len", "256",
        "--block_sz", "16",
    ])
    chat_cli.main()
    out = capsys.readouterr().out
    assert "Chat ready" in out
    assert "[ttft" in out and "tok/s]" in out


class _StubChatStream(BaseHTTPRequestHandler):
    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        assert self.path == "/v1/chat/completions" and body["stream"] is True
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        for word in ("hi", " from", " stub"):
            chunk = {"choices": [{"delta": {"content": word}}]}
            self.wfile.write(f"data: {json.dumps(chunk)}\n".encode())
            self.wfile.flush()
        self.wfile.write(b"data: [DONE]\n")

    def log_message(self, *a):
        pass


def test_chat_server_mode_parses_stream(monkeypatch, capsys):
    """Baseline mode: the OpenAI-compatible SSE stream is parsed delta by
    delta and per-turn TTFT/tok-s are printed."""
    from bench import chat as chat_cli

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubChatStream)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        lines = iter(["ping"])

        def fake_input(prompt=""):
            try:
                return next(lines)
            except StopIteration:
                raise EOFError

        monkeypatch.setattr(builtins, "input", fake_input)
        monkeypatch.setattr(sys, "argv", [
            "chat", "--server", f"http://127.0.0.1:{srv.server_address[1]}",
        ])
        chat_cli.main()
        out = capsys.readouterr().out
        assert "hi from stub" in out
        assert "[ttft" in out
    finally:
        srv.shutdown()
