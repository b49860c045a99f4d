"""Validate the baseline-server eval tooling against an in-process stub of an
OpenAI-compatible streaming /v1/completions endpoint (VERDICT r1 item 5: the
client had never been exercised against a live server — vLLM/SGLang are not
installable in this image, so a protocol-faithful stub stands in)."""

import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


class _StubCompletions(BaseHTTPRequestHandler):
    n_tokens = 7
    delay_s = 0.01

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        if self.path == "/v1/chat/completions":  # compare_outputs --server
            assert body["messages"]
            payload = json.dumps({
                "choices": [{"message": {"content": "tok0 tok1"}}]
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
            return
        assert self.path == "/v1/completions"
        assert body["stream"] is True
        assert "prompt" in body and "max_tokens" in body
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        time.sleep(self.delay_s)  # fake prefill (TTFT)
        for i in range(min(self.n_tokens, body["max_tokens"])):
            chunk = {"choices": [{"text": f"tok{i} "}]}
            self.wfile.write(f"data: {json.dumps(chunk)}\n".encode())
            self.wfile.flush()
        self.wfile.write(b"data: [DONE]\n")

    def log_message(self, *a):
        pass


@pytest.fixture()
def stub_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubCompletions)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_baseline_eval_client_against_stub(stub_server, capsys, monkeypatch):
    from bench import baseline_eval_client as bec

    monkeypatch.setattr(sys, "argv", [
        "x", "--url", stub_server, "--numseqs", "4", "--input_len", "8",
        "--output_len", "16", "--concurrency", "2",
    ])
    bec.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["numseqs"] == 4
    assert out["output_tokens_approx_chunks"] == 4 * _StubCompletions.n_tokens
    assert out["decode_tok_s"] > 0 and out["end_to_end_tok_s"] > 0
    assert 0 < out["mean_ttft_s"] < 5


def test_compare_outputs_server_mode_against_stub(stub_server):
    """compare_outputs --server path: fetch a server completion string."""
    from types import SimpleNamespace

    from bench.compare_outputs import server_completion

    args = SimpleNamespace(server=stub_server, model_id="m", max_new_tokens=4,
                           temp=0.0)
    text = server_completion(args, "hello")
    assert text.startswith("tok0")
