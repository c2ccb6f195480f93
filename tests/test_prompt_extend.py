"""Prompt extension dispatch + backend plumbing."""

from worldforge_tpu.utils.prompt_extend import (LM_EN_SYS_PROMPT,
                                                LM_ZH_SYS_PROMPT,
                                                VL_EN_MULTI_SYS_PROMPT,
                                                VL_ZH_SYS_PROMPT,
                                                LocalPromptExpander,
                                                enhance_prompt_i2v,
                                                enhance_prompt_t2v)


def _echo(system, prompt, seed):
    return f"[{seed}] {prompt} (expanded)"


def test_dispatch_lm():
    e = LocalPromptExpander(_echo)
    assert e.decide_system_prompt("en") == LM_EN_SYS_PROMPT
    assert e.decide_system_prompt("zh") == LM_ZH_SYS_PROMPT


def test_dispatch_vl_and_multi():
    e = LocalPromptExpander(_echo, is_vl=True)
    assert e.decide_system_prompt("zh") == VL_ZH_SYS_PROMPT
    # multi-image flips the high bit even for a non-VL expander
    e2 = LocalPromptExpander(_echo)
    assert e2.decide_system_prompt(
        "en", multi_images_input=True) == VL_EN_MULTI_SYS_PROMPT
    assert e2.is_vl


def test_extend_success_and_seed():
    e = LocalPromptExpander(_echo)
    out = e("a cat", tar_lang="en", seed=7)
    assert out.status and out.seed == 7
    assert out.prompt == "[7] a cat (expanded)"


def test_extend_failure_falls_back():
    def boom(system, prompt, seed):
        raise RuntimeError("backend down")

    e = LocalPromptExpander(boom)
    out = e("a cat", tar_lang="en", seed=1)
    assert not out.status and out.prompt == "a cat"
    assert "backend down" in out.message
    assert enhance_prompt_t2v(e, "a cat", seed=1) == "a cat"


def test_vl_requires_backend():
    e = LocalPromptExpander(_echo, is_vl=True)
    out = e("a cat", image=object(), tar_lang="en", seed=2)
    assert not out.status
    assert enhance_prompt_i2v(e, "a cat", image=object(), seed=2) == "a cat"

    e2 = LocalPromptExpander(_echo, is_vl=True,
                             generate_vl_fn=lambda s, p, img, seed: p + "!")
    assert enhance_prompt_i2v(e2, "a cat", image=object(), seed=2) == "a cat!"


# ---------------------------------------------- hosted OpenAI-compat client


class _MockChatHandler:
    """Minimal OpenAI-compatible /chat/completions endpoint for tests."""

    def __init__(self):
        self.requests = []
        self.fail_next = 0  # number of 500s to serve before succeeding

    def make_handler(self):
        import http.server
        import json

        mock = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"])))
                mock.requests.append(
                    {"path": self.path, "body": body,
                     "auth": self.headers.get("Authorization")})
                if mock.fail_next > 0:
                    mock.fail_next -= 1
                    self.send_response(500)
                    self.end_headers()
                    return
                resp = {"choices": [{"message": {
                    "content": f"rewritten: {_last_text(body)}"}}]}
                data = json.dumps(resp).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):  # silence
                pass

        return Handler


def _last_text(body):
    content = body["messages"][-1]["content"]
    if isinstance(content, list):
        return next(p["text"] for p in content if p.get("type") == "text")
    return content


def _serve(mock):
    import http.server
    import threading

    srv = http.server.HTTPServer(("127.0.0.1", 0), mock.make_handler())
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/v1"


def _client(url, **kw):
    from worldforge_tpu.utils.prompt_extend import OpenAICompatPromptExpander
    return OpenAICompatPromptExpander(
        base_url=url, api_key="test-key", retry_sleep=0.0, **kw)


def test_openai_compat_text_roundtrip():
    mock = _MockChatHandler()
    srv, url = _serve(mock)
    try:
        e = _client(url, model_name="qwen-plus")
        out = e("a cat", tar_lang="en", seed=5)
        assert out.status and out.prompt == "rewritten: a cat"
        req = mock.requests[0]
        assert req["path"].endswith("/v1/chat/completions")
        assert req["auth"] == "Bearer test-key"
        assert req["body"]["model"] == "qwen-plus"
        assert req["body"]["seed"] == 5
        assert req["body"]["messages"][0]["role"] == "system"
    finally:
        srv.shutdown()


def test_openai_compat_retry_then_success():
    mock = _MockChatHandler()
    mock.fail_next = 2
    srv, url = _serve(mock)
    try:
        out = _client(url)("a dog", tar_lang="en", seed=1)
        assert out.status and len(mock.requests) == 3
    finally:
        srv.shutdown()


def test_openai_compat_exhausted_falls_back():
    mock = _MockChatHandler()
    mock.fail_next = 99
    srv, url = _serve(mock)
    try:
        out = _client(url, retry_times=2)("a dog", tar_lang="en", seed=1)
        assert not out.status and out.prompt == "a dog"
        assert len(mock.requests) == 2
    finally:
        srv.shutdown()


def test_openai_compat_vl_image_payload():
    import numpy as np
    from PIL import Image

    mock = _MockChatHandler()
    srv, url = _serve(mock)
    try:
        img = Image.fromarray(
            (np.random.default_rng(0).uniform(0, 255, (1024, 2048, 3))
             ).astype("uint8"))
        e = _client(url, is_vl=True, max_image_size=512 * 512)
        out = e("describe\nthis", tar_lang="en", image=img, seed=3)
        assert out.status
        parts = mock.requests[0]["body"]["messages"][-1]["content"]
        kinds = [p["type"] for p in parts]
        assert kinds == ["text", "image_url"]
        url_str = parts[1]["image_url"]["url"]
        assert url_str.startswith("data:image/jpeg;base64,")
        # area clamp: H1024xW2048 -> ~512*512 px, aspect preserved (h/w=0.5)
        import base64
        import io
        sent = Image.open(io.BytesIO(
            base64.b64decode(url_str.split(",", 1)[1])))
        assert sent.width * sent.height <= 512 * 512 * 1.01
        assert abs(sent.height / sent.width - 0.5) < 0.05
    finally:
        srv.shutdown()
