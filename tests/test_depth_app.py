"""Interactive depth demo app (cli/depth_app.py — the reference gradio
app's equivalent, DepthCrafter/app.py:103-239): serve, submit a job
through the HTTP surface, get videos + npz back."""

import os
import threading
import urllib.parse
import urllib.request

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def frame_dir(tmp_path, rng):
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(5):
        arr = (rng.uniform(0, 255, (72, 96, 3))).astype(np.uint8)
        Image.fromarray(arr).save(d / f"f_{i:02d}.png")
    return str(d)


def test_depth_app_roundtrip(tmp_path, frame_dir):
    from http.server import ThreadingHTTPServer
    from worldforge_tpu.cli.depth_app import (_build_pipeline, build_parser,
                                              make_handler)

    args = build_parser().parse_args(
        ["--random-init", "--tiny", "--port", "0",
         "--output-dir", str(tmp_path / "out"),
         "--window-size", "8", "--overlap", "2"])
    pipe = _build_pipeline(args)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(pipe, args))
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/", timeout=30) as r:
            page = r.read().decode()
        assert "num denoising steps" in page and "cfg scale" in page

        body = urllib.parse.urlencode({
            "video": frame_dir, "steps": "2", "cfg": "1.0",
            "max_res": "64", "length": "5", "fps": "4"}).encode()
        with urllib.request.urlopen(base + "/run", data=body,
                                    timeout=600) as r:
            res = r.read().decode()
        assert "Generated depth" in res

        outs = os.listdir(tmp_path / "out")
        assert any(n.endswith("_vis.mp4") for n in outs)
        assert any(n.endswith("_input.mp4") for n in outs)
        npz = [n for n in outs if n.endswith("_depth.npz")]
        assert npz
        depth = np.load(tmp_path / "out" / npz[0])["depth"]
        assert depth.ndim == 3 and np.isfinite(depth).all()
        assert 0.0 <= depth.min() and depth.max() <= 1.0

        # bad path -> form again with the error, not a 500
        bad = urllib.parse.urlencode({"video": "/no/such/path",
                                      "steps": "2"}).encode()
        with urllib.request.urlopen(base + "/run", data=bad,
                                    timeout=60) as r:
            assert "color:red" in r.read().decode()
    finally:
        srv.shutdown()


def test_vis_sequence_depth_lut():
    from worldforge_tpu.utils.depth_vis import vis_sequence_depth
    d = np.linspace(0, 1, 16, dtype=np.float32).reshape(1, 4, 4)
    rgb = vis_sequence_depth(d)
    assert rgb.shape == (1, 4, 4, 3)
    assert np.isfinite(rgb).all() and rgb.min() >= 0 and rgb.max() <= 1
    # monotone LUT index: the max-depth pixel maps to the LUT's last entry,
    # min-depth to the first -> distinct colors
    assert not np.allclose(rgb[0, 0, 0], rgb[0, 3, 3])
