"""Offline render CLI smoke test (the reference viewer's headless analog).

Drives capsaicin_tpu.viewer.cli.main end-to-end — argument parsing, session
construction, N progressive frames, PNG write — at a tiny resolution.
Reference: src/viewer/main.cpp:84-102 (startup sequence + render loop).
"""

import numpy as np

from capsaicin_tpu.viewer import cli


def test_cli_renders_png(tmp_path):
    out = tmp_path / "out.png"
    rc = cli.main([
        "--scene", "cornell", "--width", "32", "--height", "32",
        "--frames", "2", "--bounces", "1", "--out", str(out),
    ])
    assert rc == 0
    assert out.exists()
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (32, 32, 3)
    # a real render: not all-black, not all-white, finite spread of values
    assert img.max() > 32 and img.min() < 224
