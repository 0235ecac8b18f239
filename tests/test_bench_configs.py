"""bench.py config-table plumbing: every named config must resolve to a
coherent run_config call (the driver runs these on hardware where a typo
costs a 20-minute compile, so gate the table shape on CPU)."""

import importlib.util
import os
import sys
from unittest import mock


def _load_bench():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(root, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_configs_well_formed():
    bench = _load_bench()
    for name, cfg in bench.CONFIGS.items():
        assert {"width", "height", "bounces", "scene"} <= set(cfg), name
        assert cfg["scene"] in ("cornell", "textured", "colonnade"), name
        assert cfg.get("frames_per_dispatch", 1) >= 1, name
    assert bench.FLAGSHIP in bench.ALL_CONFIGS
    # A/B-only variants stay out of --all (each --all line is a multi-minute
    # hardware compile; variants are opt-in by name)
    for ab in bench._AB_ONLY:
        assert ab in bench.CONFIGS and ab not in bench.ALL_CONFIGS
    # loop16 variants differ from their base config only in dispatch mode
    for base in ("direct512", "progressive", "textured"):
        v = dict(bench.CONFIGS[f"{base}_loop16"])
        assert v.pop("frames_per_dispatch") == 16
        assert v == bench.CONFIGS[base], base


def test_run_named_passes_config_dispatch(monkeypatch):
    bench = _load_bench()
    calls = {}

    def fake_run_config(width, height, bounces, scene, traversal, frames,
                        lowres=False, extra_options=None, spp=1,
                        frames_per_dispatch=1, atlas_u32=False,
                        stream_block=None):
        calls[scene, width, frames_per_dispatch] = dict(
            bounces=bounces, traversal=traversal, lowres=lowres,
            extra=extra_options, u32=atlas_u32, stream_block=stream_block)
        return {"mrays_per_s": 1.0, "ms_per_frame": 1.0, "fps": 1.0,
                "spp_per_s": 1.0}

    monkeypatch.setattr(bench, "run_config", fake_run_config)
    monkeypatch.setattr(bench, "wait_for_backend", lambda: True)
    with mock.patch.object(
            sys, "argv", ["bench.py", "--config", "progressive_loop16"]):
        bench.main()
    ((scene, width, fpd),) = calls
    assert (scene, width, fpd) == ("cornell", 1024, 16)
    assert calls[scene, width, fpd]["lowres"] is True
    assert calls[scene, width, fpd]["extra"] == {}
    assert calls[scene, width, fpd]["stream_block"] is None

    calls.clear()
    with mock.patch.object(
            sys, "argv", ["bench.py", "--config", "colonnade_stream64"]):
        bench.main()
    ((scene, width, fpd),) = calls
    assert (scene, width, fpd) == ("colonnade", 1920, 1)
    assert calls[scene, width, fpd]["traversal"] == "stream"
    assert calls[scene, width, fpd]["stream_block"] == 64
