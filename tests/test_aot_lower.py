"""Cross-platform AOT lowering gate: every Pallas kernel family must
lower to a serialized Mosaic module for platform 'tpu' on a CPU-only
host. This is the stage where "unsupported op / layout" Mosaic errors
surface (libtpu-side regalloc/VMEM limits are the only class it cannot
catch), so it gates kernel edits without needing the tunnel.

tools/aot_lower.py is the manual superset; here we run the two families
with the most Mosaic-sensitive constructs (the stream kernel's dynamic
pend-row indexing + DMA loops, and the fused stencil pairs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _lower_tpu(fn, *args):
    traced = jax.jit(fn).trace(*args)
    try:
        low = traced.lower(lowering_platforms=("tpu",))
    except TypeError:
        low = traced.lower(platforms=("tpu",))
    text = low.as_text()
    assert "tpu_custom_call" in text
    return text


@pytest.fixture
def rays():
    o = jnp.zeros((2048, 3), jnp.float32)
    d = jnp.ones((2048, 3), jnp.float32)
    return o, d


@pytest.mark.parametrize("variant", ["hier", "flat", "balanced", "any"])
def test_stream_kernel_lowers_for_tpu(monkeypatch, rays, variant):
    from capsaicin_tpu.ops import stream

    monkeypatch.setattr(stream, "_use_interpret", lambda: False)
    tris = np.random.RandomState(0).rand(900, 3, 3).astype(np.float32)
    sbvh = stream.build_stream_bvh(tris)
    o, d = rays
    fn = {
        "hier": lambda s, o, d: stream.stream_closest(s, o, d),
        "flat": lambda s, o, d: stream.stream_closest(s, o, d, hier=False),
        "balanced": lambda s, o, d: stream.stream_closest(s, o, d,
                                                          balance=True),
        "any": lambda s, o, d: stream.stream_any(s, o, d),
    }[variant]
    _lower_tpu(fn, sbvh, o, d)


@pytest.mark.parametrize("fused,storage", [
    (None, False), (True, False), ("13", False),
    (None, True), (True, True),  # bf16 storage (16-row tile layout)
])
def test_denoise_chain_lowers_for_tpu(monkeypatch, fused, storage):
    from capsaicin_tpu.ops import pallas_stencil as ps
    from capsaicin_tpu.render.settings import RenderOptions, default_settings

    monkeypatch.setattr(ps, "_use_interpret", lambda: False)
    h, w = 128, 256
    rng = np.random.RandomState(2)
    col = jnp.asarray(rng.rand(h, w, 4), jnp.float32)
    nrm = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    dep = jnp.asarray(rng.rand(h, w), jnp.float32)
    mom = jnp.asarray(rng.rand(h, w, 4), jnp.float32)
    settings = default_settings()
    opt = RenderOptions(eaw5=True)
    _lower_tpu(
        lambda c, nn, dd, m: ps.denoise_chain(c, nn, dd, m, settings, opt,
                                              fused=fused, storage=storage),
        col, nrm, dep, mom)
