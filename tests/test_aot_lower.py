"""Cross-platform AOT lowering gate: every Pallas kernel family must
lower to a serialized Mosaic module for platform 'tpu' on a CPU-only
host. This is the stage where "unsupported op / layout" Mosaic errors
surface (libtpu-side regalloc/VMEM limits are the only class it cannot
catch), so it gates kernel edits without needing the tunnel.

Covers every kernel family and variant (the same matrix as the manual
tools/aot_lower.py runner): a kernel edit that breaks TPU lowering for
any family fails CI, not just the stream/stencil subset."""

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


@pytest.mark.parametrize("variant", ["hier", "flat", "balanced", "any",
                                     "hier_b64", "any_b64", "hier_b128"])
def test_stream_kernel_lowers_for_tpu(monkeypatch, rays, variant):
    from capsaicin_tpu.ops import stream

    monkeypatch.setattr(stream, "_use_interpret", lambda: False)
    tris = np.random.RandomState(0).rand(900, 3, 3).astype(np.float32)
    block = 128 if variant.endswith("b128") else (
        64 if variant.endswith("b64") else 32)
    sbvh = stream.build_stream_bvh(tris, block_tris=block)
    o, d = rays
    fn = {
        "hier": lambda s, o, d: stream.stream_closest(s, o, d),
        "flat": lambda s, o, d: stream.stream_closest(s, o, d, hier=False),
        "balanced": lambda s, o, d: stream.stream_closest(s, o, d,
                                                          balance=True),
        "any": lambda s, o, d: stream.stream_any(s, o, d),
        "hier_b64": lambda s, o, d: stream.stream_closest(s, o, d),
        "any_b64": lambda s, o, d: stream.stream_any(s, o, d),
        "hier_b128": lambda s, o, d: stream.stream_closest(s, o, d),
    }[variant]
    _lower_tpu(fn, sbvh, o, d)


@pytest.mark.parametrize("variant", ["closest", "any"])
def test_packet_kernel_lowers_for_tpu(monkeypatch, rays, variant):
    from capsaicin_tpu.ops import pallas_traverse as pt

    monkeypatch.setattr(pt, "_use_interpret", lambda: False)
    tris = np.random.RandomState(1).rand(900, 3, 3).astype(np.float32)
    bvh = pt.build_packed_bvh(tris)
    o, d = rays
    fn = {"closest": lambda b, o, d: pt.bvh_closest(b, o, d),
          "any": lambda b, o, d: pt.bvh_any(b, o, d)}[variant]
    _lower_tpu(fn, bvh, o, d)


@pytest.mark.parametrize("storage", [False, True])
def test_spatial_gather_lowers_for_tpu(monkeypatch, storage):
    from capsaicin_tpu.ops import pallas_stencil as ps
    from capsaicin_tpu.render.settings import default_settings

    monkeypatch.setattr(ps, "_use_interpret", lambda: False)
    h, w = 128, 256
    rng = np.random.RandomState(3)
    col = jnp.asarray(rng.rand(h, w, 4), jnp.float32)
    nrm = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    dep = jnp.asarray(rng.rand(h, w), jnp.float32)
    settings = default_settings()
    _lower_tpu(
        lambda c, nn, dd: ps.spatial_gather(c, nn, dd, settings,
                                            storage=storage),
        col, nrm, dep)


@pytest.mark.parametrize("variant", ["closest", "any"])
def test_brute_kernel_lowers_for_tpu(monkeypatch, rays, variant):
    from capsaicin_tpu.ops import pallas_intersect as pi

    monkeypatch.setattr(pi, "_use_interpret", lambda: False)
    tris = jnp.asarray(np.random.RandomState(4).rand(300, 3, 3), jnp.float32)
    o, d = rays
    fn = {"closest": lambda o, d, t: pi.brute_force_closest(o, d, t),
          "any": lambda o, d, t: pi.brute_force_any(o, d, t)}[variant]
    _lower_tpu(fn, o, d, tris)


def test_lookup_kernel_lowers_for_tpu(monkeypatch):
    from capsaicin_tpu.ops import pallas_lookup as plk

    monkeypatch.setattr(plk, "_use_interpret", lambda: False)
    table = jnp.asarray(np.random.RandomState(5).rand(8, 512), jnp.float32)
    idx = jnp.zeros((4096,), jnp.int32)
    _lower_tpu(lambda t, i: plk.table_lookup(t, i), table, idx)


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
