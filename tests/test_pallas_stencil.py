"""Pallas stencil kernels (EAW chain, spatial gather) must equal the jnp
reference formulation to fp tolerance. Runs in interpret mode on CPU."""

import os

import numpy as np
import pytest

os.environ.setdefault("CAPSAICIN_PALLAS_STENCIL", "0")  # jnp reference path

import jax.numpy as jnp

from capsaicin_tpu.ops import mathops as m
from capsaicin_tpu.ops import pallas_stencil as ps
from capsaicin_tpu.render import passes
from capsaicin_tpu.render.settings import RenderOptions, default_settings


def _fake_buffers(rng, h, w):
    color4 = rng.random((h, w, 4), dtype=np.float32) * 2.0
    color4[..., 3] *= 0.1
    n = rng.normal(size=(h, w, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    oct = np.asarray(m.oct_encode(jnp.asarray(n)))
    depth = (rng.random((h, w), dtype=np.float32) * 20.0 + 1.0).astype(np.float32)
    depth[rng.random((h, w)) < 0.1] = 0.0  # background pixels
    moments4 = rng.random((h, w, 4), dtype=np.float32).astype(np.float32)
    moments4[..., 3] = rng.integers(0, 20, (h, w)).astype(np.float32)
    nd = {
        "oct": jnp.asarray(oct),
        "depth": jnp.asarray(depth),
        "inst": jnp.zeros((h, w), jnp.int32),
    }
    return jnp.asarray(color4), nd, jnp.asarray(moments4)


@pytest.mark.parametrize("eaw5", [False, True])
def test_denoise_chain_matches_jnp(rng, eaw5):
    h, w = 40, 150  # odd sizes exercise row/col padding
    color4, nd, moments4 = _fake_buffers(rng, h, w)
    settings = default_settings()
    options = RenderOptions(eaw5=eaw5)

    ref = np.asarray(passes.denoise(color4, nd, moments4, settings, options))
    got = np.asarray(
        ps.denoise_chain(
            color4, m.oct_decode(nd["oct"]), nd["depth"], moments4, settings, options
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_eaw_blur_no_variance_matches_jnp(rng):
    h, w = 32, 100
    color4, nd, moments4 = _fake_buffers(rng, h, w)
    settings = default_settings()
    options = RenderOptions(use_variance=False)

    ref = np.asarray(passes.eaw_blur(color4, nd, 3, settings, options))
    geo = ps.pack_geo(m.oct_decode(nd["oct"]), nd["depth"], h, w)
    col = ps.to_planar([color4[..., i] for i in range(4)], h, w)
    out = ps.eaw_blur_planar(
        col, geo, 3, False,
        settings.eaw_normal_sigma, settings.eaw_depth_sigma, settings.eaw_luma_sigma,
    )
    got = np.asarray(jnp.stack(ps.from_planar(out, h, w), axis=-1))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("eaw5", [False, True])
@pytest.mark.parametrize("mode", [True, "13"])
def test_denoise_chain_fused_pairs_equal_sequential(rng, eaw5, mode):
    """CAPSAICIN_EAW_FUSED pairs (1+3, 5+7) are the same math as the
    sequential stages — stage A recomputed over the slab stage B's taps
    reach, intermediate never leaving VMEM. Must match the sequential
    kernel chain to fp noise."""
    h, w = 40, 150
    color4, nd, moments4 = _fake_buffers(rng, h, w)
    settings = default_settings()
    options = RenderOptions(eaw5=eaw5)

    seq = np.asarray(
        ps.denoise_chain(
            color4, m.oct_decode(nd["oct"]), nd["depth"], moments4, settings,
            options, fused=False,
        )
    )
    fus = np.asarray(
        ps.denoise_chain(
            color4, m.oct_decode(nd["oct"]), nd["depth"], moments4, settings,
            options, fused=mode,
        )
    )
    np.testing.assert_allclose(fus, seq, rtol=1e-6, atol=1e-7)


def test_spatial_gather_matches_jnp(rng):
    h, w = 48, 130
    color4, nd, moments4 = _fake_buffers(rng, h, w)
    indirect = color4[..., :3]
    settings = default_settings()
    options = RenderOptions()

    ref = np.asarray(
        passes.spatial_gather(indirect, nd, w, h, jnp.int32(0), settings, options)
    )
    got = np.asarray(
        ps.spatial_gather(indirect, m.oct_decode(nd["oct"]), nd["depth"], settings)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("eaw5", [False, True])
@pytest.mark.parametrize("fused", [False, True])
def test_denoise_chain_bf16_storage_close_to_f32(rng, eaw5, fused):
    """CAPSAICIN_EAW_BF16 stores the planar chain buffers in bf16 through
    HBM (compute stays f32 in VMEM) on a 16-row tile layout — the analog
    of the reference running these passes on reduced-precision (RGBA16F)
    targets instead of fp32.

    The meaningful bound is vs the f32 chain on bf16-ROUNDED inputs: that
    isolates the chain's own per-stage storage rounding from the one-time
    input quantization, which on white-noise test data gets amplified
    arbitrarily by the exp(-|Δluma|/σ) weights (a property of ANY reduced
    -precision input, not of this kernel; real renders are smooth)."""
    h, w = 40, 150
    color4, nd, moments4 = _fake_buffers(rng, h, w)
    settings = default_settings()
    options = RenderOptions(eaw5=eaw5)
    norm = m.oct_decode(nd["oct"])

    def rounded(x):
        return jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32)

    f32r = np.asarray(
        ps.denoise_chain(
            rounded(color4), rounded(norm), rounded(nd["depth"]),
            rounded(moments4), settings, options, fused=fused, storage=False,
        )
    )
    b16 = np.asarray(
        ps.denoise_chain(
            color4, norm, nd["depth"], moments4, settings,
            options, fused=fused, storage=True,
        )
    )
    assert b16.dtype == np.float32
    scale = np.maximum(np.abs(f32r), 1.0)
    rel = np.abs(b16 - f32r) / scale
    # rgb is what the display path consumes; the variance channel rides
    # squared weights + the disocclusion boost, so it is inherently looser
    # (and nothing downstream of the chain reads it)
    assert rel[..., :3].max() < 5e-2, rel[..., :3].max()
    assert np.sqrt((rel[..., :3] ** 2).mean()) < 2e-3
    assert rel[..., 3].max() < 0.15, rel[..., 3].max()


def test_spatial_gather_bf16_storage_close_to_f32(rng):
    """bf16 planar I/O for the gather kernel, same bound structure as the
    chain test: vs the f32 kernel on bf16-rounded inputs."""
    h, w = 40, 150
    color4, nd, _ = _fake_buffers(rng, h, w)
    indirect = color4[..., :3]
    settings = default_settings()
    norm = m.oct_decode(nd["oct"])

    def rounded(x):
        return jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32)

    f32r = np.asarray(ps.spatial_gather(
        rounded(indirect), rounded(norm), rounded(nd["depth"]), settings,
        storage=False))
    b16 = np.asarray(ps.spatial_gather(
        indirect, norm, nd["depth"], settings, storage=True))
    assert b16.dtype == np.float32
    rel = np.abs(b16 - f32r) / np.maximum(np.abs(f32r), 1.0)
    assert rel.max() < 5e-2, rel.max()
    assert np.sqrt((rel ** 2).mean()) < 2e-3


def test_eaw_knobs_reject_typos(monkeypatch):
    """eaw_fused/eaw_bf16 parsing is strict at RenderOptions construction:
    a typo must raise, not silently select the fully-fused chain or f32
    storage (that corrupts hardware A/B runs). The env vars are read ONCE,
    when the options object is built."""
    with pytest.raises(ValueError, match="eaw_fused"):
        RenderOptions(eaw_fused="off")
    with pytest.raises(ValueError, match="eaw_bf16"):
        RenderOptions(eaw_bf16="yes")
    monkeypatch.setenv("CAPSAICIN_EAW_FUSED", "off")
    with pytest.raises(ValueError, match="CAPSAICIN_EAW_FUSED"):
        RenderOptions()
    monkeypatch.setenv("CAPSAICIN_EAW_FUSED", "0")
    monkeypatch.setenv("CAPSAICIN_EAW_BF16", "yes")
    with pytest.raises(ValueError, match="CAPSAICIN_EAW_BF16"):
        RenderOptions()


def test_eaw_knobs_are_static_options(monkeypatch):
    """The EAW execution knobs are RenderOptions fields (the repo's
    compile-time-define level, raytracing_system.h:22-27): part of the
    hashable options key, env-seeded at construction only, so the jit
    variant cache can never serve a stale fusion/storage variant and two
    sessions in one process can differ."""
    base = RenderOptions()
    fused = RenderOptions(eaw_fused="1")
    b16 = RenderOptions(eaw_bf16=True)
    assert base != fused and base != b16
    assert len({hash(base), hash(fused), hash(b16)}) == 3

    # env seeds the default at construction time...
    monkeypatch.setenv("CAPSAICIN_EAW_FUSED", "13")
    monkeypatch.setenv("CAPSAICIN_EAW_BF16", "1")
    seeded = RenderOptions()
    assert seeded.eaw_fused == "13" and seeded.eaw_bf16 is True
    assert seeded == RenderOptions(eaw_fused="13", eaw_bf16=True)
    # ...and flipping the env afterwards does not mutate existing options
    monkeypatch.setenv("CAPSAICIN_EAW_FUSED", "0")
    monkeypatch.setenv("CAPSAICIN_EAW_BF16", "0")
    assert seeded.eaw_fused == "13" and seeded.eaw_bf16 is True

    # the chain honors the options field (fused pairs == sequential math
    # is covered above; here: the field alone selects bf16 storage)
    import dataclasses as dc
    assert dc.replace(base, eaw_bf16=True) == b16
