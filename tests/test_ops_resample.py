"""Bilinear / bicubic resampling tests."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops import resample


def test_bilinear_at_texel_centers(rng):
    img = jnp.asarray(rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32))
    # texel centers: uv = (x + 0.5)/W
    xs, ys = np.meshgrid(np.arange(16), np.arange(16), indexing="xy")
    uv = jnp.asarray(
        np.stack([(xs + 0.5) / 16.0, (ys + 0.5) / 16.0], -1).reshape(-1, 2), jnp.float32
    )
    out = np.asarray(resample.sample_bilinear(img, uv, (16, 16))).reshape(16, 16, 3)
    # UVtoXY clamps to dim-1 (utils.h:5-9), shifting the last row/column;
    # compare the interior.
    np.testing.assert_allclose(out[:15, :15], np.asarray(img)[:15, :15], atol=1e-5)


def test_bilinear_interpolates_midpoint():
    img = jnp.zeros((4, 4, 1)).at[1, 1, 0].set(1.0).at[1, 2, 0].set(3.0)
    # halfway between texels (1,1) and (2,1): uv x = (1.5+0.5)/4
    uv = jnp.array([[0.5, 0.375]], jnp.float32)
    out = float(resample.sample_bilinear(img, uv, (4, 4))[0, 0])
    assert abs(out - 2.0) < 1e-5


def test_bicubic_reproduces_constant(rng):
    img = jnp.full((12, 12, 3), 0.7)
    uv = jnp.asarray(rng.uniform(0.15, 0.85, size=(64, 2)).astype(np.float32))
    out = np.asarray(resample.resample_bicubic(img, uv, (12, 12)))
    np.testing.assert_allclose(out, 0.7, atol=1e-4)


def test_uv_xy_roundtrip():
    dims = (64, 32)
    xy = jnp.array([[10.0, 20.0], [63.0, 31.0]], jnp.float32)
    uv = resample.xy_to_uv(xy, dims)
    back = np.asarray(resample.uv_to_xy(uv, dims))
    np.testing.assert_allclose(back, np.asarray(xy), atol=1e-4)


def test_upsample2x_matches_sample_bilinear():
    """The zero-gather 2x upsample must equal the general bilinear fetch at
    the identity UV grid of the doubled resolution (incl. border clamps)."""
    import jax.numpy as jnp

    from capsaicin_tpu.ops import resample

    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.random((7, 5, 3)).astype(np.float32))
    h2, w2 = 14, 10
    ys, xs = np.meshgrid(np.arange(h2), np.arange(w2), indexing="ij")
    uv = jnp.asarray(
        np.stack([(xs + 0.5) / w2, (ys + 0.5) / h2], -1).astype(np.float32)
    )
    want = resample.sample_bilinear(img, uv, (5, 7))
    got = resample.upsample2x_bilinear(img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
