"""Golden-value tests for the device math library against NumPy references."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops import color, mathops as m


def test_luminance_golden():
    rgb = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.5, 0.5, 0.5]])
    out = np.asarray(m.luminance(rgb))
    np.testing.assert_allclose(out, [0.299, 0.587, 0.5], atol=1e-6)


def test_oct_encode_decode_roundtrip(rng):
    n = rng.normal(size=(1024, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    enc = m.oct_encode(jnp.asarray(n))
    assert np.all(np.asarray(enc) >= 0.0) and np.all(np.asarray(enc) <= 1.0)
    dec = np.asarray(m.oct_decode(enc))
    # oct encoding at f32 is good to ~1e-3
    assert np.max(np.abs(dec - n)) < 5e-3


def test_oct_encode_axes():
    # +z axis encodes to center (0.5, 0.5)
    enc = np.asarray(m.oct_encode(jnp.array([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(enc, [0.5, 0.5], atol=1e-6)


def test_cubic_catmull_rom_partition():
    # Catmull-Rom (b=0, c=0.5): weights at integer offsets
    assert abs(float(m.cubic(jnp.float32(0.0), 0.0, 0.5)) - 1.0) < 1e-6
    assert abs(float(m.cubic(jnp.float32(1.0), 0.0, 0.5))) < 1e-6
    assert abs(float(m.cubic(jnp.float32(2.0), 0.0, 0.5))) < 1e-6
    # interior samples sum to 1 over the 4-tap window
    for frac in (0.25, 0.5, 0.75):
        taps = [m.cubic(jnp.float32(abs(frac - k)), 0.0, 0.5) for k in (-1, 0, 1, 2)]
        assert abs(sum(float(t) for t in taps) - 1.0) < 1e-5


def test_edge_stopping_weights():
    n = jnp.array([0.0, 0.0, 1.0])
    assert abs(float(m.normal_weight(n, n, 128.0)) - 1.0) < 1e-6
    assert float(m.normal_weight(n, jnp.array([1.0, 0.0, 0.0]), 128.0)) == 0.0
    assert abs(float(m.depth_weight(1.0, 1.0, 3.0)) - 1.0) < 1e-6
    # zero sigma guard: reference returns exp(0) = 1
    assert abs(float(m.depth_weight(1.0, 5.0, 0.0)) - 1.0) < 1e-6
    assert abs(float(m.luma_weight(0.5, 0.5, 3.0)) - 1.0) < 1e-6


def test_ycocg_roundtrip(rng):
    c = rng.uniform(0, 1, size=(256, 3)).astype(np.float32)
    back = np.asarray(color.ycocg_to_rgb(color.rgb_to_ycocg(jnp.asarray(c))))
    np.testing.assert_allclose(back, c, atol=1e-5)


def test_tonemap_roundtrip(rng):
    c = rng.uniform(0, 4, size=(256, 3)).astype(np.float32)
    tm = color.simple_tonemap(jnp.asarray(c))
    back = np.asarray(color.invert_simple_tonemap(tm))
    np.testing.assert_allclose(back, c, rtol=1e-4, atol=1e-4)


def test_clip_to_aabb():
    pmin = jnp.array([0.0, 0.0, 0.0])
    pmax = jnp.array([1.0, 1.0, 1.0])
    inside = jnp.array([0.25, 0.5, 0.75])
    np.testing.assert_allclose(
        np.asarray(color.clip_to_aabb(pmin, pmax, inside)), np.asarray(inside)
    )
    outside = jnp.array([2.0, 0.5, 0.5])
    clipped = np.asarray(color.clip_to_aabb(pmin, pmax, outside))
    # moved toward center, inside (or on) the box
    assert clipped[0] <= 1.0 + 1e-4
    np.testing.assert_allclose(clipped[1:], [0.5, 0.5], atol=1e-5)
