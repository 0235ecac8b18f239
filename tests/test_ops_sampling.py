"""Sampler golden tests: sequences must match the reference HLSL formulas."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops import sampling


def test_halton23_table():
    # sampling.h:139-152 literal table
    pts = np.asarray(sampling.HALTON23)
    np.testing.assert_allclose(pts[0], [0.5, 1.0 / 3.0], atol=1e-7)
    np.testing.assert_allclose(pts[7], [0.0625, 8.0 / 9.0], atol=1e-7)
    assert np.allclose(
        np.asarray(sampling.sample2d_halton23(9)), pts[1]
    )  # wraps mod 8


def _wang_hash_ref(x, y):
    M, C = 1664525, 1013904223
    mask = 0xFFFFFFFF
    seed = ((x * M + y + C) * M) & mask
    seed ^= seed >> 11
    seed = (seed ^ ((seed << 7) & 0x9D2C5680)) & mask
    seed = (seed ^ ((seed << 15) & 0xEFC60000)) & mask
    seed ^= seed >> 18
    return seed


def test_wang_hash_golden(rng):
    xs = rng.integers(0, 4096, size=(64, 2))
    got = np.asarray(sampling.wang_hash(jnp.asarray(xs, jnp.uint32)))
    want = np.array([_wang_hash_ref(int(x), int(y)) for x, y in xs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_hammersley_range(rng):
    xy = jnp.asarray(rng.integers(0, 1920, size=(128, 2)), jnp.int32)
    for frame in (0, 7, 123):
        s = np.asarray(sampling.sample2d_hammersley(xy, frame, 16))
        assert s.shape == (128, 2)
        assert np.all(s >= 0.0) and np.all(s < 1.0)


def test_ortho_vector_orthogonal(rng):
    n = rng.normal(size=(512, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    p = np.asarray(sampling.ortho_vector(jnp.asarray(n)))
    dots = np.abs(np.sum(p * n, axis=-1))
    assert np.max(dots) < 1e-5
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 1.0, atol=1e-5)


def test_map_to_hemisphere_distribution(rng):
    """Monte Carlo check: for e=1 the mapping is cosine-weighted, so
    E[cos theta] = 2/3 and all samples lie in the +n hemisphere."""
    n = jnp.array([0.0, 0.0, 1.0])
    s = jnp.asarray(rng.uniform(0, 1, size=(20000, 2)).astype(np.float32))
    d = np.asarray(sampling.map_to_hemisphere(s, jnp.broadcast_to(n, (20000, 3)), 1.0))
    cos_t = d[:, 2]
    assert np.all(cos_t >= -1e-6)
    assert abs(cos_t.mean() - 2.0 / 3.0) < 0.01
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_map_to_hemisphere_pdf_consistency(rng):
    """cos_theta = (1-r2)^(1/(e+1)) with e=1 -> matches Lambert_Pdf usage."""
    s = jnp.array([[0.0, 0.0]])  # r2=0 -> cos_theta = 1 -> direction == n
    n = jnp.array([[0.0, 1.0, 0.0]])
    d = np.asarray(sampling.map_to_hemisphere(s, n, 1.0))[0]
    np.testing.assert_allclose(d, [0.0, 1.0, 0.0], atol=1e-5)


def test_interleave2x2_partition():
    xy = jnp.stack(
        jnp.meshgrid(jnp.arange(8), jnp.arange(8), indexing="xy"), axis=-1
    ).reshape(-1, 2)
    masks = [np.asarray(sampling.interleave2x2(xy, f)) for f in range(4)]
    total = sum(m.astype(int) for m in masks)
    # every pixel active exactly once over 4 frames
    np.testing.assert_array_equal(total, np.ones(64, int))


def test_bluenoise4x4_advances(rng):
    noise = jnp.asarray(rng.uniform(0, 1, size=(256, 256, 2)).astype(np.float32))
    xy = jnp.array([[3, 5]], jnp.int32)
    vals = {tuple(np.asarray(sampling.sample2d_bluenoise4x4(noise, xy, c))[0]) for c in range(16)}
    # 16 distinct sub-positions over a 16-frame cycle
    assert len(vals) == 16
