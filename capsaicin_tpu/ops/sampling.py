"""Sampler library.

TPU-native reimplementation of /root/reference/src/core/shaders/sampling.h:
Halton(2,3) subpixel table, blue-noise 4x4 interleaved sampling with
golden-ratio Kronecker rotation, Wang hash, Hammersley, hemisphere mapping and
the 2x2 temporal interleave predicate.

Everything is vectorized: pixel coordinates come in as integer arrays
`xy` with a trailing axis of size 2 (x, y), and frame counters are scalars
(traced or static).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import mathops as m

PI = 3.141592653589793

GOLDEN = 0.61803398875

# Halton (2,3) 8-entry subpixel jitter table (sampling.h:139-152).
# NumPy on purpose: a module-level jnp constant would initialize the device
# backend at import time (hanging `import capsaicin_tpu` entirely when the
# TPU tunnel is down); numpy constants convert at trace time instead.
HALTON23 = np.array(
    [
        [0.5, 1.0 / 3.0],
        [0.25, 2.0 / 3.0],
        [0.75, 1.0 / 9.0],
        [0.125, 4.0 / 9.0],
        [0.625, 7.0 / 9.0],
        [0.375, 2.0 / 9.0],
        [0.875, 5.0 / 9.0],
        [0.0625, 8.0 / 9.0],
    ],
    dtype=np.float32,
)


def sample2d_halton23(frame_count):
    """Per-frame subpixel jitter; sampling.h:139-152."""
    return jnp.asarray(HALTON23)[jnp.asarray(frame_count) % 8]


def wang_hash(xy):
    """sampling.h:38-48. xy: [...,2] uint32/int32."""
    xy = jnp.asarray(xy).astype(jnp.uint32)
    M = jnp.uint32(1664525)
    C = jnp.uint32(1013904223)
    seed = (xy[..., 0] * M + xy[..., 1] + C) * M
    seed = seed ^ (seed >> 11)
    seed = seed ^ ((seed << 7) & jnp.uint32(0x9D2C5680))
    seed = seed ^ ((seed << 15) & jnp.uint32(0xEFC60000))
    seed = seed ^ (seed >> 18)
    return seed


def _reverse_bits32(bits):
    bits = (bits << 16) | (bits >> 16)
    bits = ((bits & jnp.uint32(0x00FF00FF)) << 8) | ((bits & jnp.uint32(0xFF00FF00)) >> 8)
    bits = ((bits & jnp.uint32(0x0F0F0F0F)) << 4) | ((bits & jnp.uint32(0xF0F0F0F0)) >> 4)
    bits = ((bits & jnp.uint32(0x33333333)) << 2) | ((bits & jnp.uint32(0xCCCCCCCC)) >> 2)
    bits = ((bits & jnp.uint32(0x55555555)) << 1) | ((bits & jnp.uint32(0xAAAAAAAA)) >> 1)
    return bits


def sample1d_hammersley(bits, seed):
    """Radical inverse with seed xor; sampling.h:66-75."""
    bits = _reverse_bits32(jnp.asarray(bits).astype(jnp.uint32))
    bits = bits ^ jnp.asarray(seed).astype(jnp.uint32)
    return bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)


def sample2d_hammersley(xy, frame_count, cell_size):
    """sampling.h:77-89."""
    seed1 = wang_hash(xy)
    seed2 = wang_hash(jnp.stack([seed1, jnp.full_like(seed1, 1000)], axis=-1))
    index = jnp.uint32(frame_count % cell_size)
    u = seed1.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
    uu = jnp.mod(u + index.astype(jnp.float32) / cell_size, 1.0)
    vv = jnp.mod(sample1d_hammersley(index, seed2), 1.0)
    return jnp.stack([uu, vv], axis=-1)


def sample2d_bluenoise(noise, xy, count):
    """Blue-noise with golden-ratio rotation; sampling.h:7-12.

    noise: [256,256,2] float array; xy: [...,2] int; count: scalar.
    """
    px = jnp.mod(xy[..., 0], 256)
    py = jnp.mod(xy[..., 1], 256)
    value = noise[py, px]
    return jnp.mod(value + GOLDEN * jnp.asarray(count).astype(jnp.float32), 1.0)


def sample2d_bluenoise4x4(noise, xy, count):
    """4x4 interleaved blue-noise; sampling.h:14-24.

    Each pixel advances through a 4x4 sub-tile over 16 frames, with a
    golden-ratio Kronecker rotation every 16 frames.
    """
    count = jnp.asarray(count)
    px = (count % 16) % 4
    py = (count % 16) // 4
    sx = jnp.mod(xy[..., 0] * 4 + px, 256)
    sy = jnp.mod(xy[..., 1] * 4 + py, 256)
    value = noise[sy, sx]
    return jnp.mod(value + GOLDEN * (count // 16).astype(jnp.float32), 1.0)


def bluenoise4x4_field(noise, width, height, count, stride: int = 1, offset=(0, 0)):
    """The sample2d_bluenoise4x4 values for the whole pixel grid
    xy[y, x] = (stride*x + offset[0], stride*y + offset[1]), WITHOUT a
    per-pixel gather.

    The table index (4*(stride*y + oy) + py) % 256 is affine in y, so the
    field is a periodic tiling of a small rolled subsample of the noise
    table: roll by the per-frame phase (py, px) and the traced offsets, take
    every (4*stride)-th row/column, tile to cover the grid. Exactly equal to
    the gather form (tests assert this); replaces a 2M-index gather (~28 ms
    at 1080p on v5e) with ~0.1 ms of rolls and tiles.

    `offset` entries may be traced scalars (the 2x2 interleave phase).
    """
    count = jnp.asarray(count)
    px = (count % 16) % 4
    py = (count % 16) // 4
    ox, oy = offset
    step = 4 * stride
    period = 256 // _gcd256(step)
    # row/col r of the field reads noise[(step*r + 4*o + p) % 256]
    shift_y = 4 * jnp.asarray(oy) + py
    shift_x = 4 * jnp.asarray(ox) + px
    rolled = jnp.roll(noise, shift=(-shift_y, -shift_x), axis=(0, 1))
    tile = rolled[:: step][:, :: step][:period, :period]  # [period, period, 2]
    ry = -(-height // period)
    rx = -(-width // period)
    field = jnp.tile(tile, (ry, rx, 1))[:height, :width]
    return jnp.mod(field + GOLDEN * (count // 16).astype(jnp.float32), 1.0)


def _gcd256(step: int) -> int:
    g = 1
    while step % 2 == 0 and g < 256:
        step //= 2
        g *= 2
    return min(g, 256)


def ortho_vector(n):
    """A vector orthogonal to n; sampling.h:92-110."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    kz = jnp.sqrt(ny * ny + nz * nz)
    kz = jnp.where(kz == 0.0, 1.0, kz)
    p_a = jnp.stack([jnp.zeros_like(nx), -nz / kz, ny / kz], axis=-1)
    kx = jnp.sqrt(nx * nx + ny * ny)
    kx = jnp.where(kx == 0.0, 1.0, kx)
    p_b = jnp.stack([ny / kx, -nx / kx, jnp.zeros_like(nx)], axis=-1)
    return jnp.where((jnp.abs(nz) > 0.0)[..., None], p_a, p_b)


def map_to_hemisphere(s, n, e):
    """Cosine-power hemisphere mapping about n; sampling.h:112-132."""
    u = ortho_vector(n)
    v = jnp.cross(u, n)
    u = jnp.cross(n, v)
    r1 = s[..., 0]
    r2 = s[..., 1]
    sin_psi = jnp.sin(2.0 * PI * r1)
    cos_psi = jnp.cos(2.0 * PI * r1)
    cos_theta = jnp.power(1.0 - r2, 1.0 / (e + 1.0))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    d = (
        u * (sin_theta * cos_psi)[..., None]
        + v * (sin_theta * sin_psi)[..., None]
        + n * cos_theta[..., None]
    )
    return m.normalize(d)


def interleave2x2(xy, frame_count):
    """True for pixels active this frame in the 2x2 interleave; sampling.h:135-141."""
    sub = frame_count % 4
    y_off = sub // 2
    x_off = sub % 2
    return (xy[..., 0] % 2 == x_off) & (xy[..., 1] % 2 == y_off)
