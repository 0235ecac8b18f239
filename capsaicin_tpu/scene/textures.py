"""Texture loading and blue-noise generation.

Replaces the reference's TextureSystem (texture_system.cpp: stb_image PNG
decode, missing-file 1x1 fallback) and its shipped 256x256 blue-noise texture
(assets/textures/bluenoise256.png, uploaded at raytracing_system.cpp:642-646).

We do not ship the reference's texture; instead a 256x256x2 blue-noise table
is generated once with a void-and-cluster algorithm and cached under
assets/textures/bluenoise256.npy. Statistically it serves the same role
(low-frequency-suppressed 2D sample offsets for the 4x4 interleaved GI
sampler, sampling.h:14-24).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "assets")


def asset_dir() -> str:
    return _ASSET_DIR


def load_texture(name: str, texture_dir: Optional[str] = None) -> Optional[np.ndarray]:
    """Load an RGBA image as float [H,W,4] in [0,1]; None if missing.

    The caller (Scene build) substitutes the 1x1 zero fallback for None,
    matching texture_system.cpp:47-56.
    """
    search = [texture_dir] if texture_dir else []
    search += [os.path.join(_ASSET_DIR, "textures"), _ASSET_DIR, "."]
    for d in search:
        if d is None:
            continue
        path = os.path.join(d, name)
        if os.path.exists(path):
            try:
                from PIL import Image

                img = Image.open(path).convert("RGBA")
                return np.asarray(img, np.float32) / 255.0
            except Exception:
                return None
    return None


def _void_and_cluster(size: int, sigma: float, seed: int) -> np.ndarray:
    """Rank matrix in [0, size*size) with blue-noise spectral ordering."""
    rng = np.random.default_rng(seed)
    n = size * size

    # toroidal gaussian kernel (truncated)
    radius = int(3 * sigma)
    ax = np.arange(-radius, radius + 1)
    kx, ky = np.meshgrid(ax, ax)
    kernel = np.exp(-(kx * kx + ky * ky) / (2.0 * sigma * sigma))

    def splat(energy, y, x, sign):
        ys = (y + ax) % size
        xs = (x + ax) % size
        energy[np.ix_(ys, xs)] += sign * kernel

    # initial pattern: 10% random ones, relaxed into blue noise
    count = n // 10
    mask = np.zeros((size, size), bool)
    flat = rng.choice(n, count, replace=False)
    mask[np.unravel_index(flat, (size, size))] = True
    energy = np.zeros((size, size))
    for y, x in zip(*np.nonzero(mask)):
        splat(energy, y, x, 1.0)
    for _ in range(2 * count):
        # remove tightest cluster, fill biggest void
        e_on = np.where(mask, energy, -np.inf)
        cy, cx = np.unravel_index(np.argmax(e_on), (size, size))
        mask[cy, cx] = False
        splat(energy, cy, cx, -1.0)
        e_off = np.where(mask, np.inf, energy)
        vy, vx = np.unravel_index(np.argmin(e_off), (size, size))
        if (vy, vx) == (cy, cx):
            mask[cy, cx] = True
            splat(energy, cy, cx, 1.0)
            break
        mask[vy, vx] = True
        splat(energy, vy, vx, 1.0)

    rank = np.full((size, size), -1, np.int64)
    # Phase 1: rank initial points by removing tightest clusters
    m = mask.copy()
    e = energy.copy()
    for r in range(count - 1, -1, -1):
        e_on = np.where(m, e, -np.inf)
        cy, cx = np.unravel_index(np.argmax(e_on), (size, size))
        m[cy, cx] = False
        splat(e, cy, cx, -1.0)
        rank[cy, cx] = r
    # Phase 2: fill remaining voids in order
    m = mask.copy()
    e = energy.copy()
    for r in range(count, n):
        e_off = np.where(m, np.inf, e)
        vy, vx = np.unravel_index(np.argmin(e_off), (size, size))
        m[vy, vx] = True
        splat(e, vy, vx, 1.0)
        rank[vy, vx] = r
    return rank


def blue_noise_256(cache: bool = True) -> np.ndarray:
    """[256,256,2] float32 blue-noise values in [0,1)."""
    path = os.path.join(_ASSET_DIR, "textures", "bluenoise256.npy")
    if cache and os.path.exists(path):
        return np.load(path)
    size = 256
    r0 = _void_and_cluster(size, sigma=1.9, seed=7)
    r1 = _void_and_cluster(size, sigma=1.9, seed=1337)
    noise = np.stack([r0, r1], axis=-1).astype(np.float32) / (size * size)
    if cache:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, noise)
    return noise
