"""Color space conversions and color-AABB clipping.

TPU-native reimplementation of /root/reference/src/core/shaders/color_space.h
and aabb.h (ClipToAABB).
"""

from __future__ import annotations

import jax.numpy as jnp

from .mathops import luminance, max_component


def rgb_to_ycocg(c):
    """color_space.h:8-16."""
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    return jnp.stack(
        [r / 4.0 + g / 2.0 + b / 4.0, r / 2.0 - b / 2.0, -r / 4.0 + g / 2.0 - b / 4.0],
        axis=-1,
    )


def ycocg_to_rgb(c):
    """color_space.h:18-25 (clamped to [0,1])."""
    y, co, cg = c[..., 0], c[..., 1], c[..., 2]
    rgb = jnp.stack([y + co - cg, y + cg, y - co - cg], axis=-1)
    return jnp.clip(rgb, 0.0, 1.0)


def simple_tonemap(v):
    """v / (1 + luma(v)); color_space.h:27-30."""
    return v / (1.0 + luminance(v))[..., None]


def invert_simple_tonemap(v):
    """v / (1 - luma(v)); color_space.h:32-35."""
    return v / (1.0 - luminance(v))[..., None]


def clip_to_aabb(pmin, pmax, p):
    """Clip color p toward AABB center; aabb.h:25-34."""
    c = 0.5 * (pmin + pmax)
    radius = 0.5 * (pmax - pmin)
    dc = p - c
    clip = dc / (radius + 1e-5)
    max_extent = max_component(jnp.abs(clip))
    clipped = c + dc / max_extent[..., None]
    return jnp.where((max_extent > 1.0)[..., None], clipped, p)


def gamma_encode(c, gamma: float = 2.2):
    """Final display transfer pow(c, 1/gamma); simple.hlsl:46."""
    return jnp.power(jnp.maximum(c, 0.0), 1.0 / gamma)
