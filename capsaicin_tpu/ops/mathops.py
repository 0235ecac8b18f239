"""Small device-side math library.

TPU-native reimplementation of the reference's shared HLSL math headers:
  - /root/reference/src/core/shaders/math_functions.h (Gaussian, luminance,
    octahedral normal encoding, Catmull-Rom style cubic weights)
  - /root/reference/src/core/shaders/eaw_edge_stopping.h (edge-stopping weights)

All functions are shape-polymorphic jnp ops: vector quantities use a trailing
axis of size 3 (or 2) so they vectorize over arbitrary pixel/ray batches.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EPS = 1e-8
# NumPy on purpose (module-level jnp constants would initialize the device
# backend at import time); reference uses ~0u (INVALID_ID, data_payload.h:5)
INVALID_ID = np.int32(-1)


def dot(a, b):
    """Batched dot product over the trailing axis."""
    return jnp.sum(a * b, axis=-1)


def normalize(v, eps=0.0):
    """Normalize over the trailing axis."""
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def cross(a, b):
    return jnp.cross(a, b)


def gaussian(x, m, sigma):
    """exp(-0.5 * |x-m|^2 / sigma^2); matches math_functions.h:6-22."""
    d = x - m
    if d.ndim and d.shape[-1] in (2, 3) and d.ndim > 0:
        a = jnp.sum(d * d, axis=-1) / (sigma * sigma)
    else:
        a = (d * d) / (sigma * sigma)
    return jnp.exp(-0.5 * a)


def luminance(rgb):
    """Rec.601 luma; math_functions.h:24-27."""
    return (
        rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    )


def max_component(v):
    return jnp.max(v, axis=-1)


# --- Octahedral normal encoding (math_functions.h:31-59) ---------------------


def _oct_wrap(v):
    # (1 - |v.yx|) * (v.xy >= 0 ? 1 : -1)
    w = (1.0 - jnp.abs(v[..., ::-1])) * jnp.where(v >= 0.0, 1.0, -1.0)
    return w


def oct_encode(n):
    """Unit vector [... ,3] -> [... ,2] in [0,1]."""
    n = n / jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    xy = n[..., :2]
    xy = jnp.where(n[..., 2:3] >= 0.0, xy, _oct_wrap(xy))
    return xy * 0.5 + 0.5


def oct_decode(f):
    """[... ,2] in [0,1] -> unit vector [... ,3]."""
    f = f * 2.0 - 1.0
    z = 1.0 - jnp.abs(f[..., 0]) - jnp.abs(f[..., 1])
    t = jnp.clip(-z, 0.0, 1.0)[..., None]
    xy = f + jnp.where(f >= 0.0, -t, t)
    n = jnp.concatenate([xy, z[..., None]], axis=-1)
    return normalize(n)


def cubic(x, b, c):
    """Mitchell-Netravali cubic weight; math_functions.h:61-77."""
    x = jnp.abs(x)
    x2 = x * x
    x3 = x2 * x
    y1 = (12.0 - 9.0 * b - 6.0 * c) * x3 + (-18.0 + 12.0 * b + 6.0 * c) * x2 + (6.0 - 2.0 * b)
    y2 = (-b - 6.0 * c) * x3 + (6.0 * b + 30.0 * c) * x2 + (-12.0 * b - 48.0 * c) * x + (
        8.0 * b + 24.0 * c
    )
    y = jnp.where(x < 1.0, y1, jnp.where(x <= 2.0, y2, 0.0))
    return y / 6.0


# --- Edge stopping weights (eaw_edge_stopping.h) -----------------------------


def normal_weight(n0, n1, s):
    """pow(max(dot(n0,n1),0), s); eaw_edge_stopping.h:4-7."""
    return jnp.power(jnp.maximum(dot(n0, n1), 0.0), s)


def depth_weight(dc, dp, s):
    """exp(-|dc-dp|/s), 0-sigma guarded; eaw_edge_stopping.h:9-13."""
    t = jnp.where(s == 0.0, 0.0, jnp.abs(dc - dp) / jnp.where(s == 0.0, 1.0, s))
    return jnp.exp(-t)


def luma_weight(lc, lp, s):
    """exp(-|lc-lp|/s); eaw_edge_stopping.h:15-19."""
    return jnp.exp(-jnp.abs(lc - lp) / s)
