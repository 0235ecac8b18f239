"""Ray/triangle intersection: Möller–Trumbore and the brute-force intersector.

The reference delegates intersection to DXR fixed-function hardware
(TraceRay in rt_*.hlsl; BLAS/TLAS built in blas_system.cpp / tlas_system.cpp).
On TPU we implement it ourselves. This module is the *oracle*: an exact
O(rays x tris) batched intersector used for small scenes and as the
correctness reference for the BVH traversal kernels (capsaicin_tpu.ops.traverse).

Conventions (matching DXR as used by the reference):
  - no backface culling (TLAS built with cull disabled, tlas_system.cpp:39-58)
  - barycentrics (u, v) weight vertices 1 and 2: P = (1-u-v) v0 + u v1 + v v2,
    consumed exactly that way by InterpolateAttributes (scene.h:5-50)
  - closest-hit returns the triangle index or -1 for miss
    (reference packs INVALID_ID = ~0u, data_payload.h:5)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# np.float32 on purpose: a module-level jnp scalar initializes the device
# backend at import time (hangs `import capsaicin_tpu` if the TPU is down)
INF = np.float32(1e30)


def _mt_block(o, d, v0, e1, e2, tmin, tmax):
    """Möller–Trumbore for a block: rays [R,3] x tris [T,3] -> [R,T] hits.

    Returns (t, u, v, valid) each [R,T].
    """
    pvec = jnp.cross(d[:, None, :], e2[None, :, :])  # [R,T,3]
    det = jnp.sum(e1[None, :, :] * pvec, axis=-1)  # [R,T]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o[:, None, :] - v0[None, :, :]  # [R,T,3]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])  # [R,T,3]
    v = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin[:, None])
        & (t < tmax[:, None])
    )
    return t, u, v, valid


def brute_force_closest(origins, dirs, tris, tmin=0.0, tmax=1e6, tri_block=1024):
    """Closest hit over all triangles.

    origins, dirs: [N,3]; tris: [T,3,3] (v0,v1,v2).
    Returns dict with t [N], u [N], v [N], prim [N] (int32, -1 miss).
    """
    n = origins.shape[0]
    t_tot = tris.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))

    tb = min(tri_block, t_tot)
    pad = (-t_tot) % tb
    v0 = tris[:, 0, :]
    e1 = tris[:, 1, :] - v0
    e2 = tris[:, 2, :] - v0
    if pad:
        v0 = jnp.pad(v0, ((0, pad), (0, 0)))
        e1 = jnp.pad(e1, ((0, pad), (0, 0)))
        e2 = jnp.pad(e2, ((0, pad), (0, 0)))
    nblocks = (t_tot + pad) // tb
    v0 = v0.reshape(nblocks, tb, 3)
    e1 = e1.reshape(nblocks, tb, 3)
    e2 = e2.reshape(nblocks, tb, 3)

    def body(carry, blk):
        best_t, best_u, best_v, best_p = carry
        bv0, be1, be2, base = blk
        t, u, v, valid = _mt_block(origins, dirs, bv0, be1, be2, tmin, tmax)
        tri_idx = base + jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        in_range = valid & (tri_idx < t_tot)
        t = jnp.where(in_range, t, INF)
        j = jnp.argmin(t, axis=1)
        rows = jnp.arange(n)
        bt = t[rows, j]
        closer = bt < best_t
        best_u = jnp.where(closer, u[rows, j], best_u)
        best_v = jnp.where(closer, v[rows, j], best_v)
        best_p = jnp.where(closer, tri_idx[rows, j], best_p)
        best_t = jnp.where(closer, bt, best_t)
        return (best_t, best_u, best_v, best_p), None

    init = (
        jnp.full((n,), INF),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
        jnp.full((n,), -1, jnp.int32),
    )
    bases = jnp.arange(nblocks, dtype=jnp.int32) * tb
    (best_t, best_u, best_v, best_p), _ = jax.lax.scan(body, init, (v0, e1, e2, bases))
    return {"t": best_t, "u": best_u, "v": best_v, "prim": best_p}


def brute_force_any(origins, dirs, tris, tmin=1e-4, tmax=1e6, tri_block=1024):
    """Any-hit (shadow) query: True if any triangle is hit in (tmin, tmax).

    Mirrors RAY_FLAG_ACCEPT_FIRST_HIT_AND_END_SEARCH shadow rays
    (lighting.h:42-55).
    """
    n = origins.shape[0]
    t_tot = tris.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))

    tb = min(tri_block, t_tot)
    pad = (-t_tot) % tb
    v0 = tris[:, 0, :]
    e1 = tris[:, 1, :] - v0
    e2 = tris[:, 2, :] - v0
    if pad:
        v0 = jnp.pad(v0, ((0, pad), (0, 0)))
        e1 = jnp.pad(e1, ((0, pad), (0, 0)))
        e2 = jnp.pad(e2, ((0, pad), (0, 0)))
    nblocks = (t_tot + pad) // tb
    v0 = v0.reshape(nblocks, tb, 3)
    e1 = e1.reshape(nblocks, tb, 3)
    e2 = e2.reshape(nblocks, tb, 3)

    def body(hit, blk):
        bv0, be1, be2, base = blk
        _, _, _, valid = _mt_block(origins, dirs, bv0, be1, be2, tmin, tmax)
        tri_idx = base + jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1)
        return hit | jnp.any(valid & (tri_idx < t_tot), axis=1), None

    bases = jnp.arange(nblocks, dtype=jnp.int32) * tb
    hit, _ = jax.lax.scan(body, jnp.zeros((n,), bool), (v0, e1, e2, bases))
    return hit
