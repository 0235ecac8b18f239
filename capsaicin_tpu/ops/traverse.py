"""Batched stackless BVH traversal.

The replacement for DXR's fixed-function TraceRay (used by every raygen
shader: rt_primary_visibility.hlsl:43, rt_indirect.hlsl:172, the shadow rays
in lighting.h:48-55). Restructured for a vector machine:

  * All rays advance in lockstep through a `lax.while_loop`; each ray's
    entire traversal state is ONE int32 node index (plus its best-hit record).
  * The BVH is an implicit heap (ops.lbvh), so the two successor functions —
    descend (2k) and DFS-skip (strip trailing ones, +1) — are pure integer
    arithmetic: no stacks, no parent pointers, no memory traffic for control.
  * Per step each ray gathers one node AABB; on leaf nodes it additionally
    intersects the leaf's `leaf_size` triangles (statically unrolled
    Möller–Trumbore, masked). Finished rays idle at the root sentinel until
    the whole wave drains.
  * Any-hit (shadow) rays terminate their lane at the first accepted hit —
    the RAY_FLAG_ACCEPT_FIRST_HIT_AND_END_SEARCH analog (lighting.h:49).

Semantics match ops.intersect exactly (same epsilons, no backface culling);
tests assert equality against the brute-force oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .lbvh import BVH

# np.float32 on purpose: module-level jnp scalars initialize the device
# backend at import time (hangs `import capsaicin_tpu` if the TPU is down)
INF = np.float32(1e30)
BIG = np.float32(1e30)


def _popcount(x):
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _dfs_next(k):
    """DFS successor in the implicit heap: strip trailing ones, step right.

    Returns 1 (the root sentinel) when traversal is exhausted.
    """
    lowest_zero = (~k.astype(jnp.uint32)) & (k.astype(jnp.uint32) + 1)
    trailing_ones = _popcount(lowest_zero - 1)
    up = k >> trailing_ones
    return jnp.where(up <= 1, 1, up + 1)


def _slab_test(o, inv_d, lo, hi, tmin, tmax):
    """Ray vs AABB; o/lo/hi [N,3], inv_d [N,3] (zeros replaced by huge)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (t_near <= t_far) & (t_far >= tmin) & (t_near <= tmax)


def _safe_inv(d):
    tiny = jnp.abs(d) < 1e-12
    return jnp.where(tiny, jnp.where(d < 0, -1e12, 1e12), 1.0 / jnp.where(tiny, 1.0, d))


def _mt_single(o, d, v0, e1, e2, tmin, tmax):
    """Möller–Trumbore, one triangle per ray (all [N,3])."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, -1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, -1) * inv_det
    t = jnp.sum(e2 * qvec, -1) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < tmax)
    )
    return t, u, v, ok


def _traverse(bvh: BVH, origins, dirs, tmin, tmax, any_hit: bool):
    n = origins.shape[0]
    n_leaves = bvh.n_leaves
    leaf_size = bvh.leaf_size
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    inv_d = _safe_inv(dirs)

    max_steps = 4 * bvh.nodes_min.shape[0]

    def cond(state):
        k, step, t_best, u, v, prim, done = state
        return (~jnp.all(done)) & (step < max_steps)

    def body(state):
        k, step, t_best, u, v, prim, done = state
        lo = bvh.nodes_min[k]
        hi = bvh.nodes_max[k]
        hit_box = _slab_test(origins, inv_d, lo, hi, tmin, t_best) & ~done
        is_leaf = k >= n_leaves

        do_tris = hit_box & is_leaf
        base = (k - n_leaves) * leaf_size
        for j in range(leaf_size):
            idx = jnp.clip(base + j, 0, bvh.tri_v0.shape[0] - 1)
            t, uu, vv, ok = _mt_single(
                origins,
                dirs,
                bvh.tri_v0[idx],
                bvh.tri_e1[idx],
                bvh.tri_e2[idx],
                tmin,
                jnp.minimum(tmax, t_best),
            )
            ok = ok & do_tris & (bvh.tri_id[idx] >= 0)
            closer = ok & (t < t_best)
            t_best = jnp.where(closer, t, t_best)
            u = jnp.where(closer, uu, u)
            v = jnp.where(closer, vv, v)
            prim = jnp.where(closer, bvh.tri_id[idx], prim)

        if any_hit:
            done = done | (prim >= 0)

        descend = hit_box & ~is_leaf
        k_next = jnp.where(descend, 2 * k, _dfs_next(k))
        newly_done = k_next <= 1
        done = done | newly_done
        k = jnp.where(done, 1, k_next)
        return (k, step + 1, t_best, u, v, prim, done)

    init = (
        jnp.ones((n,), jnp.int32),
        jnp.int32(0),
        tmax.astype(jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), bool),
    )
    k, step, t_best, u, v, prim, done = jax.lax.while_loop(cond, body, init)
    return {"t": t_best, "u": u, "v": v, "prim": prim}


def bvh_closest(bvh: BVH, origins, dirs, tmin=0.0, tmax=1e6):
    """Closest-hit query; equal to intersect.brute_force_closest."""
    return _traverse(bvh, origins, dirs, tmin, tmax, any_hit=False)


def bvh_any(bvh: BVH, origins, dirs, tmin=1e-4, tmax=1e6):
    """Any-hit (shadow) query with first-hit early lane termination."""
    out = _traverse(bvh, origins, dirs, tmin, tmax, any_hit=True)
    return out["prim"] >= 0
