"""LBVH build: morton codes + sort + implicit balanced hierarchy + AABB fit.

The replacement for DXR's driver-side acceleration structure build
(BLASSystem/TLASSystem, blas_system.cpp:14-67, tlas_system.cpp:11-73 — fixed
function in the reference, ours to implement on TPU).

Design (TPU-first, not a Karras-pointer-tree translation):
  * Triangles are sorted by 30-bit morton code of their centroid (the LBVH
    ordering), then grouped into fixed-size leaves.
  * The hierarchy is an *implicit complete binary tree* (heap layout) over
    the leaves: node k's children are 2k/2k+1, every leaf sits at the same
    depth, and the DFS successor ("skip link") of any node is computable
    arithmetically from its index. Traversal therefore carries one integer
    of state per ray and does zero pointer chasing — a pure gather machine
    that vectorizes across 8x128 lanes (see ops.traverse).
  * AABB fit is a log2(n) sequence of pairwise min/max reductions — fully
    parallel XLA, no atomics.

Build cost is O(n log n) in XLA sort + O(n) reductions; the whole build jits.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# np.float32 on purpose: a module-level jnp scalar initializes the device
# backend at import time (hangs `import capsaicin_tpu` if the TPU is down)
INF = np.float32(3e38)


class BVH(NamedTuple):
    """Implicit-heap BVH over morton-ordered triangles.

    nodes_min/max: [2*n_leaves, 3]; 1-based heap (index 0 unused, root = 1,
    leaves occupy [n_leaves, 2*n_leaves)).
    Triangles are stored morton-sorted and padded to n_leaves*leaf_size:
    tri_v0 plus edge vectors, and tri_id mapping back to the global prim id
    (-1 for padding).
    """

    nodes_min: jnp.ndarray
    nodes_max: jnp.ndarray
    tri_v0: jnp.ndarray  # [P,3]
    tri_e1: jnp.ndarray  # [P,3]
    tri_e2: jnp.ndarray  # [P,3]
    tri_id: jnp.ndarray  # [P] i32

    @property
    def n_leaves(self) -> int:
        return self.nodes_min.shape[0] // 2

    @property
    def leaf_size(self) -> int:
        return self.tri_v0.shape[0] // self.n_leaves

    @property
    def depth(self) -> int:
        return int(self.n_leaves).bit_length() - 1


def _expand_bits_10(v):
    """Spread 10 bits over 30 (classic morton expansion), uint32."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(points, lo, hi):
    """30-bit morton codes of points normalized to [lo, hi]."""
    extent = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((points - lo) / extent * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (
        (_expand_bits_10(q[..., 0]) << 2)
        | (_expand_bits_10(q[..., 1]) << 1)
        | _expand_bits_10(q[..., 2])
    )


def _next_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()


def build_lbvh(tris, leaf_size: int = 4) -> BVH:
    """tris: [T,3,3] float32 (v0,v1,v2). Pure XLA; jit-compatible for a
    fixed triangle count."""
    t = tris.shape[0]
    # minimum 2 leaves so traversal can start below the root (heap row 2/3
    # always exist; packet kernel relies on this)
    n_leaves = max(2, _next_pow2(-(-t // leaf_size)))
    padded = n_leaves * leaf_size

    v0 = tris[:, 0]
    v1 = tris[:, 1]
    v2 = tris[:, 2]
    centroids = (v0 + v1 + v2) / 3.0
    lo = jnp.min(jnp.minimum(jnp.minimum(v0, v1), v2), axis=0)
    hi = jnp.max(jnp.maximum(jnp.maximum(v0, v1), v2), axis=0)

    codes = morton_codes(centroids, lo, hi)
    order = jnp.argsort(codes).astype(jnp.int32)

    pad = padded - t
    tri_id = jnp.concatenate([order, jnp.full((pad,), -1, jnp.int32)])
    gv0 = jnp.concatenate([v0[order], jnp.zeros((pad, 3), v0.dtype)])
    gv1 = jnp.concatenate([v1[order], jnp.zeros((pad, 3), v0.dtype)])
    gv2 = jnp.concatenate([v2[order], jnp.zeros((pad, 3), v0.dtype)])

    # leaf AABBs; padding triangles get inverted boxes that never intersect
    valid = (tri_id >= 0)[:, None]
    p_min = jnp.where(valid, jnp.minimum(jnp.minimum(gv0, gv1), gv2), INF)
    p_max = jnp.where(valid, jnp.maximum(jnp.maximum(gv0, gv1), gv2), -INF)
    leaf_min = p_min.reshape(n_leaves, leaf_size, 3).min(axis=1)
    leaf_max = p_max.reshape(n_leaves, leaf_size, 3).max(axis=1)

    # heap AABB fit: level-by-level pairwise reduction
    levels_min = [leaf_min]
    levels_max = [leaf_max]
    cur_min, cur_max = leaf_min, leaf_max
    while cur_min.shape[0] > 1:
        cur_min = jnp.minimum(cur_min[0::2], cur_min[1::2])
        cur_max = jnp.maximum(cur_max[0::2], cur_max[1::2])
        levels_min.append(cur_min)
        levels_max.append(cur_max)

    # heap layout: index 0 = unused sentinel, 1 = root, ..., leaves last
    nodes_min = jnp.concatenate([jnp.full((1, 3), INF)] + levels_min[::-1])
    nodes_max = jnp.concatenate([jnp.full((1, 3), -INF)] + levels_max[::-1])

    return BVH(
        nodes_min=nodes_min,
        nodes_max=nodes_max,
        tri_v0=gv0,
        tri_e1=gv1 - gv0,
        tri_e2=gv2 - gv0,
        tri_id=tri_id,
    )


def build_median_bvh(tris, leaf_size: int = 4, to_device: bool = True) -> BVH:
    """Host-side (NumPy) object-median build: same implicit-heap layout as
    build_lbvh, but each split partitions its triangle range at the slot
    midpoint by centroid along the locally longest axis instead of relying
    on global morton order. Tighter boxes -> substantially fewer node steps
    and leaf visits for the packet traversal kernel (the quality lever the
    reference gets from the driver's PREFER_FAST_TRACE builder,
    blas_system.cpp:44). Build is host-side because the recursion is
    data-dependent; it runs once per scene upload.
    """
    import numpy as np

    tris_np = np.asarray(tris)
    t = tris_np.shape[0]
    n_leaves = max(2, _next_pow2(-(-t // leaf_size)))
    padded = n_leaves * leaf_size

    v0 = tris_np[:, 0]
    v1 = tris_np[:, 1]
    v2 = tris_np[:, 2]
    centroids = (v0 + v1 + v2) / 3.0

    def split(seg, slots):
        if slots <= leaf_size:
            return [seg]
        if len(seg) == 0:
            return [seg] * (slots // leaf_size)  # a run of empty leaves
        half = slots // 2
        if len(seg) <= half:
            # everything fits in the left subtree; right stays empty
            return split(seg, half) + split(seg[:0], half)
        c = centroids[seg]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        part = np.argpartition(c[:, axis], half - 1)
        return split(seg[part[:half]], half) + split(seg[part[half:]], half)

    segs = split(np.arange(t, dtype=np.int32), padded)
    order_parts = []
    tri_id_parts = []
    for leaf_seg in segs:
        pad = leaf_size - len(leaf_seg)
        order_parts.append(leaf_seg)
        order_parts.append(np.zeros(pad, np.int32))  # clamped below by id -1
        tri_id_parts.append(leaf_seg)
        tri_id_parts.append(np.full(pad, -1, np.int32))
    order = np.concatenate(order_parts)
    tri_id = np.concatenate(tri_id_parts)

    gv0 = v0[order]
    gv1 = v1[order]
    gv2 = v2[order]

    valid = (tri_id >= 0)[:, None]
    inf = float(INF)
    p_min = np.where(valid, np.minimum(np.minimum(gv0, gv1), gv2), inf)
    p_max = np.where(valid, np.maximum(np.maximum(gv0, gv1), gv2), -inf)
    leaf_min = p_min.reshape(n_leaves, leaf_size, 3).min(axis=1)
    leaf_max = p_max.reshape(n_leaves, leaf_size, 3).max(axis=1)

    levels_min = [leaf_min]
    levels_max = [leaf_max]
    cur_min, cur_max = leaf_min, leaf_max
    while cur_min.shape[0] > 1:
        cur_min = np.minimum(cur_min[0::2], cur_min[1::2])
        cur_max = np.maximum(cur_max[0::2], cur_max[1::2])
        levels_min.append(cur_min)
        levels_max.append(cur_max)

    nodes_min = np.concatenate([np.full((1, 3), inf)] + levels_min[::-1])
    nodes_max = np.concatenate([np.full((1, 3), -inf)] + levels_max[::-1])

    f32 = np.float32
    conv = jnp.asarray if to_device else (lambda x: x)
    # to_device=False keeps everything NumPy: callers that post-process the
    # arrays on the host (wavefront packing) avoid ~14 device round trips,
    # each of which costs a remote transfer-program compile on a tunneled
    # TPU (measured: minutes of pure overhead at colonnade scale).
    return BVH(
        nodes_min=conv(nodes_min.astype(f32)),
        nodes_max=conv(nodes_max.astype(f32)),
        tri_v0=conv(gv0.astype(f32)),
        tri_e1=conv((gv1 - gv0).astype(f32)),
        tri_e2=conv((gv2 - gv0).astype(f32)),
        tri_id=conv(tri_id),
    )
