"""Wavefront leaf-streaming traversal: the dense-scene TraceRay backend.

The third traversal generation (after the jnp lockstep walk and the Pallas
packet kernel), built for scenes whose packet union footprint defeats
scalar-stepping kernels (colonnade-class, 250k+ tris — the scenes the
reference hands to DXR hardware, blas_system.cpp:44, main.cpp:88).

Design — a two-phase wavefront, all in XLA (TPU-first reasoning):

  Phase A ("walk"): 128-ray packets traverse the BVH *data-parallel across
    all packets* — one lax.while_loop whose body advances every packet's
    ordered near-first stack walk by one sibling-pair visit. Each iteration
    is a [P]-wide gather of pair records plus vector interval arithmetic:
    the irregular, data-dependent part of ray traversal becomes dense
    lockstep vector work across ~16k packets instead of a scalar critical
    path inside a kernel. Packets use conservative interval AABB tests
    (origin box x inverse-direction interval), so mixed-octant packets are
    handled correctly (just less efficiently — callers sort rays first).
    The walk emits per-packet lists of LEAF ROWS (8 triangles each), in
    near-first order, bounded to K rows per stage (static shapes).

  Phase B ("stream"): gathers the listed triangle rows and runs
    Moller-Trumbore as pure elementwise XLA over [P, 128] ray tiles — a
    lax.scan over row chunks with a running-best carry. No scalar
    addressing on the hot path at all: every fetch was resolved by the
    Phase A gather, so the VPU streams at full rate. (Measured on v5e:
    the scalar-stepping packet kernel runs at ~2% of VPU peak because each
    of its ~400ns traversal steps serializes a dynamic fetch + rank-0
    extracts; this design removes that class of cost entirely.)

  Stages: list lengths are data-dependent (colonnade: mean ~136 rows per
    packet, p95 ~1600 — corridor-view packets legitimately overlap that
    much geometry), so the trace runs stage 1 over all packets with a
    K-row budget, then an in-graph while_loop of compacted stages (active
    packets gathered to a P/8-slot buffer) until every walk is exhausted.
    Everything stays inside one jit — no host round trips.

Because both phases are plain jnp, the backend runs unchanged on CPU (test
oracle parity) and under shard_map (packets are embarrassingly parallel).

Semantics match ops.intersect exactly (same epsilons, no backface culling).
Reference parity: TraceRay closest/any over the scene TLAS
(raytracing_system.cpp:1068-1073; lighting.h:48-55 for the any-hit early
accept, which here becomes packet retirement between stages).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .lbvh import build_median_bvh

LANE = 128          # rays per packet
TRIS_PER_ROW = 8    # one leaf = one row of 8 triangles
ROW_F = 80          # 8 tris x 10 floats (v0 xyz, e1 xyz, e2 xyz, tid+1)
STACK_DEPTH = 28    # >= max tree depth (2^27 leaves is far beyond HBM)
K_STAGE1 = 192      # leaf-row budget, stage 1 (covers ~90% of packets)
K_STAGE2 = 256      # budget per compacted stage
CHUNK = 4           # rows per Phase-B scan step (32 tris)
INF = 1e30


@jax.tree_util.register_pytree_node_class
class WavefrontBVH:
    """Gather-friendly BVH for the wavefront backend (pytree).

    pair_rows: [L, 16] f32 — row k holds the records of children (2k, 2k+1):
               (min xyz, max xyz, split-code, valid) x 2. Row 0 unused.
               split-code (slot 6 of the LEFT record): axis | 4*left_is_low.
               valid (slot 7): 1.0 for real nodes, 0.0 for power-of-two
               padding subtrees, whose inverted +/-INF boxes would otherwise
               pass EVERY interval test (same fix as cull.py's slot-6 flag).
    tri_rows:  [L + 1, 80] f32 — leaf row l = 8 triangles of heap leaf L+l,
               tri j at floats j*10..+10 as (v0, e1, e2, tid+1); 0 id marks
               padding. The LAST row is all-zero: the gather target for
               invalid list slots.
    """

    def __init__(self, pair_rows, tri_rows, n_leaves: int):
        self.pair_rows = pair_rows
        self.tri_rows = tri_rows
        self.n_leaves = n_leaves

    def tree_flatten(self):
        return (self.pair_rows, self.tri_rows), (self.n_leaves,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])


def build_wavefront_bvh(tris) -> WavefrontBVH:
    """tris [T,3,3] -> WavefrontBVH. Host median-split build (the quality
    lever the reference gets from PREFER_FAST_TRACE, blas_system.cpp:44),
    leaf size 8 = one triangle row per leaf. No VMEM cap: both tables live
    in HBM and are gathered, so one tree covers the whole scene (the
    Pallas packet kernel's 150k-tri chunking does not apply here)."""
    import numpy as np

    tris = np.asarray(tris)
    bvh = build_median_bvh(tris, leaf_size=TRIS_PER_ROW, to_device=False)
    l = bvh.n_leaves

    # ALL packing in NumPy on the host: eager jnp ops each cost a device
    # round trip (minutes at scene scale on a tunneled TPU); the only
    # device work here is the two final transfers.
    nodes_min = np.asarray(bvh.nodes_min)
    nodes_max = np.asarray(bvh.nodes_max)

    # sibling-pair records with the split-axis code in the left child's
    # slot 6 (same layout contract as pallas_traverse.pack_bvh)
    centers = (nodes_min + nodes_max) * 0.5
    diff = centers[3::2] - centers[2::2]
    axis = np.argmax(np.abs(diff), axis=1)
    low = np.take_along_axis(diff, axis[:, None], axis=1)[:, 0] >= 0
    code = (axis + 4 * low.astype(np.int32)).astype(np.float32)
    codes = np.zeros((2 * l,), np.float32)
    codes[2::2] = code
    # validity: padding subtrees carry inverted boxes (min > max); without
    # this flag every packet "hits" them and floods the stage budgets with
    # phantom leaf rows on non-power-of-two scenes
    valid = (nodes_min[:, 0] <= nodes_max[:, 0]).astype(np.float32)
    rec = np.concatenate(
        [nodes_min, nodes_max, codes[:, None], valid[:, None]], axis=1,
    ).astype(np.float32)  # [2L, 8]
    pair_rows = np.concatenate(
        [np.zeros((1, 16), np.float32), rec[2:].reshape(l - 1, 16)]
    )

    tid_f = (np.asarray(bvh.tri_id) + 1).astype(np.float32)
    tri_rec = np.concatenate(
        [np.asarray(bvh.tri_v0), np.asarray(bvh.tri_e1),
         np.asarray(bvh.tri_e2), tid_f[:, None]], axis=1
    ).astype(np.float32).reshape(l, ROW_F)
    tri_rows = np.concatenate([tri_rec, np.zeros((1, ROW_F), np.float32)])
    return WavefrontBVH(jnp.asarray(pair_rows), jnp.asarray(tri_rows), l)


class _Packets(NamedTuple):
    """Per-packet ray data and conservative interval bounds."""

    ox: jnp.ndarray  # [P, LANE] each
    oy: jnp.ndarray
    oz: jnp.ndarray
    dx: jnp.ndarray
    dy: jnp.ndarray
    dz: jnp.ndarray
    tmin: jnp.ndarray
    tmax: jnp.ndarray
    o_lo: jnp.ndarray  # [P, 3] packet origin box
    o_hi: jnp.ndarray
    i_lo: jnp.ndarray  # [P, 3] inverse-direction interval
    i_hi: jnp.ndarray
    sd_pos: jnp.ndarray  # [P, 3] bool representative direction sign
    tmin_lo: jnp.ndarray  # [P]


class _WalkState(NamedTuple):
    k: jnp.ndarray      # [P] i32 current pair (internal node); 0 = exhausted
    sp: jnp.ndarray     # [P] i32 stack pointer
    stack: jnp.ndarray  # [P, STACK_DEPTH] i32
    done: jnp.ndarray   # [P] bool


def _safe_inv(d):
    tiny = jnp.abs(d) < 1e-12
    return jnp.where(tiny, jnp.where(d < 0, -1e12, 1e12),
                     1.0 / jnp.where(tiny, 1.0, d))


def _make_packets(origins, dirs, tmin, tmax):
    """Pad N rays to P*LANE and compute per-packet interval bounds.
    Padding rays get tmax=-1 (dead: accept nothing, bound nothing)."""
    n = origins.shape[0]
    p = -(-n // LANE)
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    pad = p * LANE - n

    def padded(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        ).reshape((p, LANE) + x.shape[1:]) if pad else x.reshape((p, LANE) + x.shape[1:])

    o = padded(origins.astype(jnp.float32), 0.0)
    d = padded(dirs.astype(jnp.float32), 1.0)
    tmin_p = padded(tmin, 1.0)
    tmax_p = padded(tmax, -1.0)

    inv = _safe_inv(d)
    live = (tmax_p >= tmin_p)[..., None]  # [P, LANE, 1]
    big = jnp.float32(INF)
    o_lo = jnp.min(jnp.where(live, o, big), axis=1)
    o_hi = jnp.max(jnp.where(live, o, -big), axis=1)
    i_lo = jnp.min(jnp.where(live, inv, big), axis=1)
    i_hi = jnp.max(jnp.where(live, inv, -big), axis=1)
    # packets with no live rays get inverted bounds -> every test misses
    sd_pos = d[:, 0, :] > 0
    tmin_lo = jnp.min(jnp.where(live[..., 0], tmin_p, big), axis=1)
    return _Packets(
        o[..., 0], o[..., 1], o[..., 2], d[..., 0], d[..., 1], d[..., 2],
        tmin_p, tmax_p, o_lo, o_hi, i_lo, i_hi, sd_pos, tmin_lo,
    ), n


def _interval_hit(pk: _Packets, b_lo, b_hi, t_cap):
    """Conservative packet-vs-AABB slab test ([P] vectorized).

    b_lo/b_hi: [P, 3]. Interval arithmetic over (box - origin) * inv_dir:
    true whenever ANY live ray COULD hit the box closer than t_cap."""
    a_lo0 = b_lo - pk.o_hi
    a_hi0 = b_lo - pk.o_lo
    a_lo1 = b_hi - pk.o_hi
    a_hi1 = b_hi - pk.o_lo

    def prods(a_lo, a_hi):
        p1 = a_lo * pk.i_lo
        p2 = a_lo * pk.i_hi
        p3 = a_hi * pk.i_lo
        p4 = a_hi * pk.i_hi
        return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

    lo0, hi0 = prods(a_lo0, a_hi0)
    lo1, hi1 = prods(a_lo1, a_hi1)
    tn = jnp.minimum(lo0, lo1)  # [P,3] lower bound of per-ray slab entry
    tf = jnp.maximum(hi0, hi1)  # [P,3] upper bound of per-ray slab exit
    t_near_lo = jnp.max(tn, axis=1)
    t_far_hi = jnp.min(tf, axis=1)
    return (t_near_lo <= t_far_hi) & (t_far_hi >= pk.tmin_lo) & (t_near_lo <= t_cap)


def _row_write(arr, pos, val, mask):
    """arr[p, pos[p]] = val[p] where mask[p] (one-hot select, no scatter)."""
    w = arr.shape[1]
    hot = (jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) == pos[:, None]) & mask[:, None]
    return jnp.where(hot, val[:, None], arr)


def walk_init(pk: _Packets) -> _WalkState:
    p = pk.ox.shape[0]
    no_live = jnp.all(pk.tmax < pk.tmin, axis=1)
    return _WalkState(
        k=jnp.where(no_live, 0, 1).astype(jnp.int32),
        sp=jnp.zeros((p,), jnp.int32),
        stack=jnp.zeros((p, STACK_DEPTH), jnp.int32),
        done=no_live,
    )


def phase_a(bvh: WavefrontBVH, pk: _Packets, state: _WalkState, t_cap, k_rows: int):
    """Advance every packet's ordered stack walk until it has emitted
    k_rows leaf rows (or exhausted). Returns (lists [P, k_rows] i32 leaf-row
    ids, -1 padded, near-first order; new state)."""
    l = bvh.n_leaves
    p = state.k.shape[0]
    lists0 = jnp.full((p, k_rows), -1, jnp.int32)
    emit0 = jnp.zeros((p,), jnp.int32)

    def active_of(s, emit):
        return (~s.done) & (emit <= k_rows - 2)

    def cond(carry):
        s, emit, _ = carry
        return jnp.any(active_of(s, emit))

    def body(carry):
        s, emit, lists = carry
        active = active_of(s, emit)
        rec = bvh.pair_rows[s.k]  # [P, 16]
        hit_l = _interval_hit(pk, rec[:, 0:3], rec[:, 3:6], t_cap) & (rec[:, 7] > 0)
        hit_r = _interval_hit(pk, rec[:, 8:11], rec[:, 11:14], t_cap) & (rec[:, 15] > 0)
        c0 = 2 * s.k
        kids_leaf = c0 >= l

        code = rec[:, 6].astype(jnp.int32)
        axis = code & 3
        left_low = code >= 4
        dpos = jnp.where(
            axis == 0, pk.sd_pos[:, 0],
            jnp.where(axis == 1, pk.sd_pos[:, 1], pk.sd_pos[:, 2]),
        )
        near_left = dpos == left_low
        any_n = jnp.where(near_left, hit_l, hit_r)
        any_f = jnp.where(near_left, hit_r, hit_l)
        near = jnp.where(near_left, c0, c0 + 1)
        far = jnp.where(near_left, c0 + 1, c0)

        # leaf emissions, near first
        e0 = kids_leaf & any_n & active
        e1 = kids_leaf & any_f & active
        lists = _row_write(lists, emit, near - l, e0)
        lists = _row_write(lists, emit + e0.astype(jnp.int32), far - l, e1)
        emit = emit + e0.astype(jnp.int32) + e1.astype(jnp.int32)

        # descend / push / pop
        both = any_n & any_f & (~kids_leaf)
        stack = _row_write(s.stack, s.sp, far, both & active)
        sp1 = s.sp + (both & active).astype(jnp.int32)
        desc = jnp.where(
            (~kids_leaf) & any_n, near,
            jnp.where((~kids_leaf) & any_f, far, 0),
        )
        need_pop = desc == 0
        spm = jnp.maximum(sp1 - 1, 0)
        popped = jnp.take_along_axis(stack, spm[:, None], axis=1)[:, 0]
        k_next = jnp.where(need_pop, jnp.where(sp1 > 0, popped, 0), desc)
        sp_next = jnp.where(need_pop, spm, sp1)

        k_new = jnp.where(active, k_next, s.k)
        sp_new = jnp.where(active, sp_next, s.sp)
        done = s.done | (k_new == 0)
        return _WalkState(k_new, sp_new, stack, done), emit, lists

    state, _, lists = jax.lax.while_loop(cond, body, (state, emit0, lists0))
    return lists, state


def _mt_update(best, pk: _Packets, v0x, v0y, v0z, e1x, e1y, e1z,
               e2x, e2y, e2z, tid, any_hit: bool):
    """One triangle (per-packet [P,1] fields) vs the packet's rays [P,LANE].
    Same epsilons as ops.intersect (the oracle)."""
    t, u, v, prim = best
    px = pk.dy * e2z - pk.dz * e2y
    py = pk.dz * e2x - pk.dx * e2z
    pz = pk.dx * e2y - pk.dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(
        jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
    )
    tvx = pk.ox - v0x
    tvy = pk.oy - v0y
    tvz = pk.oz - v0z
    uu = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    vv = (pk.dx * qx + pk.dy * qy + pk.dz * qz) * inv_det
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12)
        & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
        & (tt > pk.tmin) & (tid >= 0)
    )
    if any_hit:
        ok = ok & (tt < pk.tmax)
        return (t, u, v, jnp.where(ok, 1, prim))
    ok = ok & (tt < jnp.minimum(t, pk.tmax))
    return (
        jnp.where(ok, tt, t),
        jnp.where(ok, uu, u),
        jnp.where(ok, vv, v),
        jnp.where(ok, tid.astype(jnp.int32), prim),
    )


def phase_b(bvh: WavefrontBVH, pk: _Packets, lists, best, any_hit: bool):
    """Stream the listed triangle rows: lax.scan over CHUNK-row steps, the
    Moller-Trumbore fully unrolled inside each step (8 tris x CHUNK rows of
    [P, LANE] elementwise work — pure VPU streaming)."""
    l = bvh.n_leaves
    k_rows = lists.shape[1]
    steps = -(-k_rows // CHUNK)
    pad = steps * CHUNK - k_rows
    if pad:
        lists = jnp.concatenate(
            [lists, jnp.full((lists.shape[0], pad), -1, jnp.int32)], axis=1
        )
    idx = jnp.where(lists < 0, l, lists)  # null row on invalid slots
    idx = jnp.transpose(idx.reshape(-1, steps, CHUNK), (1, 0, 2))  # [S,P,C]

    def step(carry, idx_c):
        rows = bvh.tri_rows[idx_c]  # [P, CHUNK, 80]
        for c in range(CHUNK):
            for j in range(TRIS_PER_ROW):
                b = j * 10
                f = lambda q: rows[:, c, b + q][:, None]  # noqa: E731
                tid = f(9) - 1.0
                carry = _mt_update(
                    carry, pk, f(0), f(1), f(2), f(3), f(4), f(5),
                    f(6), f(7), f(8), tid, any_hit,
                )
        return carry, None

    best, _ = jax.lax.scan(step, best, idx)
    return best


def _closest_t_cap(pk: _Packets, t):
    """Conservative per-packet pruning cap: no unvisited node whose entry
    distance exceeds every live ray's current best can improve anything."""
    live = pk.tmax >= pk.tmin
    return jnp.max(jnp.where(live, jnp.minimum(t, pk.tmax), -INF), axis=1)


def _any_t_cap(pk: _Packets, hit):
    live = (pk.tmax >= pk.tmin) & (hit == 0)
    return jnp.max(jnp.where(live, pk.tmax, -INF), axis=1)


def _trace(bvh: WavefrontBVH, origins, dirs, tmin, tmax, any_hit: bool):
    pk, n = _make_packets(origins, dirs, tmin, tmax)
    p = pk.ox.shape[0]
    if any_hit:
        best = (pk.tmax * 0.0, pk.ox * 0.0, pk.ox * 0.0,
                jnp.zeros((p, LANE), jnp.int32))
    else:
        best = (jnp.minimum(pk.tmax, INF), jnp.zeros((p, LANE), jnp.float32),
                jnp.zeros((p, LANE), jnp.float32),
                jnp.full((p, LANE), -1, jnp.int32))

    state = walk_init(pk)
    t_cap = _any_t_cap(pk, best[3]) if any_hit else _closest_t_cap(pk, best[0])
    lists, state = phase_a(bvh, pk, state, t_cap, K_STAGE1)
    best = phase_b(bvh, pk, lists, best, any_hit)

    # compacted continuation stages for the footprint tail (in-graph)
    a = max(p // 8, 1)

    def sub(tree, idx):
        return jax.tree_util.tree_map(lambda x: x[idx], tree)

    def put(tree, idx, subtree):
        return jax.tree_util.tree_map(
            lambda x, s: x.at[idx].set(s), tree, subtree
        )

    def stage_done(s: _WalkState, best):
        if any_hit:
            # packets whose every live ray already hit need no more rows
            all_hit = jnp.all((best[3] > 0) | (pk.tmax < pk.tmin), axis=1)
            return s.done | all_hit
        return s.done

    def cond(carry):
        state, _ = carry
        return jnp.any(~stage_done(state, carry[1]))

    def body(carry):
        state, best = carry
        still = ~stage_done(state, best)
        order = jnp.argsort(~still)  # actives first (False < True)
        idx = order[:a]
        pk_s = sub(pk, idx)
        st_s = sub(state, idx)
        best_s = sub(best, idx)
        cap = _any_t_cap(pk_s, best_s[3]) if any_hit else _closest_t_cap(pk_s, best_s[0])
        lists, st_s = phase_a(bvh, pk_s, st_s, cap, K_STAGE2)
        best_s = phase_b(bvh, pk_s, lists, best_s, any_hit)
        return put(state, idx, st_s), put(best, idx, best_s)

    state, best = jax.lax.while_loop(cond, body, (state, best))

    t, u, v, prim = best

    def flat(x):
        return x.reshape(-1)[:n]

    if any_hit:
        alive = flat(pk.tmax) >= flat(pk.tmin)
        return (flat(prim) > 0) & alive
    no_hit = prim < 0
    return {
        "t": flat(jnp.where(no_hit, jnp.float32(INF), t)),
        "u": flat(u),
        "v": flat(v),
        "prim": flat(prim),
    }


def wavefront_closest(bvh: WavefrontBVH, origins, dirs, tmin=0.0, tmax=1e6):
    return _trace(bvh, origins, dirs, tmin, tmax, any_hit=False)


def wavefront_any(bvh: WavefrontBVH, origins, dirs, tmin=1e-4, tmax=1e6):
    return _trace(bvh, origins, dirs, tmin, tmax, any_hit=True)
