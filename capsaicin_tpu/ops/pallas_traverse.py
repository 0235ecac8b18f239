"""Pallas TPU kernel: BVH packet traversal.

The production replacement for DXR TraceRay on scenes large enough to need
an acceleration structure. Design (TPU-first — this is where the framework
diverges hardest from a GPU port):

  * **Packet traversal with shared control flow.** A packet of 1024 rays
    (one full 8x128 VPU tile per ray component) walks the implicit-heap BVH
    (ops.lbvh) together: ONE scalar node pointer for the whole packet,
    descending whenever ANY live ray hits the node box. Scalar control means
    no per-lane gathers (which cost ~17ns/index on TPU and make
    pointer-chasing traversal hopeless). Coherent packets (primary, shadow)
    visit near-minimal node sets; incoherent bounce rays should be sorted
    by direction/origin first (sort_rays_for_traversal).
  * **Lane-packed VMEM-resident scene.** Mosaic only allows dynamic indexing
    on sublane (row) dimensions, and pads VMEM lane dims to 128 — so both
    tables are packed 128 floats per row with zero padding waste:
      nodes: SIBLING-PAIR rows — row k holds the records of children
             (2k, 2k+1) in lanes 0..15, so a traversal step is one dynamic
             sublane read + static extracts (no rotate, no slot arithmetic)
      tris:  8 triangles x 10 floats per row; a 32-tri leaf spans 4 rows,
             iterated with a fori_loop (in-row lanes are STATIC via the
             unrolled 8-tri body, so extraction is free)
    Triangle ids ride along as floats (exact below 2^24).
  * Ordered near-first stack traversal: each step fetches a sibling PAIR
    row, box-tests both children, descends into the near child (chosen from
    the pair's split-axis code against the packet-representative direction
    sign) and pushes the far child on a scalar SMEM stack — the classic
    closest-hit pruning DXR hardware does, expressed packet-wide.
  * Any-hit packets retire lanes at first hit and exit when every lane is
    done (RAY_FLAG_ACCEPT_FIRST_HIT analog, lighting.h:48-55).

Capacity: ~150k triangles per VMEM-resident sub-tree; bigger scenes are
split into morton-ordered chunks (PackedBVHSet) traced sequentially and
merged. Semantics match
ops.intersect exactly (same epsilons, no backface culling); tests assert
equality against the brute-force oracle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lbvh import BVH, build_lbvh

INF = 1e30
PACKET = 1024  # rays per packet: 8 sublanes x 128 lanes
SUB = 8
LANE = 128

TRIS_PER_ROW = 8  # 8 tris x 10 floats = 80 lanes/row. Do NOT unroll wider:
# a 12-wide unrolled leaf body crosses the vector-register spill cliff and
# runs ~80x slower (measured on v5e). Wider leaves iterate over ROWS with a
# fori_loop (live set stays at 8 tris) instead of unrolling.
LEAF_SIZE = 32  # tris per BVH leaf = 4 rows. Wider leaves -> a 4x shallower
# tree -> 4x fewer scalar-bound traversal steps; the extra triangle tests
# are dense VPU work, which is the cheap currency on TPU.
# VMEM cap per sub-tree: tris rows*512B + nodes. Scenes above this are split
# into morton-ordered chunks, each with its own VMEM-resident sub-BVH, traced
# sequentially and merged (spatially disjoint chunks exit each other's trees
# in a few steps).
CHUNK_TRIS_CAP = 150_000


def pack_tri_rows(v0, e1, e2, tri_id, per_row: int = TRIS_PER_ROW):
    """[T,3]x3 + [T] -> [ceil(T/per_row), 128] rows, tri j at lanes
    j*10..+10 as (v0 xyz, e1 xyz, e2 xyz, tid+1); 0 id marks padding.
    (A per-row AABB in the spare lanes was tried for in-leaf row skipping
    and measured ~8% slower — see the kernel; rows carry only triangles.)"""
    t = v0.shape[0]
    tid_f = (tri_id + 1).astype(jnp.float32)
    rec = jnp.concatenate([v0, e1, e2, tid_f[:, None]], axis=1)  # [T, 10]
    rows = -(-t // per_row)
    pad = rows * per_row - t
    if pad:
        rec = jnp.concatenate([rec, jnp.zeros((pad, 10), jnp.float32)])
    packed = rec.reshape(rows, per_row * 10)
    return jnp.concatenate(
        [packed, jnp.zeros((rows, 128 - per_row * 10), jnp.float32)], axis=1
    )


def _use_interpret():
    return jax.default_backend() != "tpu"


@jax.tree_util.register_pytree_node_class
class PackedBVH:
    """Traversal-ready lane-packed BVH (pytree: arrays are children,
    n_leaves/leaf_size are static aux data — the kernel needs them at
    trace time).

    nodes: [L, 128] f32 sibling-pair rows — row k holds children (2k, 2k+1)
           records in lanes 0..15 (min xyz, max xyz, order-code, pad) x 2
    tris:  [ceil(P/leaf), 128] f32 — leaf row l holds its triangles, tri j
           at lanes j*10..+10 as (v0 xyz, e1 xyz, e2 xyz, tid+1); trimmed to
           the real triangle count (trailing all-padding leaf rows dropped)
    """

    def __init__(self, nodes, tris, n_leaves: int, leaf_size: int = LEAF_SIZE):
        self.nodes = nodes
        self.tris = tris
        self.n_leaves = n_leaves
        self.leaf_size = leaf_size

    @property
    def per_row(self) -> int:
        return min(self.leaf_size, TRIS_PER_ROW)

    @property
    def leaf_rows(self) -> int:
        return self.leaf_size // self.per_row

    def tree_flatten(self):
        return (self.nodes, self.tris), (self.n_leaves, self.leaf_size)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])


@jax.tree_util.register_pytree_node_class
class PackedBVHSet:
    """A list of sub-BVHs over morton-ordered triangle chunks, plus per-chunk
    local->global triangle id maps packed into the leaf records upstream."""

    def __init__(self, parts):
        self.parts = tuple(parts)

    def tree_flatten(self):
        return self.parts, len(self.parts)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children)


def build_packed_bvh(tris):
    """tris [T,3,3] -> PackedBVH, or PackedBVHSet when over the VMEM cap.

    Over-cap scenes are pre-sorted by centroid morton code and chunked so
    each sub-BVH covers a compact spatial region; sub-tree leaf records carry
    GLOBAL triangle ids, so results merge by plain min."""
    from .lbvh import build_median_bvh

    t = tris.shape[0]
    if t <= CHUNK_TRIS_CAP:
        return pack_bvh(build_median_bvh(tris, leaf_size=LEAF_SIZE), n_real_tris=t)

    from .lbvh import morton_codes

    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    centroids = (v0 + v1 + v2) / 3.0
    lo = jnp.min(jnp.minimum(jnp.minimum(v0, v1), v2), axis=0)
    hi = jnp.max(jnp.maximum(jnp.maximum(v0, v1), v2), axis=0)
    order = jnp.argsort(morton_codes(centroids, lo, hi)).astype(jnp.int32)

    n_chunks = -(-t // CHUNK_TRIS_CAP)
    chunk = -(-t // n_chunks)
    parts = []
    for c in range(n_chunks):
        ids = order[c * chunk : min((c + 1) * chunk, t)]
        sub = build_median_bvh(tris[ids], leaf_size=LEAF_SIZE)
        # remap chunk-local ids to global ids before packing
        local = sub.tri_id
        global_ids = jnp.where(local >= 0, ids[jnp.clip(local, 0, None)], -1)
        sub = sub._replace(tri_id=global_ids)
        parts.append(pack_bvh(sub, n_real_tris=ids.shape[0]))
    return PackedBVHSet(parts)


def pack_bvh(bvh: BVH, n_real_tris=None) -> PackedBVH:
    leaf = bvh.leaf_size
    per_row = min(leaf, TRIS_PER_ROW)
    assert leaf % per_row == 0, f"leaf_size {leaf} must be a multiple of rows"
    n2 = bvh.nodes_min.shape[0]
    # per-sibling-pair traversal ordering code, stored in slot 6 of the LEFT
    # child's record (the kernel fetches child pairs, never the parent):
    # axis = argmax |center(right) - center(left)|, +4 if left is the
    # lower-coordinate child. Values 0..7, exact in f32.
    centers = (bvh.nodes_min + bvh.nodes_max) * 0.5
    cl = centers[2::2]  # even nodes 2, 4, ... (left children)
    cr = centers[3::2]
    diff = cr - cl
    axis = jnp.argmax(jnp.abs(diff), axis=1)
    low = jnp.take_along_axis(diff, axis[:, None], axis=1)[:, 0] >= 0
    code = (axis + 4 * low.astype(jnp.int32)).astype(jnp.float32)
    codes = jnp.zeros((n2,), jnp.float32)
    codes = codes.at[2::2].set(code)
    node_rec = jnp.concatenate(
        [bvh.nodes_min, bvh.nodes_max, codes[:, None],
         jnp.zeros((n2, 1), jnp.float32)], axis=1
    )  # [2L, 8]
    # sibling-PAIR rows: row k holds the records of children (2k, 2k+1) in
    # lanes 0..15, so the kernel's node fetch is ONE dynamic sublane read —
    # no lane rotate, no slot arithmetic on the scalar critical path. Row 0
    # is unused (k starts at the root, 1). Costs 8x the VMEM of the dense
    # 16-nodes/row layout (512B per pair vs 64B) — ~4MB at the chunk cap,
    # well in budget.
    n_pairs = n2 // 2  # == n_leaves
    pair_rec = node_rec[2:].reshape(n_pairs - 1, 16)
    pair_rec = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), pair_rec])
    nodes = jnp.concatenate(
        [pair_rec, jnp.zeros((n_pairs, 128 - 16), jnp.float32)], axis=1
    )

    tris = pack_tri_rows(bvh.tri_v0, bvh.tri_e1, bvh.tri_e2, bvh.tri_id, per_row)
    if n_real_tris is not None:
        # drop trailing all-padding rows (morton padding is appended at the
        # end); the kernel clamps row indices (re-testing a clamped row is
        # idempotent: min-merge of identical triangles)
        rows_real = max(1, -(-int(n_real_tris) // per_row))
        tris = tris[:rows_real]
    return PackedBVH(nodes=nodes, tris=tris, n_leaves=bvh.n_leaves, leaf_size=leaf)


def pack_rays_tiled(origins, dirs, tmin, tmax):
    """[N,3]x2 -> [Np, 8, SUB, LANE] packet-tiled rays (+ n)."""
    n = origins.shape[0]
    n_pad = -(-n // PACKET) * PACKET
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays = jnp.concatenate(
        [origins.T, dirs.T, tmin[None, :], tmax[None, :]], axis=0
    ).astype(jnp.float32)
    if n_pad != n:
        pad = jnp.zeros((8, n_pad - n), jnp.float32)
        pad = pad.at[7, :].set(-1.0)  # tmax < tmin: padding never accepts
        rays = jnp.concatenate([rays, pad], axis=1)
    tiled = rays.reshape(8, n_pad // PACKET, SUB, LANE).transpose(1, 0, 2, 3)
    return tiled, n


# A 2-packet interleaved-walk variant was tried to overlap the scalar
# node-stepping latency; it ran ~20x SLOWER on v5e (extra live tiles across
# the doubled branch regions cross the vector-register spill cliff). The
# kernel therefore stays single-walk and instead minimizes WORK: ordered
# (near-child-first) stack traversal with sibling-pair fetches.

STACK_DEPTH = 32  # >= tree depth (<= log2(2^14 leaves) for the VMEM cap)


def _traverse_kernel(
    n_leaves, tri_rows, per_row, leaf_rows, any_hit, interpret,
    rays_ref, nodes_ref, tris_ref,
    t_out, u_out, v_out, p_out, stack_ref,
):
    """Ordered stack traversal, one sibling PAIR per fetch.

    The walk pointer k is always an INTERNAL node; each step reads the
    children pair (2k, 2k+1) from pair-row k with ONE dynamic sublane read,
    box-tests both, and descends into the near child first (near/far chosen
    from the pair's split-axis code, slot 6 of the left child's record,
    against the packet-representative ray direction sign). The far child of
    a both-hit pair goes on a scalar SMEM stack. Near-first ordering
    tightens t_best early, so popped far subtrees usually fail their box
    tests immediately — the classic closest-hit pruning DXR hardware does,
    expressed packet-wide.
    """
    del interpret  # layout no longer needs a hardware-only lane rotate

    max_steps = 4 * n_leaves + 64  # safety cap

    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    tmin = rays_ref[0, 6]
    tmax = rays_ref[0, 7]

    def safe_inv(d):
        tiny = jnp.abs(d) < 1e-12
        return jnp.where(tiny, jnp.where(d < 0, -1e12, 1e12), 1.0 / jnp.where(tiny, 1.0, d))

    ix = safe_inv(dx)
    iy = safe_inv(dy)
    iz = safe_inv(dz)

    # packet-representative direction signs for near/far ordering (packets
    # are direction-octant sorted, so lane (0,0) represents the packet;
    # wrong-sign lanes only lose the ordering heuristic, never correctness)
    sd0 = dx[0, 0] > 0
    sd1 = dy[0, 0] > 0
    sd2 = dz[0, 0] > 0

    # Traversal state (t/u/v/prim tiles) lives IN THE OUTPUT REFS and is
    # mutated in place; the while carry is scalars only.
    t_out[0, 0] = tmax
    u_out[0, 0] = jnp.zeros((SUB, LANE), jnp.float32)
    v_out[0, 0] = jnp.zeros((SUB, LANE), jnp.float32)
    if any_hit:
        # dead lanes (padding, or retired by PackedBVHSet chunk culling:
        # tmax < tmin) latch a fake hit so the every-lane-done early exit
        # can actually fire on partial packets
        p_out[0, 0] = jnp.where(tmax < tmin, 0, -1).astype(jnp.int32)
    else:
        p_out[0, 0] = jnp.full((SUB, LANE), -1, jnp.int32)

    def box_from(rec, base, t_best, prim):
        tx0 = (rec[0, base + 0] - ox) * ix
        tx1 = (rec[0, base + 3] - ox) * ix
        ty0 = (rec[0, base + 1] - oy) * iy
        ty1 = (rec[0, base + 4] - oy) * iy
        tz0 = (rec[0, base + 2] - oz) * iz
        tz1 = (rec[0, base + 5] - oz) * iz
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        hit = (t_near <= t_far) & (t_far >= tmin) & (t_near <= t_best)
        if any_hit:
            hit = hit & (prim < 0)  # retired lanes stop expanding boxes
        return hit

    def leaf_tests(k):
        def row_body(i, c):
            rr = jnp.minimum((k - n_leaves) * leaf_rows + i, tri_rows - 1)
            trow = tris_ref[rr, :]  # [128]; in-row lanes are static below
            # NOTE: a per-row AABB pretest here was tried and measured ~8%
            # SLOWER (the per-row any() reduce + branch costs more than the
            # skipped triangle math on v5e) — rows run unconditionally.
            _row_tri_tests(trow)
            return c

        def _row_tri_tests(trow):
            t_best = t_out[0, 0]
            u = u_out[0, 0]
            v = v_out[0, 0]
            prim = p_out[0, 0]
            for j in range(per_row):
                b = j * 10
                v0x, v0y, v0z = trow[b], trow[b + 1], trow[b + 2]
                e1x, e1y, e1z = trow[b + 3], trow[b + 4], trow[b + 5]
                e2x, e2y, e2z = trow[b + 6], trow[b + 7], trow[b + 8]
                tid = trow[b + 9].astype(jnp.int32) - 1

                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(
                    jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
                )
                tvx = ox - v0x
                tvy = oy - v0y
                tvz = oz - v0z
                uu = (tvx * px + tvy * py + tvz * pz) * inv_det
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = (
                    (jnp.abs(det) > 1e-12)
                    & (uu >= 0.0)
                    & (vv >= 0.0)
                    & (uu + vv <= 1.0)
                    & (tt > tmin)
                    & (tt < jnp.minimum(tmax, t_best))
                    & (tid >= 0)
                )
                if any_hit:
                    ok = ok & (prim < 0)
                t_best = jnp.where(ok, tt, t_best)
                u = jnp.where(ok, uu, u)
                v = jnp.where(ok, vv, v)
                prim = jnp.where(ok, tid, prim)
            t_out[0, 0] = t_best
            u_out[0, 0] = u
            v_out[0, 0] = v
            p_out[0, 0] = prim

        if leaf_rows == 1:
            row_body(0, 0)
        else:
            # loop (not unroll) over leaf rows: the live set stays at one
            # row's 8 triangles, below the register-spill cliff
            jax.lax.fori_loop(0, leaf_rows, row_body, 0)

    def body(state):
        step, k, sp, live = state
        c0 = 2 * k
        # sibling-pair layout: row k holds BOTH children records (left at
        # lanes 0..7, right at 8..15) — ONE dynamic sublane read, no lane
        # rotate or slot arithmetic on the scalar critical path
        rec = nodes_ref[k, :].reshape(1, 128)
        t_best = t_out[0, 0]
        prim = p_out[0, 0]
        hitL = box_from(rec, 0, t_best, prim)
        hitR = box_from(rec, 8, t_best, prim)
        anyL = jnp.any(hitL)
        anyR = jnp.any(hitR)
        kids_leaf = c0 >= n_leaves

        @pl.when(kids_leaf & anyL)
        def _():
            leaf_tests(c0)

        @pl.when(kids_leaf & anyR)
        def _():
            leaf_tests(c0 + 1)

        if any_hit:
            # refresh the early-exit flag only after leaf work
            live = jax.lax.cond(
                kids_leaf & (anyL | anyR),
                lambda _: jnp.any(p_out[0, 0] < 0),
                lambda _: live,
                0,
            )

        # near/far from the pair's split-axis code (slot 6 of left child)
        code = rec[0, 6].astype(jnp.int32)
        axis = code & 3
        left_low = code >= 4
        d_pos = jnp.where(axis == 0, sd0, jnp.where(axis == 1, sd1, sd2))
        near_left = d_pos == left_low
        any_near = jnp.where(near_left, anyL, anyR)
        any_far = jnp.where(near_left, anyR, anyL)
        near = jnp.where(near_left, c0, c0 + 1)
        far = jnp.where(near_left, c0 + 1, c0)

        both = any_near & any_far & (~kids_leaf)

        @pl.when(both)
        def _():
            stack_ref[sp] = far

        sp1 = sp + both.astype(jnp.int32)
        desc = jnp.where(
            (~kids_leaf) & any_near, near,
            jnp.where((~kids_leaf) & any_far, far, 0),
        )
        need_pop = desc == 0
        spm = jnp.maximum(sp1 - 1, 0)
        popped = jnp.where(sp1 > 0, stack_ref[spm], 0)
        k_next = jnp.where(need_pop, popped, desc)
        sp_next = jnp.where(need_pop, spm, sp1)
        return step + 1, k_next, sp_next, live

    def cond(state):
        step, k, sp, live = state
        more = (k > 0) & (step < max_steps)
        if any_hit:
            more = more & live
        return more

    init = (
        jnp.int32(0),
        jnp.int32(1),  # root (always internal; builds guarantee >= 2 leaves)
        jnp.int32(0),
        jnp.any(p_out[0, 0] < 0) if any_hit else jnp.bool_(True),
    )
    jax.lax.while_loop(cond, body, init)


def _run(packed: PackedBVH, rays_tiled, any_hit: bool):
    np_ = rays_tiled.shape[0]
    kernel = functools.partial(
        _traverse_kernel, packed.n_leaves, packed.tris.shape[0],
        packed.per_row, packed.leaf_rows, any_hit, _use_interpret(),
    )
    f32 = jax.ShapeDtypeStruct((np_, 1, SUB, LANE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((np_, 1, SUB, LANE), jnp.int32)
    out_spec = pl.BlockSpec((1, 1, SUB, LANE), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM)
    t, u, v, prim = pl.pallas_call(
        kernel,
        grid=(np_,),
        in_specs=[
            pl.BlockSpec((1, 8, SUB, LANE), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(packed.nodes.shape, lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(packed.tris.shape, lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(f32, f32, f32, i32),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=_use_interpret(),
    )(rays_tiled, packed.nodes, packed.tris)
    return t, u, v, prim


def _untile(x, n):
    return x.reshape(-1)[:n]


def bvh_closest(packed, origins, dirs, tmin=0.0, tmax=1e6):
    if isinstance(packed, PackedBVHSet):
        # Chunk culling by ray shortening: each chunk is traced with the
        # best-so-far hit distance as its per-ray tmax, so once a packet has
        # found close hits, later (morton-disjoint) chunks fail the root/box
        # t_near <= t_best test and their walk exits in a couple of steps —
        # sublinear total cost instead of a full walk per chunk
        # (PREFER_FAST_TRACE intent, blas_system.cpp:44).
        best = None
        for part in packed.parts:
            cur = bvh_closest(
                part, origins, dirs, tmin,
                tmax if best is None else best["t"],
            )
            if best is None:
                best = cur
            else:
                closer = cur["t"] < best["t"]
                best = {
                    k: jnp.where(closer, cur[k], best[k]) for k in best
                }
        return best
    rays, n = pack_rays_tiled(origins, dirs, tmin, tmax)
    t, u, v, prim = _run(packed, rays, any_hit=False)
    return {
        "t": _untile(t, n),
        "u": _untile(u, n),
        "v": _untile(v, n),
        "prim": _untile(prim, n),
    }


def bvh_any(packed, origins, dirs, tmin=1e-4, tmax=1e6):
    if isinstance(packed, PackedBVHSet):
        # retire already-hit lanes for later chunks (tmax < tmin accepts
        # nothing and expands no boxes): the occluded-lane analog of the
        # closest-hit ray shortening above
        hit = None
        tmax_arr = jnp.broadcast_to(
            jnp.asarray(tmax, jnp.float32), origins.shape[:1]
        )
        for part in packed.parts:
            cur = bvh_any(part, origins, dirs, tmin, tmax_arr)
            hit = cur if hit is None else (hit | cur)
            tmax_arr = jnp.where(hit, -1.0, tmax_arr)
        return hit
    rays, n = pack_rays_tiled(origins, dirs, tmin, tmax)
    t, u, v, prim = _run(packed, rays, any_hit=True)
    # dead lanes (tmax < tmin, e.g. chunk-retired rays) latch prim=0 inside
    # the kernel for the early-exit check; normalize them back to "no hit"
    # so every any-hit backend agrees on the full input domain
    alive = jnp.broadcast_to(
        jnp.asarray(tmax, jnp.float32), origins.shape[:1]
    ) >= jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), origins.shape[:1])
    return (_untile(prim, n) >= 0) & alive


def sort_rays_for_traversal(origins, dirs, dead=None, dir_grid: int = 0):
    """Morton-ish coherence sort key for bounce rays: quantized direction
    bin + origin morton. `dead` lanes (masked-off rays, tmax < tmin)
    sort LAST so they fill whole packets that retire in ~2 node steps
    instead of polluting live packets. Returns (order, inverse_order).

    dir_grid=0 (default): 8 direction octants, the packet-kernel sweet
    spot. dir_grid=N: 6*N^2 bins (major-axis face x NxN face cells) — the
    finer angular grouping the stream kernel's per-128-ray interval cull
    needs on dense scenes (sim_stream.py: 96 bins halve incoherent-ray
    candidate pops vs octants; 384 bins over-split and lose position
    coherence)."""
    from .lbvh import morton_codes

    lo = jnp.min(origins, axis=0)
    hi = jnp.max(origins, axis=0)
    om = morton_codes(origins, lo, hi)
    if dir_grid:
        g = dir_grid
        ax = jnp.argmax(jnp.abs(dirs), axis=1)
        m = jnp.take_along_axis(dirs, ax[:, None], 1)[:, 0]
        am = jnp.maximum(jnp.abs(m), 1e-12)
        u = jnp.take_along_axis(dirs, ((ax + 1) % 3)[:, None], 1)[:, 0] / am
        v = jnp.take_along_axis(dirs, ((ax + 2) % 3)[:, None], 1)[:, 0] / am
        face = ax.astype(jnp.uint32) * 2 + (m > 0).astype(jnp.uint32)
        qa = jnp.clip((u + 1.0) * 0.5 * g, 0, g - 1).astype(jnp.uint32)
        qb = jnp.clip((v + 1.0) * 0.5 * g, 0, g - 1).astype(jnp.uint32)
        dbin = (face * g + qa) * g + qb  # < 6*g^2
        bits = max(int(6 * g * g - 1).bit_length(), 3)
        key = (dbin << (31 - bits)) | (om >> (bits + 1))
    else:
        oct_key = (
            (dirs[:, 0] > 0).astype(jnp.uint32) * 4
            + (dirs[:, 1] > 0).astype(jnp.uint32) * 2
            + (dirs[:, 2] > 0).astype(jnp.uint32)
        )
        key = (oct_key << 28) | (om >> 4)
    if dead is not None:
        key = key | (dead.astype(jnp.uint32) << 31)
    order = jnp.argsort(key)
    inverse = jnp.argsort(order)
    return order, inverse
