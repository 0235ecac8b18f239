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
      nodes: 16 nodes x 8 floats per row; the in-row record is aligned to
             lane 0 with a dynamic lane rotate (pltpu.roll) and read via
             static slice-broadcasts — the whole step stays on the VPU
      tris:  8 triangles x 10 floats per row; a 32-tri leaf spans 4 rows,
             iterated with a fori_loop (in-row lanes are STATIC via the
             unrolled 8-tri body, so extraction is free)
    Triangle ids ride along as floats (exact below 2^24).
  * The DFS successor is the same trailing-ones arithmetic as
    ops.traverse._dfs_next — no stack, no parent pointers.
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
NODES_PER_ROW = 16  # 16 nodes x 8 floats = 128 lanes
# VMEM cap per sub-tree: tris rows*512B + nodes. Scenes above this are split
# into morton-ordered chunks, each with its own VMEM-resident sub-BVH, traced
# sequentially and merged (spatially disjoint chunks exit each other's trees
# in a few steps).
CHUNK_TRIS_CAP = 150_000


def pack_tri_rows(v0, e1, e2, tri_id, per_row: int = TRIS_PER_ROW):
    """[T,3]x3 + [T] -> [ceil(T/per_row), 128] rows, tri j at lanes
    j*10..+10 as (v0 xyz, e1 xyz, e2 xyz, tid+1); 0 id marks padding."""
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

    nodes: [ceil(2L/16), 128] f32 — node k at row k//16, lanes (k%16)*8..+6
           as (min xyz, max xyz); slots 6,7 unused
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
    rows_n = -(-n2 // NODES_PER_ROW)
    node_rec = jnp.concatenate(
        [bvh.nodes_min, bvh.nodes_max, jnp.zeros((n2, 2), jnp.float32)], axis=1
    )  # [2L, 8]
    pad = rows_n * NODES_PER_ROW - n2
    if pad:
        node_rec = jnp.concatenate([node_rec, jnp.zeros((pad, 8), jnp.float32)])
    nodes = node_rec.reshape(rows_n, NODES_PER_ROW * 8)

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


def _dfs_next_scalar(k):
    """Scalar DFS successor: strip trailing ones, step right (1 = done)."""
    x = (~k.astype(jnp.uint32)) & (k.astype(jnp.uint32) + 1)
    x = x - 1
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    trailing = ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)
    up = k >> trailing
    return jnp.where(up <= 1, 1, up + 1)


INTERLEAVE = 1  # independent packet walks per kernel instance. Measured on
# v5e: G=2 runs ~20x SLOWER (17.9s vs 0.94s colonnade primary) — the extra
# live tiles across the per-walk branch regions push the kernel over the
# vector-register spill cliff. Keep 1; the latency-overlap idea does not
# survive Mosaic register allocation.


def _traverse_kernel(
    n_leaves, tri_rows, per_row, leaf_rows, any_hit, interpret, g,
    rays_ref, nodes_ref, tris_ref,
    t_out, u_out, v_out, p_out,
):
    # dynamic lane rotate: pltpu.roll on hardware, jnp.roll when interpreted
    roll_fn = jnp.roll if interpret else pltpu.roll

    max_steps = 4 * n_leaves + 64  # full DFS bound (safety cap)

    def safe_inv(d):
        tiny = jnp.abs(d) < 1e-12
        return jnp.where(tiny, jnp.where(d < 0, -1e12, 1e12), 1.0 / jnp.where(tiny, 1.0, d))

    walks = []
    for w in range(g):
        ox = rays_ref[w, 0]
        oy = rays_ref[w, 1]
        oz = rays_ref[w, 2]
        dx = rays_ref[w, 3]
        dy = rays_ref[w, 4]
        dz = rays_ref[w, 5]
        tmin = rays_ref[w, 6]
        tmax = rays_ref[w, 7]
        walks.append(dict(
            ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
            ix=safe_inv(dx), iy=safe_inv(dy), iz=safe_inv(dz),
            tmin=tmin, tmax=tmax,
        ))
        # Traversal state (t/u/v/prim tiles) lives IN THE OUTPUT REFS and is
        # mutated in place: carrying [8,128] tiles through lax.while/cond
        # costs a tile copy per carry per step. The while carry is scalars.
        t_out[w, 0] = tmax
        u_out[w, 0] = jnp.zeros((SUB, LANE), jnp.float32)
        v_out[w, 0] = jnp.zeros((SUB, LANE), jnp.float32)
        if any_hit:
            # dead lanes (padding, or retired by PackedBVHSet chunk
            # culling: tmax < tmin) latch a fake hit so the every-lane-done
            # early exit can actually fire on partial packets
            p_out[w, 0] = jnp.where(tmax < tmin, 0, -1).astype(jnp.int32)
        else:
            p_out[w, 0] = jnp.full((SUB, LANE), -1, jnp.int32)

    def box_test(w, k):
        """Node AABB vs walk w's packet. Extraction: rotate the packed row
        so the node's 8-float record starts at lane 0, then static rank-0
        extracts (scalar->tile broadcast is native)."""
        r = walks[w]
        row = nodes_ref[k // NODES_PER_ROW, :].reshape(1, 128)
        slot = (k % NODES_PER_ROW) * 8
        rec = roll_fn(row, (128 - slot) % 128, axis=1)
        tx0 = (rec[0, 0] - r["ox"]) * r["ix"]
        tx1 = (rec[0, 3] - r["ox"]) * r["ix"]
        ty0 = (rec[0, 1] - r["oy"]) * r["iy"]
        ty1 = (rec[0, 4] - r["oy"]) * r["iy"]
        tz0 = (rec[0, 2] - r["oz"]) * r["iz"]
        tz1 = (rec[0, 5] - r["oz"]) * r["iz"]
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        hit_box = (t_near <= t_far) & (t_far >= r["tmin"]) & (t_near <= t_out[w, 0])
        if any_hit:
            # retired lanes (prim latched) stop expanding boxes
            hit_box = hit_box & (p_out[w, 0] < 0)
        return hit_box

    def leaf_tests(w, k):
        r = walks[w]
        ox, oy, oz = r["ox"], r["oy"], r["oz"]
        dx, dy, dz = r["dx"], r["dy"], r["dz"]
        tmin, tmax = r["tmin"], r["tmax"]

        def row_body(i, c):
            t_best = t_out[w, 0]
            u = u_out[w, 0]
            v = v_out[w, 0]
            prim = p_out[w, 0]
            rr = jnp.minimum((k - n_leaves) * leaf_rows + i, tri_rows - 1)
            trow = tris_ref[rr, :]  # [128]; in-row lanes are static below
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
            t_out[w, 0] = t_best
            u_out[w, 0] = u
            v_out[w, 0] = v
            p_out[w, 0] = prim
            return c

        if leaf_rows == 1:
            row_body(0, 0)
        else:
            # loop (not unroll) over leaf rows: the live set stays at one
            # row's 8 triangles, below the register-spill cliff
            jax.lax.fori_loop(0, leaf_rows, row_body, 0)

    def body(state):
        step = state[0]
        ks = state[1:1 + g]
        lives = state[1 + g:]

        # all walks' box tests first: independent scalar/vector chains the
        # scheduler can overlap; branches (leaf bodies) come after
        tests = [box_test(w, ks[w]) for w in range(g)]

        new_ks = []
        new_lives = []
        for w in range(g):
            k = ks[w]
            any_box = jnp.any(tests[w])
            is_leaf = k >= n_leaves
            take_leaf = any_box & is_leaf

            @pl.when(take_leaf)
            def _(w=w, k=k):
                leaf_tests(w, k)

            live = lives[w]
            if any_hit:
                # refresh the early-exit flag only after leaf work
                live = jax.lax.cond(
                    take_leaf,
                    lambda _, w=w: jnp.any(p_out[w, 0] < 0),
                    lambda _, live=live: live,
                    0,
                )
            descend = any_box & (~is_leaf)
            new_ks.append(jnp.where(descend, 2 * k, _dfs_next_scalar(k)))
            new_lives.append(live)
        return (step + 1, *new_ks, *new_lives)

    def cond(state):
        step = state[0]
        ks = state[1:1 + g]
        lives = state[1 + g:]
        more = jnp.bool_(False)
        for w in range(g):
            live_w = (ks[w] > 1) & lives[w] if any_hit else (ks[w] > 1)
            more = more | live_w
        return more & (step < max_steps)

    init_lives = tuple(
        jnp.any(p_out[w, 0] < 0) if any_hit else jnp.bool_(True)
        for w in range(g)
    )
    # the root box always contains the scene; start below it
    init = (jnp.int32(0),) + (jnp.int32(2),) * g + init_lives
    jax.lax.while_loop(cond, body, init)


def _run(packed: PackedBVH, rays_tiled, any_hit: bool):
    g = INTERLEAVE
    np_ = rays_tiled.shape[0]
    if np_ % g:
        # pad with dead packets (tmax = -1 accepts nothing; under any_hit
        # they latch instantly and never stall the early exit)
        pad = jnp.zeros((g - np_ % g,) + rays_tiled.shape[1:], jnp.float32)
        pad = pad.at[:, 7].set(-1.0)
        rays_tiled = jnp.concatenate([rays_tiled, pad])
    npad = rays_tiled.shape[0]
    kernel = functools.partial(
        _traverse_kernel, packed.n_leaves, packed.tris.shape[0],
        packed.per_row, packed.leaf_rows, any_hit, _use_interpret(), g,
    )
    f32 = jax.ShapeDtypeStruct((npad, 1, SUB, LANE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((npad, 1, SUB, LANE), jnp.int32)
    out_spec = pl.BlockSpec((g, 1, SUB, LANE), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM)
    t, u, v, prim = pl.pallas_call(
        kernel,
        grid=(npad // g,),
        in_specs=[
            pl.BlockSpec((g, 8, SUB, LANE), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(packed.nodes.shape, lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(packed.tris.shape, lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(f32, f32, f32, i32),
        interpret=_use_interpret(),
    )(rays_tiled, packed.nodes, packed.tris)
    return t[:np_], u[:np_], v[:np_], prim[:np_]


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
    return _untile(prim, n) >= 0


def sort_rays_for_traversal(origins, dirs, dead=None):
    """Morton-ish coherence sort key for bounce rays: quantized direction
    octant + origin morton. `dead` lanes (masked-off rays, tmax < tmin)
    sort LAST so they fill whole packets that retire in ~2 node steps
    instead of polluting live packets. Returns (order, inverse_order)."""
    from .lbvh import morton_codes

    lo = jnp.min(origins, axis=0)
    hi = jnp.max(origins, axis=0)
    om = morton_codes(origins, lo, hi)
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
