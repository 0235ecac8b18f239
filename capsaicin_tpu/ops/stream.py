"""DMA-streaming candidate traversal: the dense-scene TraceRay backend.

The fourth traversal generation, built from the round-3 measurements
(PERF.md): the Pallas packet kernel is bound by the 1024-ray packet's
union footprint times the per-node scalar step cost (~450-530 steps x
~400ns), while the pure-XLA wavefront/cull backends are bound by XLA
per-index gather cost (~17ns/index). This kernel removes BOTH classes:

  * **No stack walk at all.** Each 128-ray sub-packet tests its
    conservative interval bounds against EVERY leaf-block AABB in one
    vectorized pass ([8 sub-packets x B blocks] slab arithmetic on the
    VPU) — the 250k-tri colonnade has only ~8k blocks of 32 tris, so the
    "brute-force cull" is ~80 vector ops over [8, 8192], far cheaper than
    hundreds of serialized scalar node steps. Candidate sets shrink 8x
    versus the 1024-ray packet union (the footprint is per-128 rays).
  * **No XLA gathers.** Candidate triangle blocks are streamed HBM->VMEM
    with explicit double-buffered `pltpu.make_async_copy` DMAs, one block
    per sub-packet per step, overlapped with Moller-Trumbore on the
    previous block. The per-sub-packet block index is min-extracted lazily
    from the candidate mask each step, so no candidate list is ever
    materialized and there are NO budgets or overflow fallbacks — the
    stream loop runs exactly until every sub-packet's mask is empty.
  * **Exact-footprint MT.** Triangle math runs on [8, 128] tiles where
    each SUBLANE is a different sub-packet testing its OWN block (the DMA
    interleaves 8 blocks into one [rows, 8, 128] scratch), so every
    ray-triangle pair tested is one some sub-packet actually needs —
    ~18x fewer pair tests than the 1024-wide shared-leaf packet kernel.
  * **Ray shortening between steps.** Before each extraction the mask is
    re-pruned against the gang's current best-t (closest) / undecided
    lanes (any-hit, the RAY_FLAG_ACCEPT_FIRST_HIT analog, lighting.h:48),
    so blocks behind found hits are never fetched. Extraction pops the
    NEAREST remaining block (min conservative entry distance) by default,
    so best-t drops as early as possible and the re-prune retires whole
    distant block ranges (`near_first=False` restores index order).
  * **Whole-scene, no chunking.** Triangle data stays in HBM (only the
    [8, B] box table is VMEM-resident), so one structure covers scenes far
    beyond the packet kernel's 150k-tri VMEM cap.

Callers should sort incoherent (bounce) rays first, as with every packet
backend (render.traversal.with_ray_sorting).

Semantics match ops.intersect exactly (same epsilons, no backface culling).
Reference parity: TraceRay closest/any over the scene TLAS
(raytracing_system.cpp:1068-1073; lighting.h:48-55 any-hit early accept).
The host median-split builder stands in for the driver's PREFER_FAST_TRACE
SAH build (blas_system.cpp:44).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lbvh import build_median_bvh
from .pallas_traverse import pack_rays_tiled

SUB = 8     # sub-packets per gang (sublanes)
LANE = 128  # rays per sub-packet (lanes)
GANG = SUB * LANE
TRIS_PER_ROW = 8   # 8 tris x 10 floats per 128-lane row (shared layout
                   # contract with pallas_traverse; >8 spills registers)
BLOCK_TRIS = 32    # tris per candidate block (= BVH leaf): granularity of
                   # the cull mask, the DMA, and the stream step
INF = 1e30
BIGI = 2**30  # empty-candidate sentinel (>> any block id)


def _use_interpret():
    return jax.default_backend() != "tpu"


@jax.tree_util.register_pytree_node_class
class StreamBVH:
    """Stream-traversal scene structure (pytree).

    boxes: [8, Bp] f32, VMEM-resident at trace time. Row layout per block
           (lanes = blocks, Bp = B padded to 128): lo.xyz (rows 0-2),
           hi.xyz (rows 3-5), valid flag (row 6: 1.0 real / 0.0 padding —
           interval arithmetic over padding's inverted boxes would
           otherwise hit every packet), row 7 unused.
    tris:  [B, rows, 128] f32, HBM-resident at trace time; block b row r
           holds 8 triangles, tri j at lanes j*10..+10 as
           (v0 xyz, e1 xyz, e2 xyz, tid+1); id 0 marks padding.
    """

    def __init__(self, boxes, tris, n_blocks: int, block_tris: int = BLOCK_TRIS):
        self.boxes = boxes
        self.tris = tris
        self.n_blocks = n_blocks
        self.block_tris = block_tris

    @property
    def rows(self) -> int:
        return self.block_tris // TRIS_PER_ROW

    def tree_flatten(self):
        return (self.boxes, self.tris), (self.n_blocks, self.block_tris)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])


def build_stream_bvh(tris, block_tris: int = BLOCK_TRIS) -> StreamBVH:
    """tris [T,3,3] -> StreamBVH. Host median-split build (NumPy: eager jnp
    ops cost a device round trip each on tunneled TPUs); only the two final
    transfers touch the device."""
    import numpy as np

    tris = np.asarray(tris)
    bvh = build_median_bvh(tris, leaf_size=block_tris, to_device=False)
    b = bvh.n_leaves

    nodes_min = np.asarray(bvh.nodes_min)
    nodes_max = np.asarray(bvh.nodes_max)
    leaf_lo = nodes_min[b:]  # implicit heap: leaves at [n_leaves, 2n)
    leaf_hi = nodes_max[b:]
    valid = (leaf_lo[:, 0] <= leaf_hi[:, 0]).astype(np.float32)

    bp = max(-(-b // LANE) * LANE, LANE)
    boxes = np.zeros((8, bp), np.float32)
    boxes[0:3, :b] = leaf_lo.T
    boxes[3:6, :b] = leaf_hi.T
    boxes[6, :b] = valid

    rows = block_tris // TRIS_PER_ROW
    rec = np.concatenate(
        [np.asarray(bvh.tri_v0), np.asarray(bvh.tri_e1),
         np.asarray(bvh.tri_e2),
         (np.asarray(bvh.tri_id) + 1).astype(np.float32)[:, None]], axis=1,
    ).astype(np.float32)  # [B*block_tris, 10]
    tri_rows = np.zeros((b, rows, 128), np.float32)
    tri_rows[:, :, : TRIS_PER_ROW * 10] = rec.reshape(b, rows, TRIS_PER_ROW * 10)
    return StreamBVH(jnp.asarray(boxes), jnp.asarray(tri_rows), b, block_tris)


def _safe_inv(d):
    tiny = jnp.abs(d) < 1e-12
    return jnp.where(tiny, jnp.where(d < 0, -1e12, 1e12),
                     1.0 / jnp.where(tiny, 1.0, d))


def _unpack_rays(rays_ref):
    """rays_ref [1, 8, SUB, LANE] -> per-field [SUB, LANE] arrays."""
    return (rays_ref[0, 0], rays_ref[0, 1], rays_ref[0, 2], rays_ref[0, 3],
            rays_ref[0, 4], rays_ref[0, 5], rays_ref[0, 6], rays_ref[0, 7])


def _sub_packet_bounds(live, ox, oy, oz, dx, dy, dz, tmin, tmax):
    """Conservative per-sub-packet interval bounds over live lanes."""
    big = jnp.float32(INF)

    def lo_of(x):
        return jnp.min(jnp.where(live, x, big), axis=1, keepdims=True)

    def hi_of(x):
        return jnp.max(jnp.where(live, x, -big), axis=1, keepdims=True)

    o_lo = (lo_of(ox), lo_of(oy), lo_of(oz))  # [8,1] each
    o_hi = (hi_of(ox), hi_of(oy), hi_of(oz))
    inv = (_safe_inv(dx), _safe_inv(dy), _safe_inv(dz))
    i_lo = tuple(lo_of(c) for c in inv)
    i_hi = tuple(hi_of(c) for c in inv)
    tmin_lo = lo_of(tmin)
    tcap0 = hi_of(tmax)
    any_live = jnp.any(live, axis=1, keepdims=True)
    return o_lo, o_hi, i_lo, i_hi, tmin_lo, tcap0, any_live


def _slab(boxes_ref, lane_lo, lane_hi, bnds):
    """Interval slab test of boxes in lanes [lane_lo, lane_hi) vs each
    sub-packet's conservative ray bounds -> (tn conservative entry, hit)."""
    o_lo, o_hi, i_lo, i_hi, tmin_lo, tcap0, any_live = bnds
    tn = None
    tf = None
    for ax in range(3):
        blo = boxes_ref[ax : ax + 1, lane_lo:lane_hi]
        bhi = boxes_ref[ax + 3 : ax + 4, lane_lo:lane_hi]
        a0l = blo - o_hi[ax]              # [8, W] interval endpoints
        a0h = blo - o_lo[ax]
        a1l = bhi - o_hi[ax]
        a1h = bhi - o_lo[ax]

        def prods(al, ah, il=i_lo[ax], ih=i_hi[ax]):
            p1 = al * il
            p2 = al * ih
            p3 = ah * il
            p4 = ah * ih
            return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                    jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

        l0, h0 = prods(a0l, a0h)
        l1, h1 = prods(a1l, a1h)
        alo = jnp.minimum(l0, l1)
        ahi = jnp.maximum(h0, h1)
        tn = alo if tn is None else jnp.maximum(tn, alo)
        tf = ahi if tf is None else jnp.minimum(tf, ahi)
    hit = (
        (tn <= tf) & (tf >= tmin_lo) & (tn <= tcap0)
        & (boxes_ref[6:7, lane_lo:lane_hi] > 0) & any_live
    )
    return tn, hit


def _count_kernel(rays_ref, boxes_ref, n_out):
    """Per-sub-packet candidate-count pass: one cull, popcount per row.
    Output [1, SUB, LANE] with the count broadcast across lanes."""
    ox, oy, oz, dx, dy, dz, tmin, tmax = _unpack_rays(rays_ref)
    live = tmax >= tmin
    bnds = _sub_packet_bounds(live, ox, oy, oz, dx, dy, dz, tmin, tmax)
    _, hit = _slab(boxes_ref, 0, boxes_ref.shape[1], bnds)
    n_out[0] = jnp.broadcast_to(
        jnp.sum(hit.astype(jnp.float32), axis=1, keepdims=True), (SUB, LANE))


def _stream_kernel(
    n_blocks, rows, any_hit, near_first, hier,
    rays_ref, boxes_ref, tris_hbm,
    t_out, u_out, v_out, p_out,
    c1_ref, c2_ref, tblock_ref, sem_ref,
):
    """One gang. Candidate-state scratch layout depends on `hier`:

    flat: c1_ref [8, Bp] i32 candidate mask (block id or BIGI),
          c2_ref [8, Bp] f32 conservative entry distances. Extraction
          re-scans the full Bp lanes every step (~Bp/128 tiles x ~6 ops).
    hier: c1_ref [G*8, 128] f32 `pend` — row g*8+s holds sub-packet s's
          entry distances for block group g (block id = g*128 + lane),
          +INF = not a candidate / consumed; c2_ref [8, Gp] f32 `grp` —
          per-(sub-packet, group) min of pend. Extraction scans the ONE
          [8, Gp] group-min tile, then one dynamically-indexed [1, 128]
          pend row per sub-packet: O(Bp/128 + 128) instead of O(Bp) —
          the two-level structure cuts the per-step extraction cost ~6x
          at colonnade scale (Bp=8192) while popping in the exact same
          nearest-first (tnear, block-id) order.
    """
    ox, oy, oz, dx, dy, dz, tmin, tmax = _unpack_rays(rays_ref)
    live = tmax >= tmin  # [8, 128]
    big = jnp.float32(INF)

    t_out[0, 0] = tmax
    u_out[0, 0] = jnp.zeros((SUB, LANE), jnp.float32)
    v_out[0, 0] = jnp.zeros((SUB, LANE), jnp.float32)
    if any_hit:
        # dead lanes latch a fake hit so sub-packets retire when every
        # live lane has decided (pallas_traverse convention)
        p_out[0, 0] = jnp.where(live, -1, 0).astype(jnp.int32)
    else:
        p_out[0, 0] = jnp.full((SUB, LANE), -1, jnp.int32)

    # ---- cull: every sub-packet vs every block box, one vector pass ----
    bnds = _sub_packet_bounds(live, ox, oy, oz, dx, dy, dz, tmin, tmax)

    def slab(lane_lo, lane_hi):
        return _slab(boxes_ref, lane_lo, lane_hi, bnds)

    if hier:
        n_grp = boxes_ref.shape[1] // LANE
        gp = c2_ref.shape[1]
        giota = jax.lax.broadcasted_iota(jnp.int32, (SUB, gp), 1)
        grp = jnp.full((SUB, gp), big, jnp.float32)
        for g in range(n_grp):
            tn_g, hit_g = slab(g * LANE, (g + 1) * LANE)
            pend = jnp.where(hit_g, tn_g, big)  # [8, 128]
            c1_ref[g * SUB : (g + 1) * SUB, :] = pend
            gmin = jnp.min(pend, axis=1, keepdims=True)  # [8, 1]
            grp = jnp.where(giota == g, gmin, grp)
        c2_ref[:] = grp
    else:
        tn, hit = slab(0, boxes_ref.shape[1])
        iota = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
        c1_ref[:] = jnp.where(hit, iota, BIGI)
        c2_ref[:] = tn

    # ---- stream loop: extract next block per sub-packet, DMA, MT ----
    def t_cap_now():
        """Per-sub-packet pruning cap: no block whose conservative entry
        distance exceeds every undecided ray's reach can contribute."""
        if any_hit:
            undecided = live & (p_out[0, 0] < 0)
            return jnp.max(jnp.where(undecided, tmax, -big), axis=1,
                           keepdims=True)
        t_best = t_out[0, 0]
        return jnp.max(jnp.where(live, jnp.minimum(t_best, tmax), -big),
                       axis=1, keepdims=True)

    def extract_flat():
        """Full-width scan pop; returns (valid [8,1] bool, blk scalars)."""
        cand = jnp.where(c2_ref[:] > t_cap_now(), BIGI, c1_ref[:])
        if near_first:
            # pop the NEAREST remaining block (min conservative entry
            # distance, ties broken by index): closest-hit t_best drops as
            # early as possible, so the t_cap re-prune above retires whole
            # distant block ranges instead of streaming them
            has = cand < BIGI
            tn = jnp.where(has, c2_ref[:], big)
            mt = jnp.min(tn, axis=1, keepdims=True)
            pick = jnp.where(tn == mt, cand, BIGI)
            m = jnp.min(pick, axis=1, keepdims=True)  # [8,1]
        else:
            m = jnp.min(cand, axis=1, keepdims=True)  # [8,1]
        c1_ref[:] = jnp.where(cand == m, BIGI, cand)
        return m < BIGI, [m[s, 0] for s in range(SUB)]

    def extract_hier():
        """Two-level pop in the same nearest-first (tnear, id) order: one
        [8, Gp] scan picks each sub-packet's min-entry GROUP (group-level
        t_cap pruning included), then one dynamic [1,128] pend-row read
        per sub-packet picks the lane, consumes it, and refreshes that
        group's min."""
        liota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        gp = c2_ref.shape[1]
        giota1 = jax.lax.broadcasted_iota(jnp.int32, (1, gp), 1)
        grp = c2_ref[:]                                  # [8, Gp]
        capped = jnp.where(grp <= t_cap_now(), grp, big)
        mg = jnp.min(capped, axis=1, keepdims=True)      # [8, 1]
        valid = mg < big
        gsel = jnp.min(
            jnp.where(capped == mg, jax.lax.broadcasted_iota(
                jnp.int32, (SUB, gp), 1), BIGI),
            axis=1, keepdims=True)                       # [8, 1]
        blks = []
        for s in range(SUB):
            has = mg[s, 0] < big  # scalar compare (no bool-vector extract)
            gs = jnp.clip(gsel[s, 0], 0, max(n_grp - 1, 0))
            row = c1_ref[gs * SUB + s, :].reshape(1, LANE)
            mrow = jnp.min(row, axis=1, keepdims=True)   # [1, 1]
            ln = jnp.min(jnp.where(row == mrow, liota, BIGI),
                         axis=1, keepdims=True)          # [1, 1]
            blks.append(jnp.where(has, gs * LANE + ln[0, 0], BIGI))

            @pl.when(has)
            def _(s=s, gs=gs, row=row, ln=ln):
                row2 = jnp.where(liota == ln, big, row)
                c1_ref[gs * SUB + s, :] = row2.reshape(LANE)
                newmin = jnp.min(row2, axis=1, keepdims=True)
                c2_ref[s : s + 1, :] = jnp.where(
                    giota1 == gs, newmin, c2_ref[s : s + 1, :])
        return valid, blks

    extract = extract_hier if hier else extract_flat

    def start_dmas(slot, blks):
        for s in range(SUB):
            blk = jnp.clip(blks[s], 0, n_blocks - 1)
            pltpu.make_async_copy(
                tris_hbm.at[blk],
                tblock_ref.at[slot, :, s, :],
                sem_ref.at[slot, s],
            ).start()

    def wait_dmas(slot):
        for s in range(SUB):
            pltpu.make_async_copy(
                tris_hbm.at[0],
                tblock_ref.at[slot, :, s, :],
                sem_ref.at[slot, s],
            ).wait()

    def mt_block(slot, valid_vec):
        """Test each sub-packet's DMA'd block against its own 128 rays:
        [8,128] tiles where sublane s carries sub-packet s's triangle
        (fields broadcast from [8,1] lane slices of the interleaved
        scratch). Same epsilons as ops.intersect (the oracle)."""
        t_best = t_out[0, 0]
        u = u_out[0, 0]
        v = v_out[0, 0]
        prim = p_out[0, 0]
        for r in range(rows):
            row = tblock_ref[slot, r]  # [8, 128]
            for j in range(TRIS_PER_ROW):
                base = j * 10

                def fld(q, row=row, base=base):
                    return row[:, base + q : base + q + 1]  # [8,1]

                v0x, v0y, v0z = fld(0), fld(1), fld(2)
                e1x, e1y, e1z = fld(3), fld(4), fld(5)
                e2x, e2y, e2z = fld(6), fld(7), fld(8)
                tidf = fld(9)

                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(
                    jnp.abs(det) > 1e-12,
                    1.0 / jnp.where(det == 0, 1.0, det), 0.0,
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
                    & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt > tmin) & (tt < jnp.minimum(tmax, t_best))
                    & (tidf > 0) & valid_vec
                )
                if any_hit:
                    ok = ok & (prim < 0)
                t_best = jnp.where(ok, tt, t_best)
                u = jnp.where(ok, uu, u)
                v = jnp.where(ok, vv, v)
                prim = jnp.where(ok, tidf.astype(jnp.int32) - 1, prim)
        t_out[0, 0] = t_best
        u_out[0, 0] = u
        v_out[0, 0] = v
        p_out[0, 0] = prim

    # double-buffered pipeline: extraction + DMA of step k+1 overlap MT of
    # step k; exactly one started DMA set is outstanding at loop exit.
    # The valid mask is carried as i32, NOT bool: libtpu's Mosaic backend
    # (v5e terminal, Nov-2025 vintage) fails to legalize an i1 vector
    # flowing through scf.yield ("failed to legalize operation 'scf.yield'",
    # in_layout vpad<32,...> on vector<8x128xi1>) — first real-hardware
    # compile, round 5. Pure type change; bit-equal results.
    v0, b0 = extract()
    start_dmas(0, b0)

    def cond(carry):
        valid_i, _ = carry
        return jnp.any(valid_i > 0)

    def body(carry):
        valid_i, parity = carry
        v2, b2 = extract()
        start_dmas(1 - parity, b2)
        wait_dmas(parity)
        mt_block(parity, valid_i > 0)
        return v2.astype(jnp.int32), 1 - parity

    _, p_fin = jax.lax.while_loop(
        cond, body, (v0.astype(jnp.int32), jnp.int32(0)))
    wait_dmas(p_fin)  # drain the final (unconsumed) DMA set


def _run(sbvh: StreamBVH, rays_tiled, any_hit: bool, near_first: bool = True,
         hier: bool = True):
    np_ = rays_tiled.shape[0]
    bp = sbvh.boxes.shape[1]
    kernel = functools.partial(
        _stream_kernel, sbvh.n_blocks, sbvh.rows, any_hit, near_first, hier,
    )
    if hier:
        n_grp = bp // LANE
        gp = max(-(-n_grp // LANE) * LANE, LANE)
        cand_scratch = [
            pltpu.VMEM((n_grp * SUB, LANE), jnp.float32),  # pend rows
            pltpu.VMEM((SUB, gp), jnp.float32),            # group mins
        ]
    else:
        cand_scratch = [
            pltpu.VMEM((SUB, bp), jnp.int32),      # candidate mask
            pltpu.VMEM((SUB, bp), jnp.float32),    # block entry dists
        ]
    f32 = jax.ShapeDtypeStruct((np_, 1, SUB, LANE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((np_, 1, SUB, LANE), jnp.int32)
    out_spec = pl.BlockSpec(
        (1, 1, SUB, LANE), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM)
    t, u, v, prim = pl.pallas_call(
        kernel,
        grid=(np_,),
        in_specs=[
            pl.BlockSpec((1, 8, SUB, LANE), lambda p: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sbvh.boxes.shape, lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # tris stay in HBM
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(f32, f32, f32, i32),
        scratch_shapes=cand_scratch + [
            pltpu.VMEM((2, sbvh.rows, SUB, LANE), jnp.float32),  # tri blocks
            pltpu.SemaphoreType.DMA((2, SUB)),
        ],
        interpret=_use_interpret(),
    )(rays_tiled, sbvh.boxes, sbvh.tris)
    return t, u, v, prim


def _count_candidates(sbvh: StreamBVH, rays_tiled):
    """Candidate-count pre-pass: one interval cull per gang, returning the
    per-sub-packet candidate block count [np_*SUB] (float32)."""
    np_ = rays_tiled.shape[0]
    out = pl.pallas_call(
        _count_kernel,
        grid=(np_,),
        in_specs=[
            pl.BlockSpec((1, 8, SUB, LANE), lambda p: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sbvh.boxes.shape, lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, SUB, LANE), jnp.float32),
        interpret=_use_interpret(),
    )(rays_tiled, sbvh.boxes)
    return out[:, :, 0].reshape(-1)


def _balance(rays_tiled, counts):
    """Repack sub-packets into gangs by DESCENDING candidate count so each
    gang's 8 sublanes carry near-equal work. The stream loop runs until the
    slowest sub-packet of a gang empties, so heterogeneous gangs waste
    sublane-steps; grouping similar loads together converts that idle into
    speed (sim_stream.py: real bounce 1931 -> 809 steps/gang, ~100% sublane
    efficiency). NOTE: similar loads must share a gang — round-robin
    spreading of heavy sub-packets measured 1.5x WORSE than no balancing.
    Returns (balanced rays_tiled, inverse sub-packet permutation)."""
    np_ = rays_tiled.shape[0]
    rank = jnp.argsort(-counts)
    rt = rays_tiled.transpose(0, 2, 1, 3).reshape(np_ * SUB, 8, LANE)
    rt = rt[rank].reshape(np_, SUB, 8, LANE).transpose(0, 2, 1, 3)
    return rt, jnp.argsort(rank)


def _unbalance(x, inv):
    """Undo _balance on a [np_, 1, SUB, LANE] kernel output."""
    np_ = x.shape[0]
    return x.reshape(np_ * SUB, LANE)[inv].reshape(np_, 1, SUB, LANE)


def _untile(x, n):
    return x.reshape(-1)[:n]


def stream_closest(sbvh: StreamBVH, origins, dirs, tmin=0.0, tmax=1e6,
                   near_first: bool = True, hier: bool = True,
                   balance: bool = False):
    rays, n = pack_rays_tiled(origins, dirs, tmin, tmax)
    if balance:
        rays, inv = _balance(rays, _count_candidates(sbvh, rays))
    t, u, v, prim = _run(sbvh, rays, any_hit=False, near_first=near_first,
                         hier=hier)
    if balance:
        t, u, v, prim = (_unbalance(x, inv) for x in (t, u, v, prim))
    prim = _untile(prim, n)
    return {
        "t": jnp.where(prim < 0, jnp.float32(INF), _untile(t, n)),
        "u": _untile(u, n),
        "v": _untile(v, n),
        "prim": prim,
    }


def stream_any(sbvh: StreamBVH, origins, dirs, tmin=1e-4, tmax=1e6,
               near_first: bool = True, hier: bool = True,
               balance: bool = False):
    rays, n = pack_rays_tiled(origins, dirs, tmin, tmax)
    if balance:
        rays, inv = _balance(rays, _count_candidates(sbvh, rays))
    t, u, v, prim = _run(sbvh, rays, any_hit=True, near_first=near_first,
                         hier=hier)
    if balance:
        prim = _unbalance(prim, inv)
    # dead lanes latch prim=0 in-kernel for the retirement check; normalize
    alive = jnp.broadcast_to(
        jnp.asarray(tmax, jnp.float32), origins.shape[:1]
    ) >= jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), origins.shape[:1])
    return (_untile(prim, n) >= 0) & alive
