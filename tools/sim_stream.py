#!/usr/bin/env python
"""Exact CPU step-count simulation of the stream traversal kernel.

Answers, without TPU hardware, the question that decides the colonnade
config (BASELINE config 4): how many while_loop steps does ops/stream.py
execute per 1024-ray gang, under (a) index-order vs nearest-first
extraction and (b) block sizes, on the real 1080p primary/shadow/bounce
workloads?  Each step costs roughly [extract ~5 vector ops over [8,Bp] +
one 8-block DMA (overlapped) + 32-tri MT on [8,128]] — measured per-step
cost is applied afterwards; the simulation itself mirrors the kernel's
candidate/pruning logic EXACTLY (same interval-arithmetic cull, same
conservative t_cap, same pop rule), with real per-ray Moller-Trumbore
updating t_best between steps.

Runs on CPU NumPy over a stratified sample of gangs (default every 16th)
and extrapolates. Usage:
  python tools/sim_stream.py [--target 250000] [--block 32] [--stride 16]
                             [--workload primary|shadow|bounce|all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# pure-CPU analysis tool: the env var alone is NOT enough (sitecustomize
# presets axon and would hang device init when the tunnel is down)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np

SUB, LANE = 8, 128
GANG = SUB * LANE
INF = np.float32(1e30)


def build_blocks(tris, block_tris):
    from capsaicin_tpu.ops.lbvh import build_median_bvh

    bvh = build_median_bvh(np.asarray(tris), leaf_size=block_tris,
                           to_device=False)
    b = bvh.n_leaves
    lo = np.asarray(bvh.nodes_min)[b:]
    hi = np.asarray(bvh.nodes_max)[b:]
    valid = lo[:, 0] <= hi[:, 0]
    v0 = np.asarray(bvh.tri_v0).reshape(b, block_tris, 3)
    e1 = np.asarray(bvh.tri_e1).reshape(b, block_tris, 3)
    e2 = np.asarray(bvh.tri_e2).reshape(b, block_tris, 3)
    tid = np.asarray(bvh.tri_id).reshape(b, block_tris)
    return lo, hi, valid, v0, e1, e2, tid


def build_blocks_sah(tris, block_tris, bins=16):
    """Binned-SAH leaf blocks (variable fill, padded to block_tris) ordered
    along a morton curve of leaf centers. Tighter boxes -> fewer candidate
    pops per frustum; the kernel's per-step cost is fill-independent
    (fixed rows loop), so sim steps compare directly vs build_blocks."""
    tris = np.asarray(tris, np.float32)
    pmin = tris.min(1)
    pmax = tris.max(1)
    cen = tris.mean(1)
    leaves = []

    def area(lo_, hi_):
        d = np.maximum(hi_ - lo_, 0)
        return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] \
            + d[..., 2] * d[..., 0]

    def split(idx):
        if len(idx) <= block_tris:
            leaves.append(idx)
            return
        c = cen[idx]
        clo, chi = c.min(0), c.max(0)
        best = None  # (cost, ax, plane_bin, bin_ids)
        for ax in range(3):
            ext = chi[ax] - clo[ax]
            if ext < 1e-9:
                continue
            b = np.clip(((c[:, ax] - clo[ax]) / ext * bins).astype(np.int64),
                        0, bins - 1)
            bmin = np.full((bins, 3), np.inf, np.float32)
            bmax = np.full((bins, 3), -np.inf, np.float32)
            cnt = np.zeros(bins, np.int64)
            np.minimum.at(bmin, b, pmin[idx])
            np.maximum.at(bmax, b, pmax[idx])
            np.add.at(cnt, b, 1)
            lmin = np.minimum.accumulate(bmin, 0)
            lmax = np.maximum.accumulate(bmax, 0)
            rmin = np.minimum.accumulate(bmin[::-1], 0)[::-1]
            rmax = np.maximum.accumulate(bmax[::-1], 0)[::-1]
            lcnt = np.cumsum(cnt)
            for pl in range(bins - 1):
                nl = lcnt[pl]
                nr = len(idx) - nl
                if nl == 0 or nr == 0:
                    continue
                cost = nl * area(lmin[pl], lmax[pl]) \
                    + nr * area(rmin[pl + 1], rmax[pl + 1])
                if best is None or cost < best[0]:
                    best = (cost, ax, pl, b)
        if best is None:  # all centroids coincide: arbitrary halves
            leaves.append(idx[: block_tris])
            split(idx[block_tris:])
            return
        _, ax, pl, b = best
        split(idx[b <= pl])
        split(idx[b > pl])

    split(np.arange(len(tris), dtype=np.int64))
    # morton order of leaf centers keeps hier groups (128 consecutive
    # blocks) spatially coherent
    lcen = np.stack([(pmin[ix].min(0) + pmax[ix].max(0)) * 0.5
                     for ix in leaves])
    from capsaicin_tpu.ops.lbvh import morton_codes
    import jax.numpy as jnp

    mc = np.asarray(morton_codes(
        jnp.asarray(lcen), jnp.asarray(lcen.min(0)), jnp.asarray(lcen.max(0))))
    leaves = [leaves[i] for i in np.argsort(mc, kind="stable")]

    b_ = len(leaves)
    lo = np.empty((b_, 3), np.float32)
    hi = np.empty((b_, 3), np.float32)
    v0 = np.zeros((b_, block_tris, 3), np.float32)
    e1 = np.zeros((b_, block_tris, 3), np.float32)
    e2 = np.zeros((b_, block_tris, 3), np.float32)
    tid = np.full((b_, block_tris), -1, np.int64)
    for i, ix in enumerate(leaves):
        lo[i] = pmin[ix].min(0)
        hi[i] = pmax[ix].max(0)
        k = len(ix)
        v0[i, :k] = tris[ix, 0]
        e1[i, :k] = tris[ix, 1] - tris[ix, 0]
        e2[i, :k] = tris[ix, 2] - tris[ix, 0]
        tid[i, :k] = ix
    valid = np.ones(b_, bool)
    fill = np.mean([len(ix) for ix in leaves]) / block_tris
    print(f"SAH blocks: {b_} (median builder: "
          f"{max(2, 1 << (int(np.ceil(len(tris) / block_tris)) - 1).bit_length())}"
          f"-ish), mean fill {fill:.2f}")
    return lo, hi, valid, v0, e1, e2, tid


def safe_inv(d):
    tiny = np.abs(d) < 1e-12
    return np.where(tiny, np.where(d < 0, -1e12, 1e12),
                    1.0 / np.where(tiny, 1.0, d))


def cull(lo, hi, valid, o, d, tmin, tmax):
    """Mirror of the kernel's per-sub-packet interval cull.
    o,d [S,K,3] (S sub-packets of K rays); returns hit [S,B], tn [S,B]."""
    live = tmax >= tmin  # [S,K]
    big = np.float32(INF)
    inv = safe_inv(d)

    def lo_of(x):
        return np.min(np.where(live, x, big), axis=1)  # [SUB]

    def hi_of(x):
        return np.max(np.where(live, x, -big), axis=1)

    tn = None
    tf = None
    for ax in range(3):
        o_lo, o_hi = lo_of(o[..., ax]), hi_of(o[..., ax])
        i_lo, i_hi = lo_of(inv[..., ax]), hi_of(inv[..., ax])
        blo, bhi = lo[:, ax][None, :], hi[:, ax][None, :]  # [1,B]
        a0l = blo - o_hi[:, None]
        a0h = blo - o_lo[:, None]
        a1l = bhi - o_hi[:, None]
        a1h = bhi - o_lo[:, None]

        def prods(al, ah, il=i_lo[:, None], ih=i_hi[:, None]):
            p = np.stack([al * il, al * ih, ah * il, ah * ih])
            return p.min(0), p.max(0)

        l0, h0 = prods(a0l, a0h)
        l1, h1 = prods(a1l, a1h)
        alo = np.minimum(l0, l1)
        ahi = np.maximum(h0, h1)
        tn = alo if tn is None else np.maximum(tn, alo)
        tf = ahi if tf is None else np.minimum(tf, ahi)
    tmin_lo = np.min(np.where(live, tmin, big), axis=1)
    tcap0 = np.max(np.where(live, tmax, -big), axis=1)
    any_live = live.any(axis=1)
    hit = ((tn <= tf) & (tf >= tmin_lo[:, None]) & (tn <= tcap0[:, None])
           & valid[None, :] & any_live[:, None])
    return hit, tn


def mt_block(o, d, v0, e1, e2, tid, tmin, cap):
    """Per-ray MT of one block vs 128 rays; returns per-ray best t."""
    p = np.cross(d[:, None, :], e2[None, :, :])
    det = (e1[None] * p).sum(-1)
    tv = o[:, None, :] - v0[None, :, :]
    inv_det = np.where(np.abs(det) > 1e-12,
                       1.0 / np.where(det == 0, 1.0, det), 0.0)
    u = (tv * p).sum(-1) * inv_det
    q = np.cross(tv, e1[None, :, :])
    v = (d[:, None, :] * q).sum(-1) * inv_det
    t = (e2[None] * q).sum(-1) * inv_det
    ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
          & (t > tmin[:, None]) & (t < cap[:, None]) & (tid >= 0)[None, :])
    t = np.where(ok, t, INF)
    return t.min(axis=1)


def sim_gang(lo, hi, valid, v0, e1, e2, tid, o, d, tmin, tmax,
             near_first, any_hit=False, windows=()):
    """Returns (steps, popped_blocks) for one gang.

    Mirrors the kernel's double-buffered pipeline exactly: extraction of
    step k+1 happens BEFORE Moller-Trumbore of step k, so pruning sees a
    t_best that lags the MT stream by one block.

    `windows`: optional ascending interior band boundaries (w1, w2, ...)
    for banded traversal — the gang walks band [0,w1) first with only the
    blocks whose conservative entry falls in the band as candidates, rays
    whose hit lands inside a completed band retire, survivors continue
    into the next band with shrunken union bounds and t_best as a cap.
    Exact: bands partition blocks by entry distance."""
    bounds = list(windows) + [np.inf]
    total_steps = 0
    total_popped = 0
    t_best = tmax.copy()
    decided = np.zeros(tmax.shape, bool)
    prim_found = np.zeros(tmax.shape, bool)
    live0 = tmax >= tmin
    for bi, w_hi in enumerate(bounds):
        w_lo = 0.0 if bi == 0 else bounds[bi - 1]
        if any_hit:
            und = live0 & ~decided
        else:
            und = live0 & (~prim_found | (t_best > w_lo))
        if not und.any():
            break
        s_, p_, t_best, decided, prim_found = _sim_band(
            lo, hi, valid, v0, e1, e2, tid, o, d, tmin, tmax,
            near_first, any_hit, und, t_best, decided, prim_found,
            w_lo, w_hi)
        total_steps += s_
        total_popped += p_
    return total_steps, total_popped, t_best, decided


def _sim_band(lo, hi, valid, v0, e1, e2, tid, o, d, tmin, tmax,
              near_first, any_hit, und, t_best, decided, prim_found,
              w_lo, w_hi):
    """One distance band of sim_gang (w_lo inclusive, w_hi exclusive on
    block entry distances; und = rays still undecided entering the band)."""
    band_tmax = np.where(und, np.minimum(t_best, tmax), -1.0).astype(
        np.float32)
    hit, tn = cull(lo, hi, valid, o, d,
                   np.maximum(tmin, max(w_lo, 0.0)).astype(np.float32),
                   band_tmax)
    # candidate filter: band 0 starts at -inf (origin-containing boxes
    # have negative conservative entries); later bands partition by entry
    flo = -np.inf if w_lo == 0.0 else w_lo
    hit = hit & (tn >= flo) & (tn < w_hi)
    live = und
    n_sub = o.shape[0]
    cand = [set(np.nonzero(hit[s])[0].tolist()) for s in range(n_sub)]

    def pop_all():
        out = [None] * n_sub
        for s in range(n_sub):
            if not cand[s]:
                continue
            if any_hit:
                und = live[s] & ~decided[s]
                cap = np.max(np.where(und, tmax[s], -INF), initial=-INF)
            else:
                cap = np.max(np.where(live[s],
                                      np.minimum(t_best[s], tmax[s]), -INF),
                             initial=-INF)
            cand[s] = {b for b in cand[s] if tn[s, b] <= cap}
            if not cand[s]:
                continue
            if near_first:
                b = min(cand[s], key=lambda b: (tn[s, b], b))
            else:
                b = min(cand[s])
            cand[s].discard(b)
            out[s] = b
        return out

    prev = pop_all()
    steps = 0
    popped = sum(b is not None for b in prev)
    while any(b is not None for b in prev):
        nxt = pop_all()
        for s, b in enumerate(prev):
            if b is None:
                continue
            cap_r = np.minimum(t_best[s], tmax[s])
            tb = mt_block(o[s], d[s], v0[b], e1[b], e2[b], tid[b],
                          tmin[s], cap_r)
            if any_hit:
                decided[s] |= tb < INF
            else:
                t_best[s] = np.minimum(t_best[s], tb)
                prim_found[s] |= tb < INF
        popped += sum(b is not None for b in nxt)
        prev = nxt
        steps += 1
    return steps, popped, t_best, decided, prim_found


def pack_balanced(o, d, tmn, tmx, lo, hi, valid):
    """Count-balanced gang packing: consecutive 128-ray sub-packets are
    ordered by candidate count so similar loads share a gang (steps/gang =
    max over sub-packets). Pads to a whole gang with dead rays."""
    n = len(o)
    pad = (-n) % GANG
    if pad:
        o = np.concatenate([o, np.zeros((pad, 3), np.float32)])
        d = np.concatenate(
            [d, np.tile(np.array([[0, 0, 1]], np.float32), (pad, 1))])
        tmn = np.concatenate([tmn, np.full(pad, 1e-3, np.float32)])
        tmx = np.concatenate([tmx, np.full(pad, -1.0, np.float32)])
    o2 = o.reshape(-1, LANE, 3)
    d2 = d.reshape(-1, LANE, 3)
    tm2 = tmn.reshape(-1, LANE)
    tM2 = tmx.reshape(-1, LANE)
    counts = np.empty(len(o2), np.int64)
    for i in range(0, len(o2), 1024):
        h, _ = cull(lo, hi, valid, o2[i : i + 1024], d2[i : i + 1024],
                    tm2[i : i + 1024], tM2[i : i + 1024])
        counts[i : i + h.shape[0]] = h.sum(1)
    perm = np.argsort(-counts, kind="stable")
    ng = len(o2) // SUB
    return (o2[perm].reshape(ng, SUB, LANE, 3),
            d2[perm].reshape(ng, SUB, LANE, 3),
            tm2[perm].reshape(ng, SUB, LANE),
            tM2[perm].reshape(ng, SUB, LANE))


def ladder_bounce(lo, hi, valid, v0, e1, e2, tid, p, db, dead, args, tris):
    """Multi-round tmax-laddered bounce tracing with inter-round repacking.

    Round k traces only still-undecided rays with tmax capped at the k-th
    ladder rung — SHORT segments keep sub-packet candidate unions tight —
    then survivors are re-sorted (96-bin), re-balanced, and re-packed into
    fresh gangs with tmin advanced to the proven-empty cap. Exact: a
    closest hit found under cap c is the global closest, and [tmin, c) was
    searched exhaustively. Unlike distance BANDING (per-gang band walk, no
    repacking — PERF.md negative results), the repack concentrates far/miss
    rays into few dedicated gangs instead of poisoning every gang's tail.
    Reported steps are normalized per ROUND-1 source gang so the total is
    directly comparable to the single-round 809 steps/gang number."""
    diag = float(np.linalg.norm(
        tris.reshape(-1, 3).max(0) - tris.reshape(-1, 3).min(0)))
    rungs = [float(x) * diag for x in args.rounds.split(",") if x.strip()]
    rungs.append(np.inf)
    grid = args.dirbins or 4
    n_rays = len(p)

    order = sort_dirbins(p, db, dead, grid)
    cur_o, cur_d = p[order], db[order]
    cur_tmn = np.full(n_rays, 1e-3, np.float32)
    cur_tmx = np.where(dead[order], -1.0, 1e6).astype(np.float32)

    n_source = None
    total_steps = 0.0
    total_pops = 0.0
    for ri, rung in enumerate(rungs):
        if len(cur_o) == 0:
            break
        t0 = time.time()
        cap = np.where(cur_tmx < 0, -1.0,
                       np.minimum(cur_tmx, rung)).astype(np.float32)
        OG, DG, TM, TX = pack_balanced(cur_o, cur_d, cur_tmn, cap, lo, hi,
                                       valid)
        ng = len(OG)
        if ri == 0:
            sample = list(range(0, ng, args.stride))
            n_source = len(sample)
        else:
            sample = list(range(ng))  # survivors of the SAMPLED gangs only
        steps, pops = [], []
        und_o, und_d, und_tmn, und_tmx = [], [], [], []
        for g in sample:
            s_, p_, tb, _ = sim_gang(lo, hi, valid, v0, e1, e2, tid,
                                     OG[g], DG[g], TM[g], TX[g],
                                     True, False)
            steps.append(s_)
            pops.append(p_)
            live = TX[g] >= TM[g]
            found = tb < TX[g]  # hit strictly inside the capped range
            und = live & ~found
            if und.any() and np.isfinite(rung):
                und_o.append(OG[g][und])
                und_d.append(DG[g][und])
                # [tmin, cap) proven empty: resume just below the cap
                und_tmn.append(TX[g][und] * (1.0 - 1e-6))
                und_tmx.append(np.full(int(und.sum()), 1e6, np.float32))
        r_steps = (np.mean(steps) if ri == 0
                   else np.sum(steps) / max(n_source, 1))
        r_pops = (np.mean(pops) if ri == 0
                  else np.sum(pops) / max(n_source, 1))
        total_steps += r_steps
        total_pops += r_pops
        n_und = sum(len(x) for x in und_o)
        print(f"  rung {ri} cap={rung:.1f} gangs={len(sample)} "
              f"steps/source-gang={r_steps:.1f} pops={r_pops:.0f} "
              f"undecided={n_und} ({time.time()-t0:.1f}s)", flush=True)
        if not und_o:
            break
        cur_o = np.concatenate(und_o)
        cur_d = np.concatenate(und_d)
        cur_tmn = np.concatenate(und_tmn)
        cur_tmx = np.concatenate(und_tmx)
        ro = sort_dirbins(cur_o, cur_d, np.zeros(len(cur_o), bool), grid)
        cur_o, cur_d = cur_o[ro], cur_d[ro]
        cur_tmn, cur_tmx = cur_tmn[ro], cur_tmx[ro]
    print(f"[ladder {args.rounds}] TOTAL steps/source-gang = "
          f"{total_steps:.1f} pops={total_pops:.0f} "
          f"(single-round balanced baseline: 809)")


def gangs_of(o, d, width, height):
    """8x128-pixel-block gang order (passes._to_blocks)."""
    o = o.reshape(height // 8, 8, width // 128, 128, 3).swapaxes(1, 2)
    d = d.reshape(height // 8, 8, width // 128, 128, 3).swapaxes(1, 2)
    return (o.reshape(-1, SUB, LANE, 3), d.reshape(-1, SUB, LANE, 3))


def gangs_of_scalar(x, width, height):
    """Same pixel-block gang order for a per-ray scalar field."""
    return (x.reshape(height // 8, 8, width // 128, 128)
            .swapaxes(1, 2).reshape(-1, SUB, LANE))


def trace_primary_hits(tris, o, d, cache_path, chunk=131072, tmin=0.0):
    """Exact closest hits for the real-workload sims via the jnp BVH
    oracle (chunked; CPU jax). Cached to disk — the trace costs minutes."""
    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        if z["n"] == len(o):
            return {k: z[k] for k in ("t", "prim")}
    import jax
    import jax.numpy as jnp

    from capsaicin_tpu.ops import lbvh, traverse

    bvh = lbvh.build_lbvh(jnp.asarray(tris))
    f = jax.jit(lambda oo, dd: traverse.bvh_closest(bvh, oo, dd, tmin, 1e6))
    ts, ps = [], []
    for i in range(0, len(o), chunk):
        r = f(jnp.asarray(o[i : i + chunk]), jnp.asarray(d[i : i + chunk]))
        ts.append(np.asarray(r["t"]))
        ps.append(np.asarray(r["prim"]))
        print(f"  traced {min(i + chunk, len(o))}/{len(o)} primary rays",
              flush=True)
    t, prim = np.concatenate(ts), np.concatenate(ps)
    if cache_path:
        np.savez(cache_path, t=t, prim=prim, n=len(o))
    return {"t": t, "prim": prim}


def hit_geometry(tris, o, d, hits):
    """(hit points, shading-side geometric normals, hit mask)."""
    prim = hits["prim"]
    hitm = prim >= 0
    tri = np.asarray(tris)[np.clip(prim, 0, len(tris) - 1)]
    gn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-12)
    gn = np.where((gn * d).sum(-1, keepdims=True) > 0, -gn, gn)
    p = o + d * np.where(hitm, hits["t"], 0.0)[:, None]
    return p.astype(np.float32), gn.astype(np.float32), hitm


def sort_6d(o, d, dead, pbits=8, dbits=3):
    """6D ray-binning sort: position morton with octahedral-direction bits
    interleaved at the COARSE levels — balances origin spread against
    direction spread per 128-ray sub-packet instead of committing to one
    (octant sort = all direction first; pure morton = all position)."""
    lo_, hi_ = o.min(0), o.max(0)
    q = ((o - lo_) / np.maximum(hi_ - lo_, 1e-9)
         * (2 ** pbits - 1)).astype(np.uint64)
    ad = np.maximum(np.abs(d).sum(1), 1e-12)
    u = d[:, 0] / ad
    v = d[:, 1] / ad
    uu = np.where(d[:, 2] >= 0, u, (1 - np.abs(v)) * np.sign(u))
    vv = np.where(d[:, 2] >= 0, v, (1 - np.abs(u)) * np.sign(v))
    qd = np.stack([(uu + 1) * 0.5, (vv + 1) * 0.5], 1)
    qd = np.clip((qd * (2 ** dbits - 1)).round(), 0,
                 2 ** dbits - 1).astype(np.uint64)
    key = np.zeros(len(o), np.uint64)
    for lv in range(pbits - 1, -1, -1):  # MSB first
        for c in range(3):
            key = (key << np.uint64(1)) | ((q[:, c] >> np.uint64(lv))
                                           & np.uint64(1))
        if lv >= pbits - dbits:
            dl = np.uint64(lv - (pbits - dbits))
            for c in range(2):
                key = (key << np.uint64(1)) | ((qd[:, c] >> dl)
                                               & np.uint64(1))
    key |= dead.astype(np.uint64) << np.uint64(62)
    return np.argsort(key, kind="stable")


def sort_dirbins(o, d, dead, grid):
    """Finer-than-octant direction binning: major-axis face (6) x grid^2
    face cells, then origin morton — tests whether narrower per-sub-packet
    angular spread shrinks incoherent-ray candidate sets."""
    from capsaicin_tpu.ops.lbvh import morton_codes
    import jax.numpy as jnp

    ax = np.argmax(np.abs(d), axis=-1)
    sgn = (np.take_along_axis(d, ax[:, None], 1)[:, 0] > 0).astype(np.uint32)
    face = ax.astype(np.uint32) * 2 + sgn
    m = np.take_along_axis(d, ax[:, None], 1)[:, 0]
    u_ = np.take_along_axis(d, ((ax + 1) % 3)[:, None], 1)[:, 0] / np.abs(m)
    v_ = np.take_along_axis(d, ((ax + 2) % 3)[:, None], 1)[:, 0] / np.abs(m)
    qa = np.clip(((u_ + 1) * 0.5 * grid).astype(np.uint32), 0, grid - 1)
    qb = np.clip(((v_ + 1) * 0.5 * grid).astype(np.uint32), 0, grid - 1)
    dbin = (face * grid + qa) * grid + qb  # [0, 6*grid^2)
    bits = int(np.ceil(np.log2(6 * grid * grid)))
    om = np.asarray(morton_codes(
        jnp.asarray(o), jnp.asarray(o.min(0)), jnp.asarray(o.max(0))))
    key = (dbin.astype(np.uint64) << np.uint64(31 - bits)) | (
        om.astype(np.uint64) >> np.uint64(bits + 1))
    key |= dead.astype(np.uint64) << np.uint64(31)
    return np.argsort(key, kind="stable")


def report(tag, steps, popped, n_gangs_total, n_rays, bp):
    steps = np.asarray(steps, np.float64)
    popped = np.asarray(popped, np.float64)
    total_steps = steps.mean() * n_gangs_total
    print(f"[{tag}] steps/gang mean={steps.mean():.1f} p50="
          f"{np.percentile(steps, 50):.0f} p95={np.percentile(steps, 95):.0f}"
          f" max={steps.max():.0f}  pops/gang={popped.mean():.1f}")
    for step_us in (0.3, 0.6, 1.2):
        # fixed extract cost scales with the box-table width (Bp lanes)
        t = total_steps * step_us * 1e-6
        print(f"    @ {step_us:.1f}us/step: pass {t*1e3:6.1f} ms  "
              f"{n_rays/t/1e6:7.1f} Mrays/s")
    return total_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=250_000)
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--stride", type=int, default=16)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--workload", default="primary",
                    choices=("primary", "shadow", "bounce", "all",
                             "real-bounce", "real-shadow", "real-all",
                             "real-bounce-exact", "real-nee"))
    ap.add_argument("--orders", default="near,index")
    ap.add_argument("--dirbins", type=int, default=0,
                    help="bounce sort: 6*N^2 direction bins instead of the "
                         "production octant sort (0 = production sort)")
    ap.add_argument("--windows", default="",
                    help="banded traversal: comma-separated interior band "
                         "boundaries as fractions of the scene bbox "
                         "diagonal (e.g. 0.02,0.08,0.3)")
    ap.add_argument("--check", action="store_true",
                    help="assert banded results equal unbanded per gang")
    ap.add_argument("--subrays", type=int, default=LANE,
                    help="rays per cull sub-packet (default 128 = one "
                         "sublane row; 32 models a segment-reduced cull)")
    ap.add_argument("--sort6d", default="",
                    help="bounce sort: 6D morton 'pbits,dbits' (e.g. 8,3)")
    ap.add_argument("--rebalance", action="store_true",
                    help="repack sub-packets into gangs by candidate-count "
                         "rank (models a count-pass + round-robin deal; "
                         "steps per gang = max over its sub-packets, so "
                         "balance converts wasted sublane idle into speed)")
    ap.add_argument("--hits-cache", default="/tmp/sim_stream_hits.npz")
    ap.add_argument("--builder", default="median", choices=("median", "sah"))
    ap.add_argument("--rounds", default="",
                    help="real-bounce tmax ladder: comma-separated rung caps "
                         "as fractions of the scene diag (e.g. '0.1' or "
                         "'0.05,0.2'); a final unbounded round is implicit. "
                         "Rays are re-sorted, re-balanced and re-packed "
                         "between rounds (see ladder_bounce)")
    ap.add_argument("--shadow-sort", default="pixel",
                    choices=("pixel", "morton"),
                    help="real-shadow ray order: image pixel blocks (the "
                         "current production order) or origin-morton (the "
                         "NEE wrapper's sort)")
    ap.add_argument("--exit-tmax", action="store_true",
                    help="cap bounce tmax at the scene-bbox exit distance")
    ap.add_argument("--oracle-tmax", action="store_true",
                    help="cap bounce tmax at the EXACT hit distance (misses "
                         "keep 1e6): the upper bound on every tmax-capping "
                         "scheme (DDA grids, ladders, proxy prepasses)")
    ap.add_argument("--oracle-tmax-miss", action="store_true",
                    help="with --oracle-tmax, also cap MISS rays at their "
                         "scene-bbox exit (models perfect per-ray info)")
    args = ap.parse_args()

    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, make_camera

    t0 = time.time()
    scene = build_scene(colonnade(target_tris=args.target))
    tris = scene.triangles()
    builder = build_blocks_sah if args.builder == "sah" else build_blocks
    lo, hi, valid, v0, e1, e2, tid = builder(tris, args.block)
    print(f"scene tris={len(tris)} blocks={len(lo)} builder={args.builder} "
          f"(build {time.time()-t0:.1f}s)")

    cam = make_camera("colonnade", args.width, args.height)
    o, d = create_primary_rays(
        cam, pixel_grid(args.width, args.height),
        (args.width, args.height), 0)
    o = np.asarray(o, np.float32).reshape(-1, 3)
    d = np.asarray(d, np.float32).reshape(-1, 3)
    og, dg = gangs_of(o, d, args.width, args.height)
    n_gangs = og.shape[0]
    sample = range(0, n_gangs, args.stride)
    n_rays = args.width * args.height

    workloads = []
    if args.workload in ("primary", "all"):
        workloads.append(("primary", og, dg, 0.0, 1e6, False))
    if args.workload in ("shadow", "bounce", "all"):
        # surface origins via per-ray brute closest on sampled gangs is
        # expensive; approximate with random in-bounds origins (the
        # profile_stream convention) — exact hit-point workloads need TPU
        rng = np.random.default_rng(7)
        blo, bhi = tris.reshape(-1, 3).min(0), tris.reshape(-1, 3).max(0)
        ob = rng.uniform(blo, bhi, (n_rays, 3)).astype(np.float32)
        if args.workload in ("bounce", "all"):
            db = rng.normal(size=(n_rays, 3)).astype(np.float32)
            db /= np.linalg.norm(db, axis=1, keepdims=True)
            from capsaicin_tpu.ops.pallas_traverse import (
                sort_rays_for_traversal,
            )

            order, _ = sort_rays_for_traversal(
                ob, db, dead=np.zeros((n_rays,), bool))
            order = np.asarray(order)
            ob2, db2 = ob[order], db[order]
            obg = ob2.reshape(-1, SUB, LANE, 3)
            dbg = db2.reshape(-1, SUB, LANE, 3)
            workloads.append(("bounce-sorted", obg, dbg, 1e-3, 1e6, False))
        if args.workload in ("shadow", "all"):
            ld = np.array([0.0, 100.0, 40.0], np.float32)
            ld /= np.linalg.norm(ld)
            dsh = np.broadcast_to(ld, (n_rays, 3)).copy()
            osg = ob.reshape(-1, SUB, LANE, 3)
            dsg = dsh.reshape(-1, SUB, LANE, 3)
            workloads.append(("shadow-any", osg, dsg, 1e-4, 1e6, True))
    if args.workload == "real-bounce-exact":
        # per-RAY exact candidate counts: the lower bound any grouping
        # scheme is chasing, and the shape of the irreducible tail
        from capsaicin_tpu.ops import sampling
        import jax.numpy as jnp

        hits = trace_primary_hits(tris, o, d, args.hits_cache)
        p, gn, hitm = hit_geometry(tris, o, d, hits)
        rng = np.random.default_rng(11)
        s2 = rng.uniform(0, 1, (n_rays, 2)).astype(np.float32)
        db = np.asarray(sampling.map_to_hemisphere(
            jnp.asarray(s2), jnp.asarray(gn), 1.0), np.float32)
        sel = rng.choice(np.nonzero(hitm)[0], 50000, replace=False)
        po, pd = p[sel], db[sel]
        inv = safe_inv(pd)
        counts = np.zeros(len(sel), np.int64)
        near = np.zeros(len(sel), np.float32)
        for i in range(0, len(sel), 4096):
            oo = po[i : i + 4096, None, :]
            ii = inv[i : i + 4096, None, :]
            t0s = (lo[None] - oo) * ii
            t1s = (hi[None] - oo) * ii
            tn = np.minimum(t0s, t1s).max(-1)
            tf = np.maximum(t0s, t1s).min(-1)
            h = (tn <= tf) & (tf >= 1e-3) & valid[None, :]
            counts[i : i + 4096] = h.sum(1)
            tnh = np.where(h, tn, INF)
            near[i : i + 4096] = tnh.min(1)
        print(f"[real-bounce-exact] per-ray candidate blocks: "
              f"mean={counts.mean():.1f} p50={np.percentile(counts, 50):.0f}"
              f" p90={np.percentile(counts, 90):.0f}"
              f" p99={np.percentile(counts, 99):.0f} max={counts.max()}")
        print(f"    sum over 128-ray sub-packet if perfectly grouped ~= "
              f"{counts.mean() * 128:.0f} pair-tests vs union behavior; "
              f"per-gang exact-union lower bound ~= {counts.mean():.1f} "
              f"steps IF unions were free")
        return
    if args.workload.startswith("real"):
        # REAL per-pass workloads: exact primary hit points via the jnp BVH
        # oracle, then (a) cosine-hemisphere bounce rays sorted exactly as
        # the production pipeline sorts them, (b) NEE shadow rays toward the
        # frame-0 directional light in pixel-block order, dead-masked at
        # primary misses. This is the workload the full colonnade config
        # actually traces, unlike the uniform-random approximation above.
        from capsaicin_tpu.ops import sampling
        import jax.numpy as jnp

        hits = trace_primary_hits(tris, o, d, args.hits_cache)
        p, gn, hitm = hit_geometry(tris, o, d, hits)
        dead = ~hitm
        print(f"primary hit rate {hitm.mean():.3f}")
        if args.workload in ("real-bounce", "real-all"):
            rng = np.random.default_rng(11)
            s2 = rng.uniform(0, 1, (n_rays, 2)).astype(np.float32)
            db = np.asarray(sampling.map_to_hemisphere(
                jnp.asarray(s2), jnp.asarray(gn), 1.0), np.float32)
            if args.rounds:
                ladder_bounce(lo, hi, valid, v0, e1, e2, tid, p, db, dead,
                              args, tris)
                return
            if args.sort6d:
                pb, dbit = (int(x) for x in args.sort6d.split(","))
                order = sort_6d(p, db, dead, pb, dbit)
            elif args.dirbins:
                order = sort_dirbins(p, db, dead, args.dirbins)
            else:
                from capsaicin_tpu.ops.pallas_traverse import (
                    sort_rays_for_traversal,
                )

                order = np.asarray(
                    sort_rays_for_traversal(
                        jnp.asarray(p), jnp.asarray(db),
                        dead=jnp.asarray(dead))[0])
            ob2, db2, dd2 = p[order], db[order], dead[order]
            if args.oracle_tmax:
                # EXACT hit distances (the cached real-nee bounce trace):
                # the ceiling for every tmax-capping scheme. Cap at
                # t*(1+1e-3)+1e-4 so the found hit itself stays in range.
                h2 = trace_primary_hits(
                    tris, p, db, "/tmp/sim_stream_hits2.npz", tmin=1e-3)
                t2 = h2["t"].astype(np.float32)
                hit2 = h2["prim"] >= 0
                cap = np.where(hit2, t2 * 1.001 + 1e-4, 1e6)
                if args.oracle_tmax_miss:
                    blo = np.asarray(tris.reshape(-1, 3).min(0))
                    bhi = np.asarray(tris.reshape(-1, 3).max(0))
                    inv2 = safe_inv(db)
                    t0s = (blo[None] - p) * inv2
                    t1s = (bhi[None] - p) * inv2
                    texit = np.maximum(t0s, t1s).min(-1) + 1e-3
                    cap = np.where(hit2, cap, texit)
                cap = cap[order]
                tmx = np.where(dd2, -1.0, cap).astype(np.float32)
            elif args.exit_tmax:
                # rays cannot hit beyond the scene bbox: capping tmax at
                # the bbox exit distance is exact and lets miss rays
                # contribute a short pruning cap instead of 1e6
                blo = np.asarray(tris.reshape(-1, 3).min(0))
                bhi = np.asarray(tris.reshape(-1, 3).max(0))
                inv2 = safe_inv(db2)
                t0s = (blo[None] - ob2) * inv2
                t1s = (bhi[None] - ob2) * inv2
                texit = np.maximum(t0s, t1s).min(-1) + 1e-3
                tmx = np.where(dd2, -1.0, texit).astype(np.float32)
            else:
                tmx = np.where(dd2, -1.0, 1e6).astype(np.float32)
            if args.sort6d:
                tag = f"real-bounce/6d{args.sort6d}"
            elif args.dirbins:
                tag = f"real-bounce/dirbins{args.dirbins}"
            else:
                tag = "real-bounce"
            if args.oracle_tmax:
                tag += "/oracle" + ("+miss" if args.oracle_tmax_miss else "")
            elif args.exit_tmax:
                tag += "/exit"
            workloads.append((tag,
                              ob2.reshape(-1, SUB, LANE, 3),
                              db2.reshape(-1, SUB, LANE, 3),
                              np.full_like(tmx, 1e-3).reshape(-1, SUB, LANE),
                              tmx.reshape(-1, SUB, LANE), False))
        if args.workload == "real-nee":
            # per-bounce NEE shadows: origins at the exact BOUNCE hit
            # points (the most scattered any-hit pass of the frame),
            # constant light direction, sorted like the production
            # bounce_any wrapper (origin morton; direction key constant)
            rng = np.random.default_rng(11)
            s2 = rng.uniform(0, 1, (n_rays, 2)).astype(np.float32)
            db = np.asarray(sampling.map_to_hemisphere(
                jnp.asarray(s2), jnp.asarray(gn), 1.0), np.float32)
            h2 = trace_primary_hits(
                tris, p, db, "/tmp/sim_stream_hits2.npz", tmin=1e-3)
            p2, _, hitm2 = hit_geometry(tris, p, db, h2)
            dead2 = ~(hitm & hitm2)
            ld = np.array([0.0, 100.0, 40.0], np.float32)
            ld /= np.linalg.norm(ld)
            dsh = np.broadcast_to(ld, (n_rays, 3)).astype(np.float32).copy()
            from capsaicin_tpu.ops.pallas_traverse import (
                sort_rays_for_traversal,
            )

            order = np.asarray(sort_rays_for_traversal(
                jnp.asarray(p2), jnp.asarray(dsh),
                dead=jnp.asarray(dead2))[0])
            o3, d3, dd3 = p2[order], dsh[order], dead2[order]
            tmx = np.where(dd3, -1.0, 1e6).astype(np.float32)
            workloads.append(("real-nee",
                              o3.reshape(-1, SUB, LANE, 3),
                              d3.reshape(-1, SUB, LANE, 3),
                              np.full_like(tmx, 1e-4).reshape(-1, SUB, LANE),
                              tmx.reshape(-1, SUB, LANE), True))
        if args.workload in ("real-shadow", "real-all"):
            ld = np.array([0.0, 100.0, 40.0], np.float32)
            ld /= np.linalg.norm(ld)
            dsh = np.broadcast_to(ld, (n_rays, 3)).astype(np.float32)
            tmx = np.where(dead, -1.0, 1e6).astype(np.float32)
            if args.shadow_sort == "morton":
                # NEE's origin-morton sort gets 47 steps/gang where the
                # pixel-block direct shadow sits at 189: the image-space
                # blocks scatter in DEPTH down the hall, while 3D-morton
                # clusters hit points so sub-packet unions stay tight
                import jax.numpy as jnp

                from capsaicin_tpu.ops.pallas_traverse import (
                    sort_rays_for_traversal,
                )

                order = np.asarray(sort_rays_for_traversal(
                    jnp.asarray(p), jnp.asarray(dsh.copy()),
                    dead=jnp.asarray(dead))[0])
                o3, d3, tmx3 = p[order], dsh[order], tmx[order]
                workloads.append(
                    ("real-shadow/morton",
                     o3.reshape(-1, SUB, LANE, 3),
                     d3.reshape(-1, SUB, LANE, 3),
                     np.full_like(tmx3, 1e-4).reshape(-1, SUB, LANE),
                     tmx3.reshape(-1, SUB, LANE), True))
            else:
                og2, dg2 = gangs_of(p, dsh, args.width, args.height)
                workloads.append(("real-shadow", og2, dg2,
                                  gangs_of_scalar(np.full_like(tmx, 1e-4),
                                                  args.width, args.height),
                                  gangs_of_scalar(tmx, args.width,
                                                  args.height),
                                  True))

    def rebalance(OG, DG, tmn, tmx, kk):
        """Round-robin deal of sub-packets into gangs by candidate count."""
        n_g = OG.shape[0]
        sub = GANG // kk
        o2 = OG.reshape(n_g * sub, kk, 3)
        d2 = DG.reshape(n_g * sub, kk, 3)
        tm2 = (np.full((n_g * sub, kk), tmn, np.float32)
               if np.isscalar(tmn) else tmn.reshape(n_g * sub, kk))
        tM2 = (np.full((n_g * sub, kk), tmx, np.float32)
               if np.isscalar(tmx) else tmx.reshape(n_g * sub, kk))
        counts = np.empty(n_g * sub, np.int64)
        for i in range(0, n_g * sub, 1024):
            h, _ = cull(lo, hi, valid, o2[i : i + 1024], d2[i : i + 1024],
                        tm2[i : i + 1024], tM2[i : i + 1024])
            counts[i : i + h.shape[0]] = h.sum(1)
        order = np.argsort(-counts, kind="stable")
        # gang j <- ranks [j*sub, (j+1)*sub): SIMILAR loads share a gang.
        # Steps per gang = MAX over its sub-packets, so grouping equals out
        # the max; spreading heavy sub-packets would put one long pole in
        # every gang (measured 1.5x WORSE than no rebalancing at all)
        perm = order
        return (o2[perm].reshape(n_g, sub * kk, 3).reshape(OG.shape),
                d2[perm].reshape(n_g, sub * kk, 3).reshape(DG.shape),
                tm2[perm].reshape(n_g, SUB, LANE),
                tM2[perm].reshape(n_g, SUB, LANE))

    diag = float(np.linalg.norm(
        tris.reshape(-1, 3).max(0) - tris.reshape(-1, 3).min(0)))
    windows = tuple(float(w) * diag for w in args.windows.split(",")
                    if w.strip())
    wtag = f"/w{args.windows}" if windows else ""

    for name, OG, DG, tmn, tmx, anyh in workloads:
        if args.rebalance:
            OG, DG, tmn, tmx = rebalance(OG, DG, tmn, tmx, args.subrays)
            name += "/rebal"
        for order in args.orders.split(","):
            nf = order == "near"
            t0 = time.time()
            steps, popped = [], []
            k = args.subrays
            sub = GANG // k
            for g in sample:
                tm = (np.full((SUB, LANE), tmn, np.float32)
                      if np.isscalar(tmn) else tmn[g])
                tM = (np.full((SUB, LANE), tmx, np.float32)
                      if np.isscalar(tmx) else tmx[g])
                s, p_, tb, dec = sim_gang(lo, hi, valid, v0, e1, e2, tid,
                                          OG[g].reshape(sub, k, 3),
                                          DG[g].reshape(sub, k, 3),
                                          tm.reshape(sub, k),
                                          tM.reshape(sub, k), nf, anyh,
                                          windows=windows)
                if args.check and windows:
                    _, _, tb0, dec0 = sim_gang(
                        lo, hi, valid, v0, e1, e2, tid,
                        OG[g].reshape(sub, k, 3), DG[g].reshape(sub, k, 3),
                        tm.reshape(sub, k), tM.reshape(sub, k), nf, anyh)
                    assert np.array_equal(dec, dec0), f"any-hit mismatch g{g}"
                    assert np.array_equal(tb, tb0), f"t_best mismatch g{g}"
                steps.append(s)
                popped.append(p_)
            ktag = f"/k{k}" if k != LANE else ""
            report(f"{name}/{order}/b{args.block}{wtag}{ktag}", steps,
                   popped, OG.shape[0], n_rays, len(lo))
            print(f"    (simulated {len(steps)} of {OG.shape[0]} gangs "
                  f"in {time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
