#!/usr/bin/env python
"""Footprint sim for the wavefront-v2 'hierarchical dense cull' traversal.

Design under test (see ops/wavefront2.py): instead of walking the BVH,
test EVERY node of a cut level C (S = 2^C subtrees) against every
1024-ray packet with the conservative interval test (dense [P, S] vector
work), then refine hit subtrees against their leaf-row AABBs. Phase B
cost is proportional to the refined row count; coarse+refine cost to
S + sum(hits) * rows_per_subtree.

This sim answers, for colonnade primary AND diffuse-bounce ray sets:
  - mean/p95 subtree hits per packet at each cut level
  - refined leaf-row footprint (dense-cull) vs exact walk footprint
    (the walk requires every ancestor to hit; the cull only level C +
    the row itself, so cull >= walk)

Run: python tools/sim_dense_cull.py [--target 250000] [--samples 120]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def interval_bounds(o, d, live=None):
    inv = np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e12, 1e12),
                   1.0 / np.where(d == 0, 1, d))
    if live is None:
        live = np.ones(o.shape[0], bool)
    big = 1e30
    sel = live[:, None]
    return (np.where(sel, o, big).min(0), np.where(sel, o, -big).max(0),
            np.where(sel, inv, big).min(0), np.where(sel, inv, -big).max(0))


def exact_union_hits(o, d, live, b_lo, b_hi):
    """Exact per-ray slab OR over the packet: [S] bool."""
    inv = np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e12, 1e12),
                   1.0 / np.where(d == 0, 1, d))
    t0 = (b_lo[:, None] - o[None]) * inv[None]   # [S,R,3]
    t1 = (b_hi[:, None] - o[None]) * inv[None]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    hit = (tn <= tf) & (tf >= 0) & live[None]
    return hit.any(1)


def cone_bounds(o, d, live):
    """Direction cone (unit axis, cos half-angle) + max tmax per packet."""
    dn = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    a = dn[live].mean(0)
    a /= max(np.linalg.norm(a), 1e-12)
    cos_t = float((dn[live] @ a).min())
    return a, max(cos_t, -1.0)


def cone_hits(o_lo, o_hi, axis, cos_t, b_lo, b_hi, t_hi=1e30):
    """Conservative apex-box/dir-cone vs AABB (bounding-sphere form)."""
    c = (b_lo + b_hi) * 0.5
    r = np.linalg.norm((b_hi - b_lo) * 0.5, axis=1)
    v = c - np.clip(c, o_lo[None], o_hi[None])
    dist = np.linalg.norm(v, axis=1)
    inside = dist <= r + 1e-6
    cos_phi = (v @ axis) / np.maximum(dist, 1e-12)
    sin_t = np.sqrt(max(1.0 - cos_t * cos_t, 0.0))
    ratio = np.minimum(r / np.maximum(dist, 1e-12), 1.0)
    cos_a = np.sqrt(np.maximum(1.0 - ratio * ratio, 0.0))
    thresh = cos_t * cos_a - sin_t * ratio
    return (inside | (cos_phi >= thresh)) & (dist - r <= t_hi)


def dense_hits(o_lo, o_hi, i_lo, i_hi, b_lo, b_hi):
    """Vectorized conservative interval test: packet x [S] boxes -> [S] bool."""
    a_lo0 = b_lo - o_hi[None]
    a_hi0 = b_lo - o_lo[None]
    a_lo1 = b_hi - o_hi[None]
    a_hi1 = b_hi - o_lo[None]

    def prods(a_lo, a_hi):
        p = np.stack([a_lo * i_lo, a_lo * i_hi, a_hi * i_lo, a_hi * i_hi])
        return p.min(0), p.max(0)

    lo0, hi0 = prods(a_lo0, a_hi0)
    lo1, hi1 = prods(a_lo1, a_hi1)
    tn = np.minimum(lo0, lo1).max(-1)
    tf = np.maximum(hi0, hi1).min(-1)
    return (tn <= tf) & (tf >= 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=250_000)
    ap.add_argument("--samples", type=int, default=120)
    ap.add_argument("--bounce-res", type=int, default=256,
                    help="res of the frame used to spawn bounce rays")
    args = ap.parse_args()

    from capsaicin_tpu.ops import lbvh, sampling, traverse
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.ops.pallas_traverse import sort_rays_for_traversal
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, make_camera

    import jax.numpy as jnp

    scene = build_scene(colonnade(target_tris=args.target))
    tris = np.asarray(scene.triangles())
    print(f"# colonnade {tris.shape[0]} tris", flush=True)

    bvh = lbvh.build_median_bvh(tris, leaf_size=8, to_device=False)
    nm, nx, L = bvh.nodes_min, bvh.nodes_max, bvh.n_leaves
    depth = int(L).bit_length() - 1
    print(f"# n_leaf_rows={L} depth={depth}", flush=True)

    width, height = 1920, 1080
    camera = make_camera("colonnade", width, height)
    xy = pixel_grid(width, height)
    o, d = create_primary_rays(camera, xy, (width, height), 0)
    o = np.asarray(o.reshape(-1, 3))
    d = np.asarray(d.reshape(-1, 3))
    h32 = height // 32 * 32
    o32 = (o.reshape(height, width, 3)[:h32]
           .reshape(h32 // 32, 32, width // 32, 32, 3)
           .transpose(0, 2, 1, 3, 4).reshape(-1, 1024, 3))
    d32 = (d.reshape(height, width, 3)[:h32]
           .reshape(h32 // 32, 32, width // 32, 32, 3)
           .transpose(0, 2, 1, 3, 4).reshape(-1, 1024, 3))

    # bounce rays: trace a low-res frame on CPU (jnp bvh), cosine-sample
    # hemispheres at hits, then sort exactly like the production trace does
    res = args.bounce_res
    cam2 = make_camera("colonnade", res, res)
    xy2 = pixel_grid(res, res)
    ob, db = create_primary_rays(cam2, xy2, (res, res), 0)
    ob = np.asarray(ob.reshape(-1, 3))
    db = np.asarray(db.reshape(-1, 3))
    jb = lbvh.build_median_bvh(tris, leaf_size=8, to_device=True)
    hit = jax.jit(lambda o, d: traverse.bvh_closest(jb, o, d, 1e-4, 1e6))(
        jnp.asarray(ob), jnp.asarray(db))
    t = np.asarray(hit["t"])
    prim = np.asarray(hit["prim"])
    ok = prim >= 0
    pos = ob + db * np.minimum(t, 1e6)[:, None]
    v0 = tris[np.clip(prim, 0, None), 0]
    v1 = tris[np.clip(prim, 0, None), 1]
    v2 = tris[np.clip(prim, 0, None), 2]
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    n = np.where((n * db).sum(1, keepdims=True) > 0, -n, n)
    rng = np.random.default_rng(1)
    s2 = rng.random((len(pos), 2)).astype(np.float32)
    bd = np.asarray(sampling.map_to_hemisphere(
        jnp.asarray(s2), jnp.asarray(n.astype(np.float32)), 1.0))
    bo = pos + n * 1e-3
    order, _ = sort_rays_for_traversal(
        jnp.asarray(bo, jnp.float32), jnp.asarray(bd, jnp.float32),
        dead=jnp.asarray(~ok))
    order = np.asarray(order)
    bo, bd, live = bo[order], bd[order], ok[order]
    nb = len(bo) // 1024
    bo32 = bo[: nb * 1024].reshape(nb, 1024, 3)
    bd32 = bd[: nb * 1024].reshape(nb, 1024, 3)
    bl32 = live[: nb * 1024].reshape(nb, 1024)

    rng = np.random.default_rng(0)
    row_lo, row_hi = nm[L:], nx[L:]
    row_valid = (row_lo <= row_hi).all(1)  # empty padding leaves have
    # inverted INF boxes: the EXACT test rejects them, but interval
    # arithmetic with infinities produces spurious hits — mask statically.

    # packet-size sweep: interval vs exact-union row footprint per G-ray
    # packet, plus funnel stage stats. Phase B pairs/ray = rows(G)*8.
    for name, (po, pd, plive, sel_n) in {
        "primary": (o32, d32, None, args.samples),
        "bounce": (bo32, bd32, bl32, args.samples),
    }.items():
        sel = rng.choice(po.shape[0], size=min(sel_n, po.shape[0]), replace=False)
        for g in (32,):
            k = 1024 // g
            rows_g, sub_hits_g, rows_ex = [], [], []
            rows_cone, rows_both = [], []
            sp_hits = []
            c = 11
            s = 1 << c
            sub_lo, sub_hi = nm[s:2 * s], nx[s:2 * s]
            sub_valid = (sub_lo <= sub_hi).all(1)
            r_sub = L // s
            for p in sel:
                live = (np.ones(1024, bool) if plive is None else plive[p])
                if not live.any():
                    continue
                o_lo, o_hi, i_lo, i_hi = interval_bounds(po[p], pd[p], live)
                sp_hit = dense_hits(o_lo, o_hi, i_lo, i_hi, sub_lo, sub_hi) & sub_valid
                sp_hits.append(int(sp_hit.sum()))
                for j in range(k):
                    sl = slice(j * g, (j + 1) * g)
                    if not live[sl].any():
                        continue
                    o_lo, o_hi, i_lo, i_hi = interval_bounds(
                        po[p][sl], pd[p][sl], live[sl])
                    # packet-level subtree hits, limited to sp survivors
                    hits = dense_hits(o_lo, o_hi, i_lo, i_hi, sub_lo, sub_hi) & sp_hit
                    rmask = (dense_hits(o_lo, o_hi, i_lo, i_hi, row_lo, row_hi)
                             .reshape(s, r_sub) & row_valid.reshape(s, r_sub)
                             & hits[:, None])
                    ex = exact_union_hits(po[p][sl], pd[p][sl], live[sl],
                                          row_lo, row_hi) & row_valid
                    rows_ex.append(int(ex.sum()))
                    axis, cos_t = cone_bounds(po[p][sl], pd[p][sl], live[sl])
                    cm = cone_hits(o_lo, o_hi, axis, cos_t, row_lo, row_hi) & row_valid
                    rows_cone.append(int(cm.sum()))
                    rows_both.append(int((cm & dense_hits(
                        o_lo, o_hi, i_lo, i_hi, row_lo, row_hi) & row_valid).sum()))
                    if not ex[~(cm)].sum() == 0:
                        print("# CONE NOT CONSERVATIVE!", flush=True)
                    sub_hits_g.append(int(hits.sum()))
                    rows_g.append(int(rmask.sum()))
            out = {
                "rays": name, "G": g, "cut": c,
                "sp1024_sub_hits_mean": round(float(np.mean(sp_hits)), 1),
                "sp1024_sub_hits_p95": round(float(np.percentile(sp_hits, 95)), 1),
                "pkt_sub_hits_mean": round(float(np.mean(sub_hits_g)), 1),
                "pkt_sub_hits_p95": round(float(np.percentile(sub_hits_g, 95)), 1),
                "rows_mean": round(float(np.mean(rows_g)), 1),
                "rows_p95": round(float(np.percentile(rows_g, 95)), 1),
                "rows_max": int(np.max(rows_g)),
                "exact_rows_mean": round(float(np.mean(rows_ex)), 1),
                "exact_rows_p95": round(float(np.percentile(rows_ex, 95)), 1),
                "cone_rows_mean": round(float(np.mean(rows_cone)), 1),
                "both_rows_mean": round(float(np.mean(rows_both)), 1),
                "both_rows_p95": round(float(np.percentile(rows_both, 95)), 1),
                "pairs_per_ray": round(float(np.mean(rows_g)) * 8 / g, 1),
            }
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
