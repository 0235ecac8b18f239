#!/usr/bin/env python
"""Footprint simulator for the wavefront leaf-streaming traversal design.

Questions it answers (CPU, NumPy, exact node-level simulation):
  1. How many leaf ROWS (8 tris each) does a 128-ray packet's conservative
     interval walk visit, vs the current 1024-ray packet walk? Phase B cost
     is proportional to per-packet leaf rows; the current kernel's cost is
     proportional to 1024-packet leaf visits x rows/leaf (all 8 sublanes
     walk together).
  2. How much does the conservative packet-interval AABB test (what the
     vectorized XLA Phase A must use) overestimate the exact per-ray-union
     footprint?
  3. Distribution over packets (mean / p95 / max) -> Phase A lockstep cost
     and Phase B load-balance headroom.

Run: python tools/sim_wavefront.py [--target 250000] [--samples 150]
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
import jax.numpy as jnp


def walk(nodes_min, nodes_max, n_leaves, test_fn, t_best_cap=1e6):
    """Ordered-ish DFS with a stack; test_fn(k) -> bool (packet hits node k).
    Returns (node_visits, leaf_list)."""
    stack = [1]
    visits = 0
    leaves = []
    while stack:
        k = stack.pop()
        if k >= n_leaves:
            leaves.append(k)
            continue
        visits += 1
        c0, c1 = 2 * k, 2 * k + 1
        h0 = test_fn(c0)
        h1 = test_fn(c1)
        if h1:
            stack.append(c1)
        if h0:
            stack.append(c0)
    return visits, leaves


def make_tests(nodes_min, nodes_max, o, d):
    """Per-ray union test (exact) and packet-interval test (conservative)."""
    inv = np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e12, 1e12),
                   1.0 / np.where(d == 0, 1, d))

    def exact(k):
        lo, hi = nodes_min[k], nodes_max[k]
        t0 = (lo[None] - o) * inv
        t1 = (hi[None] - o) * inv
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        return bool(((tn <= tf) & (tf >= 0) & (tn <= 1e6)).any())

    o_lo, o_hi = o.min(0), o.max(0)
    i_lo, i_hi = inv.min(0), inv.max(0)

    def interval(k):
        lo, hi = nodes_min[k], nodes_max[k]
        # interval product of (b - o) x invd per axis, per plane
        tn_min = np.empty(3)
        tf_max = np.empty(3)
        for ax in range(3):
            a_lo0, a_hi0 = lo[ax] - o_hi[ax], lo[ax] - o_lo[ax]
            a_lo1, a_hi1 = hi[ax] - o_hi[ax], hi[ax] - o_lo[ax]
            p0 = np.array([a_lo0 * i_lo[ax], a_lo0 * i_hi[ax],
                           a_hi0 * i_lo[ax], a_hi0 * i_hi[ax]])
            p1 = np.array([a_lo1 * i_lo[ax], a_lo1 * i_hi[ax],
                           a_hi1 * i_lo[ax], a_hi1 * i_hi[ax]])
            # slab entry/exit intervals: near plane = min over the two
            # planes' products, far = max
            tn_min[ax] = np.minimum(p0, p1).min()
            tf_max[ax] = np.maximum(p0, p1).max()
        t_near_lo = tn_min.max()  # conservative lower bound of per-ray t_near
        t_far_hi = tf_max.min()   # conservative upper bound of per-ray t_far
        return bool((t_near_lo <= t_far_hi) and (t_far_hi >= 0))

    return exact, interval


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=250_000)
    ap.add_argument("--samples", type=int, default=150)
    ap.add_argument("--leaf-sizes", default="8,12,16,32")
    args = ap.parse_args()

    from capsaicin_tpu.ops import lbvh
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, make_camera

    scene = build_scene(colonnade(target_tris=args.target))
    tris = np.asarray(scene.triangles())
    print(f"# colonnade {tris.shape[0]} tris", flush=True)

    width, height = 1920, 1080
    camera = make_camera("colonnade", width, height)
    xy = pixel_grid(width, height)
    o, d = create_primary_rays(camera, xy, (width, height), 0)
    o = np.asarray(o.reshape(-1, 3))
    d = np.asarray(d.reshape(-1, 3))

    # 128-ray packets = 16x8 pixel blocks (16 wide x 8 tall)
    bw, bh = 16, 8
    ob = o.reshape(height, width, 3).reshape(height // bh, bh, width // bw, bw, 3)
    ob = ob.transpose(0, 2, 1, 3, 4).reshape(-1, bh * bw, 3)
    db = d.reshape(height, width, 3).reshape(height // bh, bh, width // bw, bw, 3)
    db = db.transpose(0, 2, 1, 3, 4).reshape(-1, bh * bw, 3)
    n_packs = ob.shape[0]

    # 1024-ray packets = 32x32 pixel blocks (current kernel's pixel blocks);
    # crop height to a multiple of 32 for sampling purposes
    h32 = height // 32 * 32
    oc = o.reshape(height, width, 3)[:h32]
    dc = d.reshape(height, width, 3)[:h32]
    o32 = oc.reshape(h32 // 32, 32, width // 32, 32, 3).transpose(0, 2, 1, 3, 4).reshape(-1, 1024, 3)
    d32 = dc.reshape(h32 // 32, 32, width // 32, 32, 3).transpose(0, 2, 1, 3, 4).reshape(-1, 1024, 3)

    rng = np.random.default_rng(0)
    sel128 = rng.choice(n_packs, size=min(args.samples, n_packs), replace=False)
    sel1k = rng.choice(o32.shape[0], size=min(args.samples // 2, o32.shape[0]), replace=False)

    for leaf in [int(x) for x in args.leaf_sizes.split(",")]:
        bvh = lbvh.build_median_bvh(tris, leaf_size=leaf)
        nm, nx, L = np.asarray(bvh.nodes_min), np.asarray(bvh.nodes_max), bvh.n_leaves
        rows_per_leaf = -(-leaf // 8)

        stats = {}
        for name, packs, sel in (("p128", (ob, db), sel128), ("p1024", (o32, d32), sel1k)):
            ex_rows, iv_rows, iv_nodes = [], [], []
            for p in sel:
                op, dp = packs[0][p], packs[1][p]
                exact, interval = make_tests(nm, nx, op, dp)
                _, lv_e = walk(nm, nx, L, exact)
                nv_i, lv_i = walk(nm, nx, L, interval)
                ex_rows.append(len(lv_e) * rows_per_leaf)
                iv_rows.append(len(lv_i) * rows_per_leaf)
                iv_nodes.append(nv_i)
            stats[name] = dict(
                exact_rows_mean=round(float(np.mean(ex_rows)), 1),
                interval_rows_mean=round(float(np.mean(iv_rows)), 1),
                interval_rows_p95=round(float(np.percentile(iv_rows, 95)), 1),
                interval_rows_max=int(np.max(iv_rows)),
                interval_node_visits_mean=round(float(np.mean(iv_nodes)), 1),
                interval_node_visits_max=int(np.max(iv_nodes)),
            )
        print(json.dumps({"leaf_size": leaf, "n_leaves": int(L), **stats}), flush=True)


if __name__ == "__main__":
    main()


def shortened_walk(nodes_min, nodes_max, n_leaves, leaf, tri_v0, tri_e1, tri_e2, tri_id, o, d):
    """Exact ordered near-first walk with per-ray t_best updated at each leaf
    (near-first order) and node pruning by the packet-conservative cap
    t_cap = max over rays of t_best. Returns leaf rows visited — the
    footprint a staged (t-shortened) wavefront pass converges to."""
    inv = np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e12, 1e12),
                   1.0 / np.where(d == 0, 1, d))
    t_best = np.full(o.shape[0], 1e6)

    def box(k, cap):
        lo, hi = nodes_min[k], nodes_max[k]
        t0 = (lo[None] - o) * inv
        t1 = (hi[None] - o) * inv
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        return bool(((tn <= tf) & (tf >= 0) & (tn <= np.minimum(t_best, cap))).any())

    def isect(k):
        nonlocal t_best
        s = (k - n_leaves) * leaf
        v0 = tri_v0[s:s + leaf]; e1 = tri_e1[s:s + leaf]; e2 = tri_e2[s:s + leaf]
        tid = tri_id[s:s + leaf]
        p = np.cross(d[:, None], e2[None])          # [R,T,3]
        det = (p * e1[None]).sum(-1)
        invd = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
        tv = o[:, None] - v0[None]
        u = (tv * p).sum(-1) * invd
        q = np.cross(tv, e1[None])
        v = (q * d[:, None]).sum(-1) * invd
        t = (q * e2[None]).sum(-1) * invd
        ok = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & \
             (t > 1e-4) & (t < t_best[:, None]) & (tid[None] >= 0)
        t = np.where(ok, t, 1e6)
        t_best = np.minimum(t_best, t.min(1))

    stack = [1]
    rows = 0
    while stack:
        k = stack.pop()
        if k >= n_leaves:
            rows += -(-leaf // 8)
            isect(k)
            continue
        if not box(k, t_best.max()):
            continue
        c0, c1 = 2 * k, 2 * k + 1
        # near-first by direction sign on the pair split axis
        cl = (nodes_min[c0] + nodes_max[c0]) * 0.5
        cr = (nodes_min[c1] + nodes_max[c1]) * 0.5
        ax = int(np.argmax(np.abs(cr - cl)))
        near_left = (d[0, ax] > 0) == (cr[ax] >= cl[ax])
        near, far = (c0, c1) if near_left else (c1, c0)
        stack.append(far)
        stack.append(near)
    return rows


def main_shortened():
    from capsaicin_tpu.ops import lbvh
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, make_camera

    scene = build_scene(colonnade(target_tris=250_000))
    tris = np.asarray(scene.triangles())
    width, height = 1920, 1080
    camera = make_camera("colonnade", width, height)
    xy = pixel_grid(width, height)
    o, d = create_primary_rays(camera, xy, (width, height), 0)
    o = np.asarray(o.reshape(-1, 3)); d = np.asarray(d.reshape(-1, 3))
    bw, bh = 16, 8
    ob = o.reshape(height // bh, bh, width // bw, bw, 3).transpose(0, 2, 1, 3, 4).reshape(-1, 128, 3)
    db = d.reshape(height // bh, bh, width // bw, bw, 3).transpose(0, 2, 1, 3, 4).reshape(-1, 128, 3)
    rng = np.random.default_rng(0)
    sel = rng.choice(ob.shape[0], size=150, replace=False)
    for leaf in (8, 16):
        bvh = lbvh.build_median_bvh(tris, leaf_size=leaf)
        nm, nx, L = np.asarray(bvh.nodes_min), np.asarray(bvh.nodes_max), bvh.n_leaves
        v0 = np.asarray(bvh.tri_v0); e1 = np.asarray(bvh.tri_e1)
        e2 = np.asarray(bvh.tri_e2); tid = np.asarray(bvh.tri_id)
        rows = [shortened_walk(nm, nx, L, leaf, v0, e1, e2, tid, ob[p], db[p]) for p in sel]
        print(json.dumps({
            "leaf": leaf,
            "shortened_rows_mean": round(float(np.mean(rows)), 1),
            "p95": round(float(np.percentile(rows, 95)), 1),
            "max": int(np.max(rows)),
        }), flush=True)
