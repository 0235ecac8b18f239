#!/usr/bin/env python
"""Footprint sim for the superrow MT kernel design: exact per-packet union
of SUPERROWS (16 consecutive 8-tri leaf rows = 128 tris, tree order) for
G-ray packets on the colonnade, primary + bounce ray sets.

Sizes the Pallas kernel budgets: K superrows per packet (p50/p95/max) and
MT pairs/ray = superrows * 128 / G.

Run: python tools/sim_superrow.py [--target 250000] [--samples 200] [--g 128]
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


def exact_union_hits(o, d, live, b_lo, b_hi, tmax):
    inv = np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e12, 1e12),
                   1.0 / np.where(d == 0, 1, d))
    t0 = (b_lo[:, None] - o[None]) * inv[None]   # [S,R,3]
    t1 = (b_hi[:, None] - o[None]) * inv[None]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    hit = (tn <= tf) & (tf >= 0) & (tn <= tmax[None]) & live[None]
    return hit.any(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=250_000)
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--rows-per-super", type=int, default=16)
    ap.add_argument("--bounce-res", type=int, default=256)
    args = ap.parse_args()
    g = args.g
    rps = args.rows_per_super

    from capsaicin_tpu.ops import lbvh, sampling, traverse
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.ops.pallas_traverse import sort_rays_for_traversal
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, make_camera

    import jax.numpy as jnp

    scene = build_scene(colonnade(target_tris=args.target))
    tris = np.asarray(scene.triangles())
    bvh = lbvh.build_median_bvh(tris, leaf_size=8, to_device=False)
    nm, nx, L = np.asarray(bvh.nodes_min), np.asarray(bvh.nodes_max), int(bvh.n_leaves)
    depth = L.bit_length() - 1
    ns = L // rps
    # superrow box = node at level depth - log2(rps)
    slv = depth - rps.bit_length() + 1
    s_lo, s_hi = nm[ns:2 * ns], nx[ns:2 * ns]
    tid = np.asarray(bvh.tri_id).reshape(L, 8)
    s_valid = (tid.reshape(ns, -1) >= 0).any(1)
    print(f"# tris {tris.shape[0]} leaf_rows {L} superrows {ns} "
          f"valid {int(s_valid.sum())} level {slv}", flush=True)

    width, height = 1920, 1080
    camera = make_camera("colonnade", width, height)
    xy = pixel_grid(width, height)
    o, d = create_primary_rays(camera, xy, (width, height), 0)
    o = np.asarray(o.reshape(-1, 3))
    d = np.asarray(d.reshape(-1, 3))
    # 8x128-ish pixel blocks -> G-ray packets (the production primary order)
    bh, bw = 8, g // 8
    hb = height // bh * bh
    def blocks(x):
        x = x.reshape(height, width, 3)[:hb]
        x = x.reshape(hb // bh, bh, width // bw, bw, 3)
        return x.transpose(0, 2, 1, 3, 4).reshape(-1, g, 3)
    po, pd = blocks(o), blocks(d)

    # bounce rays via a low-res CPU trace
    res = args.bounce_res
    cam2 = make_camera("colonnade", res, res)
    ob, db = create_primary_rays(cam2, pixel_grid(res, res), (res, res), 0)
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
    bo, bd, blive = bo[order], bd[order], ok[order]
    nb = len(bo) // g
    bo = bo[: nb * g].reshape(nb, g, 3)
    bd = bd[: nb * g].reshape(nb, g, 3)
    bl = blive[: nb * g].reshape(nb, g)

    rng = np.random.default_rng(0)
    for name, (PO, PD, PL) in {
        "primary": (po, pd, None),
        "bounce": (bo, bd, bl),
    }.items():
        sel = rng.choice(PO.shape[0], size=min(args.samples, PO.shape[0]),
                         replace=False)
        counts = []
        for pidx in sel:
            live = np.ones(g, bool) if PL is None else PL[pidx]
            if not live.any():
                continue
            tmax = np.full(g, 1e30)
            hits = exact_union_hits(PO[pidx], PD[pidx], live,
                                    s_lo, s_hi, tmax) & s_valid
            counts.append(int(hits.sum()))
        counts = np.array(counts)
        print(json.dumps({
            "rays": name, "G": g, "rows_per_super": rps,
            "supers_mean": round(float(counts.mean()), 1),
            "supers_p50": float(np.percentile(counts, 50)),
            "supers_p95": float(np.percentile(counts, 95)),
            "supers_max": int(counts.max()),
            "mt_pairs_per_ray": round(float(counts.mean()) * rps * 8 / 1, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
