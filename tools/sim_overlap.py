#!/usr/bin/env python
"""Static candidate-overlap analysis: sub-packet-major vs block-major.

The stream kernel is sub-packet-major: each of a gang's 8 sub-packets
streams ITS candidate blocks (one per sublane per step), so steps/gang =
max over sub-packets of candidate count. A block wanted by k sub-packets
of the gang is fetched and MT'd k times.

The dual is block-major: stream each block of the gang's candidate UNION
once (1 DMA/step) and MT it against all 8 sub-packets in the same [8,128]
tile (block broadcast across sublanes). steps/gang = |union of 8 candidate
sets|. Whether that wins is a pure set question this tool answers from the
exact cull, on the same real workloads sim_stream.py uses:

    block-major wins  iff  |union| < max_s |cand_s|   (same per-step cost)

Reports both for the real bounce workload under the production sort and
balanced packing, plus the duplication factor sum/|union| (how many times
the average union block would be re-fetched today).

Usage: python tools/sim_overlap.py [--stride 64] [--dirbins 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tools.sim_stream import (  # noqa: E402
    GANG, LANE, SUB, build_blocks, cull, hit_geometry, pack_balanced,
    sort_dirbins, trace_primary_hits,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=250_000)
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--stride", type=int, default=64)
    ap.add_argument("--dirbins", type=int, default=4)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--hits-cache", default="/tmp/sim_stream_hits.npz")
    args = ap.parse_args()

    from capsaicin_tpu.ops import sampling
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, make_camera
    import jax.numpy as jnp

    scene = build_scene(colonnade(target_tris=args.target))
    tris = scene.triangles()
    lo, hi, valid, v0, e1, e2, tid = build_blocks(tris, args.block)
    print(f"scene tris={len(tris)} blocks={len(lo)}")

    cam = make_camera("colonnade", args.width, args.height)
    o, d = create_primary_rays(
        cam, pixel_grid(args.width, args.height),
        (args.width, args.height), 0)
    o = np.asarray(o, np.float32).reshape(-1, 3)
    d = np.asarray(d, np.float32).reshape(-1, 3)
    n_rays = len(o)

    hits = trace_primary_hits(tris, o, d, args.hits_cache)
    p, gn, hitm = hit_geometry(tris, o, d, hits)
    dead = ~hitm
    rng = np.random.default_rng(11)
    s2 = rng.uniform(0, 1, (n_rays, 2)).astype(np.float32)
    db = np.asarray(sampling.map_to_hemisphere(
        jnp.asarray(s2), jnp.asarray(gn), 1.0), np.float32)

    order = sort_dirbins(p, db, dead, args.dirbins)
    ob, dbs, dd = p[order], db[order], dead[order]
    tmn = np.full(n_rays, 1e-3, np.float32)
    tmx = np.where(dd, -1.0, 1e6).astype(np.float32)

    OG, DG, TM, TX = pack_balanced(ob, dbs, tmn, tmx, lo, hi, valid)
    ng = len(OG)
    sample = range(0, ng, args.stride)

    mx, un, sm = [], [], []
    for g in sample:
        h, _ = cull(lo, hi, valid, OG[g], DG[g], TM[g], TX[g])
        per = h.sum(1)  # [SUB]
        mx.append(per.max())
        sm.append(per.sum())
        un.append(h.any(0).sum())
    mx = np.asarray(mx, np.float64)
    un = np.asarray(un, np.float64)
    sm = np.asarray(sm, np.float64)
    print(f"[real-bounce/dirbins{args.dirbins}/balanced] {len(mx)} gangs "
          f"of {ng}")
    print(f"  sub-packet-major steps/gang (static max): mean={mx.mean():.1f}"
          f" p50={np.percentile(mx, 50):.0f} p95={np.percentile(mx, 95):.0f}")
    print(f"  block-major steps/gang (static |union|):  mean={un.mean():.1f}"
          f" p50={np.percentile(un, 50):.0f} p95={np.percentile(un, 95):.0f}")
    print(f"  duplication sum/|union|: mean={np.mean(sm / np.maximum(un, 1)):.2f}"
          f"  (8.0 = every sub-packet wants every union block)")
    print(f"  block-major/sub-packet-major ratio: {un.mean() / mx.mean():.2f}"
          f"  (<1 = block-major fetches fewer blocks per gang)")


if __name__ == "__main__":
    main()
