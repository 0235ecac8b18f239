#!/usr/bin/env python
"""Stage-level timing for the dense-cull funnel (ops/cull.py) on TPU.

Times each stage in isolation (jitted separately, evolving inputs so the
axon tunnel cannot cache) and reports overflow-flag counts so we can see
whether the retrace/rescue backstops are being hit in normal frames.

Run: python tools/profile_cull.py [--res 512] [--target 250000] [--coherent 1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, args_fn, iters=3):
    o = fn(*args_fn(0))
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x, jnp.float32).sum()), o)
    ts = []
    for i in range(iters):
        a = args_fn(i + 1)
        jax.tree_util.tree_map(
            lambda x: float(jnp.asarray(x, jnp.float32).sum()) if hasattr(x, "sum") else x, a)
        t0 = time.perf_counter()
        o = fn(*a)
        jax.tree_util.tree_map(
            lambda x: float(jnp.asarray(x, jnp.float32).sum()), o)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), o


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--target", type=int, default=250_000)
    ap.add_argument("--coherent", type=int, default=1)
    args = ap.parse_args()
    coherent = bool(args.coherent)

    from capsaicin_tpu.ops import cull
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, make_camera

    scene = build_scene(colonnade(target_tris=args.target))
    tris = np.stack([np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
                     np.asarray(scene.tri_v2)], axis=1)
    bvh = cull.build_cull_bvh(tris)
    w = h = args.res
    n = w * h
    cam = make_camera("colonnade", w, h)
    print(f"# res {w} rays {n} tris {tris.shape[0]} depth {bvh.depth} "
          f"backend {jax.default_backend()}", flush=True)

    def rays(f):
        o, d = create_primary_rays(cam, pixel_grid(w, h), (w, h), f)
        return jnp.asarray(o.reshape(-1, 3)), jnp.asarray(d.reshape(-1, 3))

    budget, k_rows = (cull.COH_B, cull.COH_K) if coherent else (cull.INC_B, cull.INC_K)
    level = bvh.coh_level if coherent else bvh.inc_level
    table = bvh.coh_boxes if coherent else bvh.inc_boxes
    s = table.shape[1]

    @jax.jit
    def mk(o, d):
        pk, _ = cull._make_packets(o, d, 0.0, 1e6)
        return pk

    pk0 = mk(*rays(0))
    p = pk0.ox.shape[0]
    print(f"# packets {p} budget {budget} k_rows {k_rows} level {level} "
          f"S {s}", flush=True)

    def best0(pk):
        return (jnp.minimum(pk.tmax, cull.INF),
                jnp.zeros((p, cull.G), jnp.float32),
                jnp.zeros((p, cull.G), jnp.float32),
                jnp.full((p, cull.G), -1, jnp.int32))

    # stage 1: dense level cull
    @jax.jit
    def stage1(o, d):
        pk, _ = cull._make_packets(o, d, 0.0, 1e6)
        t_ray = cull._t_cap_ray(pk, best0(pk), False)
        t_pk = jnp.max(t_ray, axis=1)
        if coherent:
            hits0 = cull._interval_hits(pk, table, t_pk)
        else:
            hits0 = cull._perray_union_hits(pk, table, t_ray)
        ids0 = jax.lax.broadcasted_iota(jnp.int32, (p, s), 1) + s
        ids, count = cull._select(hits0, ids0, budget)
        return ids, count

    dt, (ids, count) = timed(stage1, rays)
    cnt = np.asarray(count)
    print(json.dumps({"stage": "1-dense-cull", "s": round(dt, 3),
                      "hits_mean": round(float(cnt.mean()), 1),
                      "hits_p95": float(np.percentile(cnt, 95)),
                      "over_frac": round(float((cnt > budget).mean()), 4)}),
          flush=True)

    # stage 2: descent
    @jax.jit
    def stage2(o, d, ids):
        pk, _ = cull._make_packets(o, d, 0.0, 1e6)
        t_ray = cull._t_cap_ray(pk, best0(pk), False)
        t_pk = jnp.max(t_ray, axis=1)
        return cull._descend(bvh, pk, ids, level, not coherent, t_pk, t_ray)

    def s2args(f):
        o, d = rays(f)
        return o, d, ids

    dt, (row_ids, row_boxes, row_hits, over) = timed(stage2, s2args)
    rh = np.asarray(row_hits.sum(axis=1))
    print(json.dumps({"stage": "2-descend", "s": round(dt, 3),
                      "rows_mean": round(float(rh.mean()), 1),
                      "rows_p95": float(np.percentile(rh, 95)),
                      "over_frac": round(float(np.asarray(over).mean()), 4)}),
          flush=True)

    # stage 4: MT waves
    @jax.jit
    def stage4(o, d, row_ids, row_hits):
        pk, _ = cull._make_packets(o, d, 0.0, 1e6)
        best = best0(pk)
        c = row_hits.shape[1]
        kk = min(k_rows, c)
        slot = jax.lax.broadcasted_iota(jnp.int32, (p, c), 1)
        rank = jnp.cumsum(row_hits.astype(jnp.int32), axis=1) - 1
        n_rows = row_hits.sum(axis=1)

        def cond(carry):
            wv, _ = carry
            return jnp.any(n_rows > wv * kk)

        def body(carry):
            wv, best = carry
            sel = row_hits & (rank >= wv * kk) & (rank < (wv + 1) * kk)
            key = jnp.where(sel, c - slot, -1)
            _, top = jax.lax.top_k(key, kk)
            valid = jnp.take_along_axis(sel, top, axis=1)
            ids = jnp.where(valid, jnp.take_along_axis(row_ids, top, axis=1), 0)
            best = cull._mt_rows(bvh, pk, ids, best, False)
            return wv + 1, best

        _, best = jax.lax.while_loop(cond, body, (jnp.int32(0), best))
        return best

    def s4args(f):
        o, d = rays(f)
        return o, d, row_ids, row_hits

    dt, best = timed(stage4, s4args)
    print(json.dumps({"stage": "4-mt-waves", "s": round(dt, 3),
                      "waves_needed": int(np.ceil(rh.max() / k_rows))}),
          flush=True)

    # full trace for reference
    @jax.jit
    def full(o, d):
        return cull.cull_closest(bvh, o, d, 0.0, 1e6, coherent=coherent)

    dt, res = timed(full, rays)
    print(json.dumps({"stage": "full", "s": round(dt, 3),
                      "mrays_per_s": round(n / dt / 1e6, 2),
                      "hit_frac": round(float(jnp.mean((res["prim"] >= 0)
                                                        .astype(jnp.float32))), 3)}),
          flush=True)


if __name__ == "__main__":
    from capsaicin_tpu.render.session import setup_compilation_cache
    setup_compilation_cache()  # ops-level tool: opt into the persistent compile cache
    main()
