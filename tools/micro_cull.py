#!/usr/bin/env python
"""Sub-stage micros for the dense-cull funnel: separates the box-test
chains from lax.top_k, and the MT pair chain from its argmin/select tail,
so optimization effort lands on the real cost.

Run: python tools/micro_cull.py [--res 512]
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
    out = fn(*args_fn(0))
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x, jnp.float32).sum()), out)
    ts = []
    for i in range(iters):
        a = args_fn(i + 1)
        for x in a:
            if hasattr(x, "sum"):
                float(jnp.asarray(x, jnp.float32).sum())
        t0 = time.perf_counter()
        out = fn(*a)
        jax.tree_util.tree_map(lambda x: float(jnp.asarray(x, jnp.float32).sum()), out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--target", type=int, default=250_000)
    args = ap.parse_args()

    from capsaicin_tpu.ops import cull
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, make_camera

    scene = build_scene(colonnade(target_tris=args.target))
    tris = np.stack([np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
                     np.asarray(scene.tri_v2)], axis=1)
    bvh = cull.build_cull_bvh(tris)
    w = h = args.res
    cam = make_camera("colonnade", w, h)
    table = bvh.coh_boxes
    s = table.shape[1]

    def rays(f):
        o, d = create_primary_rays(cam, pixel_grid(w, h), (w, h), f)
        return jnp.asarray(o.reshape(-1, 3)), jnp.asarray(d.reshape(-1, 3))

    @jax.jit
    def mk(o, d):
        return cull._make_packets(o, d, 0.0, 1e6)[0]

    pk0 = mk(*rays(0))
    p = pk0.ox.shape[0]
    print(f"# packets {p} S {s} backend {jax.default_backend()}", flush=True)

    # A) stage-1 interval chain only (sum-reduce instead of select)
    @jax.jit
    def hits_only(o, d):
        pk = cull._make_packets(o, d, 0.0, 1e6)[0]
        t_pk = jnp.full((p,), 1e6, jnp.float32)
        return cull._interval_hits(pk, table, t_pk).sum(axis=1)

    print(json.dumps({"micro": "interval-chain-2048", "s":
                      round(timed(hits_only, rays), 4)}), flush=True)

    # B) top_k alone on a [P,2048] key (data-dependent to dodge caching)
    @jax.jit
    def topk_only(o, d):
        pk = cull._make_packets(o, d, 0.0, 1e6)[0]
        t_pk = jnp.full((p,), 1e6, jnp.float32)
        hits = cull._interval_hits(pk, table, t_pk)
        ids0 = jax.lax.broadcasted_iota(jnp.int32, (p, s), 1) + s
        return cull._select(hits, ids0, 48)[0]

    print(json.dumps({"micro": "chain+select48", "s":
                      round(timed(topk_only, rays), 4)}), flush=True)

    # MT micros: fixed contiguous row ids (shape-identical to a wave)
    ids = jnp.tile(jnp.arange(cull.COH_K, dtype=jnp.int32)[None] + bvh.n_leaves,
                   (p, 1))

    @jax.jit
    def mt_full(o, d, ids):
        pk = cull._make_packets(o, d, 0.0, 1e6)[0]
        best = (jnp.minimum(pk.tmax, cull.INF),
                jnp.zeros((p, cull.G), jnp.float32),
                jnp.zeros((p, cull.G), jnp.float32),
                jnp.full((p, cull.G), -1, jnp.int32))
        return cull._mt_rows(bvh, pk, ids, best, False)

    def argsf(f):
        o, d = rays(f)
        return o, d, ids

    print(json.dumps({"micro": f"mt-rows-K{cull.COH_K}-full", "s":
                      round(timed(mt_full, argsf), 4)}), flush=True)

    @jax.jit
    def mt_any(o, d, ids):
        pk = cull._make_packets(o, d, 0.0, 1e6)[0]
        best = jnp.zeros((p, cull.G), bool)
        return cull._mt_rows(bvh, pk, ids, best, True)

    print(json.dumps({"micro": f"mt-rows-K{cull.COH_K}-any", "s":
                      round(timed(mt_any, argsf), 4)}), flush=True)

    # C) MT chain + min-reduce only (no argmin, no select tail)
    @jax.jit
    def mt_chain(o, d, ids):
        pk = cull._make_packets(o, d, 0.0, 1e6)[0]
        l = bvh.n_leaves
        idx = jnp.where(ids >= l, ids - l, l)
        steps = idx.shape[1] // cull.MT_CHUNK
        idx = jnp.transpose(idx.reshape(-1, steps, cull.MT_CHUNK), (1, 0, 2))
        t0 = jnp.full((p, cull.G), cull.INF, jnp.float32)

        def step(carry, idx_c):
            rows = bvh.tri_rows[idx_c]
            t_c = cull.MT_CHUNK * cull.TRIS_PER_ROW
            fld = jnp.transpose(rows.reshape(p, t_c, 10), (2, 0, 1))
            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, tidf = (
                fld[i][:, None, :] for i in range(10))
            ox, oy, oz = pk.ox[..., None], pk.oy[..., None], pk.oz[..., None]
            dx, dy, dz = pk.dx[..., None], pk.dy[..., None], pk.dz[..., None]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-12,
                                1.0 / jnp.where(det == 0, 1.0, det), 0.0)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ((jnp.abs(det) > 1e-12) & (uu >= 0.0) & (vv >= 0.0)
                  & (uu + vv <= 1.0) & (tt > pk.tmin[..., None]) & (tidf > 0))
            return jnp.minimum(carry, jnp.min(jnp.where(ok, tt, cull.INF),
                                              axis=2)), None

        t, _ = jax.lax.scan(step, t0, idx)
        return t

    print(json.dumps({"micro": f"mt-chain-K{cull.COH_K}-minonly", "s":
                      round(timed(mt_chain, argsf), 4)}), flush=True)

    # D) row gather + transpose only
    @jax.jit
    def gather_only(o, d, ids):
        l = bvh.n_leaves
        idx = jnp.where(ids >= l, ids - l, l)
        rows = bvh.tri_rows[idx]
        t_c = idx.shape[1] * cull.TRIS_PER_ROW
        fld = jnp.transpose(rows.reshape(p, t_c, 10), (2, 0, 1))
        return fld.sum(axis=(1, 2))

    print(json.dumps({"micro": f"gather+transpose-K{cull.COH_K}", "s":
                      round(timed(gather_only, argsf), 4)}), flush=True)


if __name__ == "__main__":
    from capsaicin_tpu.render.session import setup_compilation_cache
    setup_compilation_cache()  # ops-level tool: opt into the persistent compile cache
    main()
