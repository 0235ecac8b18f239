#!/usr/bin/env python
"""Wavefront vs packet-kernel traversal on the colonnade (real TPU).

Times isolated 1080p primary closest-hit and shadow any-hit workloads.
Inputs vary per iteration (camera jitter via frame index) so the axon
tunnel's identical-execution cache cannot fake the numbers.

Run: python tools/bench_wavefront.py [--target 250000] [--iters 3] [--backend both]
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


def block_order_168(o, d, width, height):
    """Reorder rays so consecutive 128 form a 16x8 pixel tile."""
    bw, bh = 16, 8
    def f(x):
        x = x.reshape(height // bh, bh, width // bw, bw, 3)
        return x.transpose(0, 2, 1, 3, 4).reshape(-1, 3)
    return f(o), f(d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=250_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--backend", default="both",
                    choices=["both", "wavefront", "packet", "cull"])
    args = ap.parse_args()

    from capsaicin_tpu.ops import wavefront as wf, pallas_traverse as pt
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, make_camera

    scene = build_scene(colonnade(target_tris=args.target))
    tris = jnp.asarray(scene.triangles())
    print(f"# {tris.shape[0]} tris, backend={jax.default_backend()}", flush=True)

    width, height = 1920, 1080
    camera = make_camera("colonnade", width, height)
    xy = pixel_grid(width, height)
    n = width * height

    def rays_for(frame):
        o, d = create_primary_rays(camera, xy, (width, height), frame)
        return block_order_168(o.reshape(-1, 3), d.reshape(-1, 3), width, height)

    def bench(name, build_fn, closest_fn, any_fn):
        t0 = time.perf_counter()
        accel = jax.block_until_ready(build_fn(tris))
        print(json.dumps({"bench": f"{name}-build", "s": round(time.perf_counter() - t0, 2)}), flush=True)

        cjit = jax.jit(lambda o, d: closest_fn(accel, o, d, 0.0, 1e6))
        ajit = jax.jit(lambda o, d, tm: any_fn(accel, o, d, 1e-4, tm))

        o, d = rays_for(0)
        res = jax.block_until_ready(cjit(o, d))  # compile
        hit_frac = float(jnp.mean((res["prim"] >= 0).astype(jnp.float32)))
        times = []
        for i in range(args.iters):
            o, d = rays_for(i + 1)
            float(o.sum())  # materialize inputs (block_until_ready can lie
            # through the axon tunnel; only value fetches truly synchronize)
            t0 = time.perf_counter()
            res = cjit(o, d)
            float(res["t"].sum())
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        print(json.dumps({
            "bench": f"{name}-closest", "s": round(dt, 3),
            "mrays_per_s": round(n / dt / 1e6, 2), "hit_frac": round(hit_frac, 3),
        }), flush=True)

        # shadow-like any-hit: origins at primary hit points, toward light
        tt = jnp.where(res["prim"] >= 0, res["t"], 1.0)
        ld = jnp.asarray([0.35, 0.85, 0.35])
        ld = ld / jnp.linalg.norm(ld)
        times = []
        for i in range(args.iters + 1):
            o, d = rays_for(i)
            oh = o + d * (tt * 0.999)[:, None]
            dd = jnp.broadcast_to(ld, oh.shape)
            tm = jnp.where(res["prim"] >= 0, 1e6, -1.0)
            float(oh.sum())
            t0 = time.perf_counter()
            float(ajit(oh, dd, tm).sum())
            if i:
                times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        print(json.dumps({
            "bench": f"{name}-any", "s": round(dt, 3),
            "mrays_per_s": round(n / dt / 1e6, 2),
        }), flush=True)

    if args.backend in ("both", "wavefront"):
        bench("wavefront", wf.build_wavefront_bvh,
              wf.wavefront_closest, wf.wavefront_any)
    if args.backend in ("both", "packet"):
        bench("packet", pt.build_packed_bvh, pt.bvh_closest, pt.bvh_any)
    if args.backend == "cull":
        from capsaicin_tpu.ops import cull

        bench("cull", lambda t: cull.build_cull_bvh(np.asarray(t)),
              cull.cull_closest, cull.cull_any)


if __name__ == "__main__":
    from capsaicin_tpu.render.session import setup_compilation_cache
    setup_compilation_cache()  # ops-level tool: opt into the persistent compile cache
    main()
