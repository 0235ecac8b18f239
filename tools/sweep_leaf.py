#!/usr/bin/env python
"""Leaf-size sweep for the packet traversal kernel (colonnade, real TPU).

Separates step-bound from leaf-bound cost: if time is flat in leaf size,
the scalar node stepping dominates; if it grows, leaf VPU work dominates.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def t(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(width=1920, height=1080, target=250_000):
    from capsaicin_tpu.ops import pallas_traverse as pt
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, make_camera

    scene = build_scene(colonnade(target_tris=target))
    tris = jnp.asarray(scene.triangles())
    camera = make_camera("colonnade", width, height)
    xy = pixel_grid(width, height)
    o, d = create_primary_rays(camera, xy, (width, height), 0)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = o.shape[0]

    key = jax.random.PRNGKey(0)
    bd = jax.random.normal(key, (n, 3))
    bd = bd / jnp.linalg.norm(bd, axis=-1, keepdims=True)
    bd = jnp.where(bd[:, 1:2] < 0, -bd, bd)

    for leaf in (8, 16, 32, 64, 128):
        pt.LEAF_SIZE = leaf
        packed = pt.build_packed_bvh(tris)
        closest = jax.jit(lambda o, d: pt.bvh_closest(packed, o, d, 0.0, 1e6)["t"])
        hit = closest(o, d)
        tp = t(closest, o, d)
        # sorted incoherent bounce rays from primary hit points
        p = o + d * jnp.minimum(hit, 60.0)[:, None]
        order, inv = pt.sort_rays_for_traversal(p, bd)
        ps, bs = p[order], bd[order]
        tb = t(closest, ps, bs)
        print(json.dumps({
            "leaf": leaf,
            "primary_s": round(tp, 4),
            "primary_mrays": round(n / tp / 1e6, 2),
            "bounce_sorted_s": round(tb, 4),
        }), flush=True)


if __name__ == "__main__":
    from capsaicin_tpu.render.session import setup_compilation_cache
    setup_compilation_cache()  # ops-level tool: opt into the persistent compile cache
    main()
