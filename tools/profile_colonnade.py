#!/usr/bin/env python
"""Surgical colonnade profile: where do 40s/frame go?

Times each traversal workload in isolation on the real TPU — primary packet
trace, direct shadow any-hit, bounce trace sorted vs unsorted, the sort
itself, and the full frame — so the dominant cost is unambiguous.
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
    packed = pt.build_packed_bvh(tris)
    n_chunks = len(packed.parts) if isinstance(packed, pt.PackedBVHSet) else 1
    print(f"tris={tris.shape[0]} chunks={n_chunks}")

    camera = make_camera("colonnade", width, height)
    xy = pixel_grid(width, height)
    o, d = create_primary_rays(camera, xy, (width, height), 0)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = o.shape[0]
    res = {}

    closest = jax.jit(lambda o, d, tmax: pt.bvh_closest(packed, o, d, 0.0, tmax))
    hit = closest(o, d, 1e6)
    res["primary_closest_s"] = t(closest, o, d, 1e6)

    # hit points + lambertian bounce dirs (incoherent, like the real frame)
    tt = jnp.minimum(hit["t"], 60.0)
    p = o + d * tt[:, None]
    key = jax.random.PRNGKey(0)
    bd = jax.random.normal(key, (n, 3))
    bd = bd / jnp.linalg.norm(bd, axis=-1, keepdims=True)
    bd = jnp.where(bd[:, 1:2] < 0, -bd, bd)  # upper hemisphere

    anyf = jax.jit(lambda o, d: pt.bvh_any(packed, o, d, 1e-4, 1e5))
    ldir = jnp.broadcast_to(jnp.array([0.37, 0.85, 0.37]), o.shape)
    anyf(p, ldir)
    res["direct_shadow_any_s"] = t(anyf, p, ldir)

    res["bounce_closest_unsorted_s"] = t(closest, p, bd, 1e5)

    def sorted_closest(o, d):
        order, inv = pt.sort_rays_for_traversal(o, d)
        h = pt.bvh_closest(packed, o[order], d[order], 1e-4, 1e5)
        return {k: v[inv] for k, v in h.items()}

    sc = jax.jit(sorted_closest)
    sc(p, bd)
    res["bounce_closest_sorted_s"] = t(sc, p, bd)

    sort_only = jax.jit(lambda o, d: pt.sort_rays_for_traversal(o, d))
    sort_only(p, bd)
    res["sort_only_s"] = t(sort_only, p, bd)

    res["bounce_shadow_any_unsorted_s"] = t(anyf, p, bd)

    for k, v in res.items():
        print(json.dumps({k: round(v, 4)}))
    print(json.dumps({"primary_mrays": round(n / res["primary_closest_s"] / 1e6, 2)}))


if __name__ == "__main__":
    from capsaicin_tpu.render.session import setup_compilation_cache
    setup_compilation_cache()  # ops-level tool: opt into the persistent compile cache
    main()
