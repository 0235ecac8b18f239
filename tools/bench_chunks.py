#!/usr/bin/env python
"""PackedBVHSet chunk-culling benchmark (VERDICT round-1 item 7).

Measures pure traversal throughput (closest-hit on primary rays, any-hit on
shadow rays) as the scene grows past the VMEM chunk cap — 1, 2, 4, 7 chunks.
With ray shortening between chunks the cost must grow sublinearly in chunk
count for coherent packets.

Run on the real TPU: python tools/bench_chunks.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from capsaicin_tpu.ops import pallas_traverse as pt
from capsaicin_tpu.ops.camera import pixel_grid, create_primary_rays
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import colonnade, make_camera


def bench(target_tris: int, width=1920, height=1080, iters=10):
    scene = build_scene(colonnade(target_tris=target_tris))
    tris = jnp.asarray(scene.triangles())
    packed = pt.build_packed_bvh(tris)
    n_chunks = len(packed.parts) if isinstance(packed, pt.PackedBVHSet) else 1

    camera = make_camera("colonnade", width, height)
    xy = pixel_grid(width, height)
    o, d = create_primary_rays(camera, xy, (width, height), 0)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = o.shape[0]

    closest = jax.jit(lambda o, d: pt.bvh_closest(packed, o, d, 0.0, 1e6)["t"])
    t0 = closest(o, d)
    t0.block_until_ready()
    t = time.perf_counter()
    for _ in range(iters):
        out = closest(o, d)
    out.block_until_ready()
    closest_mrays = n * iters / (time.perf_counter() - t) / 1e6

    ldir = jnp.broadcast_to(jnp.array([0.37, 0.85, 0.37]), o.shape)
    hitp = o + d * jnp.minimum(t0, 100.0)[:, None]
    anyf = jax.jit(lambda o, d: pt.bvh_any(packed, o, d, 1e-4, 1e5))
    anyf(hitp, ldir).block_until_ready()
    t = time.perf_counter()
    for _ in range(iters):
        out = anyf(hitp, ldir)
    out.block_until_ready()
    any_mrays = n * iters / (time.perf_counter() - t) / 1e6

    return {
        "target_tris": target_tris,
        "tris": int(tris.shape[0]),
        "chunks": n_chunks,
        "closest_mrays": round(closest_mrays, 1),
        "anyhit_mrays": round(any_mrays, 1),
    }


if __name__ == "__main__":
    from capsaicin_tpu.render.session import setup_compilation_cache
    setup_compilation_cache()  # ops-level tool: opt into the persistent compile cache
    for target in (120_000, 250_000, 500_000, 1_000_000):
        print(json.dumps(bench(target)))
