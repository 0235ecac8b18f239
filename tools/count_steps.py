#!/usr/bin/env python
"""Packet-DFS step counts (CPU simulation) for the colonnade BVH.

Simulates the UNORDERED stackless DFS (one box test per step, no near-first
ordering, no t_best shortening) over the same tree the kernel uses. The
shipped kernel (ordered stack traversal with sibling-pair fetches) visits
FEWER nodes, so these counts are an upper-bound proxy for comparing packet
footprints (e.g. row-strip vs pixel-block ray ordering), not an exact model
of the current kernel.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def dfs_next(k):
    while k > 1 and (k & 1):
        k >>= 1
    return 1 if k <= 1 else k + 1


def packet_steps(nodes_min, nodes_max, n_leaves, o, d, t_best):
    inv = np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e12, 1e12), 1.0 / np.where(d == 0, 1, d))
    k = 2
    steps = 0
    leaf_visits = 0
    while k > 1 and steps < 4 * n_leaves + 64:
        lo = nodes_min[k]
        hi = nodes_max[k]
        t0 = (lo[None] - o) * inv
        t1 = (hi[None] - o) * inv
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        hit = (tn <= tf) & (tf >= 0) & (tn <= t_best)
        any_box = hit.any()
        is_leaf = k >= n_leaves
        if any_box and is_leaf:
            leaf_visits += 1
        k = 2 * k if (any_box and not is_leaf) else dfs_next(k)
        steps += 1
    return steps, leaf_visits


def main(target=250_000, n_packets=40):
    from capsaicin_tpu.ops import lbvh, pallas_traverse as pt
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, make_camera

    scene = build_scene(colonnade(target_tris=target))
    tris = jnp.asarray(scene.triangles())

    width, height = 1920, 1080
    camera = make_camera("colonnade", width, height)
    xy = pixel_grid(width, height)
    o, d = create_primary_rays(camera, xy, (width, height), 0)
    o = np.asarray(o.reshape(-1, 3))
    d = np.asarray(d.reshape(-1, 3))

    # chunked like build_packed_bvh
    t = tris.shape[0]
    n_chunks = -(-t // pt.CHUNK_TRIS_CAP)
    chunk = -(-t // n_chunks)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    centroids = (v0 + v1 + v2) / 3.0
    lo = jnp.min(jnp.minimum(jnp.minimum(v0, v1), v2), axis=0)
    hi = jnp.max(jnp.maximum(jnp.maximum(v0, v1), v2), axis=0)
    order = np.asarray(jnp.argsort(lbvh.morton_codes(centroids, lo, hi)))

    rng = np.random.default_rng(0)
    packs = rng.choice(o.shape[0] // pt.PACKET, size=n_packets, replace=False)

    for c in range(n_chunks):
        ids = order[c * chunk: min((c + 1) * chunk, t)]
        bvh = lbvh.build_median_bvh(tris[np.asarray(ids)], leaf_size=pt.LEAF_SIZE)
        nm = np.asarray(bvh.nodes_min)
        nx = np.asarray(bvh.nodes_max)
        L = bvh.n_leaves
        tot_s, tot_l = [], []
        for p in packs:
            s0 = p * pt.PACKET
            steps, leaves = packet_steps(
                nm, nx, L, o[s0:s0 + pt.PACKET], d[s0:s0 + pt.PACKET],
                np.full(pt.PACKET, 1e6),
            )
            tot_s.append(steps)
            tot_l.append(leaves)
        print(json.dumps({
            "chunk": c, "n_leaves": int(L),
            "steps_mean": round(float(np.mean(tot_s)), 1),
            "steps_max": int(np.max(tot_s)),
            "leaf_visits_mean": round(float(np.mean(tot_l)), 1),
        }), flush=True)

    # implied per-step cost at the measured 0.94s primary (2 chunks)
    n_pk = o.shape[0] // pt.PACKET
    mean_steps = float(np.mean(tot_s))
    print(json.dumps({
        "packets": n_pk,
        "implied_ns_per_step_at_0.94s": round(0.94e9 / (n_pk * 2 * mean_steps), 1),
    }))


if __name__ == "__main__":
    from capsaicin_tpu.render.session import setup_compilation_cache
    setup_compilation_cache()  # ops-level tool: opt into the persistent compile cache
    main()
