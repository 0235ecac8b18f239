#!/usr/bin/env python
"""Stream-traversal (ops/stream.py) TPU profile.

Stage 1 (smoke, ~1 min): tiny scene + tiny ray set — catches Mosaic
lowering issues (lane slices, strided DMA dst, dynamic slot indexing) in
seconds of compile instead of a full colonnade build.

Stage 2 (colonnade): isolated workloads at 1080p — primary closest, shadow
any-hit, sorted bounce closest — vs the packet-BVH kernel, plus a block-size
sweep. Inputs are cycled across iterations (the axon tunnel caches repeated
identical executions, see PERF.md).

Usage: python tools/profile_stream.py [--smoke-only] [--target 250000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t_cycle(fn, arg_sets, iters=4):
    """Time fn cycling through arg variants (defeats tunnel result caching)."""
    out = fn(*arg_sets[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*arg_sets[i % len(arg_sets)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def ray_sets(o, d, k=3):
    """k jittered variants of a ray set (identical workload shape)."""
    sets = []
    for i in range(k):
        sets.append((o + np.float32(1e-5) * i, d))
    return sets


def smoke():
    from capsaicin_tpu.ops import intersect, stream
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import cornell_box

    rng = np.random.default_rng(3)
    scene = build_scene(cornell_box())
    tris = jnp.asarray(scene.triangles())
    sb = stream.build_stream_bvh(tris)
    o = jnp.asarray(rng.uniform(-1.5, 1.5, (1024, 3)).astype(np.float32))
    d = rng.normal(size=(1024, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    t0 = time.perf_counter()
    got = jax.jit(lambda o, d: stream.stream_closest(sb, o, d))(o, d)
    jax.block_until_ready(got)
    print(f"smoke closest compiled+ran in {time.perf_counter() - t0:.1f}s")
    want = intersect.brute_force_closest(o, d, tris, 0.0, 1e6)
    gp, wp = np.asarray(got["prim"]), np.asarray(want["prim"])
    same = gp == wp
    if not same.all():
        gt, wt = np.asarray(got["t"]), np.asarray(want["t"])
        assert np.allclose(gt[~same], wt[~same], rtol=1e-4), "smoke MISMATCH"
    print(f"smoke closest OK (prim match {same.mean():.4f})")
    t0 = time.perf_counter()
    ga = jax.jit(lambda o, d: stream.stream_any(sb, o, d, 1e-4, 1e6))(o, d)
    jax.block_until_ready(ga)
    wa = intersect.brute_force_any(o, d, tris, 1e-4, 1e6)
    assert np.array_equal(np.asarray(ga), np.asarray(wa)), "smoke any MISMATCH"
    print(f"smoke any OK in {time.perf_counter() - t0:.1f}s")


def colonnade_profile(width, height, target, block_tris_list=(32, 64)):
    from capsaicin_tpu.ops import pallas_traverse as pt
    from capsaicin_tpu.ops import stream
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.render.traversal import (
        with_ray_sorting, with_ray_sorting_any,
    )
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, make_camera

    scene = build_scene(colonnade(target_tris=target))
    tris_np = scene.triangles()
    tris = jnp.asarray(tris_np)
    n_tris = tris.shape[0]
    camera = make_camera("colonnade", width, height)
    o, d = create_primary_rays(
        camera, pixel_grid(width, height), (width, height), 0)
    o = jnp.asarray(np.asarray(o).reshape(-1, 3))
    d = jnp.asarray(np.asarray(d).reshape(-1, 3))
    n = o.shape[0]
    print(f"tris={n_tris} rays={n}")

    # bounce-style rays: origins on visible surfaces, cosine dirs
    rng = np.random.default_rng(5)
    lo, hi = scene.bounds()
    ob = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
    db = rng.normal(size=(n, 3)).astype(np.float32)
    db = jnp.asarray(db / np.linalg.norm(db, axis=1, keepdims=True))

    results = {}
    for bt in block_tris_list:
        key = f"stream{bt}"
        t0 = time.perf_counter()
        sb = stream.build_stream_bvh(tris_np, block_tris=bt)
        sb = jax.device_put(sb)
        print(f"[{key}] build {time.perf_counter() - t0:.1f}s "
              f"blocks={sb.n_blocks}")

        closest = jax.jit(
            lambda o, d, sb=sb: stream.stream_closest(sb, o, d, 0.0, 1e6))
        anyf = jax.jit(
            lambda o, d, sb=sb: stream.stream_any(sb, o, d, 1e-3, 1e6))
        sort_c = jax.jit(with_ray_sorting(
            lambda oo, dd, a, b, sb=sb: stream.stream_closest(sb, oo, dd, a, b)))

        # exact step counts from tools/sim_stream.py for THIS workload at
        # the default 250k-tri/1080p/block-32 config — lets the log answer
        # the us/step question (PERF.md bounds 0.3-1.2) on first HW contact
        # (primary only: the profiler's any-hit row uses CAMERA rays, which
        # have no sim counterpart — the sim's 189/25.7 are real shadow rays)
        sim_steps = {"stream32_primary": 40.3 * 2025}

        def us_step(rkey, dt):
            s = sim_steps.get(rkey)
            if s and target == 250_000 and (width, height) == (1920, 1080):
                return f"  [{dt / s * 1e6:.2f} us/step @ sim {s:.0f} steps]"
            return ""

        dt = t_cycle(closest, ray_sets(o, d))
        results[f"{key}_primary"] = dt
        print(f"[{key}] primary closest {dt*1e3:.1f} ms "
              f"({n/dt/1e6:.1f} Mrays/s)"
              + us_step(f"{key}_primary", dt))
        closest_flat = jax.jit(lambda o, d, sb=sb: stream.stream_closest(
            sb, o, d, 0.0, 1e6, hier=False))
        dt = t_cycle(closest_flat, ray_sets(o, d))
        results[f"{key}_primary_flat"] = dt
        print(f"[{key}] primary flat-extract {dt*1e3:.1f} ms "
              f"({n/dt/1e6:.1f} Mrays/s)")
        dt = t_cycle(anyf, ray_sets(o, d))
        results[f"{key}_any"] = dt
        print(f"[{key}] shadow any    {dt*1e3:.1f} ms "
              f"({n/dt/1e6:.1f} Mrays/s)")
        dt = t_cycle(lambda oo, dd: sort_c(oo, dd, 0.0, 1e6), ray_sets(ob, db))
        results[f"{key}_bounce_sorted"] = dt
        print(f"[{key}] bounce sorted {dt*1e3:.1f} ms "
              f"({n/dt/1e6:.1f} Mrays/s)")
        # the production bounce path: 96-bin direction sort + count-balance
        from capsaicin_tpu.render.traversal import make_stream_bounce_fns

        bc, _ = make_stream_bounce_fns(sb)
        bc = jax.jit(bc)
        dt = t_cycle(lambda oo, dd: bc(oo, dd, 1e-3, 1e6), ray_sets(ob, db))
        results[f"{key}_bounce_balanced"] = dt
        print(f"[{key}] bounce dirbins4+balance {dt*1e3:.1f} ms "
              f"({n/dt/1e6:.1f} Mrays/s)")

    # packet-BVH baseline
    t0 = time.perf_counter()
    packed = jax.device_put(pt.build_packed_bvh(tris))
    print(f"[bvh] build {time.perf_counter() - t0:.1f}s")
    closest_b = jax.jit(lambda o, d: pt.bvh_closest(packed, o, d, 0.0, 1e6))
    dt = t_cycle(closest_b, ray_sets(o, d))
    results["bvh_primary"] = dt
    print(f"[bvh] primary closest {dt*1e3:.1f} ms ({n/dt/1e6:.1f} Mrays/s)")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke-only", action="store_true")
    ap.add_argument("--target", type=int, default=250_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--blocks", type=str, default="32,64")
    args = ap.parse_args()
    # ops-level tool (no RenderSession): opt into the persistent compile
    # cache explicitly, or every run repays the multi-minute Pallas compiles
    from capsaicin_tpu.render.session import setup_compilation_cache

    setup_compilation_cache()
    smoke()
    if not args.smoke_only:
        colonnade_profile(
            args.width, args.height, args.target,
            tuple(int(x) for x in args.blocks.split(",")))
