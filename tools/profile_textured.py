#!/usr/bin/env python
"""Textured-config TPU profile: where do 36.4 ms go, and does the rgba8
u32 atlas (scene.quantize_atlas, 16 B/gather-row) beat the f32 quad atlas
(64 B/row)?

Stage 1 (isolated): sample_atlas over 2M random-ish indices — f32 vs u32 —
plus the same frame's two call-site patterns (coherent primary-hit uvs,
incoherent bounce uvs).
Stage 2 (frames): full 9-pass textured 1024^2 frame f32 vs u32 vs an
untextured control (same geometry, constant albedo) — the control bounds
what killing the atlas path entirely would buy.

Inputs cycle across iterations (the axon tunnel caches repeated identical
executions, see PERF.md).

Usage: python tools/profile_textured.py [--iters 6] [--stage1-only]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t_cycle(fn, arg_sets, iters):
    out = fn(*arg_sets[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*arg_sets[i % len(arg_sets)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def stage1(iters):
    from capsaicin_tpu.render.shading import sample_atlas
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import cornell_box_textured
    from capsaicin_tpu.scene.scene import quantize_atlas

    meshes, tex = cornell_box_textured()
    sc_f = build_scene(meshes, tex)
    sc_q = quantize_atlas(sc_f)
    n = 2 * 1024 * 1024
    rng = np.random.default_rng(5)

    def variants(kind):
        outs = []
        for s in range(3):
            if kind == "coherent":
                # primary-hit-like: smooth ramp across the floor texture
                base = np.linspace(0, 4, n, dtype=np.float32)
                uv = np.stack([base % 1.0, (base * 0.37 + s * 0.1) % 1.0], -1)
            else:
                uv = rng.random((n, 2), dtype=np.float32) * 3.0 - 1.0
            outs.append((jnp.asarray(uv), jnp.zeros((n,), jnp.int32)))
        return outs

    print(f"stage 1: isolated sample_atlas, n={n}")
    for kind in ("coherent", "incoherent"):
        vs = variants(kind)
        for name, sc in (("f32x16", sc_f), ("u32x4", sc_q)):
            atlas = jnp.asarray(sc.atlas)
            sizes = jnp.asarray(sc.atlas_size)
            f = jax.jit(lambda uv, tid, a=atlas, sz=sizes: sample_atlas(a, sz, tid, uv))
            dt = t_cycle(f, vs, iters)
            print(f"  {kind:10s} {name:7s}: {dt*1e3:7.2f} ms "
                  f"({dt/n*1e9:5.2f} ns/idx)")


def stage2(iters):
    from capsaicin_tpu.render import RenderOptions, RenderSession
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import (
        cornell_box, cornell_box_textured, make_camera,
    )
    from capsaicin_tpu.scene.scene import quantize_atlas

    meshes, tex = cornell_box_textured()
    sc_f = build_scene(meshes, tex)
    cases = [
        ("textured f32", sc_f),
        ("textured u32", quantize_atlas(sc_f)),
        ("untextured ctl", build_scene(cornell_box())),
    ]
    print("stage 2: full 1024^2 1-bounce frames")
    for name, sc in cases:
        s = RenderSession(width=1024, height=1024,
                          options=RenderOptions(num_diffuse_bounces=1))
        s.set_camera(make_camera("cornell", 1024, 1024))
        s.set_scene(sc)
        s.render(); s.render()  # compile + warm
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = s.render_async()
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        # 4 rays/pixel: primary + shadow + bounce + NEE (bench.py accounting)
        mrays = 4 * 1024 * 1024 / dt / 1e6
        print(f"  {name:15s}: {dt*1e3:7.2f} ms/frame  {mrays:7.1f} Mrays/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--stage1-only", action="store_true")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}")
    stage1(args.iters)
    if not args.stage1_only:
        stage2(args.iters)


if __name__ == "__main__":
    main()
