#!/usr/bin/env python
"""Per-step cost microbenchmark for the packet traversal loop.

Runs a synthetic node walk (fixed step count, no leaf work) with different
per-step bodies to attribute the ~400ns/step:
  walk_const   — AABB test against constant boxes (no fetch, no reduce)
  walk_fetch   — + dynamic row read + roll + 6 rank-0 extracts
  walk_onehot  — + dynamic row read + one-hot lane-reduction extracts
  walk_reduce  — walk_fetch + jnp.any() reduction each step
  walk_full    — walk_reduce + dfs_next arithmetic + cond branch (no-op leaf)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
STEPS = 4096
N_ROWS = 512  # node rows


def make_kernel(variant):
    def kernel(rays_ref, nodes_ref, out_ref):
        ox = rays_ref[0, 0]
        oy = rays_ref[0, 1]
        oz = rays_ref[0, 2]
        ix = rays_ref[0, 3]
        iy = rays_ref[0, 4]
        iz = rays_ref[0, 5]
        tmin = rays_ref[0, 6]
        t_best = rays_ref[0, 7]
        out_ref[0, 0] = jnp.zeros((SUB, LANE), jnp.float32)

        def aabb(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z):
            tx0 = (lo_x - ox) * ix
            tx1 = (hi_x - ox) * ix
            ty0 = (lo_y - oy) * iy
            ty1 = (hi_y - oy) * iy
            tz0 = (lo_z - oz) * iz
            tz1 = (hi_z - oz) * iz
            t_near = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1))
            t_far = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1))
            return (t_near <= t_far) & (t_far >= tmin) & (t_near <= t_best)

        def body(state):
            step, k, acc = state
            if variant == "const":
                hit = aabb(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
                acc = acc + step
                k = k + 1
            else:
                row = nodes_ref[k % N_ROWS, :].reshape(1, 128)
                if variant == "onehot":
                    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                    slot = (k % 16) * 8

                    def pick(c):
                        return jnp.sum(jnp.where(lane_ids == slot + c, row, 0.0))
                else:
                    slot = (k % 16) * 8
                    rec = pltpu.roll(row, (128 - slot) % 128, axis=1)

                    def pick(c):
                        return rec[0, c]

                hit = aabb(pick(0), pick(1), pick(2), pick(3), pick(4), pick(5))
                if variant in ("reduce", "full"):
                    any_box = jnp.any(hit)
                    if variant == "full":
                        @pl.when(any_box & (k % 64 == 0))
                        def _():
                            out_ref[0, 0] = out_ref[0, 0] + 1.0

                        kk = k.astype(jnp.uint32)
                        x = (~kk) & (kk + 1)
                        x = x - 1
                        x = x - ((x >> 1) & jnp.uint32(0x55555555))
                        x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
                        x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
                        tr = ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)
                        k = jnp.where(any_box, 2 * k, jnp.where((k >> tr) <= 1, 1, (k >> tr) + 1))
                        k = jnp.where(k >= 8 * N_ROWS, (k % N_ROWS) + 2, k)
                        acc = acc + jnp.where(any_box, 1, 0)
                    else:
                        acc = acc + jnp.where(any_box, 1, 0)
                        k = k + 1
                else:
                    acc = acc + k
                    k = k + 1
            return step + 1, k, acc

        def cond(state):
            return state[0] < STEPS

        _, _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(2), jnp.int32(0)))
        out_ref[0, 0] = out_ref[0, 0] + acc.astype(jnp.float32)

    return kernel


def run(variant, n_packets=64):
    rays = jnp.ones((n_packets, 8, SUB, LANE), jnp.float32)
    nodes = jnp.ones((N_ROWS, 128), jnp.float32)
    out = pl.pallas_call(
        make_kernel(variant),
        grid=(n_packets,),
        in_specs=[
            pl.BlockSpec((1, 8, SUB, LANE), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_ROWS, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, SUB, LANE), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_packets, 1, SUB, LANE), jnp.float32),
    )
    f = jax.jit(lambda r, n: out(r, n))
    f(rays, nodes).block_until_ready()
    # vary the input each call: the axon tunnel caches repeated identical
    # executions (see .claude/skills/verify)
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        o = f(rays + (0.001 * (i + 1)), nodes)
    o.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    ns_per_step = dt / (n_packets * STEPS) * 1e9
    print(json.dumps({"variant": variant, "ns_per_step": round(ns_per_step, 1)}), flush=True)


if __name__ == "__main__":
    from capsaicin_tpu.render.session import setup_compilation_cache
    setup_compilation_cache()  # ops-level tool: opt into the persistent compile cache
    for v in ("const", "fetch", "onehot", "reduce", "full"):
        run(v)
