#!/usr/bin/env python
"""Microbenchmarks for the hot ops inside the frame (axon-safe: every
measurement is a data-dependent lax.fori_loop inside ONE jit, so the tunnel
cannot cache repeated identical calls)."""

import time

import jax
import jax.numpy as jnp
from jax import lax


def bench(name, fn, *args, iters=20):
    f = jax.jit(fn, static_argnums=(0,))
    out = f(iters, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(iters, *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:45s} {dt:8.3f} ms/iter")
    return dt


def main():
    H, W = 1080, 1920
    N = H * W
    key = jax.random.PRNGKey(0)

    # 1) flat gather: N indices into [N, C] for C in {4, 16}
    for C in (4, 16):
        src = jax.random.normal(key, (N, C), jnp.float32)
        idx0 = jax.random.randint(key, (N,), 0, N, jnp.int32)

        def gather_loop(iters, src, idx0):
            def body(i, carry):
                idx, acc = carry
                g = src[idx]
                acc = acc + g
                idx = (idx + 1) % N
                return idx, acc

            return lax.fori_loop(0, iters, body, (idx0, jnp.zeros((N, C))))

        bench(f"gather {N} idx from [N,{C}] (random)", gather_loop, src, idx0)

    # 2) 2d gather from [H,W,16] via flat index (the quad-gather pattern)
    src2 = jax.random.normal(key, (H, W, 16), jnp.float32)
    ix0 = jax.random.randint(key, (H, W), 0, W, jnp.int32)
    iy0 = jax.random.randint(key, (H, W), 0, H, jnp.int32)

    def gather2d_loop(iters, src, ix, iy):
        flat = src.reshape(H * W, 16)

        def body(i, carry):
            ix, iy, acc = carry
            g = flat[(iy * W + ix).reshape(-1)].reshape(H, W, 16)
            acc = acc + g
            ix = (ix + 1) % W
            return ix, iy, acc

        return lax.fori_loop(0, iters, body, (ix0, iy0, jnp.zeros((H, W, 16))))

    bench("quad-gather [H,W]->[H,W,16] (random)", gather2d_loop, src2, ix0, iy0)

    # 3) blue-noise 4x4 field (current implementation: per-pixel gather)
    from capsaicin_tpu.ops import sampling
    from capsaicin_tpu.ops.camera import pixel_grid

    noise = jax.random.uniform(key, (256, 256, 2), jnp.float32)
    xy = pixel_grid(W, H).reshape(-1, 2)

    def bn_loop(iters, noise, xy):
        def body(i, acc):
            s = sampling.sample2d_bluenoise4x4(noise, xy, i * 25)
            return acc + s

        return lax.fori_loop(0, iters, body, jnp.zeros((N, 2)))

    bench("blue-noise 4x4 per-pixel gather", bn_loop, noise, xy)

    # 4) static-kernel trace of N rays over 40 tris
    from capsaicin_tpu.ops import pallas_static
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import cornell_box

    scene = build_scene(cornell_box())
    tris = jnp.asarray(scene.triangles())
    packed = pallas_static.build_static(tris)
    o = jnp.zeros((N, 3), jnp.float32) + jnp.array([0.0, 15.0, 0.0])
    d = jax.random.normal(key, (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def trace_loop(iters, o, d):
        def body(i, carry):
            d, acc = carry
            hit = pallas_static.static_closest(packed, o, d, 0.0, 1e6)
            acc = acc + hit["t"]
            # perturb directions so iterations are not cacheable
            d = d.at[:, 0].add(1e-6 * i)
            return d, acc

        return lax.fori_loop(0, iters, body, (d, jnp.zeros((N,))))

    bench("static trace 2.07M rays x 40 tris", trace_loop, o, d, iters=10)

    # 5) one-hot MXU table lookup: N indices into [40, 29]
    from capsaicin_tpu.ops.pallas_lookup import table_lookup

    table = jax.random.normal(key, (40, 29), jnp.float32)
    pidx = jax.random.randint(key, (N,), 0, 40, jnp.int32)

    def lookup_loop(iters, table, pidx):
        def body(i, carry):
            pidx, acc = carry
            attr = table_lookup(table, pidx)
            return (pidx + 1) % 40, acc + attr

        return lax.fori_loop(0, iters, body, (pidx, jnp.zeros((N, 29))))

    bench("one-hot table lookup 2.07M x [40,29]", lookup_loop, table, pidx)

    # 6) elementwise flop soup (normalize + power) as sanity floor
    x = jax.random.normal(key, (N, 3), jnp.float32)

    def ew_loop(iters, x):
        def body(i, acc):
            y = jnp.power(jnp.abs(acc + x), 1.1)
            return y / jnp.linalg.norm(y, axis=-1, keepdims=True)

        return lax.fori_loop(0, iters, body, x)

    bench("elementwise normalize+pow [N,3]", ew_loop, x)


if __name__ == "__main__":
    from capsaicin_tpu.render.session import setup_compilation_cache
    setup_compilation_cache()  # ops-level tool: opt into the persistent compile cache
    main()
