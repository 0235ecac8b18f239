#!/usr/bin/env python
"""Which gather formulation is fast on TPU? Isolate the difference between
flat src[idx] (measured ~0us, suspicious) and the [H,W] quad-gather (49ms)."""

import time

import jax
import jax.numpy as jnp
from jax import lax

H, W = 1080, 1920
N = H * W


def bench(name, fn, *args, iters=10):
    f = jax.jit(fn, static_argnums=(0,))
    out = f(iters, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(iters, *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:58s} {dt:8.3f} ms/iter")


def main():
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (N, 16), jnp.float32)
    idxr = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N, jnp.int32)

    # a) data-dependent random idx each iteration (cannot be precomputed)
    def a(iters, src, idx):
        def body(i, carry):
            idx, acc = carry
            g = src[idx]
            # new indices derived from gathered DATA -> no hoisting possible
            idx = (
                jnp.abs(g[:, 0] * 1e6).astype(jnp.int32) % N
            )
            return idx, acc + g

        return lax.fori_loop(0, iters, body, (idx, jnp.zeros((N, 16))))

    bench("flat src[idx], idx data-dependent", a, src, idxr)

    # b) same but jnp.take
    def b(iters, src, idx):
        def body(i, carry):
            idx, acc = carry
            g = jnp.take(src, idx, axis=0)
            idx = jnp.abs(g[:, 0] * 1e6).astype(jnp.int32) % N
            return idx, acc + g

        return lax.fori_loop(0, iters, body, (idx, jnp.zeros((N, 16))))

    bench("jnp.take(src, idx, 0), idx data-dependent", b, src, idxr)

    # c) 2d-shaped idx [H,W] gathering [H,W,16] output
    src2 = src.reshape(H, W, 16)
    ix = jax.random.randint(jax.random.PRNGKey(2), (H, W), 0, W, jnp.int32)
    iy = jax.random.randint(jax.random.PRNGKey(3), (H, W), 0, H, jnp.int32)

    def c(iters, src2, ix, iy):
        flat = src2.reshape(N, 16)

        def body(i, carry):
            ix, iy, acc = carry
            g = flat[(iy * W + ix).reshape(-1)]
            g2 = g.reshape(H, W, 16)
            ix = jnp.abs(g2[..., 0] * 1e6).astype(jnp.int32) % W
            iy = jnp.abs(g2[..., 1] * 1e6).astype(jnp.int32) % H
            return ix, iy, acc + g2

        return lax.fori_loop(0, iters, body, (ix, iy, jnp.zeros((H, W, 16))))

    bench("[H,W] idx -> flat gather -> [H,W,16]", c, src2, ix, iy)

    # d) flat, but fewer channels: 4
    src4 = src[:, :4]

    def d(iters, src, idx):
        def body(i, carry):
            idx, acc = carry
            g = src[idx]
            idx = jnp.abs(g[:, 0] * 1e6).astype(jnp.int32) % N
            return idx, acc + g

        return lax.fori_loop(0, iters, body, (idx, jnp.zeros((N, 4))))

    bench("flat src[idx] 4ch, idx data-dependent", d, src4, idxr)

    # e) flat 1 channel
    src1 = src[:, :1]

    def e(iters, src, idx):
        def body(i, carry):
            idx, acc = carry
            g = src[idx]
            idx = jnp.abs(g[:, 0] * 1e6).astype(jnp.int32) % N
            return idx, acc + g

        return lax.fori_loop(0, iters, body, (idx, jnp.zeros((N, 1))))

    bench("flat src[idx] 1ch, idx data-dependent", e, src1, idxr)

    # f) SORTED indices (coherent gather)
    def f(iters, src, idx):
        def body(i, carry):
            idx, acc = carry
            g = src[jnp.sort(idx)]
            idx = jnp.abs(g[:, 0] * 1e6).astype(jnp.int32) % N
            return idx, acc + g

        return lax.fori_loop(0, iters, body, (idx, jnp.zeros((N, 16))))

    bench("flat src[sort(idx)] incl sort cost", f, src, idxr)

    # g) argsort cost alone on N keys
    def g(iters, idx):
        def body(i, carry):
            idx, acc = carry
            o = jnp.argsort(idx)
            idx = (idx + o) % N
            return idx, acc + o

        return lax.fori_loop(0, iters, body, (idx, jnp.zeros((N,), jnp.int32)))

    bench("argsort 2.07M int keys", g, idxr, iters=5)


if __name__ == "__main__":
    from capsaicin_tpu.render.session import setup_compilation_cache
    setup_compilation_cache()  # ops-level tool: opt into the persistent compile cache
    main()
