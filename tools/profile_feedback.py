#!/usr/bin/env python
"""Measure feedback-fetch reformulations at 1080p on the real device."""

import time

import jax
import jax.numpy as jnp

W, H = 1920, 1080
N = W * H


def _time(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    ch4 = jax.random.normal(key, (H, W, 4), jnp.float32)
    # scattered reprojection targets
    px = jax.random.uniform(jax.random.PRNGKey(1), (N,), minval=0.0, maxval=W - 1.0)
    py = jax.random.uniform(jax.random.PRNGKey(2), (N,), minval=0.0, maxval=H - 1.0)

    def corners(px, py):
        x0 = px - 0.5
        y0 = py - 0.5
        bx = jnp.floor(x0).astype(jnp.int32)
        by = jnp.floor(y0).astype(jnp.int32)
        wx = (x0 - jnp.floor(x0))[:, None]
        wy = (y0 - jnp.floor(y0))[:, None]
        return bx, by, wx, wy

    # (e) single gathers of widths 4, 8, 16
    for width_ch in (4, 8, 16):
        src = jax.random.normal(key, (N, width_ch), jnp.float32)

        def g1(src, px, py):
            bx, by, wx, wy = corners(px, py)
            idx = jnp.clip(by, 0, H - 1) * W + jnp.clip(bx, 0, W - 1)
            return src[idx].sum()

        print(f"single gather [N,{width_ch}]: {_time(jax.jit(g1), src, px, py):8.2f} ms")

    # (a) roll-built f32 quad (16ch) + 1 gather + bilinear
    def quad_roll_f32(ch4, px, py):
        bx, by, wx, wy = corners(px, py)
        q = jnp.concatenate(
            [
                ch4,
                jnp.roll(ch4, -1, axis=1),
                jnp.roll(ch4, -1, axis=0),
                jnp.roll(ch4, (-1, -1), axis=(0, 1)),
            ],
            axis=-1,
        )
        flat = q.reshape(N, 16)
        idx = jnp.clip(by, 0, H - 1) * W + jnp.clip(bx, 0, W - 1)
        v = flat[idx]
        wx = jnp.where(bx + 1 > W - 1, 0.0, wx[:, 0])[:, None]
        wy = jnp.where(by + 1 > H - 1, 0.0, wy[:, 0])[:, None]
        top = v[:, 0:4] * (1 - wx) + v[:, 4:8] * wx
        bot = v[:, 8:12] * (1 - wx) + v[:, 12:16] * wx
        return (top * (1 - wy) + bot * wy).sum()

    print(f"(a) roll-quad f32 + 1 gather: {_time(jax.jit(quad_roll_f32), ch4, px, py):8.2f} ms")

    # (b) f16 quad (8 f32 lanes) + 1 gather
    def quad_roll_f16(ch4, px, py):
        bx, by, wx, wy = corners(px, py)
        h4 = ch4.astype(jnp.bfloat16)
        q = jnp.concatenate(
            [
                h4,
                jnp.roll(h4, -1, axis=1),
                jnp.roll(h4, -1, axis=0),
                jnp.roll(h4, (-1, -1), axis=(0, 1)),
            ],
            axis=-1,
        )
        flat = jax.lax.bitcast_convert_type(
            q.reshape(N, 8, 2), jnp.float32
        ).reshape(N, 8)
        idx = jnp.clip(by, 0, H - 1) * W + jnp.clip(bx, 0, W - 1)
        v = flat[idx]
        v = jax.lax.bitcast_convert_type(
            v.reshape(N, 8, 1).view() if False else v.reshape(N, 8)[..., None].astype(jnp.float32) * 0
            , jnp.float32) if False else v
        h = jax.lax.bitcast_convert_type(v.reshape(N, 8), jnp.bfloat16).reshape(N, 16)
        wx = jnp.where(bx + 1 > W - 1, 0.0, wx[:, 0])[:, None]
        wy = jnp.where(by + 1 > H - 1, 0.0, wy[:, 0])[:, None]
        hf = h.astype(jnp.float32)
        top = hf[:, 0:4] * (1 - wx) + hf[:, 4:8] * wx
        bot = hf[:, 8:12] * (1 - wx) + hf[:, 12:16] * wx
        return (top * (1 - wy) + bot * wy).sum()

    print(f"(b) roll-quad bf16 + 1 gather: {_time(jax.jit(quad_roll_f16), ch4, px, py):8.2f} ms")

    # (c) 4 gathers of bf16-packed [N,2]
    def four_f16(ch4, px, py):
        bx, by, wx, wy = corners(px, py)
        h4 = ch4.astype(jnp.bfloat16)
        flat = jax.lax.bitcast_convert_type(
            h4.reshape(N, 2, 2), jnp.float32
        ).reshape(N, 2)

        def g(jx, jy):
            idx = jnp.clip(jy, 0, H - 1) * W + jnp.clip(jx, 0, W - 1)
            v = flat[idx]
            return jax.lax.bitcast_convert_type(
                v.reshape(N, 2), jnp.bfloat16
            ).reshape(N, 4).astype(jnp.float32)

        v00 = g(bx, by)
        v10 = g(bx + 1, by)
        v01 = g(bx, by + 1)
        v11 = g(bx + 1, by + 1)
        top = v00 * (1 - wx) + v10 * wx
        bot = v01 * (1 - wx) + v11 * wx
        return (top * (1 - wy) + bot * wy).sum()

    print(f"(c) 4x bf16 [N,2] gathers: {_time(jax.jit(four_f16), ch4, px, py):8.2f} ms")

    # (d) existing implementation shape: pad + shift quad + gather
    from capsaicin_tpu.ops import resample
    from capsaicin_tpu.render.passes import shift2d_clamped

    def quad_pad(ch4, px, py):
        bx, by, wx, wy = corners(px, py)
        fb_pad = jnp.pad(ch4, ((1, 1), (1, 1), (0, 0)), mode="edge")
        fb_quad = jnp.concatenate(
            [fb_pad, shift2d_clamped(fb_pad, 1, 0), shift2d_clamped(fb_pad, 0, 1),
             shift2d_clamped(fb_pad, 1, 1)], axis=-1)
        quad = resample._gather_pixels(
            fb_quad, bx.reshape(H, W) + 1, by.reshape(H, W) + 1
        )
        top = quad[..., 0:4] * (1 - wx.reshape(H, W, 1)) + quad[..., 4:8] * wx.reshape(H, W, 1)
        bot = quad[..., 8:12] * (1 - wx.reshape(H, W, 1)) + quad[..., 12:16] * wx.reshape(H, W, 1)
        return (top * (1 - wy.reshape(H, W, 1)) + bot * wy.reshape(H, W, 1)).sum()

    print(f"(d) current pad-quad + gather: {_time(jax.jit(quad_pad), ch4, px, py):8.2f} ms")


if __name__ == "__main__":
    main()
