#!/usr/bin/env python
"""Measure XLA gather / top_k / dense-test costs on the real TPU.

These are the primitives of the wavefront-v2 'dense cull' traversal design;
the decision between row-level vs block-level candidate lists is set by the
per-slice gather cost at 320B / 1.3KB / 5KB slices.

Marginal-REPS method (tunnel caches identical dispatches; ~30ms constant
dispatch overhead): time(iters=R2) - time(iters=R1) over (R2-R1) loop steps,
with data-dependent indices so iterations can't be folded.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

R1, R2 = 8, 32


def bench(name, make_fn, *args, per=1.0):
    fn = jax.jit(make_fn, static_argnums=0)
    for r in (R1, R2):
        fn(r, *args)[-1].block_until_ready()  # compile both variants
    ts = {}
    for r in (R1, R2):
        t0 = time.perf_counter()
        fn(r, *args)[-1].block_until_ready()
        ts[r] = time.perf_counter() - t0
    step = (ts[R2] - ts[R1]) / (R2 - R1)
    print(json.dumps({"name": name, "ms_per_iter": round(step * 1e3, 4),
                      "ns_per_unit": round(step / per * 1e9, 2)}), flush=True)
    return step


def main():
    print(f"# backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)

    # --- gather: K slices of W floats from an [N, W] table ---------------
    for n, w, k in ((32768, 80, 65536), (32768, 80, 2_073_600 // 4),
                    (2048, 1280, 65536), (2048, 1280, 524288),
                    (4096, 512, 524288)):
        table = jax.random.normal(key, (n, w), jnp.float32)
        idx0 = jax.random.randint(key, (k,), 0, n)

        def run(iters, table, idx):
            def body(i, carry):
                idx, acc = carry
                g = table[idx]  # [K, W]
                s = g[:, 0]
                idx = (idx + s.astype(jnp.int32) % 7 + 1) % table.shape[0]
                return idx, acc + s
            return lax.fori_loop(0, iters, body,
                                 (idx, jnp.zeros((k,), jnp.float32)))

        bench(f"gather [{k}] slices of {w * 4}B from [{n},{w}]",
              run, table, idx0, per=k)

    # --- top_k(B) over [P, S] masked keys --------------------------------
    for p, s, b in ((4096, 2048, 64), (65536, 64, 16)):
        keys0 = jax.random.normal(key, (p, s), jnp.float32)

        def runk(iters, keys):
            def body(i, carry):
                keys, acc = carry
                v, idx = lax.top_k(keys, b)
                keys = keys + (idx[:, :1] % 3).astype(jnp.float32)
                return keys, acc + v[:, 0]
            return lax.fori_loop(0, iters, body,
                                 (keys0, jnp.zeros((p,), jnp.float32)))

        bench(f"top_k({b}) over [{p},{s}]", runk, keys0, per=p)

    # --- dense packet-vs-box interval test [P, S] ------------------------
    p, s = 65536, 2048
    pk = jax.random.normal(key, (p, 12), jnp.float32)
    boxes = jax.random.normal(key, (s, 6), jnp.float32)

    def rund(iters, pk, boxes):
        def body(i, carry):
            pk, acc = carry
            o_lo, o_hi = pk[:, 0:3], pk[:, 3:6]
            i_lo, i_hi = pk[:, 6:9], pk[:, 9:12]
            b_lo, b_hi = boxes[None, :, 0:3], boxes[None, :, 3:6]
            a0l = b_lo - o_hi[:, None]
            a0h = b_lo - o_lo[:, None]
            a1l = b_hi - o_hi[:, None]
            a1h = b_hi - o_lo[:, None]

            def prods(al, ah):
                q = jnp.stack([al * i_lo[:, None], al * i_hi[:, None],
                               ah * i_lo[:, None], ah * i_hi[:, None]])
                return q.min(0), q.max(0)

            l0, h0 = prods(a0l, a0h)
            l1, h1 = prods(a1l, a1h)
            tn = jnp.minimum(l0, l1).max(-1)
            tf = jnp.maximum(h0, h1).min(-1)
            hit = (tn <= tf) & (tf >= 0)
            pk = pk + hit.sum(1, keepdims=True).astype(jnp.float32) * 1e-9
            return pk, acc + hit.sum(1)
        return lax.fori_loop(0, iters, body,
                             (pk, jnp.zeros((p,), jnp.int32)))

    bench(f"dense interval [{p},{s}]", rund, pk, boxes, per=p * s)

    # --- MT outer product: [P, G, C] all-pairs ---------------------------
    pp, g, c = 8192, 32, 128
    rays = jax.random.normal(key, (pp, g, 8), jnp.float32)
    tris = jax.random.normal(key, (pp, c, 10), jnp.float32)

    def runmt(iters, rays, tris):
        def body(i, carry):
            rays, acc = carry
            o = rays[..., 0:3][:, :, None]
            d = rays[..., 3:6][:, :, None]
            v0 = tris[..., 0:3][:, None]
            e1 = tris[..., 3:6][:, None]
            e2 = tris[..., 6:9][:, None]
            pv = jnp.cross(d, e2)
            det = (e1 * pv).sum(-1)
            inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tv = o - v0
            u = (tv * pv).sum(-1) * inv
            qv = jnp.cross(tv, e1)
            v = (d * qv).sum(-1) * inv
            t = (e2 * qv).sum(-1) * inv
            ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
            tbest = jnp.where(ok, t, 1e30).min(-1)
            rays = rays.at[..., 7].set(tbest)
            return rays, acc + tbest
        return lax.fori_loop(0, iters, body,
                             (rays, jnp.zeros((pp, g), jnp.float32)))

    bench(f"MT outer [{pp},{g}x{c}]", runmt, rays, tris, per=pp * g * c)


if __name__ == "__main__":
    from capsaicin_tpu.render.session import setup_compilation_cache
    setup_compilation_cache()  # ops-level tool: opt into the persistent compile cache
    main()
