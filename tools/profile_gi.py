#!/usr/bin/env python
"""Dissect the indirect-GI pass cost at 1080p: option variants + stages."""

import time

import jax
import jax.numpy as jnp


def _time(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from capsaicin_tpu.render import RenderOptions, RenderSession, passes
    from capsaicin_tpu.render.traversal import make_traversal
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import cornell_box, make_camera

    W, H = 1920, 1080
    session = RenderSession(width=W, height=H, options=RenderOptions())
    session.set_camera(make_camera("cornell", W, H))
    session.set_scene(build_scene(cornell_box()))
    session.render()
    session.render()

    scene = session.scene_dev
    state = session.state
    camera = session.camera
    noise = session.noise
    fc = state.frame_count
    prev_camera = state.prev_camera
    prev_nd = {
        "oct": state.prev_nd_oct,
        "inst": state.prev_nd_inst,
        "depth": state.prev_nd_depth,
    }
    ch = state.combined_history.astype(jnp.float32)
    closest, any_hit = make_traversal(scene, session._resolved_mode, session.bvh)

    gb_fn = jax.jit(lambda cam, fc: passes.trace_primary(closest, cam, W, H, fc))
    gb = gb_fn(camera, fc)
    jax.block_until_ready(gb)

    def gi(opts):
        def f(scene, camera, prev_camera, gb, ch, prev_nd, noise, fc):
            return passes.indirect_gi(
                scene, closest, any_hit, camera, prev_camera, gb, ch,
                prev_nd, noise, W, H, fc, opts,
            )
        return jax.jit(f)

    variants = {
        "full (feedback on)": RenderOptions(),
        "feedback off": RenderOptions(gbuffer_feedback=False),
        "0 bounces (attr fetch + loop shell only)": RenderOptions(num_diffuse_bounces=0),
        "2 bounces": RenderOptions(num_diffuse_bounces=2),
    }
    for name, opts in variants.items():
        dt = _time(gi(opts), scene, camera, prev_camera, gb, ch, prev_nd, noise, fc)
        print(f"GI {name:42s} {dt:8.2f} ms")

    # isolated pieces
    from capsaicin_tpu.render import shading

    prim = gb["prim"].reshape(-1)
    u = gb["bary"][..., 0].reshape(-1)
    v = gb["bary"][..., 1].reshape(-1)

    f_attr = jax.jit(lambda p, u, v: shading.fetch_hit_attributes(scene, p, u, v))
    hit = f_attr(prim, u, v)
    jax.block_until_ready(hit)
    print(f"{'fetch_hit_attributes':45s} {_time(f_attr, prim, u, v):8.2f} ms")

    p, n = hit["p"], hit["n"]
    d = -n

    f_tr = jax.jit(lambda p, d: closest(p, d, 1e-4, 1e5))
    print(f"{'closest trace 2.07M rays':45s} {_time(f_tr, p, d):8.2f} ms")
    f_any = jax.jit(lambda p, d: any_hit(p, d, 1e-4, 1e5))
    print(f"{'any trace 2.07M rays':45s} {_time(f_any, p, d):8.2f} ms")

    # the feedback fetch in isolation
    def feedback(ch, p, prev_depth):
        from capsaicin_tpu.ops import camera as cam
        from capsaicin_tpu.ops import resample
        from capsaicin_tpu.render.passes import shift2d_clamped

        prev_uv = cam.calculate_image_plane_uv(prev_camera, p)
        prev_xy = resample.uv_to_xy(prev_uv, (W, H))
        fb_pack = jnp.concatenate([ch[..., :3], prev_depth[..., None]], axis=-1)
        fb_pad = jnp.pad(fb_pack, ((1, 1), (1, 1), (0, 0)), mode="edge")
        fb_quad = jnp.concatenate(
            [fb_pad, shift2d_clamped(fb_pad, 1, 0), shift2d_clamped(fb_pad, 0, 1),
             shift2d_clamped(fb_pad, 1, 1)], axis=-1)
        xy0 = prev_xy - 0.5
        bx = jnp.floor(xy0[..., 0]).astype(jnp.int32)
        by = jnp.floor(xy0[..., 1]).astype(jnp.int32)
        quad = resample._gather_pixels(fb_quad, bx + 1, by + 1)
        return quad.sum()

    f_fb = jax.jit(feedback)
    print(f"{'feedback quad-pack + gather':45s} {_time(f_fb, ch, p, prev_nd['depth']):8.2f} ms")

    # plain flat gather of the same index count, 4 channels
    def plain_gather(ch4, p):
        from capsaicin_tpu.ops import camera as cam
        from capsaicin_tpu.ops import resample

        prev_uv = cam.calculate_image_plane_uv(prev_camera, p)
        prev_xy = resample.uv_to_xy(prev_uv, (W, H))
        xy0 = prev_xy - 0.5
        bx = jnp.clip(jnp.floor(xy0[..., 0]).astype(jnp.int32), 0, W - 1)
        by = jnp.clip(jnp.floor(xy0[..., 1]).astype(jnp.int32), 0, H - 1)
        flat = ch4.reshape(H * W, 4)
        g = flat[by * W + bx]
        return g.sum()

    ch4 = jnp.concatenate([ch[..., :3], prev_nd["depth"][..., None]], axis=-1)
    f_pg = jax.jit(plain_gather)
    print(f"{'single 2.07M-idx gather [N,4]':45s} {_time(f_pg, ch4, p):8.2f} ms")

    # 4x flat gathers (bilinear corners without quad packing)
    def four_gathers(ch4, p):
        from capsaicin_tpu.ops import camera as cam
        from capsaicin_tpu.ops import resample

        prev_uv = cam.calculate_image_plane_uv(prev_camera, p)
        prev_xy = resample.uv_to_xy(prev_uv, (W, H))
        xy0 = prev_xy - 0.5
        bx = jnp.floor(xy0[..., 0]).astype(jnp.int32)
        by = jnp.floor(xy0[..., 1]).astype(jnp.int32)
        flat = ch4.reshape(H * W, 4)

        def g(jx, jy):
            jx = jnp.clip(jx, 0, W - 1)
            jy = jnp.clip(jy, 0, H - 1)
            return flat[jy * W + jx]

        return (g(bx, by) + g(bx + 1, by) + g(bx, by + 1) + g(bx + 1, by + 1)).sum()

    f_4g = jax.jit(four_gathers)
    print(f"{'4x 2.07M-idx gathers [N,4]':45s} {_time(f_4g, ch4, p):8.2f} ms")


if __name__ == "__main__":
    main()
