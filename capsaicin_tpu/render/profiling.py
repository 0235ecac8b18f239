"""Per-pass timing instrumentation.

The analog of the reference's named GPU timestamp-query table
(render_system.cpp:189-226, 271-281 surfaced in the ImGui overlay,
gui_system.cpp:94-104). Two methods:

  * measure_passes_inframe (default): cumulative-PREFIX timing. Prefix k
    jits passes 1..k of the frame as ONE dispatch (every intermediate
    output returned, so nothing is dead-code-eliminated); the per-pass cost
    is t(prefix_k) - t(prefix_{k-1}). Each prefix pays the same fixed
    per-dispatch overhead (~7 ms through a tunneled device), which CANCELS
    in the difference — so the table sums to ~the fused frame time, like
    the reference's in-frame timestamp queries (render_system.cpp:271-281).
  * measure_passes (isolated): each pass jitted and timed separately —
    robust to pipeline-structure drift, but each number carries the fixed
    dispatch overhead.

Pass names match the reference's timer labels (raytracing_system.cpp:1024,
1102, 1206, 1297, 1357, 1410, 1445, 1559).

Every array a pass reads is passed as a jit ARGUMENT, never closed over:
a closed-over device array is baked into the XLA program as a literal
constant, which (a) lets the compiler constant-fold chunks of the pass,
producing fake timings, and (b) at 1080p inflates program size by tens of
MB — enough to OOM-kill the compile helper.
"""

from __future__ import annotations

import functools
import time
from typing import Dict

import jax
import jax.numpy as jnp

from . import passes
from .traversal import make_traversal


def _time(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


PASS_NAMES = (
    "RaytracePrimaryVisibility",
    "RT Direct lighting",
    "RT Indirect diffuse",
    "Spatial gather",
    "Reproject history",
    "Temporal upscale",
    "EAW",
    "Combine illumination",
    "TAA",
)


def measure_passes_inframe(session, iters: int = 3) -> Dict[str, float]:
    """In-frame per-pass timings by cumulative-prefix dispatches (see module
    docstring): numbers sum to ~the fused frame time. Compiles one program
    per pass (persistent-cached on TPU).

    The profiled stages mirror pipeline.render_frame exactly — the same
    trace fns the session installs (sorting/balancing wrappers, shard_map
    on mesh sessions via session._trace_fns), the options.spp accumulation
    loop, and the options.gather/options.taa gating. Disabled passes are
    absent from the table (the reference only has timers for passes that
    ran, render_system.cpp:189-226)."""
    width, height = session.width, session.height
    options = session.options
    mode = session._resolved_mode
    block_order = mode in ("bvh", "cull", "stream")
    state = session.state
    mesh = session.mesh

    def stage_fns(scene, bvh, camera, settings, noise, fc, prev_camera,
                  prev_nd, color_hist, moments_hist, combined_hist):
        closest, any_hit, bounce, bounce_any = session._trace_fns(
            scene, bvh, options, mode)
        env = {}

        def s_primary():
            env["gb"] = passes.trace_primary(
                closest, camera, width, height, fc, block_order=block_order)

        def s_direct():
            env["direct"], env["albedo"], env["nd"] = passes.direct_lighting(
                scene, any_hit, camera, env["gb"], width, height, fc,
                options, block_order=block_order)

        def s_indirect():
            # same options.spp accumulation structure as render_frame
            def gi_sample(noise_frame):
                return passes.indirect_gi(
                    scene, closest, any_hit, camera, prev_camera, env["gb"],
                    combined_hist, prev_nd, noise, width, height, fc,
                    options, closest_bounce_fn=bounce,
                    any_bounce_fn=bounce_any, noise_frame=noise_frame)

            spp = max(int(options.spp), 1)
            if spp == 1:
                env["indirect"] = gi_sample(fc)
            else:
                def body(s, acc):
                    return acc + gi_sample(fc * spp + s)

                env["indirect"] = jax.lax.fori_loop(
                    1, spp, body, gi_sample(fc * spp)) / spp

        def s_gather():
            env["gathered"] = passes.spatial_gather(
                env["indirect"], env["nd"], width, height, fc, settings,
                options)

        def s_reproject():
            env["rep"] = passes.reproject_and_fetch_history(
                camera, prev_camera, env["nd"], prev_nd, color_hist,
                moments_hist, combined_hist, width, height)

        def s_accum():
            gathered = env["gathered"] if options.gather else env["indirect"]
            env["color_hist"], env["moments_hist"] = passes.svgf_accumulate(
                gathered, env["nd"], env["rep"], prev_camera, width,
                height, fc, settings.temporal_upscale_feedback, options)

        def s_eaw():
            env["denoised"] = passes.denoise(
                env["color_hist"], env["nd"], env["moments_hist"], settings,
                options)

        def s_combine():
            env["combined"] = passes.combine(
                env["direct"], env["denoised"], env["albedo"], options.output)

        def s_taa():
            env["final"] = passes.taa(
                env["combined"], env["rep"], env["nd"], width, height,
                settings.taa_feedback)

        stages = [
            ("RaytracePrimaryVisibility", s_primary),
            ("RT Direct lighting", s_direct),
            ("RT Indirect diffuse", s_indirect),
        ]
        if options.gather:
            stages.append(("Spatial gather", s_gather))
        stages += [
            ("Reproject history", s_reproject),
            ("Temporal upscale", s_accum),
            ("EAW", s_eaw),
            ("Combine illumination", s_combine),
        ]
        if options.taa:
            stages.append(("TAA", s_taa))
        return env, stages

    args = (
        session.scene_dev, session.bvh, session.camera, session.settings,
        session.noise, state.frame_count, state.prev_camera,
        {"oct": state.prev_nd_oct, "inst": state.prev_nd_inst,
         "depth": state.prev_nd_depth},
        state.color_history.astype(jnp.float32),
        state.moments_history.astype(jnp.float32),
        state.combined_history.astype(jnp.float32),
    )
    stage_names = [n for n, _ in stage_fns(*args)[1]]

    def prefix(k):
        def run(*a):
            env, stages = stage_fns(*a)
            # mesh sessions route stencils through shard_map halo exchange,
            # exactly as the product frame does
            from contextlib import nullcontext

            scope = passes.stencil_spmd_scope(mesh) if mesh is not None \
                else nullcontext()
            with scope:
                for _, f in stages[:k]:
                    f()
            # return EVERY live intermediate: nothing upstream may be DCE'd
            return tuple(env.values())

        return jax.jit(run)

    t_prev = 0.0
    timings: Dict[str, float] = {}
    for k, name in enumerate(stage_names, start=1):
        t_k, _ = _time(prefix(k), *args, iters=iters)
        timings[name] = max(t_k - t_prev, 0.0)
        t_prev = t_k
    timings["whole frame"] = t_prev
    return timings


def measure_passes(session, iters: int = 3) -> Dict[str, float]:
    scene = session.scene_dev
    bvh = session.bvh
    mode = session._resolved_mode
    width, height = session.width, session.height
    options = session.options
    settings = session.settings
    camera = session.camera
    state = session.state
    noise = session.noise
    fc = state.frame_count
    prev_camera = state.prev_camera
    prev_nd = {
        "oct": state.prev_nd_oct,
        "inst": state.prev_nd_inst,
        "depth": state.prev_nd_depth,
    }
    combined_hist = state.combined_history.astype(jnp.float32)
    timings: Dict[str, float] = {}

    closest, any_hit = make_traversal(scene, mode, bvh)
    # measure the same code path the frame runs: packet-backed modes trace
    # primary/shadow rays in 8x128 pixel-block packets (session keys
    # trace_block_order on the same mode set)
    block_order = mode in ("bvh", "cull", "stream")

    def f_primary(camera, fc):
        return passes.trace_primary(
            closest, camera, width, height, fc, block_order=block_order
        )

    timings["RaytracePrimaryVisibility"], gb = _time(
        jax.jit(f_primary), camera, fc, iters=iters
    )

    def f_direct(scene, camera, g, fc):
        return passes.direct_lighting(
            scene, any_hit, camera, g, width, height, fc, options,
            block_order=block_order,
        )

    timings["RT Direct lighting"], (direct, albedo, nd) = _time(
        jax.jit(f_direct), scene, camera, gb, fc, iters=iters
    )

    def f_indirect(scene, camera, prev_camera, g, ch, prev_nd, noise, fc):
        return passes.indirect_gi(
            scene, closest, any_hit, camera, prev_camera, g,
            ch, prev_nd, noise, width, height, fc, options,
        )

    timings["RT Indirect diffuse"], indirect = _time(
        jax.jit(f_indirect),
        scene, camera, prev_camera, gb, combined_hist, prev_nd, noise, fc,
        iters=iters,
    )

    def f_gather(ind, nd, fc, settings):
        return passes.spatial_gather(ind, nd, width, height, fc, settings, options)

    timings["Spatial gather"], gathered = _time(
        jax.jit(f_gather), indirect, nd, fc, settings, iters=iters
    )

    def f_rep(camera, prev_camera, nd, prev_nd, ch, mh, cb):
        return passes.reproject_and_fetch_history(
            camera, prev_camera, nd, prev_nd, ch, mh, cb, width, height
        )

    timings["Reproject history"], rep = _time(
        jax.jit(f_rep),
        camera, prev_camera, nd, prev_nd,
        state.color_history.astype(jnp.float32),
        state.moments_history.astype(jnp.float32),
        combined_hist,
        iters=iters,
    )

    def f_accum(g, nd, rep, prev_camera, fc, alpha):
        return passes.svgf_accumulate(
            g, nd, rep, prev_camera, width, height, fc, alpha, options
        )

    timings["Temporal upscale"], (color_hist, moments_hist) = _time(
        jax.jit(f_accum),
        gathered, nd, rep, prev_camera, fc, settings.temporal_upscale_feedback,
        iters=iters,
    )

    def f_eaw(c, nd, mh, settings):
        return passes.denoise(c, nd, mh, settings, options)

    timings["EAW"], denoised = _time(
        jax.jit(f_eaw), color_hist, nd, moments_hist, settings, iters=iters
    )

    def f_combine(direct, d, albedo):
        return passes.combine(direct, d, albedo, options.output)

    timings["Combine illumination"], combined = _time(
        jax.jit(f_combine), direct, denoised, albedo, iters=iters
    )

    def f_taa(c, rep, nd, fb):
        return passes.taa(c, rep, nd, width, height, fb)

    timings["TAA"], _ = _time(
        jax.jit(f_taa), combined, rep, nd, settings.taa_feedback, iters=iters
    )
    return timings
