"""Per-pass timing instrumentation.

The analog of the reference's named GPU timestamp-query table
(render_system.cpp:189-226, 271-281 surfaced in the ImGui overlay,
gui_system.cpp:94-104). XLA fuses the whole frame, so per-pass numbers are
obtained by jitting each pass separately and timing with block_until_ready;
pass names match the reference's timer labels (raytracing_system.cpp:1024,
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
    # measure the same code path the frame runs: bvh mode traces
    # primary/shadow rays in 8x128 pixel-block packets
    block_order = mode == "bvh"

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
