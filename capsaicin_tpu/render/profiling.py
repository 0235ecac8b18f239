"""Per-pass timing instrumentation.

The analog of the reference's named GPU timestamp-query table
(render_system.cpp:189-226, 271-281 surfaced in the ImGui overlay,
gui_system.cpp:94-104). XLA fuses the whole frame, so per-pass numbers are
obtained by jitting each pass separately and timing with block_until_ready;
pass names match the reference's timer labels (raytracing_system.cpp:1024,
1102, 1206, 1297, 1357, 1410, 1445, 1559).
"""

from __future__ import annotations

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
    timings: Dict[str, float] = {}

    closest, any_hit = make_traversal(scene, mode, bvh)

    f_primary = jax.jit(
        lambda cam: passes.trace_primary(closest, cam, width, height, fc)
    )
    timings["RaytracePrimaryVisibility"], gb = _time(f_primary, camera, iters=iters)

    f_direct = jax.jit(
        lambda g: passes.direct_lighting(scene, any_hit, camera, g, width, height, fc, options)
    )
    timings["RT Direct lighting"], (direct, albedo, nd) = _time(f_direct, gb, iters=iters)

    f_indirect = jax.jit(
        lambda g: passes.indirect_gi(
            scene, closest, any_hit, camera, prev_camera, g,
            state.combined_history.astype(jnp.float32), prev_nd, noise,
            width, height, fc, options,
        )
    )
    timings["RT Indirect diffuse"], indirect = _time(f_indirect, gb, iters=iters)

    f_gather = jax.jit(
        lambda ind: passes.spatial_gather(ind, nd, width, height, fc, settings, options)
    )
    timings["Spatial gather"], gathered = _time(f_gather, indirect, iters=iters)

    f_rep = jax.jit(
        lambda ch, mh, cb: passes.reproject_and_fetch_history(
            camera, prev_camera, nd, prev_nd, ch, mh, cb, width, height
        )
    )
    timings["Reproject history"], rep = _time(
        f_rep,
        state.color_history.astype(jnp.float32),
        state.moments_history.astype(jnp.float32),
        state.combined_history.astype(jnp.float32),
        iters=iters,
    )

    f_accum = jax.jit(
        lambda g: passes.svgf_accumulate(
            g, nd, rep, prev_camera, width, height, fc,
            settings.temporal_upscale_feedback, options,
        )
    )
    timings["Temporal upscale"], (color_hist, moments_hist) = _time(f_accum, gathered, iters=iters)

    f_eaw = jax.jit(lambda c: passes.denoise(c, nd, moments_hist, settings, options))
    timings["EAW"], denoised = _time(f_eaw, color_hist, iters=iters)

    f_combine = jax.jit(lambda d: passes.combine(direct, d, albedo, options.output))
    timings["Combine illumination"], combined = _time(f_combine, denoised, iters=iters)

    f_taa = jax.jit(
        lambda c: passes.taa(c, rep, nd, width, height, settings.taa_feedback)
    )
    timings["TAA"], _ = _time(f_taa, combined, iters=iters)
    return timings
