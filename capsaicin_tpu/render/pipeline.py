"""The jit-compiled frame function and its double-buffered state.

This is the TPU-native replacement for the reference's whole frame machinery:
RaytracingSystem::Run's pass sequence (raytracing_system.cpp:230-318), the
RenderSystem's command-list execution + 2-frames-in-flight fencing
(render_system.cpp:53-84) and the ping-pong history selection
(raytracing_system.cpp:1709-1710). One `frame()` call consumes the previous
FrameState and returns the next; `jax.jit` with donated state gives the
double buffering and async frame pipelining that the reference hand-builds
with fences and per-frame allocator rings.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.camera import Camera
from . import passes
from .settings import RenderOptions, Settings, default_settings


class FrameState(NamedTuple):
    """Persistent per-frame state (the reference's ping-pong textures:
    indirect_history / moments_history / combined_history pairs +
    prev gbuffer + prev camera, raytracing_system.cpp:466-575)."""

    color_history: jnp.ndarray  # [H,W,4] rgb + variance (RGBA16F analog)
    moments_history: jnp.ndarray  # [H,W,4] m1, m2, 0, history_length
    combined_history: jnp.ndarray  # [H,W,3]
    prev_nd_oct: jnp.ndarray  # [H,W,2]
    prev_nd_inst: jnp.ndarray  # [H,W] i32
    prev_nd_depth: jnp.ndarray  # [H,W]
    prev_camera: Camera
    frame_count: jnp.ndarray  # i32 scalar


def init_state(width: int, height: int, camera: Camera, options: RenderOptions) -> FrameState:
    dtype = jnp.dtype(options.history_dtype)
    # Copy camera leaves: the state is donated to the frame function, and the
    # same camera is passed separately — aliased buffers break donation.
    camera = jax.tree.map(lambda x: jnp.array(x, copy=True), camera)
    return FrameState(
        color_history=jnp.zeros((height, width, 4), dtype),
        moments_history=jnp.zeros((height, width, 4), dtype),
        combined_history=jnp.zeros((height, width, 3), dtype),
        prev_nd_oct=jnp.zeros((height, width, 2), jnp.float32),
        prev_nd_inst=jnp.full((height, width), -1, jnp.int32),
        prev_nd_depth=jnp.zeros((height, width), jnp.float32),
        prev_camera=camera,
        frame_count=jnp.int32(0),
    )


class PassOutputs(NamedTuple):
    """Intermediate images, exposed for debugging/tests (the reference's
    per-pass UAV textures)."""

    gbuffer_bary: jnp.ndarray
    gbuffer_prim: jnp.ndarray
    direct: jnp.ndarray
    albedo: jnp.ndarray
    nd_oct: jnp.ndarray
    nd_depth: jnp.ndarray
    indirect_raw: jnp.ndarray
    indirect_gathered: jnp.ndarray
    denoised: jnp.ndarray
    combined: jnp.ndarray


def render_frame(
    scene,
    closest_fn: Callable,
    any_fn: Callable,
    camera: Camera,
    state: FrameState,
    settings: Settings,
    noise: jnp.ndarray,
    width: int,
    height: int,
    options: RenderOptions,
    collect_aux: bool = False,
    closest_bounce_fn: Callable = None,
    any_bounce_fn: Callable = None,
    trace_block_order: bool = False,
):
    """One full frame. Returns (display_rgb [H,W,3] gamma-encoded,
    new FrameState[, PassOutputs])."""
    frame_count = state.frame_count
    prev_camera = state.prev_camera
    prev_nd = {
        "oct": state.prev_nd_oct,
        "inst": state.prev_nd_inst,
        "depth": state.prev_nd_depth,
    }

    # 1. primary visibility
    gb = passes.trace_primary(
        closest_fn, camera, width, height, frame_count,
        block_order=trace_block_order,
    )

    # 2. direct lighting + gbuffer
    direct, albedo, nd = passes.direct_lighting(
        scene, any_fn, camera, gb, width, height, frame_count, options,
        block_order=trace_block_order,
    )

    # 3. indirect diffuse GI — options.spp independent sample sets in ONE
    # dispatch (an on-device fori_loop over disjoint blue-noise seeds),
    # mean-accumulated before the post stack. BASELINE config 2's
    # "64 spp" is spp=64 here instead of 64 progressive frames.
    def gi_sample(noise_frame):
        return passes.indirect_gi(
            scene,
            closest_fn,
            any_fn,
            camera,
            prev_camera,
            gb,
            state.combined_history.astype(jnp.float32),
            prev_nd,
            noise,
            width,
            height,
            frame_count,
            options,
            closest_bounce_fn=closest_bounce_fn,
            any_bounce_fn=any_bounce_fn,
            noise_frame=noise_frame,
        )

    spp = max(int(options.spp), 1)
    if spp == 1:
        indirect = gi_sample(frame_count)
    else:
        def body(s, acc):
            return acc + gi_sample(frame_count * spp + s)

        indirect = jax.lax.fori_loop(
            1, spp, body, gi_sample(frame_count * spp)) / spp

    # 4. spatial gather
    if options.gather:
        gathered = passes.spatial_gather(
            indirect, nd, width, height, frame_count, settings, options
        )
    else:
        gathered = indirect

    # shared temporal reprojection + one packed history gather (SVGF + TAA)
    rep = passes.reproject_and_fetch_history(
        camera,
        prev_camera,
        nd,
        prev_nd,
        state.color_history.astype(jnp.float32),
        state.moments_history.astype(jnp.float32),
        state.combined_history.astype(jnp.float32),
        width,
        height,
    )

    # 5. SVGF temporal accumulation
    color_hist, moments_hist = passes.svgf_accumulate(
        gathered,
        nd,
        rep,
        prev_camera,
        width,
        height,
        frame_count,
        settings.temporal_upscale_feedback,
        options,
    )

    # 6. EAW denoise chain
    denoised = passes.denoise(color_hist, nd, moments_hist, settings, options)

    # 7. combine
    combined = passes.combine(direct, denoised, albedo, options.output)

    # 8. TAA -> new combined history
    if options.taa:
        combined_out = passes.taa(
            combined, rep, nd, width, height, settings.taa_feedback
        )
    else:
        combined_out = combined

    # 9. composite: exposure + gamma for display (simple.hlsl:46 adds only
    # the gamma; exposure is our extension, default 1.0); history stays linear
    display = jnp.power(
        jnp.clip(combined_out * settings.exposure, 0.0, None), 1.0 / 2.2
    )

    dtype = jnp.dtype(options.history_dtype)
    new_state = FrameState(
        color_history=color_hist.astype(dtype),
        moments_history=moments_hist.astype(dtype),
        combined_history=combined_out.astype(dtype),
        prev_nd_oct=nd["oct"],
        prev_nd_inst=nd["inst"],
        prev_nd_depth=nd["depth"],
        prev_camera=camera,
        frame_count=frame_count + 1,
    )
    if not collect_aux:
        return display, new_state
    aux = PassOutputs(
        gbuffer_bary=gb["bary"],
        gbuffer_prim=gb["prim"],
        direct=direct,
        albedo=albedo,
        nd_oct=nd["oct"],
        nd_depth=nd["depth"],
        indirect_raw=indirect,
        indirect_gathered=gathered,
        denoised=denoised,
        combined=combined,
    )
    return display, new_state, aux
