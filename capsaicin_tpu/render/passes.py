"""The render passes: the TPU-native equivalents of the reference's 9-pass
frame graph (RaytracingSystem::Run, raytracing_system.cpp:230-318, dataflow in
SURVEY.md §3.4).

Each DXR dispatch / compute PSO becomes a pure function over [H,W,...] arrays;
the whole chain is jit-compiled into one XLA program in pipeline.py, which is
what replaces command lists, descriptor tables, and UAV barriers — XLA's
dataflow ordering provides pass ordering, and fusion replaces the fixed 8x8
thread-group tiling.

Gbuffer encoding differs from the reference's float4 bit-packing (we keep
typed arrays instead of asfloat(uint) tricks):
  geo gbuffer  : {"bary": [H,W,2] f32, "prim": [H,W] i32}  prim is the GLOBAL
                 triangle id (flattened-TLAS analog of InstanceID/PrimitiveIndex,
                 valid because instances are identity transforms,
                 tlas_system.cpp:39-58); -1 = miss
  normal/depth : {"oct": [H,W,2] f32, "inst": [H,W] i32, "depth": [H,W] f32}
                 matching float4(OctEncode(n), instance, |cam-p|)
                 (rt_direct_lighting.hlsl:82); depth==0 flags background

Traversal is injected as two callables so the brute-force oracle and the BVH
backends interchange:
  closest_fn(origins [N,3], dirs [N,3], tmin, tmax) -> {"t","u","v","prim"}
  any_fn(origins [N,3], dirs [N,3], tmin, tmax) -> bool [N]
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import camera as cam
from ..ops import color as col
from ..ops import mathops as m
from ..ops import resample, sampling
from . import shading
from .settings import (
    OUTPUT_COMBINED,
    OUTPUT_DIRECT,
    OUTPUT_INDIRECT,
    OUTPUT_VARIANCE,
    RenderOptions,
    Settings,
)

EPS = 1e-8
MAX_HISTORY_LENGTH = 256.0  # temporal_accumulation.hlsl:218
FIREFLY_CLAMP = 10.0  # eaw_blur.hlsl:30-33
SPATIAL_VARIANCE_THRESHOLD = 8.0  # eaw_blur.hlsl:141


# --------------------------------------------------------------------------
# helpers


def shift2d(img, dx: int, dy: int):
    """out[y, x] = img[y+dy, x+dx]; returns (shifted, valid mask [H,W]).

    The stencil-tap primitive: expressed as roll+mask so XLA lowers it to
    cheap VPU shifts single-chip and collective-permute halo exchange when the
    image is sharded over a device mesh.
    """
    if dx == 0 and dy == 0:
        h, w = img.shape[:2]
        return img, jnp.ones((h, w), bool)
    rolled = jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))
    h, w = img.shape[:2]
    ys = jnp.arange(h)[:, None] + dy
    xs = jnp.arange(w)[None, :] + dx
    valid = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    return rolled, valid


def shift2d_clamped(img, dx: int, dy: int):
    """out[y, x] = img[clamp(y+dy), clamp(x+dx)] — edge-replicated tap."""
    if dx == 0 and dy == 0:
        return img
    h, w = img.shape[:2]
    pw = [(max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pw, mode="edge")
    return padded[max(dy, 0) : max(dy, 0) + h, max(dx, 0) : max(dx, 0) + w]


def _flat(img):
    return img.reshape((-1,) + img.shape[2:])


def _unflat(arr, h, w):
    return arr.reshape((h, w) + arr.shape[1:])


def _blocks_ok(width: int, height: int) -> bool:
    return height % 8 == 0 and width % 128 == 0


def _to_blocks(flat, height, width):
    """Image-row-major [H*W, ...] -> 8x128-pixel-block-major. Each 1024-ray
    traversal packet then covers an 8x128 pixel BLOCK instead of a 1x1024
    row strip — measured to HALVE the packet BVH footprint on colonnade
    (941 -> 447 node steps, 220 -> 91 leaf visits per packet). Pure
    reshapes/transposes; zero gathers."""
    rest = flat.shape[1:]
    x = flat.reshape(height // 8, 8, width // 128, 128, *rest)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(flat.shape)


def _from_blocks(flat, height, width):
    rest = flat.shape[1:]
    x = flat.reshape(height // 8, width // 128, 8, 128, *rest)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(flat.shape)


def interleave_offset(frame_count):
    """2x2 interleave phase; rt_indirect.hlsl:53-55 (ox, oy)."""
    fc = frame_count % 4
    return fc // 2, fc % 2


def _deinterleave2(x, oy, ox):
    """x[oy::2, ox::2] for a traced 2x2 phase (oy, ox in {0,1}).

    Formulated as reshape to [H/2, 2, W/2, 2] + two dynamic size-2 index
    picks. The previous roll+[::2,::2] form forces a stride-2 slice on
    the minor (lane) dimension — a cross-lane shuffle on TPU, measured
    19.2 ms for one [1024,1024] f32 plane vs 3.5 ms for this form
    (bit-equal; /tmp probe, round 5). Equivalence:
    roll(x, (-oy,-ox))[::2,::2] == x[oy::2, ox::2] for even H, W."""
    h, w = x.shape[0], x.shape[1]
    r = x.reshape((h // 2, 2, w // 2, 2) + x.shape[2:])
    r = jax.lax.dynamic_index_in_dim(r, oy, axis=1, keepdims=False)
    return jax.lax.dynamic_index_in_dim(r, ox, axis=2, keepdims=False)


# --------------------------------------------------------------------------
# Pass 1: primary visibility (rt_primary_visibility.hlsl)


def trace_primary(closest_fn, camera, width, height, frame_count,
                  block_order: bool = False):
    xy = cam.pixel_grid(width, height)
    o, d = cam.create_primary_rays(camera, xy, (width, height), frame_count)
    of, df = _flat(o), _flat(d)
    blocks = block_order and _blocks_ok(width, height)
    if blocks:
        of = _to_blocks(of, height, width)
        df = _to_blocks(df, height, width)
    hit = closest_fn(of, df, 0.0, 1e6)
    u, v, prim = hit["u"], hit["v"], hit["prim"]
    if blocks:
        u = _from_blocks(u, height, width)
        v = _from_blocks(v, height, width)
        prim = _from_blocks(prim, height, width)
    return {
        "bary": _unflat(jnp.stack([u, v], -1), height, width).astype(jnp.float32),
        "prim": _unflat(prim, height, width),
    }


# --------------------------------------------------------------------------
# Pass 2: direct lighting (rt_direct_lighting.hlsl)


def direct_lighting(scene, any_fn, camera, gb, width, height, frame_count,
                    options: RenderOptions, block_order: bool = False):
    prim = gb["prim"]
    miss = prim < 0
    hit = shading.fetch_hit_attributes(
        scene, _flat(prim), _flat(gb["bary"])[..., 0], _flat(gb["bary"])[..., 1]
    )
    p, n = hit["p"], hit["n"]
    kd = shading.material_from_hit(scene, hit, options.use_material_kd)
    black = jnp.all(kd < 1e-5, axis=-1)

    ldir, unshadowed = shading.direct_illumination_terms(p, n, kd, frame_count)
    # dead-lane retirement: rays whose result is provably unused (primary
    # miss, black albedo, or facing away from the light -> unshadowed == 0)
    # get tmax < tmin; the traversal kernels retire them in ~2 node steps
    # and the sort wrappers pack them into whole dead packets
    live = ~_flat(miss) & ~black & jnp.any(unshadowed > 0.0, axis=-1)
    stmax = jnp.where(live, shading.LIGHT_DISTANCE, -1.0)
    if block_order and _blocks_ok(width, height):
        # shadow rays inherit the image layout; trace in 8x128 pixel blocks
        shadow_hit = _from_blocks(
            any_fn(
                _to_blocks(p, height, width),
                _to_blocks(ldir, height, width),
                shading.SHADOW_TMIN,
                _to_blocks(stmax, height, width),
            ),
            height, width,
        )
    else:
        shadow_hit = any_fn(p, ldir, shading.SHADOW_TMIN, stmax)
    di = jnp.where(shadow_hit[..., None], 0.0, unshadowed)

    depth = jnp.sqrt(jnp.sum((camera.position - p) ** 2, axis=-1))
    oct = m.oct_encode(n)

    miss_f = _flat(miss)
    invalid = miss_f | black
    direct = jnp.where(
        miss_f[..., None], shading.SKY_COLOR, jnp.where(black[..., None], 0.0, di)
    )
    albedo = jnp.where(miss_f[..., None], 1.0, jnp.where(black[..., None], 0.0, kd))
    nd_oct = jnp.where(invalid[..., None], 0.0, oct)
    nd_depth = jnp.where(invalid, 0.0, depth)
    inst = jnp.where(invalid, -1, hit["mesh"])

    return (
        _unflat(direct, height, width),
        _unflat(albedo, height, width),
        {
            "oct": _unflat(nd_oct, height, width),
            "inst": _unflat(inst, height, width),
            "depth": _unflat(nd_depth, height, width),
        },
    )


# --------------------------------------------------------------------------
# Pass 3: indirect diffuse GI (rt_indirect.hlsl) — the wavefront loop


def indirect_gi(
    scene,
    closest_fn,
    any_fn,
    camera,
    prev_camera,
    gb,
    combined_history,
    prev_nd,
    noise,
    width,
    height,
    frame_count,
    options: RenderOptions,
    closest_bounce_fn=None,
    any_bounce_fn=None,
    noise_frame=None,
):
    """Iterative path loop restructured as a wavefront over all pixels with
    lane masking (rt_indirect.hlsl:42-175). Rays for every pixel advance in
    lock-step through bounces; inactive lanes are masked. The final TraceRay
    of the reference's last iteration is provably dead (its payload is never
    shaded) and is skipped.

    noise_frame: seed frame for the blue-noise sample sets (defaults to
    frame_count). Batched-spp rendering passes virtual frames
    frame*spp+s here so each sample draws a disjoint set while the light
    animation and interleave phase stay those of the real frame."""
    if noise_frame is None:
        noise_frame = frame_count
    if options.lowres_indirect:
        w2, h2 = width // 2, height // 2
        ox, oy = interleave_offset(frame_count)
        xy = cam.pixel_grid(w2, h2)
        fullres_xy = xy * 2 + jnp.stack(
            [jnp.broadcast_to(ox, xy[..., 0].shape), jnp.broadcast_to(oy, xy[..., 0].shape)], -1
        )
    else:
        w2, h2 = width, height
        xy = cam.pixel_grid(w2, h2)
        fullres_xy = xy

    fx = _flat(fullres_xy)
    if options.lowres_indirect:
        # gbuffer fetch at the interleave-phase subsample positions: the
        # positions (2x+ox, 2y+oy) are affine in (x, y), so this is a
        # phase-indexed deinterleave — NOT a per-pixel gather (same trick
        # as _subsampled_nd)
        prim0 = _flat(_deinterleave2(gb["prim"], oy, ox))
        bary0 = _deinterleave2(gb["bary"], oy, ox).reshape(-1, 2)
    else:
        # identity layout: plain reshape (no gather), and the bounce-0
        # attribute fetch below CSEs with the direct pass's
        prim0 = _flat(gb["prim"])
        bary0 = _flat(gb["bary"])

    npix = fx.shape[0]
    color = jnp.zeros((npix, 3))
    throughput = jnp.ones((npix, 3))
    active = prim0 >= 0
    primary_miss = ~active

    prim = prim0
    u = bary0[..., 0]
    v = bary0[..., 1]

    for bounce in range(options.num_diffuse_bounces + 1):
        if bounce > 0:
            # lanes whose indirect ray missed: add sky, terminate
            miss_now = active & (prim < 0)
            color = jnp.where(miss_now[..., None], color + throughput * shading.SKY_COLOR, color)
            active = active & (prim >= 0)

        hit = shading.fetch_hit_attributes(scene, prim, u, v)
        p, n = hit["p"], hit["n"]
        kd = shading.material_from_hit(scene, hit, options.use_material_kd)
        active = active & ~jnp.all(kd < 1e-5, axis=-1)

        if bounce != 0:
            ldir, unshadowed = shading.direct_illumination_terms(p, n, kd, frame_count)
            if options.gbuffer_feedback:
                prev_uv = cam.calculate_image_plane_uv(prev_camera, p)
                offscreen = jnp.any((prev_uv < 0.0) | (prev_uv > 1.0), axis=-1)
                prev_xy = resample.uv_to_xy(prev_uv, (width, height))
                # pack prev-depth with the history, then quad-pack so ONE
                # gather fetches all four bilinear corners for both. The quad
                # is built with aligned-shape rolls (an edge-pad to 1082x1922
                # forces XLA relayouts that cost more than the gather); the
                # wrapped +1 corners at the right/bottom border are never
                # sampled because prev_xy <= dim-1 bounds the corner index,
                # and the bx==-1 / by==-1 clamp cases reduce to weight zero —
                # exact edge-clamp bilinear semantics (utils.h:19-36).
                fb_pack = jnp.concatenate(
                    [combined_history[..., :3], prev_nd["depth"][..., None]], axis=-1
                )
                # fp16 quad: halves the gather row bytes AND matches the
                # reference, whose combined history is an RGBA16F texture
                # (raytracing_system.cpp:466-575) — the values it re-reads
                # for feedback are fp16-quantized there too.
                fb_pack = fb_pack.astype(jnp.float16)
                fb_quad = jnp.concatenate(
                    [
                        fb_pack,
                        jnp.roll(fb_pack, -1, axis=1),
                        jnp.roll(fb_pack, -1, axis=0),
                        jnp.roll(fb_pack, (-1, -1), axis=(0, 1)),
                    ],
                    axis=-1,
                )
                fb_quad = jax.lax.bitcast_convert_type(
                    fb_quad.reshape(fb_quad.shape[0], fb_quad.shape[1], 8, 2),
                    jnp.float32,
                )
                xy0 = prev_xy - 0.5
                bx = jnp.floor(xy0[..., 0]).astype(jnp.int32)
                by = jnp.floor(xy0[..., 1]).astype(jnp.int32)
                # uv_to_xy clamps prev_xy to [0, dim-1], so bx in [-1, W-2];
                # only the -1 clamp needs fixing: zero the +x weight there
                wx = jnp.where(bx < 0, 0.0, xy0[..., 0] - jnp.floor(xy0[..., 0]))[..., None]
                wy = jnp.where(by < 0, 0.0, xy0[..., 1] - jnp.floor(xy0[..., 1]))[..., None]
                bxc = jnp.maximum(bx, 0)
                byc = jnp.maximum(by, 0)
                quad = resample._gather_pixels(fb_quad, bxc, byc)
                quad = jax.lax.bitcast_convert_type(
                    quad.reshape(quad.shape[0], 8), jnp.float16
                ).reshape(quad.shape[0], 16).astype(jnp.float32)
                c00 = quad[..., 0:4]
                c10 = quad[..., 4:8]
                c01 = quad[..., 8:12]
                c11 = quad[..., 12:16]
                top = c00 * (1.0 - wx) + c10 * wx
                bot = c01 * (1.0 - wx) + c11 * wx
                bil = top * (1.0 - wy) + bot * wy
                hist = bil[..., :3]
                # point fetch (Load at int coords, rt_indirect.hlsl:125):
                # select the matching bilinear corner
                pix = jnp.floor(prev_xy).astype(jnp.int32)
                pix_x = jnp.clip(pix[..., 0], 0, width - 1)
                pix_y = jnp.clip(pix[..., 1], 0, height - 1)
                di = pix_x - bxc
                dj = pix_y - byc
                prev_depth = jnp.where(
                    dj == 0,
                    jnp.where(di == 0, c00[..., 3], c10[..., 3]),
                    jnp.where(di == 0, c01[..., 3], c11[..., 3]),
                )
                cur_depth = jnp.sqrt(jnp.sum((p - prev_camera.position) ** 2, axis=-1))
                disocc = offscreen | (
                    jnp.abs(prev_depth - cur_depth) / jnp.maximum(cur_depth, 1e-20) > 0.05
                )
                reuse = active & ~disocc
                color = jnp.where(reuse[..., None], color + throughput * hist, color)
                active = active & disocc
                nee_mask = active
            else:
                nee_mask = active
            bounce_any = any_bounce_fn or any_fn
            # retire NEE rays whose contribution is provably zero (masked
            # lanes or surface facing away from the light)
            nee_live = nee_mask & jnp.any(unshadowed > 0.0, axis=-1)
            shadow_hit = bounce_any(
                p, ldir, shading.SHADOW_TMIN,
                jnp.where(nee_live, shading.LIGHT_DISTANCE, -1.0),
            )
            add = jnp.where(
                (nee_live & ~shadow_hit)[..., None], throughput * unshadowed, 0.0
            )
            color = color + add

        if bounce == options.num_diffuse_bounces:
            break  # reference's last TraceRay is dead work

        # blue-noise sample for every pixel of the (affine) ray grid, built
        # by tiling instead of a per-pixel gather (sampling.bluenoise4x4_field)
        if options.lowres_indirect:
            s = sampling.bluenoise4x4_field(
                noise, w2, h2, noise_frame * 25 + bounce, stride=2, offset=(ox, oy)
            ).reshape(-1, 2)
        else:
            s = sampling.bluenoise4x4_field(
                noise, w2, h2, noise_frame * 25 + bounce
            ).reshape(-1, 2)
        d, brdf, pdf = shading.lambert_sample(s, n)
        active = active & (pdf >= 1e-5)
        tp_scale = brdf * jnp.maximum(m.dot(n, d), 0.0) / jnp.maximum(pdf, 1e-20)
        throughput = throughput * tp_scale[..., None]
        if bounce != 0:
            throughput = throughput * kd

        bounce_trace = closest_bounce_fn or closest_fn
        # inactive lanes trace with tmax < tmin: the kernel retires them
        # and the sort wrapper groups them into dead packets
        hit = bounce_trace(p, d, 1e-4, jnp.where(active, 1e5, -1.0))
        prim = jnp.where(active, hit["prim"], -1)
        u = hit["u"]
        v = hit["v"]

    color = jnp.where(primary_miss[..., None], 0.0, color)
    return _unflat(color, h2, w2)


# --------------------------------------------------------------------------
# Pass 4: spatial gather (spatial_gather.hlsl)


def _subsampled_nd(nd, frame_count, width, height, options: RenderOptions):
    """normal/depth at the indirect pass's resolution: fullres, or the 2x2
    interleave-phase subsample under UPSCALE2X (spatial_gather.hlsl:36-46)."""
    if not options.lowres_indirect:
        return nd["oct"], nd["depth"]
    ox, oy = interleave_offset(frame_count)
    oct = _deinterleave2(nd["oct"], oy, ox)
    depth = _deinterleave2(nd["depth"], oy, ox)
    return oct, depth


# Trace-time overrides for RenderSession(mesh=...) SPMD rendering. A
# pallas_call is a custom call XLA's SPMD partitioner cannot split, so the
# Pallas stencil kernels are placed per-shard explicitly instead: wrapped in
# shard_map with ppermute halo exchange (parallel.sharding.halo_map), one
# exchange per chain — versus the jnp roll+mask fallback, whose per-tap
# partitioning makes the eaw5 chain's ~100 taps each compile into their own
# halo collective (minutes of SPMD compile). The jnp path remains the
# fallback when the Pallas kernels aren't in play (pure-CPU runs without
# CAPSAICIN_PALLAS_STENCIL=1) or when the array height doesn't divide by
# the mesh.
# Thread-local, not module-global: session.precompile_background traces
# frame variants on a daemon thread concurrently with the foreground
# render loop, and a scope exit on one thread must not yank the mesh out
# from under a trace in progress on another.
import threading as _threading

_STENCIL_TLS = _threading.local()


def _stencil_state():
    """(force_jnp, spmd_mesh) for the calling thread's trace scope."""
    return (getattr(_STENCIL_TLS, "force_jnp", False),
            getattr(_STENCIL_TLS, "mesh", None))


def stencil_jnp_scope():
    """Context manager forcing the jnp stencil path for code traced inside."""
    return _stencil_scope(True, None)


def stencil_spmd_scope(mesh):
    """Mesh-mode scope: stencils traced inside route the Pallas kernels
    through shard_map halo exchange (falling back to jnp rolls when the
    kernels aren't eligible)."""
    return _stencil_scope(True, mesh)


def _stencil_scope(force_jnp: bool, mesh):
    import contextlib

    @contextlib.contextmanager
    def scope():
        prev = _stencil_state()
        _STENCIL_TLS.force_jnp = force_jnp
        _STENCIL_TLS.mesh = mesh
        try:
            yield
        finally:
            _STENCIL_TLS.force_jnp, _STENCIL_TLS.mesh = prev

    return scope()


def _pallas_stencil_eligible() -> bool:
    """Whether the Pallas stencil kernels are usable at all on this backend
    (ignores the mesh-mode force-jnp flag — used by the halo_map branch)."""
    import os

    flag = os.environ.get("CAPSAICIN_PALLAS_STENCIL")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() == "tpu"


def _spmd_stencil_mesh(height: int):
    """The mesh to halo_map a stencil over, or None for the local paths."""
    mesh = _stencil_state()[1]
    if mesh is None or not _pallas_stencil_eligible():
        return None
    if height % mesh.size != 0:
        return None  # uneven row split: leave it to XLA's jnp partitioning
    return mesh


def _use_pallas_stencil() -> bool:
    """The Pallas stencil kernels replace the roll+mask jnp stencils on TPU
    (each jnp tap materializes a full [H,W,C] temporary; the kernels read
    each tile once). CAPSAICIN_PALLAS_STENCIL=1 forces them (interpret mode)
    off-TPU for equivalence tests; =0 forces the jnp path everywhere."""
    if _stencil_state()[0]:
        return False
    return _pallas_stencil_eligible()


def spatial_gather(indirect, nd, width, height, frame_count, settings: Settings, options: RenderOptions):
    """7x7 edge-aware cross-bilateral filter of the raw indirect."""
    oct, depth = _subsampled_nd(nd, frame_count, width, height, options)
    mesh = _spmd_stencil_mesh(indirect.shape[0])
    if mesh is not None:
        from ..ops import pallas_stencil as ps
        from ..parallel.sharding import halo_map

        return halo_map(
            mesh,
            lambda c, n_, d_: ps.spatial_gather(
                c, n_, d_, settings, storage=options.eaw_bf16),
            3, indirect, m.oct_decode(oct), depth,
        )
    if _use_pallas_stencil():
        from ..ops import pallas_stencil as ps

        return ps.spatial_gather(indirect, m.oct_decode(oct), depth, settings,
                                 storage=options.eaw_bf16)
    center_n = m.oct_decode(oct)  # decode once, shift the decoded field
    center_d = depth
    center_c = indirect
    center_l = m.luminance(center_c)

    s_depth = center_d * settings.gather_depth_sigma
    s_normal = settings.gather_normal_sigma
    s_luma = settings.gather_luma_sigma

    background = center_d < 1e-5

    acc = jnp.zeros_like(center_c)
    tw = jnp.zeros_like(center_d)
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            c, valid = shift2d(center_c, dx, dy)
            n_tap, _ = shift2d(center_n, dx, dy)
            d_tap, _ = shift2d(center_d, dx, dy)
            l_tap, _ = shift2d(center_l, dx, dy)
            valid = valid & (d_tap >= 1e-5)
            r = float((dx * dx + dy * dy) ** 0.5)
            w = (
                m.normal_weight(center_n, n_tap, s_normal)
                * m.depth_weight(center_d, d_tap, s_depth * r)
                * m.luma_weight(center_l, l_tap, s_luma)
            )
            w = jnp.where(valid, w, 0.0)
            acc = acc + w[..., None] * c
            tw = tw + w

    filtered = jnp.where((tw < EPS)[..., None], center_c, acc / jnp.maximum(tw, EPS)[..., None])
    return jnp.where(background[..., None], center_c, filtered)


# --------------------------------------------------------------------------
# Shared temporal reprojection + history fetch (feeds SVGF accumulate and TAA)


def _cubic01(x):
    """Catmull-Rom weight at |offset| x for integer taps."""
    from ..ops.mathops import cubic

    return cubic(x, 0.0, 0.5)


def reproject_and_fetch_history(
    camera,
    prev_camera,
    nd,
    prev_nd,
    color_history,
    moments_history,
    combined_history,
    width,
    height,
):
    """Computes the per-frame reprojection (shared verbatim by the Accumulate
    and TAA kernels, temporal_accumulation.hlsl:243-258 and :388-400) and
    resamples ALL previous-frame quantities through ONE 16-corner gather of a
    packed history array:

      channels: color_history rgb (3) | moments m1 m2 (2) | history_len (1)
                | prev closest depth (1) | combined_history rgb (3)

    Dynamic gathers cost ~17ns/index on TPU regardless of width, so sharing
    one footprint across both temporal passes (instead of 34 separate
    gathers) is the dominant optimization of the frame. When the camera did
    not move, reprojection is the identity map and a `lax.cond` fast path
    reads the histories directly with ZERO gathers — bicubic weights collapse
    to the center tap (cubic(0)=1, cubic(1)=cubic(2)=0) so this is exact, not
    an approximation.

    Returns a dict:
      this_uv, hit_pos, prev_uv, prev_xy, velocity, offscreen [H,W...]
      history [H,W,3], moments [H,W,2], hist_len [H,W], prev_closest [H,W],
      taa_history [H,W,3]
    """
    xy = cam.pixel_grid(width, height).astype(jnp.float32)
    this_uv = (xy + 0.5) / jnp.asarray([width, height], jnp.float32)
    depth = nd["depth"]

    hit_pos = cam.reconstruct_world_position(camera, this_uv, depth)
    prev_uv = cam.calculate_image_plane_uv(prev_camera, hit_pos)
    prev_xy = resample.uv_to_xy(prev_uv, (width, height))
    velocity = jnp.sqrt(
        jnp.sum(((prev_uv - this_uv) * jnp.asarray([width, height], jnp.float32)) ** 2, -1)
    )
    offscreen = jnp.any((prev_uv < 0.0) | (prev_uv > 1.0), axis=-1)

    prev_closest_img = _closest_depth_3x3(prev_nd["depth"])
    packed = jnp.concatenate(
        [
            color_history[..., :3],
            moments_history[..., :2],
            moments_history[..., 3:4],
            prev_closest_img[..., None],
            combined_history[..., :3],
        ],
        axis=-1,
    )

    # static-camera test: ignore background pixels (their reprojection is
    # garbage but they reset their history anyway). Compare against the
    # identically-clamped identity mapping (uv_to_xy clamps at the border).
    valid = depth > 1e-5
    ident_xy = resample.uv_to_xy(this_uv, (width, height))
    drift = jnp.where(valid, jnp.abs(prev_xy - ident_xy).max(axis=-1), 0.0)
    # fp noise through the reconstruct->reproject roundtrip is ~1e-3 px; a
    # 0.01 px snap changes bilinear weights by <1%, far below the 1e-3 RMSE
    # target, while unlocking the zero-gather static path.
    is_static = jnp.max(drift) < 1e-2

    def _luma_combine(taps, base_w, offs, sl, luma_fn):
        filtered = None
        tw = None
        for val, wt, off in zip(taps, base_w, offs):
            group = val[..., sl]
            lw = 1.0 / (1.0 + luma_fn(val))
            w_full = jnp.where(off, 0.0, wt * lw)
            contrib = w_full[..., None] * group
            filtered = contrib if filtered is None else filtered + contrib
            tw = w_full if tw is None else tw + w_full
        return jnp.where(
            (tw > 1e-5)[..., None], filtered / jnp.maximum(tw, 1e-20)[..., None], 0.0
        )

    def moving_path(packed):
        center_xy = resample.uv_to_xy(prev_uv, (width, height))
        xy0 = center_xy - 0.5
        base_x = jnp.floor(xy0[..., 0]).astype(jnp.int32)
        base_y = jnp.floor(xy0[..., 1]).astype(jnp.int32)
        fx = (xy0[..., 0] - jnp.floor(xy0[..., 0]))[..., None]
        fy = (xy0[..., 1] - jnp.floor(xy0[..., 1]))[..., None]
        # Quad-pack: build Q[y,x] = (packed[y,x], [y,x+1], [y+1,x], [y+1,x+1])
        # with three cheap shifts, then fetch the 4x4 bicubic footprint with
        # FOUR quad gathers instead of sixteen point gathers (gather cost is
        # per-index, not per-byte, on TPU). The source is edge-padded by 2 so
        # every in-range corner index is exact (identical to the clamped
        # per-corner fetch of resample.bicubic_taps, including borders).
        nch = packed.shape[-1]
        pq = jnp.pad(packed, ((2, 2), (2, 2), (0, 0)), mode="edge")
        q = jnp.concatenate(
            [
                pq,
                shift2d_clamped(pq, 1, 0),
                shift2d_clamped(pq, 0, 1),
                shift2d_clamped(pq, 1, 1),
            ],
            axis=-1,
        )
        corners = {}
        for cj in (-1, 1):
            for ci in (-1, 1):
                quad = resample._gather_pixels(q, base_x + 2 + ci, base_y + 2 + cj)
                corners[(ci, cj)] = quad[..., 0:nch]
                corners[(ci + 1, cj)] = quad[..., nch : 2 * nch]
                corners[(ci, cj + 1)] = quad[..., 2 * nch : 3 * nch]
                corners[(ci + 1, cj + 1)] = quad[..., 3 * nch : 4 * nch]
        taps, base_w, offs = [], [], []
        for j in (-1, 0, 1):
            for i in (-1, 0, 1):
                cur = center_xy + jnp.asarray([i, j], jnp.float32)
                off = (
                    (cur[..., 0] < 0.0)
                    | (cur[..., 1] < 0.0)
                    | (cur[..., 0] >= width)
                    | (cur[..., 1] >= height)
                )
                v00 = corners[(i, j)]
                v10 = corners[(i + 1, j)]
                v01 = corners[(i, j + 1)]
                v11 = corners[(i + 1, j + 1)]
                top = v00 * (1.0 - fx) + v10 * fx
                bot = v01 * (1.0 - fx) + v11 * fx
                val = top * (1.0 - fy) + bot * fy
                d = jnp.abs(cur - center_xy)
                taps.append(val)
                base_w.append(_cubic01(d[..., 0]) * _cubic01(d[..., 1]))
                offs.append(off)

        history = _luma_combine(
            taps, base_w, offs, slice(0, 3), lambda v: m.luminance(v[..., 0:3])
        )
        # moments resampled like the reference's .xyz bicubic: luma weight on
        # (m1, m2, 0) (temporal_accumulation.hlsl:92-95, SampleMomentsHistory)
        moments = _luma_combine(
            taps, base_w, offs, slice(3, 5),
            lambda v: v[..., 3] * 0.299 + v[..., 4] * 0.587,
        )
        taa_hist = _luma_combine(
            taps, base_w, offs, slice(7, 10), lambda v: m.luminance(v[..., 7:10])
        )

        # point fetches at floor(prev_xy): select among the 2x2 corner set
        pix_x = jnp.clip(jnp.floor(prev_xy[..., 0]).astype(jnp.int32), 0, width - 1)
        pix_y = jnp.clip(jnp.floor(prev_xy[..., 1]).astype(jnp.int32), 0, height - 1)
        di = pix_x - base_x  # in {0, 1}
        dj = pix_y - base_y
        point = jnp.zeros_like(corners[(0, 0)][..., 5:7])
        for cj in (0, 1):
            for ci in (0, 1):
                sel = ((di == ci) & (dj == cj))[..., None]
                point = jnp.where(sel, corners[(ci, cj)][..., 5:7], point)
        hist_len = point[..., 0]
        prev_closest = point[..., 1]
        return history, moments, hist_len, prev_closest, taa_hist

    def static_path(packed):
        return (
            packed[..., 0:3],
            packed[..., 3:5],
            packed[..., 5],
            packed[..., 6],
            packed[..., 7:10],
        )

    history, moments, hist_len, prev_closest, taa_hist = jax.lax.cond(
        is_static, static_path, moving_path, packed
    )
    return {
        "this_uv": this_uv,
        "hit_pos": hit_pos,
        "prev_uv": prev_uv,
        "prev_xy": prev_xy,
        "velocity": velocity,
        "offscreen": offscreen,
        "history": history,
        "moments": moments,
        "hist_len": hist_len,
        "prev_closest": prev_closest,
        "taa_history": taa_hist,
    }


# --------------------------------------------------------------------------
# Pass 5: SVGF temporal accumulation (temporal_accumulation.hlsl Accumulate)


def _closest_depth_3x3(depth):
    """3x3 min of nonzero depths; temporal_accumulation.hlsl:179-205."""
    best = depth
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            d_tap, valid = shift2d(depth, dx, dy)
            take = valid & (d_tap != 0.0) & (d_tap < best)
            best = jnp.where(take, d_tap, best)
    return best


def svgf_accumulate(
    color_in,
    nd,
    rep,
    prev_camera,
    width,
    height,
    frame_count,
    alpha_setting,
    options: RenderOptions,
):
    """History/moments blend using the shared reprojection `rep`
    (reproject_and_fetch_history). color_in is the gathered indirect at input
    resolution (half under UPSCALE2X).

    Returns (new color_history [H,W,4] rgb+variance,
             new moments_history [H,W,4] m1,m2,0,len)."""
    in_h, in_w = color_in.shape[:2]
    this_uv = rep["this_uv"]

    # current color resampled at this pixel (bilinear vs the input buffer
    # size). At full resolution the bilinear fetch at a pixel's own center is
    # the identity — skip it; under UPSCALE2X the sample position is the
    # identity map of the doubled grid, so the gather becomes a zero-gather
    # separable 2x upsample (resample.upsample2x_bilinear).
    if (in_h, in_w) == (height, width):
        color = color_in
    elif (in_h * 2, in_w * 2) == (height, width):
        color = resample.upsample2x_bilinear(color_in)
    else:
        color = resample.sample_bilinear(color_in, this_uv, (in_w, in_h))
    lum = m.luminance(color)
    fresh_moments = jnp.stack([lum, lum * lum], axis=-1)

    depth = nd["depth"]
    background = depth < 1e-5

    hit_pos = rep["hit_pos"]
    disocclusion = rep["offscreen"] | (frame_count == 0)

    prev_closest = rep["prev_closest"]
    history_length = rep["hist_len"]
    cur_closest = jnp.sqrt(jnp.sum((hit_pos - prev_camera.position) ** 2, axis=-1))
    disocclusion = disocclusion | (
        jnp.abs(prev_closest - cur_closest) / jnp.maximum(cur_closest, 1e-20) > 0.05
    )

    history = rep["history"]
    moments_hist = rep["moments"]

    alpha = jnp.minimum(
        alpha_setting, 1.0 - 1.0 / (history_length + 1.0)
    )
    alpha = jnp.where(history_length < MAX_HISTORY_LENGTH, alpha, alpha_setting)

    if options.lowres_indirect:
        ox, oy = interleave_offset(frame_count)
        pix = cam.pixel_grid(width, height)
        not_phase = (pix[..., 0] % 2 != ox) | (pix[..., 1] % 2 != oy)
        alpha = jnp.where(not_phase, 1.0, alpha)
        history_length = jnp.where(not_phase, history_length - 1.0, history_length)

    moments = (
        fresh_moments * (1.0 - alpha[..., None]) + moments_hist * alpha[..., None]
    )
    variance = jnp.abs(moments[..., 1] - moments[..., 0] ** 2)
    blended = color * (1.0 - alpha[..., None]) + history * alpha[..., None]

    reset = background | disocclusion
    out_color = jnp.where(
        reset[..., None],
        jnp.concatenate([color, jnp.zeros_like(lum)[..., None]], -1),
        jnp.concatenate([blended, variance[..., None]], -1),
    )
    out_moments = jnp.where(
        reset[..., None],
        jnp.concatenate(
            [fresh_moments, jnp.zeros_like(lum)[..., None], jnp.ones_like(lum)[..., None]], -1
        ),
        jnp.concatenate(
            [moments, jnp.zeros_like(lum)[..., None], (history_length + 1.0)[..., None]], -1
        ),
    )
    return out_color, out_moments


# --------------------------------------------------------------------------
# Pass 6: EAW a-trous denoise chain (eaw_blur.hlsl)

_EAW_KW = (1.0, 2.0 / 3.0, 1.0 / 6.0)  # eaw_blur.hlsl:76


def eaw_blur(color4, nd, stride: int, settings: Settings, options: RenderOptions):
    """One Blur dispatch: 5x5 a-trous with variance-guided luma sigma."""
    rgb = jnp.minimum(color4[..., :3], FIREFLY_CLAMP)
    var = color4[..., 3]
    center_n = m.oct_decode(nd["oct"])  # decode once, shift the decoded field
    center_d = nd["depth"]
    center_l = m.luminance(rgb)
    clamped4 = jnp.concatenate([rgb, var[..., None]], -1)

    s_depth = center_d * float(stride) * settings.eaw_depth_sigma
    s_normal = settings.eaw_normal_sigma
    s_luma = settings.eaw_luma_sigma * jnp.sqrt(jnp.maximum(0.0, var + EPS))

    acc_c = jnp.zeros_like(rgb)
    acc_v = jnp.zeros_like(var)
    tw = jnp.zeros_like(var)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            sx, sy = dx * stride, dy * stride
            c4, valid = shift2d(clamped4, sx, sy)
            c = c4[..., :3]
            v_tap = c4[..., 3]
            n_tap, _ = shift2d(center_n, sx, sy)
            d_tap, _ = shift2d(center_d, sx, sy)
            valid = valid & (d_tap >= 1e-5)
            r = float((dx * dx + dy * dy) ** 0.5)
            w = m.normal_weight(center_n, n_tap, s_normal) * m.depth_weight(
                center_d, d_tap, s_depth * r
            )
            if options.use_variance:
                l_tap, _ = shift2d(center_l, sx, sy)
                lw = m.luma_weight(center_l, l_tap, s_luma)
                hw = _EAW_KW[abs(dx)] * _EAW_KW[abs(dy)]
            else:
                lw = 1.0
                hw = 1.0
            w_full = jnp.where(valid, w * hw * lw, 0.0)
            acc_c = acc_c + w_full[..., None] * c
            tw = tw + w_full
            if options.use_variance:
                w_sq = jnp.where(valid, (hw * w) ** 2 * lw * lw, 0.0)
                acc_v = acc_v + w_sq * v_tap

    out_c = jnp.where((tw < EPS)[..., None], rgb, acc_c / jnp.maximum(tw, EPS)[..., None])
    out_v = jnp.where(tw < EPS, var, acc_v / jnp.maximum(tw, EPS) ** 2)
    background = center_d < 1e-5
    out_c = jnp.where(background[..., None], rgb, out_c)
    out_v = jnp.where(background, var, out_v)
    return jnp.concatenate([out_c, out_v[..., None]], -1)


def eaw_blur_disocclusion(color4, nd, moments4, settings: Settings, options: RenderOptions):
    """BlurDisocclusion: 7x7 blur + spatial variance estimate where history
    is shorter than 8 frames (eaw_blur.hlsl:139-223)."""
    rgb = jnp.minimum(color4[..., :3], FIREFLY_CLAMP)
    var = color4[..., 3]
    hist_len = moments4[..., 3]
    center_n = m.oct_decode(nd["oct"])
    center_d = nd["depth"]
    center_l = m.luminance(rgb)
    # pack taps: rgb(3) + luma(1) + moments(2)
    packed = jnp.concatenate([rgb, center_l[..., None], moments4[..., :2]], -1)

    s_depth = center_d * settings.eaw_depth_sigma
    s_normal = settings.eaw_normal_sigma
    s_luma = settings.eaw_luma_sigma

    acc_c = jnp.zeros_like(rgb)
    acc_m = jnp.zeros_like(moments4[..., :2])
    tw = jnp.zeros_like(var)
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            p_tap, valid = shift2d(packed, dx, dy)
            c = p_tap[..., :3]
            l_tap = p_tap[..., 3]
            m_tap = p_tap[..., 4:6]
            n_tap, _ = shift2d(center_n, dx, dy)
            d_tap, _ = shift2d(center_d, dx, dy)
            valid = valid & (d_tap >= 1e-5)
            r = float((dx * dx + dy * dy) ** 0.5)
            w = (
                m.normal_weight(center_n, n_tap, s_normal)
                * m.depth_weight(center_d, d_tap, s_depth * r)
                * m.luma_weight(center_l, l_tap, s_luma)
            )
            w = jnp.where(valid, w, 0.0)
            acc_c = acc_c + w[..., None] * c
            acc_m = acc_m + w[..., None] * m_tap
            tw = tw + w

    f_c = jnp.where((tw < EPS)[..., None], rgb, acc_c / jnp.maximum(tw, EPS)[..., None])
    f_m = jnp.where((tw < EPS)[..., None], 0.0, acc_m / jnp.maximum(tw, EPS)[..., None])
    boost = SPATIAL_VARIANCE_THRESHOLD / jnp.maximum(hist_len, 1e-5)
    f_v = boost * jnp.abs(f_m[..., 1] - f_m[..., 0] ** 2)

    passthrough = (center_d < 1e-5) | (hist_len >= SPATIAL_VARIANCE_THRESHOLD)
    out_c = jnp.where(passthrough[..., None], rgb, f_c)
    out_v = jnp.where(passthrough, var, f_v)
    return jnp.concatenate([out_c, out_v[..., None]], -1)


def denoise(color4, nd, moments4, settings: Settings, options: RenderOptions):
    """The EAW chain: disocclusion blur, then strides 1, 3 (and 5, 7 when
    eaw5); raytracing_system.cpp:1437-1539."""
    if not options.denoise:
        return color4
    mesh = _spmd_stencil_mesh(color4.shape[0])
    if mesh is not None:
        from ..ops import pallas_stencil as ps
        from ..parallel.sharding import halo_map

        strides = (1, 3, 5, 7) if options.eaw5 else (1, 3)
        reach = 3 + sum(2 * s for s in strides)  # disocclusion + a-trous sum
        return halo_map(
            mesh,
            lambda c4, n_, d_, m4: ps.denoise_chain(
                c4, n_, d_, m4, settings, options),
            reach, color4, m.oct_decode(nd["oct"]), nd["depth"], moments4,
        )
    if _use_pallas_stencil():
        from ..ops import pallas_stencil as ps

        return ps.denoise_chain(
            color4, m.oct_decode(nd["oct"]), nd["depth"], moments4, settings, options
        )
    x = eaw_blur_disocclusion(color4, nd, moments4, settings, options)
    strides = (1, 3, 5, 7) if options.eaw5 else (1, 3)
    for s in strides:
        x = eaw_blur(x, nd, s, settings, options)
    return x


# --------------------------------------------------------------------------
# Pass 7: combine (combine_illumination.hlsl)


def combine(direct, indirect4, albedo, output: int):
    indirect = indirect4[..., :3]
    if output == OUTPUT_COMBINED:
        return indirect * albedo + direct
    if output == OUTPUT_DIRECT:
        return direct
    if output == OUTPUT_INDIRECT:
        return indirect
    if output == OUTPUT_VARIANCE:
        return jnp.repeat(indirect4[..., 3:4], 3, axis=-1)
    raise ValueError(f"unknown output mode {output}")


# --------------------------------------------------------------------------
# Pass 8: TAA (temporal_accumulation.hlsl TAA)


def _neighbourhood_aabb(color, scale):
    """5x5 YCoCg mean +- scale*sigma AABB; temporal_accumulation.hlsl:97-137."""
    tc = col.rgb_to_ycocg(col.simple_tonemap(color))  # transform once
    m1 = jnp.zeros_like(tc)
    m2 = jnp.zeros_like(tc)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            # clamped (not skipped) taps, matching the hlsl clamp
            v = shift2d_clamped(tc, dx, dy)
            m1 = m1 + v
            m2 = m2 + v * v
    m1 = m1 / 25.0
    m2 = m2 / 25.0
    dev = jnp.sqrt(jnp.abs(m2 - m1 * m1)) * scale[..., None]
    pmin = jnp.minimum(m1 - dev, tc)
    pmax = jnp.maximum(m1 + dev, tc)
    return pmin, pmax


def taa(combined, rep, nd, width, height, taa_feedback):
    depth = nd["depth"]
    background = depth < 1e-5
    velocity = rep["velocity"]
    offscreen = rep["offscreen"]

    cur_sample = combined  # bilinear at own texel center == identity

    is_static = velocity < 1e-3
    alpha = jnp.where(is_static, 0.98, 0.6)
    aabb_scale = jnp.where(is_static, 5.0, 0.75)
    alpha = jnp.minimum(taa_feedback, alpha)

    history = col.rgb_to_ycocg(col.simple_tonemap(rep["taa_history"]))
    color_tc = col.rgb_to_ycocg(col.simple_tonemap(cur_sample))
    pmin, pmax = _neighbourhood_aabb(combined, aabb_scale)
    history = col.clip_to_aabb(pmin, pmax, history)
    blended = col.invert_simple_tonemap(
        col.ycocg_to_rgb(color_tc * (1.0 - alpha[..., None]) + history * alpha[..., None])
    )
    out = jnp.where((background | offscreen)[..., None], cur_sample, blended)
    return out
