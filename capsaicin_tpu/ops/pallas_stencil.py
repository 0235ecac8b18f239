"""Pallas TPU kernels: edge-aware stencil filters (EAW blur chain + spatial
gather).

The reference implements these as 8x8-thread-group compute shaders
(eaw_blur.hlsl, spatial_gather.hlsl). The jnp formulation (roll + mask per
tap) makes XLA materialize a full [H,W,C] temporary per tap — at 1080p the
4-stage EAW chain alone costs ~54 ms, all of it HBM bandwidth. These kernels
read each row tile into VMEM ONCE and synthesize all 25/49 taps from on-chip
data: lane rolls for column offsets, sublane slices of a multi-tile row
window for row offsets.

Layout: planar [C, rows, Wp] f32.
  * columns: zero-padded 64 left + >=64 right so Wp % 128 == 0; max tap
    offset is 14, so lane-roll wraparound never reaches image columns, and
    zero depth in the pads excludes pad taps exactly like the jnp masks
    (the valid mask there is `in-bounds AND d_tap >= 1e-5`; zero-padded
    depth makes the second conjunct imply the first).
  * rows: height padded to a TILE multiple, plus PAD_BLOCKS zero tiles above
    and below; grid step i reads blocks i .. i+2*n_side of the same array —
    the row window. n_side = ceil(max row offset / TILE), so a stride-7
    5x5 blur (offset 14) reads 5 tiles, a 7x7 (offset 3) reads 3.
  * TILE is 8 rows: the full window set must fit the 16 MB VMEM including
    pallas' double buffering (measured: 16-row tiles with 3-block windows
    OOM at 20 MB).

Weight math matches ops.mathops / passes.py exactly (eaw_edge_stopping.h,
eaw_blur.hlsl:48-223, spatial_gather.hlsl); tests assert equality against
the jnp path to fp tolerance.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 8  # row tile
PAD_BLOCKS = 3  # zero tiles above/below = max n_side (fused 5+7 blur pair)
COL_PAD = 64
EPS = 1e-8
FIREFLY_CLAMP = 10.0
SPATIAL_VARIANCE_THRESHOLD = 8.0
_EAW_KW = (1.0, 2.0 / 3.0, 1.0 / 6.0)  # eaw_blur.hlsl:76


def _use_interpret():
    return jax.default_backend() != "tpu"


def _layout(dtype):
    """(tile, pad_blocks) for a planar storage dtype. bf16 rows tile at 16
    on TPU, so the row block doubles and every single-stride window becomes
    3 blocks; the deepest fused pair (5+7, row reach 24) needs 2 pad
    blocks."""
    if dtype == jnp.bfloat16:
        return 16, 2
    return TILE, PAD_BLOCKS


def _n_side(max_row_offset: int, tile: int = TILE) -> int:
    return -(-max_row_offset // tile)


def _col_pad_right(width: int) -> int:
    return COL_PAD + ((-width - 2 * COL_PAD) % 128)


def to_planar(channels, height: int, width: int, dtype=jnp.float32):
    """List of [H,W] planes -> padded planar
    [C, pad_blocks*tile + Hp + pad_blocks*tile, Wp] in the storage dtype."""
    tile, pad_blocks = _layout(dtype)
    img = jnp.stack(channels, axis=0).astype(dtype)  # [C, H, W]
    hp = -(-height // tile) * tile
    pr = _col_pad_right(width)
    pad = pad_blocks * tile
    return jnp.pad(
        img,
        ((0, 0), (pad, pad + hp - height), (COL_PAD, pr)),
        mode="constant",
    )


def repad_rows(planar_out):
    """Kernel output [C, Hp, Wp] -> chain input with row pads restored."""
    tile, pad_blocks = _layout(planar_out.dtype)
    pad = pad_blocks * tile
    return jnp.pad(planar_out, ((0, 0), (pad, pad), (0, 0)), mode="constant")


def from_planar(planar_out, height: int, width: int):
    """Kernel output [C, Hp, Wp] -> list of [H, W] planes."""
    img = planar_out[:, :height, COL_PAD : COL_PAD + width]
    return [img[c] for c in range(img.shape[0])]


def _roll_cols(x, dxt: int):
    """Circular lane shift so out[..., c] = x[..., c + dxt]; pltpu.roll
    requires a non-negative shift, so negate modulo the lane count."""
    if dxt == 0:
        return x
    return pltpu.roll(x, (-dxt) % x.shape[-1], axis=x.ndim - 1)


def _lum(r, g, b):
    return r * 0.299 + g * 0.587 + b * 0.114


def _edge_weights(cn, cd, tn, td, s_normal, s_depth_r):
    """normal_weight * depth_weight (eaw_edge_stopping.h:4-13)."""
    ndot = jnp.maximum(cn[0] * tn[0] + cn[1] * tn[1] + cn[2] * tn[2], 0.0)
    nw = jnp.power(ndot, s_normal)
    t = jnp.where(
        s_depth_r == 0.0,
        0.0,
        jnp.abs(cd - td) / jnp.where(s_depth_r == 0.0, 1.0, s_depth_r),
    )
    return nw * jnp.exp(-t)


def _stack(refs):
    """Concat a window's row blocks [C,tile,Wp] -> [C, n*tile, Wp],
    upcast to f32 (compute is always f32; only storage may be bf16)."""
    return jnp.concatenate(
        [r[:].astype(jnp.float32) for r in refs], axis=1)


# ---------------------------------------------------------------------------
# EAW blur (eaw_blur.hlsl Blur): 5x5 a-trous, variance-guided luma sigma


def _eaw_stage(col3, geo3, stride, use_variance, s_normal, s_depth, s_luma,
               c0, nrows):
    """One Blur stage over output rows [c0, c0+nrows) of the stacked window
    arrays col3/geo3 ([4, R, Wp]). col3 is UNCLAMPED — the stage clamps its
    own rgb taps, exactly like the sequential kernels clamp on read. Taps
    reach rows [c0 - 2*stride, c0 + nrows + 2*stride); the caller guarantees
    those are in range. Returns the stage output [4, nrows, Wp]."""
    col3 = jnp.concatenate(
        [jnp.minimum(col3[:3], FIREFLY_CLAMP), col3[3:4]], axis=0
    )

    cc = col3[:, c0 : c0 + nrows, :]
    gc = geo3[:, c0 : c0 + nrows, :]
    cr, cg, cb, cv = cc[0], cc[1], cc[2], cc[3]
    cn = (gc[0], gc[1], gc[2])
    cd = gc[3]
    cl = _lum(cr, cg, cb)
    s_l_eff = s_luma * jnp.sqrt(jnp.maximum(0.0, cv + EPS))
    s_d_base = cd * float(stride) * s_depth

    acc_r = jnp.zeros_like(cr)
    acc_g = jnp.zeros_like(cr)
    acc_b = jnp.zeros_like(cr)
    acc_v = jnp.zeros_like(cr)
    tw = jnp.zeros_like(cr)
    # row window sliced once per dy, lane roll per dx on the small window
    for dy in range(-2, 3):
        r0 = c0 + dy * stride
        c_dy = col3[:, r0 : r0 + nrows, :]
        g_dy = geo3[:, r0 : r0 + nrows, :]
        for dx in range(-2, 3):
            ct = _roll_cols(c_dy, dx * stride)
            gt = _roll_cols(g_dy, dx * stride)
            td = gt[3]
            r = float((dx * dx + dy * dy) ** 0.5)
            w = _edge_weights(cn, cd, (gt[0], gt[1], gt[2]), td,
                              s_normal, s_d_base * r)
            if use_variance:
                l_tap = _lum(ct[0], ct[1], ct[2])
                lw = jnp.exp(-jnp.abs(cl - l_tap) / s_l_eff)
                hw = _EAW_KW[abs(dx)] * _EAW_KW[abs(dy)]
            else:
                lw = 1.0
                hw = 1.0
            valid = td >= 1e-5
            w_full = jnp.where(valid, w * hw * lw, 0.0)
            acc_r += w_full * ct[0]
            acc_g += w_full * ct[1]
            acc_b += w_full * ct[2]
            tw += w_full
            if use_variance:
                w_sq = jnp.where(valid, (hw * w) ** 2 * lw * lw, 0.0)
                acc_v += w_sq * ct[3]

    low = tw < EPS
    inv = 1.0 / jnp.maximum(tw, EPS)
    out_r = jnp.where(low, cr, acc_r * inv)
    out_g = jnp.where(low, cg, acc_g * inv)
    out_b = jnp.where(low, cb, acc_b * inv)
    if use_variance:
        out_v = jnp.where(low, cv, acc_v * inv * inv)
    else:
        out_v = jnp.where(low, cv, acc_v)
    background = cd < 1e-5
    return jnp.stack(
        [
            jnp.where(background, cr, out_r),
            jnp.where(background, cg, out_g),
            jnp.where(background, cb, out_b),
            jnp.where(background, cv, out_v),
        ],
        axis=0,
    )


def _store4(out_ref, out):
    dt = out_ref.dtype
    out_ref[0] = out[0].astype(dt)
    out_ref[1] = out[1].astype(dt)
    out_ref[2] = out[2].astype(dt)
    out_ref[3] = out[3].astype(dt)


def _eaw_kernel(stride, use_variance, n_side, tile, scal_ref, *refs):
    nblk = 2 * n_side + 1
    col_refs = refs[:nblk]
    geo_refs = refs[nblk : 2 * nblk]
    out_ref = refs[2 * nblk]
    out = _eaw_stage(
        _stack(col_refs), _stack(geo_refs), stride, use_variance,
        scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2],
        n_side * tile, tile,
    )
    _store4(out_ref, out)


def _eaw_pair_kernel(stride_a, stride_b, use_variance, n_side, tile,
                     scal_ref, *refs):
    """Two back-to-back Blur stages in ONE kernel: stage A is computed over
    the wider slab stage B's taps reach ([c0 - 2*sB, c0 + TILE + 2*sB)),
    then stage B consumes it from VMEM — the intermediate image never
    round-trips HBM (the sequential chain re-reads 2*(col+geo) windows and
    writes one full image per stage). Recompute factor for stage A is
    (TILE + 4*sB)/TILE; the chain is bandwidth-bound, so trading it for
    half the traffic is the experiment (CAPSAICIN_EAW_FUSED gates it)."""
    nblk = 2 * n_side + 1
    col_refs = refs[:nblk]
    geo_refs = refs[nblk : 2 * nblk]
    out_ref = refs[2 * nblk]
    s_normal = scal_ref[0, 0]
    s_depth = scal_ref[0, 1]
    s_luma = scal_ref[0, 2]

    col3 = _stack(col_refs)
    geo3 = _stack(geo_refs)
    c0 = n_side * tile
    lo = c0 - 2 * stride_b
    n_a = tile + 4 * stride_b
    a_out = _eaw_stage(col3, geo3, stride_a, use_variance,
                       s_normal, s_depth, s_luma, lo, n_a)
    out = _eaw_stage(a_out, geo3[:, lo : lo + n_a, :], stride_b, use_variance,
                     s_normal, s_depth, s_luma, 2 * stride_b, tile)
    _store4(out_ref, out)


# ---------------------------------------------------------------------------
# EAW disocclusion blur (eaw_blur.hlsl BlurDisocclusion): 7x7 + spatial
# variance estimate where history < 8 frames


def _disocc_kernel(n_side, tile, scal_ref, *refs):
    nblk = 2 * n_side + 1
    col_refs = refs[:nblk]
    geo_refs = refs[nblk : 2 * nblk]
    mom_refs = refs[2 * nblk : 3 * nblk]
    out_ref = refs[3 * nblk]
    s_normal = scal_ref[0, 0]
    s_depth = scal_ref[0, 1]
    s_luma = scal_ref[0, 2]

    col3 = _stack(col_refs)
    geo3 = _stack(geo_refs)
    mom3 = _stack(mom_refs)
    col3 = jnp.concatenate(
        [jnp.minimum(col3[:3], FIREFLY_CLAMP), col3[3:4]], axis=0
    )

    c0 = n_side * tile
    cc = col3[:, c0 : c0 + tile, :]
    gc = geo3[:, c0 : c0 + tile, :]
    mc = mom3[:, c0 : c0 + tile, :]
    cr, cg, cb, cv = cc[0], cc[1], cc[2], cc[3]
    cn = (gc[0], gc[1], gc[2])
    cd = gc[3]
    hist_len = mc[2]
    cl = _lum(cr, cg, cb)
    s_d_base = cd * s_depth

    acc_r = jnp.zeros_like(cr)
    acc_g = jnp.zeros_like(cr)
    acc_b = jnp.zeros_like(cr)
    acc_m1 = jnp.zeros_like(cr)
    acc_m2 = jnp.zeros_like(cr)
    tw = jnp.zeros_like(cr)
    for dy in range(-3, 4):
        r0 = c0 + dy
        c_dy = col3[:, r0 : r0 + tile, :]
        g_dy = geo3[:, r0 : r0 + tile, :]
        m_dy = mom3[:, r0 : r0 + tile, :]
        for dx in range(-3, 4):
            ct = _roll_cols(c_dy, dx)
            gt = _roll_cols(g_dy, dx)
            mt = _roll_cols(m_dy, dx)
            td = gt[3]
            r = float((dx * dx + dy * dy) ** 0.5)
            w = _edge_weights(cn, cd, (gt[0], gt[1], gt[2]), td,
                              s_normal, s_d_base * r)
            l_tap = _lum(ct[0], ct[1], ct[2])
            lw = jnp.exp(-jnp.abs(cl - l_tap) / s_luma)
            w_full = jnp.where(td >= 1e-5, w * lw, 0.0)
            acc_r += w_full * ct[0]
            acc_g += w_full * ct[1]
            acc_b += w_full * ct[2]
            acc_m1 += w_full * mt[0]
            acc_m2 += w_full * mt[1]
            tw += w_full

    low = tw < EPS
    inv = 1.0 / jnp.maximum(tw, EPS)
    f_r = jnp.where(low, cr, acc_r * inv)
    f_g = jnp.where(low, cg, acc_g * inv)
    f_b = jnp.where(low, cb, acc_b * inv)
    f_m1 = jnp.where(low, 0.0, acc_m1 * inv)
    f_m2 = jnp.where(low, 0.0, acc_m2 * inv)
    boost = SPATIAL_VARIANCE_THRESHOLD / jnp.maximum(hist_len, 1e-5)
    f_v = boost * jnp.abs(f_m2 - f_m1 * f_m1)

    passthrough = (cd < 1e-5) | (hist_len >= SPATIAL_VARIANCE_THRESHOLD)
    _store4(out_ref, (
        jnp.where(passthrough, cr, f_r),
        jnp.where(passthrough, cg, f_g),
        jnp.where(passthrough, cb, f_b),
        jnp.where(passthrough, cv, f_v),
    ))


# ---------------------------------------------------------------------------
# Spatial gather (spatial_gather.hlsl): 7x7 cross-bilateral on raw indirect


def _gather_kernel(n_side, tile, scal_ref, *refs):
    nblk = 2 * n_side + 1
    col_refs = refs[:nblk]
    geo_refs = refs[nblk : 2 * nblk]
    out_ref = refs[2 * nblk]
    s_normal = scal_ref[0, 0]
    s_depth = scal_ref[0, 1]
    s_luma = scal_ref[0, 2]

    col3 = _stack(col_refs)
    geo3 = _stack(geo_refs)

    c0 = n_side * tile
    cc = col3[:, c0 : c0 + tile, :]
    gc = geo3[:, c0 : c0 + tile, :]
    cr, cg, cb = cc[0], cc[1], cc[2]
    cn = (gc[0], gc[1], gc[2])
    cd = gc[3]
    cl = _lum(cr, cg, cb)
    s_d_base = cd * s_depth

    acc_r = jnp.zeros_like(cr)
    acc_g = jnp.zeros_like(cr)
    acc_b = jnp.zeros_like(cr)
    tw = jnp.zeros_like(cr)
    for dy in range(-3, 4):
        r0 = c0 + dy
        c_dy = col3[:, r0 : r0 + tile, :]
        g_dy = geo3[:, r0 : r0 + tile, :]
        for dx in range(-3, 4):
            ct = _roll_cols(c_dy, dx)
            gt = _roll_cols(g_dy, dx)
            td = gt[3]
            r = float((dx * dx + dy * dy) ** 0.5)
            w = _edge_weights(cn, cd, (gt[0], gt[1], gt[2]), td,
                              s_normal, s_d_base * r)
            l_tap = _lum(ct[0], ct[1], ct[2])
            lw = jnp.exp(-jnp.abs(cl - l_tap) / s_luma)
            w_full = jnp.where(td >= 1e-5, w * lw, 0.0)
            acc_r += w_full * ct[0]
            acc_g += w_full * ct[1]
            acc_b += w_full * ct[2]
            tw += w_full

    low = tw < EPS
    inv = 1.0 / jnp.maximum(tw, EPS)
    out_r = jnp.where(low, cr, acc_r * inv)
    out_g = jnp.where(low, cg, acc_g * inv)
    out_b = jnp.where(low, cb, acc_b * inv)
    background = cd < 1e-5
    dt = out_ref.dtype
    out_ref[0] = jnp.where(background, cr, out_r).astype(dt)
    out_ref[1] = jnp.where(background, cg, out_g).astype(dt)
    out_ref[2] = jnp.where(background, cb, out_b).astype(dt)


# ---------------------------------------------------------------------------
# Runners


def _run(kernel, scal, planars, out_channels: int, n_side: int,
         dtype=jnp.float32):
    """planars: padded planar arrays [C_i, pad*tile + Hp + pad*tile, Wp] in
    `dtype`; runs the kernel over row tiles, giving it the 2*n_side+1 row
    blocks around each output tile for every input. Returns
    [out_channels, Hp, Wp] in `dtype` (compute is f32 either way)."""
    tile, pad_blocks = _layout(dtype)
    assert n_side <= pad_blocks
    rows = planars[0].shape[1]
    wp = planars[0].shape[2]
    hp = rows - 2 * pad_blocks * tile
    nb = hp // tile
    base = pad_blocks - n_side  # first row block of the window for i=0

    in_specs = [pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    args = [scal]
    for p in planars:
        assert p.dtype == dtype, (p.dtype, dtype)
        c = p.shape[0]
        for off in range(2 * n_side + 1):
            in_specs.append(
                pl.BlockSpec(
                    (c, tile, wp),
                    functools.partial(lambda i, o: (0, i + o, 0), o=base + off),
                    memory_space=pltpu.VMEM,
                )
            )
            args.append(p)

    out_spec = pl.BlockSpec(
        (out_channels, tile, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((out_channels, hp, wp), dtype),
        interpret=_use_interpret(),
    )(*args)


def _scal(*vals):
    return jnp.stack(
        [jnp.asarray(v, jnp.float32) for v in vals]
        + [jnp.float32(0.0)] * (8 - len(vals))
    ).reshape(1, 8)


def pack_geo(nd_normal, nd_depth, height: int, width: int, dtype=jnp.float32):
    """Decoded normals [H,W,3] + depth [H,W] -> padded geo planar [4,...]."""
    return to_planar(
        [nd_normal[..., 0], nd_normal[..., 1], nd_normal[..., 2], nd_depth],
        height, width, dtype=dtype,
    )


def eaw_blur_planar(col_planar, geo_planar, stride: int, use_variance: bool,
                    s_normal, s_depth, s_luma):
    """One Blur dispatch at planar level: col_planar is the padded [4,...]
    (rgb, var). Returns the unpadded planar output [4, Hp, Wp]."""
    tile, _ = _layout(col_planar.dtype)
    n_side = _n_side(2 * stride, tile)
    kernel = functools.partial(_eaw_kernel, stride, use_variance, n_side, tile)
    return _run(kernel, _scal(s_normal, s_depth, s_luma),
                [col_planar, geo_planar], 4, n_side, dtype=col_planar.dtype)


def eaw_blur_pair_planar(col_planar, geo_planar, stride_a, stride_b,
                         use_variance: bool, s_normal, s_depth, s_luma):
    """Two Blur dispatches fused into one kernel (see _eaw_pair_kernel)."""
    tile, _ = _layout(col_planar.dtype)
    n_side = _n_side(2 * stride_a + 2 * stride_b, tile)
    kernel = functools.partial(
        _eaw_pair_kernel, stride_a, stride_b, use_variance, n_side, tile
    )
    return _run(kernel, _scal(s_normal, s_depth, s_luma),
                [col_planar, geo_planar], 4, n_side, dtype=col_planar.dtype)


def denoise_chain(color4, nd_normal, nd_depth, moments4, settings, options,
                  fused=None, storage=None):
    """The full EAW chain (disocclusion + strides 1,3[,5,7]),
    raytracing_system.cpp:1437-1539, in planar space with one packing and
    one unpacking. Equals the jnp passes.denoise to fp tolerance.

    fused selects the Blur-stage fusion (same math either way):
      falsy / "0"  — sequential stages (the default)
      True / "1"   — fused pairs (1+3) and (5+7)
      "13"         — fuse only (1+3); 5 and 7 stay sequential (the 5+7
                     pair's n_side=3 window is the VMEM-riskiest kernel)
    Default comes from options.eaw_fused (a static RenderOptions field the
    jit variant cache keys on; its own default reads CAPSAICIN_EAW_FUSED
    at options construction). The env fallback here only covers options
    objects without the field (ops-level test forcing).

    storage selects the planar HBM dtype (compute stays f32 in VMEM):
      falsy / "0" — f32 (exact; the default)
      True / "1"  — bf16: halves the chain's HBM traffic for ~3e-3 max
                    storage-rounding error per stage. Analogous to the
                    reference running these passes on RGBA16F targets
                    rather than fp32 (raytracing_system.cpp pass buffers).
    Default comes from options.eaw_bf16 (same pattern as eaw_fused)."""
    if fused is None:
        fused = getattr(options, "eaw_fused", None)
    if fused is None:
        fused = os.environ.get("CAPSAICIN_EAW_FUSED", "0")
    if fused in (False, "0", ""):
        fused = None  # sequential
    elif fused not in (True, "1", "13"):
        # strict: a typo ("off", "2", …) must not silently select the
        # fully-fused chain — that corrupts A/B runs and risks the (5+7)
        # pair's VMEM cliff
        raise ValueError(
            f"CAPSAICIN_EAW_FUSED={fused!r}: expected 0/1/13")
    fuse_57 = fused not in (None, "13")
    if storage is None:
        storage = getattr(options, "eaw_bf16", None)
    if storage is None:
        storage = os.environ.get("CAPSAICIN_EAW_BF16", "0")
    if storage not in (False, "", "0", True, "1"):
        raise ValueError(f"CAPSAICIN_EAW_BF16={storage!r}: expected 0/1")
    dtype = jnp.bfloat16 if storage in (True, "1") else jnp.float32
    tile, _ = _layout(dtype)
    height, width = color4.shape[:2]
    geo = pack_geo(nd_normal, nd_depth, height, width, dtype=dtype)
    col = to_planar(
        [color4[..., 0], color4[..., 1], color4[..., 2], color4[..., 3]],
        height, width, dtype=dtype,
    )
    mom = to_planar(
        [moments4[..., 0], moments4[..., 1], moments4[..., 3]], height, width,
        dtype=dtype,
    )
    scal = _scal(
        settings.eaw_normal_sigma, settings.eaw_depth_sigma, settings.eaw_luma_sigma
    )
    n_side = _n_side(3, tile)
    out = _run(functools.partial(_disocc_kernel, n_side, tile), scal,
               [col, geo, mom], 4, n_side, dtype=dtype)
    strides = (1, 3, 5, 7) if options.eaw5 else (1, 3)
    sig = (options.use_variance, settings.eaw_normal_sigma,
           settings.eaw_depth_sigma, settings.eaw_luma_sigma)
    steps = []  # 1- or 2-stride groups, in chain order
    if fused is not None:
        steps.append((1, 3))
        if options.eaw5:
            steps.append((5, 7) if fuse_57 else (5,))
            if not fuse_57:
                steps.append((7,))
    else:
        steps = [(s,) for s in strides]
    for group in steps:
        if len(group) == 2:
            out = eaw_blur_pair_planar(repad_rows(out), geo, *group, *sig)
        else:
            out = eaw_blur_planar(repad_rows(out), geo, group[0], *sig)
    planes = from_planar(out, height, width)
    return jnp.stack(planes, axis=-1).astype(jnp.float32)


def spatial_gather(indirect, nd_normal, nd_depth, settings, storage=None):
    """7x7 edge-aware cross-bilateral filter (spatial_gather.hlsl).

    storage as in denoise_chain: CAPSAICIN_EAW_BF16=1 moves the planar
    I/O to bf16 (compute stays f32 in VMEM)."""
    if storage is None:
        storage = os.environ.get("CAPSAICIN_EAW_BF16", "0")
    if storage not in (False, "", "0", True, "1"):
        raise ValueError(f"CAPSAICIN_EAW_BF16={storage!r}: expected 0/1")
    dtype = jnp.bfloat16 if storage in (True, "1") else jnp.float32
    tile, _ = _layout(dtype)
    height, width = indirect.shape[:2]
    geo = pack_geo(nd_normal, nd_depth, height, width, dtype=dtype)
    col = to_planar(
        [indirect[..., 0], indirect[..., 1], indirect[..., 2]], height, width,
        dtype=dtype,
    )
    scal = _scal(
        settings.gather_normal_sigma,
        settings.gather_depth_sigma,
        settings.gather_luma_sigma,
    )
    n_side = _n_side(3, tile)
    out = _run(functools.partial(_gather_kernel, n_side, tile), scal,
               [col, geo], 3, n_side, dtype=dtype)
    return jnp.stack(
        from_planar(out, height, width), axis=-1).astype(jnp.float32)
