"""Pallas TPU kernel: brute-force ray/triangle intersection.

The hot compute of the small-scene path (and of BVH leaf tests). The pure-jnp
oracle (ops.intersect) materializes [rays, tris, 3] cross-product temporaries
in HBM — ~1 GB at 1080p — so it is bandwidth-bound. This kernel streams ray
blocks through VMEM while a triangle chunk stays resident, computing
Möller–Trumbore as [CHUNK_TRIS, BLOCK_RAYS] broadcast tiles entirely on the
VPU: zero HBM intermediates, pure 8x128-lane elementwise work.

Tile orientation: rays on the SUBLANE axis, triangles on the LANE axis
([BR, TC] tiles). The transposed orientation (rays on lanes) would keep the
running best-hit state transpose-free, but Mosaic compiles its [TC,1]
sublane broadcasts ~100x slower; this orientation compiles in seconds and
runs within ~2x of VPU peak.

Layouts: rays [8, N] component-major (ox oy oz dx dy dz tmin tmax);
triangles [9, T] component-major (v0 | e1 | e2).

Grid is (ray_blocks, tri_chunks) with the chunk axis innermost; per-ray best
hits accumulate in VMEM scratch across chunks and are written on the last
chunk. The any-hit variant ORs a hit flag instead (the shadow-ray
RAY_FLAG_ACCEPT_FIRST_HIT analog, lighting.h:48-55).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e30  # python float: jnp scalars would be captured consts in kernels

BLOCK_RAYS = 512
MAX_CHUNK_TRIS = 512
TRI_ALIGN = 128


def _chunk_for(t_pad: int) -> int:
    return min(MAX_CHUNK_TRIS, t_pad)


def _use_interpret():
    return jax.default_backend() != "tpu"


def _mt_tile(rays_ref, tris_ref, t_best_col):
    """One [BR, TC] Möller–Trumbore tile. Returns (t, u, v, valid)."""

    def ray(k):
        return rays_ref[k, :].reshape(-1, 1)  # [BR, 1]

    def tri(k):
        return tris_ref[k, :].reshape(1, -1)  # [1, TC]

    ox, oy, oz = ray(0), ray(1), ray(2)
    dx, dy, dz = ray(3), ray(4), ray(5)
    tmin, tmax = ray(6), ray(7)
    v0x, v0y, v0z = tri(0), tri(1), tri(2)
    e1x, e1y, e1z = tri(3), tri(4), tri(5)
    e2x, e2y, e2z = tri(6), tri(7), tri(8)

    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    # tvec = o - v0
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < jnp.minimum(tmax, t_best_col))
    )
    return t, u, v, valid


def _closest_kernel(chunk_tris, rays_ref, tris_ref, t_out, u_out, v_out, p_out,
                    bt, bu, bv, bp):
    c = pl.program_id(1)
    num_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        bt[:] = jnp.full_like(bt, INF)
        bu[:] = jnp.zeros_like(bu)
        bv[:] = jnp.zeros_like(bv)
        bp[:] = jnp.full_like(bp, -1)

    t, u, v, valid = _mt_tile(rays_ref, tris_ref, bt[0, :].reshape(-1, 1))
    t_masked = jnp.where(valid, t, INF)
    t_min = jnp.min(t_masked, axis=1, keepdims=True)  # [BR, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    # first column achieving the min (deterministic tie-break = lowest id,
    # matching the oracle's argmin semantics)
    best_col = jnp.min(
        jnp.where(valid & (t_masked <= t_min), col, jnp.int32(2**30)),
        axis=1,
        keepdims=True,
    )
    sel = col == best_col
    u_c = jnp.sum(jnp.where(sel, u, 0.0), axis=1)
    v_c = jnp.sum(jnp.where(sel, v, 0.0), axis=1)
    t_c = t_min[:, 0]
    p_c = jnp.where(best_col[:, 0] < 2**30, c * chunk_tris + best_col[:, 0], jnp.int32(-1))

    better = t_c < bt[0, :]
    bt[0, :] = jnp.where(better, t_c, bt[0, :])
    bu[0, :] = jnp.where(better, u_c, bu[0, :])
    bv[0, :] = jnp.where(better, v_c, bv[0, :])
    bp[0, :] = jnp.where(better, p_c, bp[0, :])

    @pl.when(c == num_chunks - 1)
    def _():
        t_out[:] = bt[:]
        u_out[:] = bu[:]
        v_out[:] = bv[:]
        p_out[:] = bp[:]


def _any_kernel(rays_ref, tris_ref, hit_out, bh):
    c = pl.program_id(1)
    num_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        bh[:] = jnp.zeros_like(bh)

    big = jnp.full((1, 1), INF)
    t, u, v, valid = _mt_tile(rays_ref, tris_ref, big)
    any_hit = jnp.any(valid, axis=1)
    bh[0, :] = jnp.where(any_hit, jnp.int32(1), bh[0, :])

    @pl.when(c == num_chunks - 1)
    def _():
        hit_out[:] = bh[:]


def pack_rays(origins, dirs, tmin, tmax):
    """[N,3]x2 + scalars -> [8, N_padded] component-major, padded rays inert."""
    n = origins.shape[0]
    n_pad = -(-n // BLOCK_RAYS) * BLOCK_RAYS
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    rays = jnp.concatenate(
        [origins.T, dirs.T, tmin[None, :], tmax[None, :]], axis=0
    ).astype(jnp.float32)
    if n_pad != n:
        pad = jnp.zeros((8, n_pad - n), jnp.float32)
        rays = jnp.concatenate([rays, pad], axis=1)
    return rays, n


@functools.partial(jax.jit, static_argnames=("n_tris",))
def _pack_tris_impl(tris, n_tris):
    t_pad = -(-n_tris // TRI_ALIGN) * TRI_ALIGN
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    packed = jnp.concatenate([v0.T, e1.T, e2.T], axis=0).astype(jnp.float32)
    if t_pad != n_tris:
        packed = jnp.concatenate(
            [packed, jnp.zeros((9, t_pad - n_tris), jnp.float32)], axis=1
        )
    return packed


def pack_tris(tris):
    """[T,3,3] -> [9, T_padded] (v0 | e1 | e2); degenerate padding never hits."""
    return _pack_tris_impl(tris, tris.shape[0])


def closest(rays_packed, tris_packed, n_rays):
    """rays [8, Np], tris [Tp, 16] -> dict(t,u,v,prim) with [n_rays] leaves."""
    n_pad = rays_packed.shape[1]
    t_pad = tris_packed.shape[1]
    chunk = _chunk_for(t_pad)
    grid = (n_pad // BLOCK_RAYS, -(-t_pad // chunk))
    out_spec = pl.BlockSpec((1, BLOCK_RAYS), lambda r, c: (0, r), memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((1, n_pad), jnp.float32)
    i32 = jax.ShapeDtypeStruct((1, n_pad), jnp.int32)
    t, u, v, p = pl.pallas_call(
        functools.partial(_closest_kernel, chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, BLOCK_RAYS), lambda r, c: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, chunk), lambda r, c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(f32, f32, f32, i32),
        scratch_shapes=[
            pltpu.VMEM((1, BLOCK_RAYS), jnp.float32),
            pltpu.VMEM((1, BLOCK_RAYS), jnp.float32),
            pltpu.VMEM((1, BLOCK_RAYS), jnp.float32),
            pltpu.VMEM((1, BLOCK_RAYS), jnp.int32),
        ],
        interpret=_use_interpret(),
    )(rays_packed, tris_packed)
    return {
        "t": t[0, :n_rays],
        "u": u[0, :n_rays],
        "v": v[0, :n_rays],
        "prim": p[0, :n_rays],
    }


def any_hit(rays_packed, tris_packed, n_rays):
    n_pad = rays_packed.shape[1]
    t_pad = tris_packed.shape[1]
    chunk = _chunk_for(t_pad)
    grid = (n_pad // BLOCK_RAYS, -(-t_pad // chunk))
    hit = pl.pallas_call(
        _any_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, BLOCK_RAYS), lambda r, c: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, chunk), lambda r, c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_RAYS), lambda r, c: (0, r), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, BLOCK_RAYS), jnp.int32)],
        interpret=_use_interpret(),
    )(rays_packed, tris_packed)
    return hit[0, :n_rays] > 0


def brute_force_closest(origins, dirs, tris, tmin=0.0, tmax=1e6):
    """Drop-in analog of intersect.brute_force_closest on the Pallas path."""
    rays, n = pack_rays(origins, dirs, tmin, tmax)
    return closest(rays, pack_tris(tris), n)


def brute_force_any(origins, dirs, tris, tmin=1e-4, tmax=1e6):
    rays, n = pack_rays(origins, dirs, tmin, tmax)
    return any_hit(rays, pack_tris(tris), n)
