"""Pallas TPU kernel: fully-static small-scene intersector.

For scenes up to ~128 triangles (Cornell-class), tree traversal is pure
overhead: the packet kernel's scalar while-loop costs ~300 cycles per node
visit in pipeline stalls. This kernel instead unrolls every triangle test
statically — no control flow, no dynamic indexing at all. Triangle data is
read from statically-indexed VMEM rows ([rows, 128] like the packet layout)
and broadcast against full 8x128 ray tiles. ~25 vector ops per triangle per
1024-ray block, nothing else.

Same Möller–Trumbore semantics/epsilons as ops.intersect.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_traverse import (
    LANE,
    PACKET,
    SUB,
    TRIS_PER_ROW,
    pack_rays_tiled,
    pack_tri_rows,
)

INF = 1e30

MAX_STATIC_TRIS = 128


def _use_interpret():
    return jax.default_backend() != "tpu"


def _static_kernel(n_rows, n_tris, any_hit,
                   rays_ref, tris_ref, t_out, u_out, v_out, p_out):
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    tmin = rays_ref[0, 6]
    tmax = rays_ref[0, 7]

    t_best = tmax
    u = jnp.zeros((SUB, LANE), jnp.float32)
    v = jnp.zeros((SUB, LANE), jnp.float32)
    prim = jnp.full((SUB, LANE), -1, jnp.int32)

    for row in range(n_rows):
        trow = tris_ref[row, :]
        for j in range(TRIS_PER_ROW):
            if row * TRIS_PER_ROW + j >= n_tris:
                break
            b = j * 10
            v0x, v0y, v0z = trow[b], trow[b + 1], trow[b + 2]
            e1x, e1y, e1z = trow[b + 3], trow[b + 4], trow[b + 5]
            e2x, e2y, e2z = trow[b + 6], trow[b + 7], trow[b + 8]
            tid = trow[b + 9].astype(jnp.int32) - 1

            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(
                jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
            )
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (
                (jnp.abs(det) > 1e-12)
                & (uu >= 0.0)
                & (vv >= 0.0)
                & (uu + vv <= 1.0)
                & (tt > tmin)
                & (tt < jnp.minimum(tmax, t_best))
                & (tid >= 0)
            )
            if any_hit:
                ok = ok & (prim < 0)
            t_best = jnp.where(ok, tt, t_best)
            u = jnp.where(ok, uu, u)
            v = jnp.where(ok, vv, v)
            prim = jnp.where(ok, tid, prim)

    t_out[0, 0] = t_best
    u_out[0, 0] = u
    v_out[0, 0] = v
    p_out[0, 0] = prim


def _run(tri_rows, n_tris, rays_tiled, any_hit: bool):
    np_ = rays_tiled.shape[0]
    kernel = functools.partial(
        _static_kernel, tri_rows.shape[0], n_tris, any_hit
    )
    f32 = jax.ShapeDtypeStruct((np_, 1, SUB, LANE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((np_, 1, SUB, LANE), jnp.int32)
    out_spec = pl.BlockSpec((1, 1, SUB, LANE), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(np_,),
        in_specs=[
            pl.BlockSpec((1, 8, SUB, LANE), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tri_rows.shape, lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(f32, f32, f32, i32),
        interpret=_use_interpret(),
    )(rays_tiled, tri_rows)


class StaticScene:
    """Packed triangle rows for the static kernel (pytree, n_tris static)."""

    def __init__(self, tri_rows, n_tris: int):
        self.tri_rows = tri_rows
        self.n_tris = n_tris

    def tree_flatten(self):
        return (self.tri_rows,), self.n_tris

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


jax.tree_util.register_pytree_node_class(StaticScene)


def build_static(tris) -> StaticScene:
    """tris [T,3,3] (T <= MAX_STATIC_TRIS) -> packed rows in original order
    (prim ids are the input triangle indices)."""
    t = tris.shape[0]
    assert t <= MAX_STATIC_TRIS, "static kernel supports up to 128 triangles"
    tri_id = jnp.arange(t, dtype=jnp.int32)
    return StaticScene(pack_tri_rows(tris[:, 0],
                                     tris[:, 1] - tris[:, 0],
                                     tris[:, 2] - tris[:, 0],
                                     tri_id), t)


def static_closest(packed: StaticScene, origins, dirs, tmin=0.0, tmax=1e6):
    rays, n = pack_rays_tiled(origins, dirs, tmin, tmax)
    t, u, v, prim = _run(packed.tri_rows, packed.n_tris, rays, any_hit=False)
    return {
        "t": t.reshape(-1)[:n],
        "u": u.reshape(-1)[:n],
        "v": v.reshape(-1)[:n],
        "prim": prim.reshape(-1)[:n],
    }


def static_any(packed: StaticScene, origins, dirs, tmin=1e-4, tmax=1e6):
    rays, n = pack_rays_tiled(origins, dirs, tmin, tmax)
    t, u, v, prim = _run(packed.tri_rows, packed.n_tris, rays, any_hit=True)
    return prim.reshape(-1)[:n] >= 0
