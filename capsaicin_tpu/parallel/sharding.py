"""Multi-chip scaling: shard the pixel grid over an ICI device mesh.

The reference is single-GPU; its only "parallelism" is pixel data-parallelism
inside one device (SURVEY.md §2.4). The TPU-native scale-out maps the same
structure onto a `jax.sharding.Mesh`:

  * the framebuffer (and all per-pixel state) is sharded over image rows —
    rays are independent, so the render passes partition trivially
  * the scene / BVH / blue-noise table are replicated (broadcast once)
  * XLA SPMD inserts the halo exchanges for the stencil passes (they are
    expressed as rolls, which lower to cheap collective-permutes on ICI) and
    the gathers for history reprojection
  * the final frame either stays sharded (per-host DMA) or is gathered for
    display — the only frame-loop collective, riding ICI not DCN

Use `make_mesh()` then `shard_session_fn()` to get a pjit-ed frame step with
row sharding; tests exercise this on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS = "rows"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (ROWS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (image height) across the mesh."""
    return NamedSharding(mesh, P(ROWS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _shard_like(mesh: Mesh, tree, height: int):
    """Sharding pytree: arrays whose leading dim == height are row-sharded,
    everything else replicated."""
    rows = row_sharding(mesh)
    rep = replicated(mesh)

    def pick(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == height:
            return rows
        return rep

    return jax.tree.map(pick, tree)


def shard_frame_state(mesh: Mesh, state, height: int):
    """Place a FrameState with row sharding."""
    return jax.device_put(state, _shard_like(mesh, state, height))


def shard_scene(mesh: Mesh, scene):
    """Replicate the scene pytree across the mesh."""
    return jax.device_put(scene, replicated(mesh))


def shard_trace(mesh: Mesh, scene, bvh, select):
    """shard_map a ray-batch trace function over the mesh.

    XLA's SPMD partitioner handles every jnp pass automatically, but a
    `pallas_call` is a custom call it cannot split — so the production
    Pallas traversal kernels (pallas_traverse / pallas_intersect /
    pallas_static) must be placed per-shard explicitly. Rays are
    embarrassingly parallel: each device runs the UNCHANGED single-chip
    kernel on its slice of the ray batch with the scene/BVH replicated
    (SURVEY.md §2.4 row 5 — shard_map over image tiles).

    `select(scene, bvh) -> fn(origins, dirs, tmin, tmax)` builds the
    single-chip trace function; it runs at trace time INSIDE the shard, so
    sorting wrappers (with_ray_sorting) sort per-shard — locality where the
    packets actually form, and no cross-chip argsort collectives.

    scene/bvh are passed as explicit shard_map operands (replicated spec):
    closure capture of traced arrays is rejected by shard_map. tmin/tmax
    are broadcast to per-ray [N] so scalar and per-ray callers shard alike.
    Returns a fn with the standard backend signature whose outputs are
    row-sharded like its ray inputs.
    """
    import jax.numpy as jnp

    def fn(origins, dirs, tmin, tmax):
        n = origins.shape[0]
        tmn = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
        tmx = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))

        def local(sb, o, d, a, b):
            scene_, bvh_ = sb
            return select(scene_, bvh_)(o, d, a, b)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(ROWS), P(ROWS), P(ROWS), P(ROWS)),
            out_specs=P(ROWS),
            check_vma=False,
        )((scene, bvh), origins, dirs, tmn, tmx)

    return fn


def halo_map(mesh: Mesh, fn, reach: int, *arrays):
    """shard_map a row-stencil function over the mesh with explicit halo
    exchange — the SPMD placement for the Pallas stencil kernels (EAW chain,
    spatial gather), which XLA's partitioner cannot split.

    Every array in `arrays` is row-partitioned (axis 0); each shard receives
    `reach` extra rows from its neighbors via `jax.lax.ppermute` (multi-hop
    when a shard is shorter than the reach), runs the UNCHANGED single-chip
    `fn` on the extended arrays, and crops the halo off the result. Edge
    shards receive ppermute's zero fill, which reproduces the out-of-bounds
    tap semantics exactly: every stencil here rejects taps with depth
    < 1e-5, and zero rows have zero depth (same argument as the kernels'
    own zero row/column padding, ops/pallas_stencil.py).

    One exchange covers a whole multi-stage chain when `reach` is the SUM of
    per-stage reaches (the classic overlapping-halo rule: kept rows only
    depend on taps whose intermediate values are exact at every stage).
    """
    import jax.numpy as jnp

    n = mesh.shape[ROWS]
    if n == 1:
        return fn(*arrays)

    def local(*xs):
        shard_rows = xs[0].shape[0]
        hops = -(-reach // shard_rows)

        def exchange(x):
            above = []
            below = []
            for j in range(1, hops + 1):
                down = [(i, i + j) for i in range(0, n - j)]
                up = [(i, i - j) for i in range(j, n)]
                above.insert(0, jax.lax.ppermute(x, ROWS, down))
                below.append(jax.lax.ppermute(x, ROWS, up))
            top = jnp.concatenate(above, axis=0)[-reach:]
            bot = jnp.concatenate(below, axis=0)[:reach]
            return jnp.concatenate([top, x, bot], axis=0)

        out = fn(*[exchange(x) for x in xs])
        return jax.tree.map(lambda y: y[reach:-reach], out)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(P(ROWS) for _ in arrays),
        out_specs=P(ROWS),
        check_vma=False,
    )(*arrays)


def build_sharded_step(mesh: Mesh, step_fn, height: int, example_state, example_args):
    """jit `step_fn(scene, bvh, camera, state, settings, noise)` with row
    sharding on the per-pixel state/outputs and replication elsewhere.

    out_shardings pins the returned (display, state) to row sharding too —
    otherwise XLA may leave gather-fed outputs replicated and the state could
    not be fed back into the next frame."""
    scene, bvh, camera, _, settings, noise = example_args
    in_shardings = (
        jax.tree.map(lambda _: replicated(mesh), scene),
        jax.tree.map(lambda _: replicated(mesh), bvh),
        jax.tree.map(lambda _: replicated(mesh), camera),
        _shard_like(mesh, example_state, height),
        jax.tree.map(lambda _: replicated(mesh), settings),
        replicated(mesh),
    )
    out_shardings = (
        row_sharding(mesh),  # display image [H,W,3]
        _shard_like(mesh, example_state, height),
    )
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(3,),
    )
