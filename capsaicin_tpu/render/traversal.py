"""Traversal backends: the replacement for DXR's fixed-function TraceRay.

A backend is a factory `(scene, accel) -> (closest_fn, any_fn)`:
  closest_fn(origins [N,3], dirs [N,3], tmin, tmax) -> {"t","u","v","prim"}
  any_fn(origins [N,3], dirs [N,3], tmin, tmax) -> bool [N]

Backends:
  "brute" — the exact O(N*T) oracle (ops.intersect); right choice for small
            scenes (Cornell-class) where a BVH would add overhead
  "bvh"   — LBVH + batched stackless traversal (ops.traverse); the DXR
            BLAS/TLAS analog (blas_system.cpp / tlas_system.cpp)
  "auto"  — brute below AUTO_BVH_THRESHOLD triangles, else bvh
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import intersect

AUTO_BVH_THRESHOLD = 4096


def make_brute_force(scene):
    import jax

    tris = jnp.stack([scene.tri_v0, scene.tri_v1, scene.tri_v2], axis=1)

    if jax.default_backend() == "tpu":
        # Pallas VMEM-resident kernel: no [rays, tris] HBM temporaries
        from ..ops import pallas_intersect as pi

        tris_packed = pi.pack_tris(tris)

        def closest(origins, dirs, tmin, tmax):
            rays, n = pi.pack_rays(origins, dirs, tmin, tmax)
            return pi.closest(rays, tris_packed, n)

        def any_hit(origins, dirs, tmin, tmax):
            rays, n = pi.pack_rays(origins, dirs, tmin, tmax)
            return pi.any_hit(rays, tris_packed, n)

        return closest, any_hit

    def closest(origins, dirs, tmin, tmax):
        return intersect.brute_force_closest(origins, dirs, tris, tmin, tmax)

    def any_hit(origins, dirs, tmin, tmax):
        return intersect.brute_force_any(origins, dirs, tris, tmin, tmax)

    return closest, any_hit


def make_bvh(scene, bvh):
    from ..ops import cull, pallas_traverse, stream, traverse, wavefront

    if isinstance(bvh, stream.StreamBVH):
        # DMA-streaming candidate traversal (ops/stream.py): the dense-scene
        # production path — whole-scene HBM triangle residency, per-128-ray
        # cull, double-buffered leaf-block DMA
        def closest(origins, dirs, tmin, tmax):
            return stream.stream_closest(bvh, origins, dirs, tmin, tmax)

        def any_hit(origins, dirs, tmin, tmax):
            return stream.stream_any(bvh, origins, dirs, tmin, tmax)

        return closest, any_hit

    if isinstance(bvh, cull.CullBVH):
        # dense-cull funnel (ops/cull.py): coherent packet tests for
        # primary/shadow rays; callers get the incoherent per-ray-test
        # variant for bounce rays via make_bounce_fns
        def closest(origins, dirs, tmin, tmax):
            return cull.cull_closest(bvh, origins, dirs, tmin, tmax)

        def any_hit(origins, dirs, tmin, tmax):
            return cull.cull_any(bvh, origins, dirs, tmin, tmax)

        return closest, any_hit

    if isinstance(bvh, wavefront.WavefrontBVH):
        def closest(origins, dirs, tmin, tmax):
            return wavefront.wavefront_closest(bvh, origins, dirs, tmin, tmax)

        def any_hit(origins, dirs, tmin, tmax):
            return wavefront.wavefront_any(bvh, origins, dirs, tmin, tmax)

        return closest, any_hit

    if isinstance(bvh, (pallas_traverse.PackedBVH, pallas_traverse.PackedBVHSet)):
        # packet-traversal Pallas kernel (TPU production path)
        def closest(origins, dirs, tmin, tmax):
            return pallas_traverse.bvh_closest(bvh, origins, dirs, tmin, tmax)

        def any_hit(origins, dirs, tmin, tmax):
            return pallas_traverse.bvh_any(bvh, origins, dirs, tmin, tmax)

        return closest, any_hit

    def closest(origins, dirs, tmin, tmax):
        return traverse.bvh_closest(bvh, origins, dirs, tmin, tmax)

    def any_hit(origins, dirs, tmin, tmax):
        return traverse.bvh_any(bvh, origins, dirs, tmin, tmax)

    return closest, any_hit




def build_accel(scene, mode: str, stream_block_tris: int = None):
    """Build the acceleration structure for the resolved traversal mode:
    the BLAS/TLAS-build analog (blas_system.cpp / tlas_system.cpp).

    `scene` should be the HOST-side Scene (numpy arrays): builders do their
    heavy lifting on the host, and pulling geometry device->host first is
    pathologically slow on tunneled TPUs (~minutes for MBs).

    `stream_block_tris` sets the stream backend's leaf-block size (default
    ops.stream.BLOCK_TRIS=32). Sim (PERF.md): 64 cuts colonnade steps/gang
    809->364 (bounce) / 47->17 (NEE) at ~2x per-step MT cost — the 32-vs-64
    call is a hardware A/B (tools/profile_stream.py)."""
    import jax
    import numpy as np

    if mode not in ("static", "bvh", "wavefront", "cull", "stream"):
        return None
    tris_np = np.stack(
        [np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
         np.asarray(scene.tri_v2)], axis=1,
    ).astype(np.float32)
    if mode == "static":
        from ..ops import pallas_static

        return pallas_static.build_static(jnp.asarray(tris_np))
    if mode == "stream":
        from ..ops import stream

        return stream.build_stream_bvh(
            tris_np, block_tris=stream_block_tris or stream.BLOCK_TRIS)
    if mode == "wavefront":
        from ..ops import wavefront

        return wavefront.build_wavefront_bvh(tris_np)
    if mode == "cull":
        from ..ops import cull

        return cull.build_cull_bvh(tris_np)
    from ..ops import lbvh, pallas_traverse

    if jax.default_backend() == "tpu":
        return pallas_traverse.build_packed_bvh(jnp.asarray(tris_np))
    return lbvh.build_lbvh(jnp.asarray(tris_np))


def resolve_mode(mode: str, num_triangles: int) -> str:
    if mode == "auto":
        import jax

        if jax.default_backend() == "tpu":
            # Pallas kernels beat the jnp paths on TPU across the board:
            # tiny scenes use the fully-static unrolled kernel (no control
            # flow at all); everything else the packet-traversal BVH (103 vs
            # 47 Mrays/s on the 40-tri Cornell box vs the brute tile kernel).
            from ..ops.pallas_static import MAX_STATIC_TRIS

            return "static" if num_triangles <= MAX_STATIC_TRIS else "bvh"
        return "brute" if num_triangles <= AUTO_BVH_THRESHOLD else "bvh"
    return mode


def make_traversal(scene, mode: str, bvh=None):
    mode = resolve_mode(mode, scene.tri_v0.shape[0])
    if mode == "brute":
        return make_brute_force(scene)
    if mode == "static":
        from ..ops import pallas_static

        def closest(origins, dirs, tmin, tmax):
            return pallas_static.static_closest(bvh, origins, dirs, tmin, tmax)

        def any_hit(origins, dirs, tmin, tmax):
            return pallas_static.static_any(bvh, origins, dirs, tmin, tmax)

        return closest, any_hit
    if mode in ("bvh", "wavefront", "cull", "stream"):
        if bvh is None:
            raise ValueError(f"{mode} traversal requested but no BVH was built")
        return make_bvh(scene, bvh)
    raise ValueError(f"unknown traversal mode {mode!r}")


def make_stream_bounce_fns(sbvh):
    """Bounce-ray trace fns for the DMA-streaming backend: finer 96-bin
    direction sorting (dir_grid=4) plus, for the CLOSEST-hit trace only,
    the candidate-count load-balance pre-pass — the two measured levers
    for incoherent rays on dense scenes (sim_stream.py: 1931 -> 809
    steps/gang on real colonnade bounce). Any-hit NEE shadows are NOT
    balanced: candidate count is a bad load proxy when rays retire at
    the first occluder (measured 47 -> 71 steps/gang WITH balancing)."""
    from ..ops import stream

    def closest(origins, dirs, tmin, tmax):
        return stream.stream_closest(sbvh, origins, dirs, tmin, tmax,
                                     balance=True)

    def any_hit(origins, dirs, tmin, tmax):
        return stream.stream_any(sbvh, origins, dirs, tmin, tmax)

    return (with_ray_sorting(closest, dir_grid=4),
            with_ray_sorting_any(any_hit, dir_grid=4))


def make_bounce_fns(bvh):
    """Incoherent-ray (diffuse bounce) trace functions for the dense-cull
    backend: per-ray slab tests instead of packet interval tests (the only
    test that stays tight for scattered directions), wrapped with morton
    ray sorting so packets keep origin locality."""
    from ..ops import cull

    def closest(origins, dirs, tmin, tmax):
        return cull.cull_closest(bvh, origins, dirs, tmin, tmax,
                                 coherent=False)

    def any_hit(origins, dirs, tmin, tmax):
        return cull.cull_any(bvh, origins, dirs, tmin, tmax, coherent=False)

    return with_ray_sorting(closest), with_ray_sorting_any(any_hit)


def with_ray_sorting(closest_fn, dir_grid: int = 0):
    """Wrap a closest-hit function with morton/direction-binned ray sorting.

    Incoherent bounce rays make packet traversal visit near-union node sets;
    sorting restores locality (the classic wavefront ray-reordering move,
    PAPERS.md). Results are scattered back to original ray order.
    `dir_grid`: 0 = octant bins (packet-kernel sweet spot); N = 6*N^2
    face-grid bins (the stream kernel's interval cull wants ~96)."""
    import jax.numpy as jnp

    from ..ops.pallas_traverse import sort_rays_for_traversal

    def sorted_closest(origins, dirs, tmin, tmax):
        tmax_arr = jnp.broadcast_to(
            jnp.asarray(tmax, jnp.float32), origins.shape[:1]
        )
        order, inverse = sort_rays_for_traversal(
            origins, dirs, dead=tmax_arr < tmin, dir_grid=dir_grid
        )
        # pack all permuted quantities so each direction costs ONE gather
        # (gather cost is per-index, not per-byte, on TPU): 3 input gathers
        # -> 1, 4 result gathers -> 1. prim rides as its float VALUE, which
        # is exact for ids < 2^24 (far beyond the VMEM-chunk scale); a raw
        # int32 BIT PATTERN through the float pipeline is NOT safe — the
        # TPU flushes denormal patterns (ids 1..8388607) to zero and
        # canonicalizes the -1 sentinel to a quiet NaN (caught in review
        # by an A/B repro).
        packed = jnp.concatenate(
            [origins, dirs, tmax_arr[:, None]], axis=1
        )[order]
        out = closest_fn(packed[:, 0:3], packed[:, 3:6], tmin, packed[:, 6])
        res = jnp.stack(
            [out["t"], out["u"], out["v"], out["prim"].astype(jnp.float32)],
            axis=1,
        )[inverse]
        return {
            "t": res[:, 0],
            "u": res[:, 1],
            "v": res[:, 2],
            "prim": res[:, 3].astype(jnp.int32),
        }

    return sorted_closest


def with_ray_sorting_any(any_fn, dir_grid: int = 0):
    """Sorting wrapper for any-hit queries (bounce NEE shadow rays have
    scattered origins; sorting by origin morton keeps packets compact)."""
    from ..ops.pallas_traverse import sort_rays_for_traversal

    def sorted_any(origins, dirs, tmin, tmax):
        tmax_arr = jnp.broadcast_to(
            jnp.asarray(tmax, jnp.float32), origins.shape[:1]
        )
        order, inverse = sort_rays_for_traversal(
            origins, dirs, dead=tmax_arr < tmin, dir_grid=dir_grid
        )
        # one input gather instead of three (see with_ray_sorting)
        packed = jnp.concatenate(
            [origins, dirs, tmax_arr[:, None]], axis=1
        )[order]
        return any_fn(packed[:, 0:3], packed[:, 3:6], tmin, packed[:, 6])[inverse]

    return sorted_any
