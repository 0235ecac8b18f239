"""AOT-lower every Pallas kernel family for platform 'tpu' WITHOUT a TPU.

The client-side Pallas->Mosaic lowering (kernel tracing, Mosaic dialect
construction, MLIR verification, serialization into the stablehlo
tpu_custom_call) runs entirely in-process during `jax.jit(...).lower()`
with a cross-platform target — no device needed. That stage is where
"unsupported op / layout" Mosaic errors surface, which is exactly the
risk class for kernels that have never compiled on real hardware (the
stream kernel's dynamic pend-row indexing + DMA loops). What it canNOT
catch: libtpu-side register allocation / VMEM overflow — those still
need the tunnel.

Usage:  python tools/aot_lower.py            # all families
        python tools/aot_lower.py stream     # one family

Exit code 0 = every requested family lowered clean.
"""

import sys
import os
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def _lower_tpu(fn, *args):
    """Cross-platform lowering for tpu; returns the lowered text size."""
    traced = jax.jit(fn).trace(*args)
    try:
        low = traced.lower(lowering_platforms=("tpu",))
    except TypeError:  # older/newer kwarg spelling
        low = traced.lower(platforms=("tpu",))
    return len(low.as_text())


def check_stream():
    from capsaicin_tpu.ops import stream

    stream._use_interpret = lambda: False  # force the Mosaic path
    tris = np.random.RandomState(0).rand(900, 3, 3).astype(np.float32)
    sbvh = stream.build_stream_bvh(tris)
    sbvh64 = stream.build_stream_bvh(tris, block_tris=64)
    o = jnp.zeros((2048, 3), jnp.float32)
    d = jnp.ones((2048, 3), jnp.float32)
    for name, sb, fn in [
        ("closest/hier", sbvh,
         lambda s, o, d: stream.stream_closest(s, o, d)),
        ("closest/flat", sbvh,
         lambda s, o, d: stream.stream_closest(s, o, d, hier=False)),
        ("closest/balanced", sbvh,
         lambda s, o, d: stream.stream_closest(s, o, d, balance=True)),
        ("any/hier", sbvh, lambda s, o, d: stream.stream_any(s, o, d)),
        # block-64 leaves: 2.2x fewer bounce steps at 2x per-step MT cost
        # in sim (PERF.md); 8-row MT unroll + doubled DMA/scratch shapes
        # get their own lowering check before the HW 32-vs-64 A/B
        ("closest/hier/b64", sbvh64,
         lambda s, o, d: stream.stream_closest(s, o, d)),
        ("any/hier/b64", sbvh64,
         lambda s, o, d: stream.stream_any(s, o, d)),
        ("closest/hier/b128",
         stream.build_stream_bvh(tris, block_tris=128),
         lambda s, o, d: stream.stream_closest(s, o, d)),
    ]:
        n = _lower_tpu(fn, sb, o, d)
        print(f"  stream {name}: OK ({n} chars)")


def check_packet():
    from capsaicin_tpu.ops import pallas_traverse as pt

    pt._use_interpret = lambda: False
    tris = np.random.RandomState(1).rand(900, 3, 3).astype(np.float32)
    bvh = pt.build_packed_bvh(tris)
    o = jnp.zeros((2048, 3), jnp.float32)
    d = jnp.ones((2048, 3), jnp.float32)
    for name, fn in [
        ("closest", lambda b, o, d: pt.bvh_closest(b, o, d)),
        ("any", lambda b, o, d: pt.bvh_any(b, o, d)),
    ]:
        n = _lower_tpu(fn, bvh, o, d)
        print(f"  packet {name}: OK ({n} chars)")


def check_stencil():
    from capsaicin_tpu.ops import pallas_stencil as ps
    from capsaicin_tpu.render.settings import RenderOptions, default_settings

    ps._use_interpret = lambda: False
    h, w = 128, 256
    rng = np.random.RandomState(2)
    col = jnp.asarray(rng.rand(h, w, 4), jnp.float32)
    nrm = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    dep = jnp.asarray(rng.rand(h, w), jnp.float32)
    mom = jnp.asarray(rng.rand(h, w, 4), jnp.float32)
    settings = default_settings()
    for label, opt, fused, storage in [
        ("chain eaw5", RenderOptions(eaw5=True), None, False),
        ("chain fused", RenderOptions(eaw5=True), True, False),
        ("chain fused13", RenderOptions(eaw5=True), "13", False),
        ("chain bf16", RenderOptions(eaw5=True), None, True),
        ("chain bf16+fused", RenderOptions(eaw5=True), True, True),
    ]:
        n = _lower_tpu(
            lambda c, nn, dd, m: ps.denoise_chain(
                c, nn, dd, m, settings, opt, fused=fused, storage=storage),
            col, nrm, dep, mom)
        print(f"  stencil {label}: OK ({n} chars)")


def check_gather():
    from capsaicin_tpu.ops import pallas_stencil as ps
    from capsaicin_tpu.render.settings import default_settings

    ps._use_interpret = lambda: False
    h, w = 128, 256
    rng = np.random.RandomState(3)
    col = jnp.asarray(rng.rand(h, w, 4), jnp.float32)
    nrm = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    dep = jnp.asarray(rng.rand(h, w), jnp.float32)
    settings = default_settings()
    for label, storage in [("f32", False), ("bf16", True)]:
        n = _lower_tpu(
            lambda c, nn, dd: ps.spatial_gather(c, nn, dd, settings,
                                                storage=storage),
            col, nrm, dep)
        print(f"  gather {label}: OK ({n} chars)")


def check_brute():
    from capsaicin_tpu.ops import pallas_intersect as pi

    pi._use_interpret = lambda: False
    tris = jnp.asarray(
        np.random.RandomState(4).rand(300, 3, 3), jnp.float32)
    o = jnp.zeros((2048, 3), jnp.float32)
    d = jnp.ones((2048, 3), jnp.float32)
    for name, fn in [
        ("closest", lambda o, d, t: pi.brute_force_closest(o, d, t)),
        ("any", lambda o, d, t: pi.brute_force_any(o, d, t)),
    ]:
        n = _lower_tpu(fn, o, d, tris)
        print(f"  brute {name}: OK ({n} chars)")


def check_lookup():
    from capsaicin_tpu.ops import pallas_lookup as plk

    plk._use_interpret = lambda: False
    table = jnp.asarray(
        np.random.RandomState(5).rand(8, 512), jnp.float32)
    idx = jnp.zeros((4096,), jnp.int32)
    n = _lower_tpu(lambda t, i: plk.table_lookup(t, i), table, idx)
    print(f"  lookup: OK ({n} chars)")


FAMILIES = {
    "stream": check_stream,
    "packet": check_packet,
    "stencil": check_stencil,
    "gather": check_gather,
    "brute": check_brute,
    "lookup": check_lookup,
}


def main():
    want = sys.argv[1:] or list(FAMILIES)
    failed = []
    for name in want:
        print(f"[{name}]")
        try:
            FAMILIES[name]()
        except Exception:
            traceback.print_exc()
            failed.append(name)
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("all requested families lowered clean for platform tpu")
    return 0


if __name__ == "__main__":
    sys.exit(main())
