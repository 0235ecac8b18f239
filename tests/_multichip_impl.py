"""Multichip test body, executed in a subprocess with an 8-virtual-device
CPU mesh (see test_multichip.py). Asserts:

1. The PRODUCT multi-chip path — ``RenderSession(mesh=...)`` at the literal
   DEFAULT options (eaw5=True) — renders frames equal to the plain
   single-device session: row-sharded state, replicated scene/BVH,
   shard_map'd traversal, and the Pallas stencil chains (gather + 5-stage
   EAW) running per-shard via halo_map's ppermute halo exchange.
2. The production Pallas traversal kernels (packet-BVH AND the
   DMA-streaming dense-scene kernel) compose with shard_map (interpret
   mode on CPU): the sharded trace selects the SAME kernel as single-chip
   and returns identical results.
3. The 5-stage eaw5 denoise chain partitions correctly standalone on BOTH
   SPMD implementations: the jnp roll fallback (XLA-partitioned) and the
   halo_map'd Pallas chain, each row-sharded-equal to single-device.
"""

import dataclasses
import os
import sys


def main(n_dev: int) -> None:
    assert os.environ.get("JAX_PLATFORMS") == "cpu"
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    # NO persistent cache here: XLA:CPU AOT entries encode tuning flags as
    # machine features; reloading them under the 8-device SPMD config made
    # one device thread diverge and abort the collective rendezvous
    # (measured: rc=-6 with cpu_aot_loader feature-mismatch errors). The
    # cold SPMD compile (~80s) is the price of a deterministic run.

    from capsaicin_tpu.parallel import sharding as sh
    from capsaicin_tpu.render.session import RenderSession
    from capsaicin_tpu.render.settings import RenderOptions
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import cornell_box, make_camera

    assert len(jax.devices()) >= n_dev, jax.devices()
    width, height = 64, 8 * n_dev
    # the literal DEFAULT options — including the 5-stage eaw5 chain, which
    # runs through halo_map'd Pallas stencils under SPMD (the jnp fallback's
    # ~100-tap partitioning is what made eaw5-in-frame uncompilable before).
    # The flag forces the Pallas stencil kernels on this CPU run (interpret
    # mode) for BOTH sessions, so ref and sharded trace identical math.
    os.environ["CAPSAICIN_PALLAS_STENCIL"] = "1"
    options = RenderOptions()
    scene_host = build_scene(cornell_box())
    camera = make_camera("cornell", width, height)

    # single-device product reference
    ref_sess = RenderSession(
        width, height, options=options, traversal="bvh", camera=camera)
    ref_sess.set_scene(scene_host)
    ref1 = ref_sess.render()
    ref2 = ref_sess.render()

    # the product mesh path
    mesh = sh.make_mesh(jax.devices()[:n_dev])
    sess = RenderSession(
        width, height, options=options, traversal="bvh", camera=camera,
        mesh=mesh)
    sess.set_scene(scene_host)
    disp = sess.render_async()
    assert disp.sharding.num_devices == n_dev, disp.sharding
    out1 = np.asarray(disp)
    # sharded execution reassociates float reductions; allow small drift
    np.testing.assert_allclose(out1, ref1, atol=1e-3)
    # second frame runs with the carried (sharded, donated) state
    out2 = sess.render()
    np.testing.assert_allclose(out2, ref2, atol=1e-3)
    assert int(sess.state.frame_count) == 2

    # in-frame per-pass profiling on the mesh session: the prefix programs
    # must route trace fns through shard_map and stencils through halo_map
    # exactly like the product frame (a plain single-chip pallas_call would
    # fail to compile on the sharded inputs). Short option set: the full
    # default chain is compile-budget, not coverage.
    import dataclasses

    prof_sess = RenderSession(
        32, height,
        options=dataclasses.replace(options, eaw5=False, taa=False),
        traversal="bvh", camera=make_camera("cornell", 32, height),
        mesh=mesh)
    prof_sess.set_scene(scene_host)
    prof_sess.render()
    t = prof_sess.measure_pass_timings(iters=1)
    assert "TAA" not in t and "Spatial gather" in t, sorted(t)
    assert all(v >= 0.0 for v in t.values())

    # Pallas packet kernel x shard_map: identical kernel, identical result
    from capsaicin_tpu.ops import pallas_traverse as pt

    tris = jnp.asarray(scene_host.triangles())
    packed = pt.build_packed_bvh(tris)
    rng = np.random.default_rng(7)
    n_rays = 64 * n_dev
    o = jnp.asarray(rng.uniform(-1.5, 1.5, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    want = pt.bvh_closest(packed, o, d, 0.0, 1e6)
    packed_rep = jax.device_put(packed, sh.replicated(mesh))
    sharded = sh.shard_trace(
        mesh, None, packed_rep,
        lambda _scene, bvh: lambda oo, dd, a, b: pt.bvh_closest(
            bvh, oo, dd, a, b))
    got = sharded(o, d, 0.0, 1e6)
    for k in ("t", "u", "v", "prim"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=k)
    want_any = pt.bvh_any(packed, o, d, 1e-4, 1e6)
    sharded_any = sh.shard_trace(
        mesh, None, packed_rep,
        lambda _scene, bvh: lambda oo, dd, a, b: pt.bvh_any(
            bvh, oo, dd, a, b))
    np.testing.assert_array_equal(
        np.asarray(sharded_any(o, d, 1e-4, 1e6)), np.asarray(want_any))

    # DMA-streaming kernel x shard_map: the dense-scene multi-chip path
    # (replicated StreamBVH, row-sharded rays, per-shard gang packing)
    from capsaicin_tpu.ops import stream as st

    sb = st.build_stream_bvh(np.asarray(scene_host.triangles()))
    sb_rep = jax.device_put(sb, sh.replicated(mesh))
    want_s = st.stream_closest(sb, o, d, 0.0, 1e6)
    sharded_s = sh.shard_trace(
        mesh, None, sb_rep,
        lambda _scene, bvh: lambda oo, dd, a, b: st.stream_closest(
            bvh, oo, dd, a, b))
    got_s = sharded_s(o, d, 0.0, 1e6)
    for k in ("t", "u", "v", "prim"):
        np.testing.assert_array_equal(
            np.asarray(got_s[k]), np.asarray(want_s[k]), err_msg=f"stream {k}")

    # the balanced production bounce path (count pre-pass + per-shard
    # argsort/gather sub-packet permutation) under shard_map
    sharded_sb = sh.shard_trace(
        mesh, None, sb_rep,
        lambda _scene, bvh: lambda oo, dd, a, b: st.stream_closest(
            bvh, oo, dd, a, b, balance=True))
    got_sb = sharded_sb(o, d, 0.0, 1e6)
    for k in ("t", "u", "v", "prim"):
        np.testing.assert_array_equal(
            np.asarray(got_sb[k]), np.asarray(want_s[k]),
            err_msg=f"stream-balanced {k}")

    # eaw5 chain (disocclusion + strides 1,3,5,7) under SPMD, standalone,
    # on the jnp fallback path (XLA partitions each roll tap): equality vs
    # single-device. The halo_map'd Pallas path is checked after it.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from capsaicin_tpu.ops import mathops as mo
    from capsaicin_tpu.render import passes
    from capsaicin_tpu.render.settings import default_settings

    os.environ["CAPSAICIN_PALLAS_STENCIL"] = "0"  # jnp fallback under test
    opt5 = RenderOptions(eaw5=True)
    settings = default_settings()
    h5, w5 = 8 * n_dev, 64
    rngf = np.random.default_rng(11)
    color4 = jnp.asarray(rngf.uniform(0, 1, (h5, w5, 4)).astype(np.float32))
    m4 = jnp.asarray(np.concatenate(
        [
            rngf.uniform(0, 1, (h5, w5, 2)).astype(np.float32),
            np.zeros((h5, w5, 1), np.float32),
            rngf.uniform(1, 20, (h5, w5, 1)).astype(np.float32),
        ],
        -1,
    ))
    nrm = rngf.normal(size=(h5, w5, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nd5 = {
        "oct": mo.oct_encode(jnp.asarray(nrm)),
        "depth": jnp.asarray(rngf.uniform(1, 5, (h5, w5)).astype(np.float32)),
        "inst": jnp.zeros((h5, w5), jnp.int32),
    }
    want5 = np.asarray(
        passes.denoise(color4, nd5, m4, settings, opt5))
    row = NamedSharding(mesh, P(sh.ROWS))
    c_sh, nd_sh, m_sh = jax.device_put(
        (color4, nd5, m4),
        (row, {"oct": row, "depth": row, "inst": row}, row),
    )
    got5 = jax.jit(
        lambda c, n, mm: passes.denoise(c, n, mm, settings, opt5),
        out_shardings=row,
    )(c_sh, nd_sh, m_sh)
    assert got5.sharding.num_devices == n_dev, got5.sharding
    # five chained stencils accumulate SPMD float-reassociation drift;
    # same tolerance as the full-frame comparison above
    np.testing.assert_allclose(np.asarray(got5), want5, atol=1e-3)

    # halo_map'd Pallas eaw5 chain (the production SPMD stencil placement):
    # multi-hop ppermute halo (reach 35 > the 8-row shards) vs single-chip
    os.environ["CAPSAICIN_PALLAS_STENCIL"] = "1"
    want5p = np.asarray(passes.denoise(color4, nd5, m4, settings, opt5))
    with passes.stencil_spmd_scope(mesh):
        got5p = jax.jit(
            lambda c, n, mm: passes.denoise(c, n, mm, settings, opt5),
            out_shardings=row,
        )(c_sh, nd_sh, m_sh)
    assert got5p.sharding.num_devices == n_dev, got5p.sharding
    # interpret-mode Pallas compiles to different fusions in the sharded
    # program (on hardware the Mosaic kernel is identical machine code);
    # same drift tolerance as the other sharded checks
    np.testing.assert_allclose(np.asarray(got5p), want5p, atol=1e-3)
    # both implementations agree with each other too
    np.testing.assert_allclose(want5p, want5, atol=1e-3)

    # fused stage-pair chain (RenderOptions.eaw_fused, promoted from the
    # round-4 CAPSAICIN_EAW_FUSED env knob) under the same halo_map
    # placement: the pairs don't change the chain's image-space reach, so
    # the halo plumbing must be oblivious to the fusion
    opt5f = dataclasses.replace(opt5, eaw_fused="1")
    with passes.stencil_spmd_scope(mesh):
        got5f = jax.jit(
            lambda c, n, mm: passes.denoise(c, n, mm, settings, opt5f),
            out_shardings=row,
        )(c_sh, nd_sh, m_sh)
    assert got5f.sharding.num_devices == n_dev, got5f.sharding
    np.testing.assert_allclose(np.asarray(got5f), want5p, atol=1e-3)

    # bf16 planar storage (RenderOptions.eaw_bf16) under halo_map: the
    # 16-row tile layout is internal to the chain, so the halo plumbing
    # must not care. Compared against the LOCAL bf16 chain: f32
    # reassociation drift can flip bf16 storage-rounding boundaries, so
    # the bound is looser than the f32 checks (this is a plumbing test;
    # accuracy has its own gate in test_pallas_stencil).
    opt5b = dataclasses.replace(opt5, eaw_bf16=True)
    want5b = np.asarray(passes.denoise(color4, nd5, m4, settings, opt5b))
    with passes.stencil_spmd_scope(mesh):
        got5b = jax.jit(
            lambda c, n, mm: passes.denoise(c, n, mm, settings, opt5b),
            out_shardings=row,
        )(c_sh, nd_sh, m_sh)
    assert got5b.sharding.num_devices == n_dev, got5b.sharding
    np.testing.assert_allclose(np.asarray(got5b), want5b, atol=5e-2)
    rms = float(np.sqrt(((np.asarray(got5b) - want5b) ** 2).mean()))
    assert rms < 5e-3, rms

    print(f"multichip impl OK ({n_dev} devices)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
