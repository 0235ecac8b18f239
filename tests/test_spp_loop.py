"""Batched spp (RenderOptions.spp) and the on-device frame loop
(RenderSession.render_loop)."""

import dataclasses

import numpy as np

from capsaicin_tpu.render import RenderOptions, RenderSession
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import cornell_box, make_camera

W = H = 32

# slim post stack: what is under test is the estimator batching, not the
# denoiser; keeps the CPU compiles light
SLIM = dict(denoise=False, gather=False, taa=False, eaw5=False)


def _session(options):
    sess = RenderSession(W, H, options=options,
                         camera=make_camera("cornell", W, H))
    sess.set_scene(build_scene(cornell_box()))
    return sess


def test_spp_noop_without_bounces():
    """spp batches the indirect estimator only; with 0 bounces the frame is
    deterministic and spp must change nothing."""
    a = _session(RenderOptions(num_diffuse_bounces=0, spp=1, **SLIM)).render()
    b = _session(RenderOptions(num_diffuse_bounces=0, spp=3, **SLIM)).render()
    np.testing.assert_array_equal(a, b)


def test_spp_reduces_temporal_noise():
    """16 batched samples must shrink the frame-to-frame estimator noise
    vs 1 sample (disjoint blue-noise sets, mean-accumulated)."""
    def frame_delta(spp):
        opts = RenderOptions(num_diffuse_bounces=1, spp=spp, output=2, **SLIM)
        sess = _session(opts)
        f1 = sess.render()
        f2 = sess.render()
        assert np.all(np.isfinite(f1)) and np.all(np.isfinite(f2))
        assert int(sess.state.frame_count) == 2
        return float(np.mean(np.abs(f2 - f1)))

    d1 = frame_delta(1)
    d16 = frame_delta(16)
    assert d16 < d1 / 2.0, (d1, d16)


def test_render_loop_matches_sequential():
    """render_loop(k) (one dispatch, lax.fori_loop) must equal k sequential
    render() calls with the same held camera."""
    opts = RenderOptions(num_diffuse_bounces=1, eaw5=False)
    ref = _session(opts)
    want = None
    for _ in range(3):
        want = ref.render()

    sess = _session(opts)
    # frames=3, chunk=2: one fixed-k device loop + one single-frame
    # remainder dispatch — the two-program path for arbitrary counts
    got = np.asarray(sess.render_loop(3, chunk=2))
    assert int(sess.state.frame_count) == 3
    np.testing.assert_allclose(got, want, atol=1e-5)

    # a second dispatch continues from the carried state (pure chunk path)
    got2 = np.asarray(sess.render_loop(2, chunk=2))
    for _ in range(2):
        want2 = ref.render()
    assert int(sess.state.frame_count) == 5
    np.testing.assert_allclose(got2, want2, atol=1e-5)


def test_render_loop_accumulate_is_mean_of_frames():
    """render_loop(accumulate=True) returns the chunk's MEAN display — the
    offline-AA semantics for non-temporal configs, and the mode benches
    use so no loop iteration is dead code (a last-display-only carry lets
    XLA eliminate k-1 frames when the temporal passes are off; round 5
    caught direct512_loop16 reading exactly 16x the kernel rate)."""
    opts = RenderOptions(num_diffuse_bounces=0, output=1, **SLIM)
    ref = _session(opts)
    frames = [np.asarray(ref.render()) for _ in range(2)]
    want = np.mean(frames, axis=0)

    sess = _session(opts)
    got = np.asarray(sess.render_loop(2, chunk=2, accumulate=True))
    assert int(sess.state.frame_count) == 2
    np.testing.assert_allclose(got, want, atol=1e-5)
    # and the default (last-display) semantics are unchanged
    sess2 = _session(opts)
    got_last = np.asarray(sess2.render_loop(2, chunk=2))
    np.testing.assert_allclose(got_last, frames[-1], atol=1e-5)


def test_spp_options_hashable_variant():
    """spp is a static option: flipping it produces a distinct compiled
    variant (and a valid cache key)."""
    o1 = RenderOptions(spp=1, **SLIM)
    o2 = dataclasses.replace(o1, spp=4)
    assert o1 != o2 and hash(o1) != hash(o2)
