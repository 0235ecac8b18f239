#!/usr/bin/env python
"""Benchmark harness: Mrays/s (traversal + shade) on the Cornell GI config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the 150 Mrays/s north-star target
(BASELINE.md; the reference publishes no numbers of its own).

Config (BASELINE.json config 2 shape): Cornell box at 1920x1080, full
9-pass pipeline (primary + direct NEE + 1-bounce GI with per-bounce NEE +
gather + SVGF + EAW + TAA). Rays counted: primary, direct shadow, indirect
bounce, indirect shadow = 4 rays/pixel/frame.

Flags:
  --width/--height/--frames/--bounces     config overrides
  --scene cornell|colonnade               scene selection
  --traversal auto|brute|bvh              intersector backend
  --all                                   additionally print per-config lines
"""

import argparse
import json
import subprocess
import sys
import time


NORTH_STAR_MRAYS = 150.0

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "d = jax.devices();"
    "x = jnp.ones((128, 128));"
    "print('PROBE_OK', d[0].platform, float((x @ x).sum()))"
)


def wait_for_backend(attempts: int = 3, probe_timeout: float = 150.0,
                     backoff: float = 90.0) -> bool:
    """Bounded-retry backend probe, run BEFORE any in-process jax init.

    A dead tunnel relay makes jax.devices() hang forever in-process with no
    way to recover; probing in a subprocess with a timeout keeps this
    process healthy. Backoff between attempts is deliberately long: a
    killed probe client can wedge the single-tenant tunnel for 1-5 min, so
    rapid retries make recovery LESS likely. Total budget ~7 min — a
    transient relay hiccup degrades to a late capture instead of rc=1."""
    for i in range(attempts):
        if i:
            print(f"bench: backend probe retry {i + 1}/{attempts} "
                  f"after {backoff:.0f}s backoff", file=sys.stderr)
            time.sleep(backoff)
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                timeout=probe_timeout, capture_output=True, text=True,
            )
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                return True
            print(f"bench: probe rc={r.returncode}: "
                  f"{(r.stderr or r.stdout).strip()[-300:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench: probe timed out after {probe_timeout:.0f}s "
                  "(device init hang — relay likely down)", file=sys.stderr)
    diagnose_backend()
    return False


def diagnose_backend(timeout: float = 90.0) -> str:
    """Best-effort root-cause probe after the retries are exhausted.

    The default remote-compile path HANGS on some infra faults where a
    client-side (AOT) compile fails FAST with the actual error — e.g. a
    client/terminal libtpu version skew during a rolling upgrade
    (round 4: devices() answered in ~10 s while any compute wedged
    forever; PALLAS_AXON_REMOTE_COMPILE=0 surfaced 'FAILED_PRECONDITION:
    libtpu version mismatch' in seconds). Run one bounded local-compile
    probe and put its tail on stderr so a failed capture records WHY."""
    import os

    env = dict(os.environ)
    env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout, capture_output=True, text=True, env=env,
        )
        if r.returncode == 0:
            msg = ("local-compile probe OK — fault is in the remote "
                   "compile/execute path only")
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()
            keep = [ln for ln in tail if "Error" in ln or "error" in ln
                    or "FAILED" in ln or "mismatch" in ln] or tail[-3:]
            msg = (" | ".join(keep[-4:])[-600:]
                   or f"probe rc={r.returncode}, no output (killed?)")
    except subprocess.TimeoutExpired:
        msg = f"local-compile probe also hung ({timeout:.0f}s)"
    print(f"bench: backend diagnosis: {msg}", file=sys.stderr)
    return msg


def rays_per_frame(width, height, bounces, lowres, spp=1):
    full = width * height
    half = full // 4 if lowres else full
    # primary + direct shadow at full res; per bounce AND per spp sample:
    # 1 indirect ray and, for bounces >= 1, 1 NEE shadow ray at indirect res
    indirect = half * bounces * spp  # bounce rays (final trace dead-skipped)
    nee = half * bounces * spp
    return full * 2 + indirect + nee


# The five BASELINE.json benchmark configs
CONFIGS = {
    "direct512": dict(width=512, height=512, bounces=0, scene="cornell",
                      options=dict(output=1, taa=False, denoise=False, gather=False)),
    "gi1080": dict(width=1920, height=1080, bounces=1, scene="cornell"),
    "gi1080x4": dict(width=1920, height=1080, bounces=4, scene="cornell"),
    # the LITERAL BASELINE.json config 2: 1080p, 4-bounce GI + NEE, 64 spp
    # traced in one dispatch (fori_loop over disjoint blue-noise seeds)
    "gi1080x4_spp64": dict(width=1920, height=1080, bounces=4,
                           scene="cornell", spp=64, frames=4),
    "textured": dict(width=1024, height=1024, bounces=1, scene="textured"),
    "colonnade": dict(width=1920, height=1080, bounces=1, scene="colonnade",
                      traversal="bvh"),
    "progressive": dict(width=1024, height=1024, bounces=1, scene="cornell",
                        options=dict(lowres_indirect=True)),
}
# named-only variants (not part of --all): opt-in A/B configs
CONFIGS["colonnade_stream"] = dict(
    width=1920, height=1080, bounces=1, scene="colonnade",
    traversal="stream")
# 64-tri leaf blocks: sim says 2.2x fewer bounce steps at 2x per-step
# cost + half the cull/extract/DMA overheads (PERF.md) — HW decides
CONFIGS["colonnade_stream64"] = dict(
    width=1920, height=1080, bounces=1, scene="colonnade",
    traversal="stream", stream_block=64)
CONFIGS["colonnade_stream128"] = dict(
    width=1920, height=1080, bounces=1, scene="colonnade",
    traversal="stream", stream_block=128)
CONFIGS["textured_u32"] = dict(
    width=1024, height=1024, bounces=1, scene="textured", atlas_u32=True)
# render_loop(16) variants: the product on-device frame loop (fixed-chunk
# dispatches since round 4) amortizes the ~1-2 ms host/tunnel launch cost;
# round 3 measured direct512 148.4 -> 181.2 Mrays/s at k=16
for _base in ("direct512", "progressive", "textured", "gi1080"):
    CONFIGS[f"{_base}_loop16"] = {**CONFIGS[_base], "frames_per_dispatch": 16}
# fp16 temporal history (the reference's literal RGBA16F storage,
# raytracing_system.cpp:466-575): halves the SVGF/TAA history HBM traffic;
# equality-tolerance-tested vs f32 in test_session_variants
CONFIGS["gi1080_fp16hist"] = dict(
    width=1920, height=1080, bounces=1, scene="cornell",
    options=dict(history_dtype="float16"))
# direct512_loop16 is part of --all (round-5 flip): the 512^2 config is
# launch-bound single-dispatch (100 Mrays/s at ~2 ms/frame of tunnel
# overhead); the on-device frame loop is its product path (371, measured
# by dispatch differencing — PERF.md round 5)
_AB_ONLY = ("colonnade_stream", "colonnade_stream64", "colonnade_stream128",
            "textured_u32", "progressive_loop16",
            "textured_loop16", "gi1080_loop16", "gi1080_fp16hist")
ALL_CONFIGS = [n for n in CONFIGS if n not in _AB_ONLY]

# the driver's required single-line metric comes from this config
FLAGSHIP = "gi1080"
assert FLAGSHIP in CONFIGS


def run_config(width, height, bounces, scene_name, traversal, frames, lowres=False,
               extra_options=None, spp=1, frames_per_dispatch=1, atlas_u32=False,
               stream_block=None):
    import numpy as np

    from capsaicin_tpu.render import RenderOptions, RenderSession
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import (
        colonnade, cornell_box, cornell_box_textured, make_camera,
    )
    from capsaicin_tpu.scene.scene import quantize_atlas

    opt_kw = dict(num_diffuse_bounces=bounces, lowres_indirect=lowres, spp=spp)
    opt_kw.update(extra_options or {})
    options = RenderOptions(**opt_kw)
    session = RenderSession(width=width, height=height, options=options,
                            traversal=traversal, stream_block_tris=stream_block)
    session.set_camera(make_camera(
        "colonnade" if scene_name == "colonnade" else "cornell", width, height))
    if scene_name == "colonnade":
        session.set_scene(build_scene(colonnade()))
    elif scene_name == "textured":
        meshes, tex = cornell_box_textured()
        sc = build_scene(meshes, tex)
        # rgba8-in-u32 atlas: native R8G8B8A8 precision, 1/4 gather bytes
        session.set_scene(quantize_atlas(sc) if atlas_u32 else sc)
    else:
        session.set_scene(build_scene(cornell_box()))

    k = max(int(frames_per_dispatch), 1)
    if k > 1:
        # on-device frame loop: K frames per dispatch (lax.fori_loop with
        # carried state) — removes the per-frame host dispatch overhead.
        # Measurement design, forced by three bogus round-5 captures:
        #  - accumulate=True so every iteration's image compute is
        #    provably live (a last-display-only loop carry lets XLA
        #    dead-code-eliminate K-1 frames when the temporal passes are
        #    off: direct512_loop16 read exactly 16x the kernel rate).
        #  - every timed dispatch gets a PERTURBED CAMERA (position +
        #    i*1e-5): the device tunnel replays repeated execute requests
        #    from a cache (flagship-loop16 read 312k Mrays/s), and a
        #    perturbed traced-settings scalar was NOT enough to defeat it
        #    (every config then measured the same ~0.43 s constant).
        #  - per-frame time = median(k-frame dispatch) minus
        #    median(1-frame dispatch), over k-1: differencing cancels
        #    whatever fixed per-dispatch round-trip the tunnel charges,
        #    which host-side timing cannot otherwise separate.
        import jax.numpy as jnp

        base_cam = session.camera

        def cam_i(i):
            return base_cam._replace(
                position=base_cam.position + jnp.float32(1e-5) * (i + 1))

        session.render_loop(k, accumulate=True)  # compile + warm the k-loop
        session.render()  # compile + warm the single-frame variant
        # Serial-blocked, camera-perturbed dispatches, then difference a
        # k-frame dispatch against a 1-frame dispatch: the tunnel charges a
        # large constant round trip per serial-blocked dispatch (~0.54 s at
        # 1080p) which the subtraction cancels, and the distinct camera per
        # dispatch forces real execution. Validated: this read 162.5 on
        # gi1080_loop16 vs the known 161.4 single-frame rate. The async
        # enqueue pattern (even camera-perturbed) collapses repeated loop
        # dispatches to ~one execution (read 646) and CANNOT be used here.
        # 12 reps: the min-estimator needs enough samples for both mins to
        # sit on the round-trip floor, or small-frame configs see +-50%.
        reps = max(frames // k, 12)

        def timed(fn_call, n, tag):
            per = []
            out = None
            for i in range(n):
                td = time.perf_counter()
                out = fn_call(i)
                out.block_until_ready()
                per.append(time.perf_counter() - td)
            print(f"bench: {tag} dispatch seconds: "
                  + " ".join(f"{p:.4f}" for p in per), file=sys.stderr)
            # min, not median: the tunnel round-trip noise is one-sided
            # (delays only), and at small frame sizes +-10 ms of jitter on
            # a ~50 ms dispatch otherwise swamps the differenced signal
            return min(per), out

        tk, out = timed(
            lambda i: session.render_loop(k, camera=cam_i(i),
                                          accumulate=True), reps, f"loop{k}")
        t1, _ = timed(
            lambda i: session.render_async(camera=cam_i(100 + i)), reps,
            "single")
        session.camera = base_cam
        dt = max(tk - t1, 1e-9) / (k - 1)
    else:
        # compile + warm up
        session.render()
        session.render()

        t0 = time.perf_counter()
        out = None
        for _ in range(frames):
            out = session.render_async()
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / frames

    img = np.asarray(out)
    assert np.all(np.isfinite(img)), "non-finite pixels in benchmark render"
    mrays = rays_per_frame(width, height, bounces, lowres, spp) / dt / 1e6
    return {
        "mrays_per_s": mrays,
        "ms_per_frame": dt * 1e3,
        "fps": 1.0 / dt,
        "spp_per_s": spp / dt,  # indirect samples per second
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--bounces", type=int, default=1)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--traversal", default="auto")
    ap.add_argument("--config", default=None, choices=sorted(CONFIGS),
                    help="run a named BASELINE config instead of flags")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--spp", type=int, default=1,
                    help="indirect samples/pixel/frame in one dispatch "
                         "(--config gi1080x4 --spp 64 = literal BASELINE "
                         "config 2)")
    ap.add_argument("--frames-per-dispatch", type=int, default=1,
                    help="render K frames per device dispatch "
                         "(on-device lax.fori_loop frame loop)")
    args = ap.parse_args()

    if not wait_for_backend():
        print(json.dumps({
            "error": "device backend unavailable after bounded retries",
            "metric": "Mrays/s traversal+shade",
            "unit": "Mrays/s",
        }))
        sys.exit(1)

    def run_named(name):
        cfg = CONFIGS[name]
        return run_config(
            cfg["width"], cfg["height"], cfg["bounces"], cfg["scene"],
            cfg.get("traversal", "auto"), cfg.get("frames", args.frames),
            lowres=cfg.get("options", {}).get("lowres_indirect", False),
            extra_options={k: v for k, v in cfg.get("options", {}).items()
                           if k != "lowres_indirect"},
            spp=cfg.get("spp", args.spp),
            frames_per_dispatch=cfg.get("frames_per_dispatch",
                                        args.frames_per_dispatch),
            atlas_u32=cfg.get("atlas_u32", False),
            stream_block=cfg.get("stream_block"),
        )

    if args.all:
        # one JSON line per BASELINE config; the flagship (gi1080) line last
        # in the driver's required single-line format
        flagship = None
        for name in ALL_CONFIGS:
            res = run_named(name)
            if name == FLAGSHIP:
                flagship = res
            line = {
                "config": name,
                "mrays_per_s": round(res["mrays_per_s"], 2),
                "ms_per_frame": round(res["ms_per_frame"], 3),
                "fps": round(res["fps"], 2),
            }
            if CONFIGS[name].get("spp", 1) > 1:
                line["spp_per_s"] = round(res["spp_per_s"], 2)
            print(json.dumps(line), file=sys.stderr)
        res = flagship
    elif args.config:
        res = run_named(args.config)
    else:
        res = run_config(
            args.width, args.height, args.bounces, args.scene, args.traversal,
            args.frames, spp=args.spp,
            frames_per_dispatch=args.frames_per_dispatch,
        )
    value = round(res["mrays_per_s"], 2)
    label = "Cornell 1080p 1-bounce GI full pipeline"
    if args.config and args.config != FLAGSHIP and not args.all:
        label = f"config {args.config} full pipeline"
    if args.spp > 1:
        label += f" {args.spp}spp"
    out = {
        "metric": f"Mrays/s traversal+shade, {label}",
        "value": value,
        "unit": "Mrays/s",
        "vs_baseline": round(value / NORTH_STAR_MRAYS, 3),
    }
    if args.spp > 1:
        out["spp_per_s"] = round(res["spp_per_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
