"""Offline render CLI — the headless analog of the reference viewer
(src/viewer/main.cpp): load a scene, run N progressive frames, save a PNG.

    python -m capsaicin_tpu.viewer --scene cornell --frames 32 --out out.png
    python -m capsaicin_tpu.viewer --obj path/to/scene.obj --width 1920 ...
    python -m capsaicin_tpu.viewer --web    # interactive browser viewer
"""

from __future__ import annotations

import argparse
import sys
import time


def build_session(args):
    from ..render import RenderOptions, RenderSession
    from ..scene import build_scene, load_scene_obj
    from ..scene.procedural import (
        colonnade,
        cornell_box,
        cornell_box_textured,
        make_camera,
    )

    options = RenderOptions(
        num_diffuse_bounces=args.bounces,
        lowres_indirect=args.lowres_indirect,
        output=args.output,
        denoise=not args.no_denoise,
        taa=not args.no_taa,
    )
    session = RenderSession(
        width=args.width, height=args.height, options=options, traversal=args.traversal
    )
    if args.obj:
        scene = load_scene_obj(args.obj)
        session.set_camera(make_camera("cornell", args.width, args.height))
    elif args.scene == "cornell":
        scene = build_scene(cornell_box())
        session.set_camera(make_camera("cornell", args.width, args.height))
    elif args.scene == "cornell-textured":
        meshes, textures = cornell_box_textured()
        scene = build_scene(meshes, textures)
        session.set_camera(make_camera("cornell", args.width, args.height))
    elif args.scene == "cornell-multitex":
        from ..scene.procedural import cornell_box_multitextured

        meshes, textures = cornell_box_multitextured()
        scene = build_scene(meshes, textures)
        session.set_camera(make_camera("cornell", args.width, args.height))
    elif args.scene == "colonnade":
        scene = build_scene(colonnade())
        session.set_camera(make_camera("colonnade", args.width, args.height))
    else:
        raise SystemExit(f"unknown scene {args.scene}")
    if args.atlas_u32:
        from ..scene.scene import quantize_atlas

        scene = quantize_atlas(scene)
    session.set_scene(scene)
    return session


def main(argv=None):
    ap = argparse.ArgumentParser(prog="capsaicin_tpu.viewer")
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "cornell-textured", "cornell-multitex", "colonnade"])
    ap.add_argument("--obj", default=None, help="render an OBJ file instead")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--bounces", type=int, default=1)
    ap.add_argument("--output", type=int, default=0, help="0=combined 1=direct 2=indirect 3=variance")
    ap.add_argument("--traversal", default="auto",
                    choices=["auto", "brute", "bvh", "wavefront", "cull",
                             "stream"])
    ap.add_argument("--lowres-indirect", action="store_true")
    ap.add_argument("--atlas-u32", action="store_true",
                    help="pack the texture atlas rgba8-in-u32 (native "
                         "R8G8B8A8 precision, 1/4 gather bytes)")
    ap.add_argument("--no-denoise", action="store_true")
    ap.add_argument("--no-taa", action="store_true")
    ap.add_argument("--exposure", type=float, default=None,
                    help="display exposure scale (default 1; colonnade auto-uses 0.2)")
    ap.add_argument("--out", default="render.png")
    ap.add_argument("--timings", action="store_true", help="print per-pass timings")
    ap.add_argument("--web", action="store_true", help="interactive web viewer")
    ap.add_argument("--port", type=int, default=8089)
    ap.add_argument("--precompile", action="store_true",
                    help="compile the option-variant cache before serving "
                         "(hitch-free panel toggles; slower startup)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (renders end-to-end without "
                         "a TPU; the JAX_PLATFORMS env var alone is not "
                         "authoritative when an accelerator plugin is "
                         "preregistered)")
    args = ap.parse_args(argv)

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    session = build_session(args)
    exposure = args.exposure
    if exposure is None and args.scene == "colonnade":
        exposure = 0.2  # the open-air sun otherwise saturates the display
    if exposure is not None:
        import jax.numpy as jnp

        session.settings = session.settings._replace(exposure=jnp.float32(exposure))

    if args.web:
        from .web import serve

        serve(session, port=args.port, precompile=args.precompile)
        return 0

    t0 = time.perf_counter()
    img = None
    for i in range(args.frames):
        img = session.render()
        if i == 0:
            print(f"first frame (incl. compile): {time.perf_counter() - t0:.1f}s")
            t0 = time.perf_counter()
    n_timed = max(args.frames - 1, 1)
    dt = (time.perf_counter() - t0) / n_timed
    print(f"{1.0 / dt:.1f} fps ({dt * 1e3:.1f} ms/frame) at {args.width}x{args.height}")
    session.save_png(args.out, img)
    print(f"wrote {args.out}")

    if args.timings:
        for name, seconds in session.measure_pass_timings().items():
            print(f"  {name:28s} {seconds * 1e3:8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
