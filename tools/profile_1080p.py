#!/usr/bin/env python
"""Per-pass 1080p breakdown on the real device (VERDICT round-1 item 2).

Prints the named per-pass timer table (reference labels,
raytracing_system.cpp:1024...) plus the whole-frame time, in ms.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--bounces", type=int, default=1)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--traversal", default="auto")
    ap.add_argument("--lowres-indirect", action="store_true",
                    help="profile the progressive (UPSCALE2X) variant")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--frames", type=int, default=20)
    args = ap.parse_args()

    from capsaicin_tpu.render import RenderOptions, RenderSession
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import colonnade, cornell_box, make_camera

    options = RenderOptions(num_diffuse_bounces=args.bounces,
                            lowres_indirect=args.lowres_indirect)
    session = RenderSession(
        width=args.width, height=args.height, options=options, traversal=args.traversal
    )
    session.set_camera(
        make_camera(
            "colonnade" if args.scene == "colonnade" else "cornell",
            args.width,
            args.height,
        )
    )
    session.set_scene(
        build_scene(colonnade() if args.scene == "colonnade" else cornell_box())
    )
    session.render()
    session.render()

    t0 = time.perf_counter()
    out = None
    for _ in range(args.frames):
        out = session.render_async()
    out.block_until_ready()
    frame_ms = (time.perf_counter() - t0) / args.frames * 1e3

    timings = session.measure_pass_timings(iters=args.iters)
    table = {k: round(v * 1e3, 3) for k, v in timings.items()}
    table["[whole frame]"] = round(frame_ms, 3)
    table["[sum of passes]"] = round(sum(timings.values()) * 1e3, 3)
    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
