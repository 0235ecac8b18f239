#!/usr/bin/env python
"""Compiled-kernel TPU gate: the smoke subset that catches hardware-only
regressions the CPU suite's interpret mode cannot (Mosaic lowering, VMEM
budgets, layout cliffs).

Runs, on the REAL device (no interpret):
  1. the four Pallas kernel test files (traversal, brute intersect,
     stencils, lookup) via pytest with CAPSAICIN_TEST_TPU=1
  2. one short end-to-end frame per benchmark scene family
     (cornell / textured / colonnade) with finite-pixel asserts

Target < 5 min warm (persistent XLA cache makes reruns cheap; the first
ever run pays the compile bill). Exits nonzero on any failure — wire it
wherever a TPU is available:

    python tools/tpu_smoke.py            # kernels + frames
    python tools/tpu_smoke.py --frames-only
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KERNEL_TESTS = [
    "tests/test_pallas_traverse.py",
    "tests/test_pallas_intersect.py",
    "tests/test_pallas_stencil.py",
    "tests/test_pallas_lookup.py",
]

# (scene, width, height, traversal, bounces)
FRAMES = [
    ("cornell", 256, 256, "auto", 1),
    ("cornell-textured", 256, 256, "auto", 1),
    ("colonnade", 256, 144, "bvh", 1),
]


def run_kernel_tests() -> bool:
    env = dict(os.environ, CAPSAICIN_TEST_TPU="1")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-x", "-q", *KERNEL_TESTS],
        cwd=REPO, env=env,
    )
    print(f"[tpu-smoke] kernel tests rc={proc.returncode} "
          f"({time.time() - t0:.0f}s)", flush=True)
    return proc.returncode == 0


def run_frames() -> bool:
    import numpy as np

    sys.path.insert(0, REPO)
    from capsaicin_tpu.render import RenderOptions, RenderSession
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import (
        colonnade, cornell_box, cornell_box_textured, make_camera,
    )

    ok = True
    for scene_name, w, h, traversal, bounces in FRAMES:
        t0 = time.time()
        sess = RenderSession(
            w, h, options=RenderOptions(num_diffuse_bounces=bounces),
            traversal=traversal,
            camera=make_camera(
                "colonnade" if scene_name == "colonnade" else "cornell", w, h),
        )
        if scene_name == "colonnade":
            sess.set_scene(build_scene(colonnade()))
        elif scene_name == "cornell-textured":
            meshes, tex = cornell_box_textured()
            sess.set_scene(build_scene(meshes, tex))
        else:
            sess.set_scene(build_scene(cornell_box()))
        img = sess.render()
        good = bool(np.all(np.isfinite(img))) and float(img.max()) > 0.01
        ok &= good
        print(f"[tpu-smoke] frame {scene_name} {w}x{h} "
              f"{'OK' if good else 'FAIL'} ({time.time() - t0:.0f}s)",
              flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-only", action="store_true")
    ap.add_argument("--kernels-only", action="store_true")
    args = ap.parse_args()

    t0 = time.time()
    ok = True
    if not args.frames_only:
        ok &= run_kernel_tests()
    if not args.kernels_only:
        ok &= run_frames()
    print(f"[tpu-smoke] {'PASS' if ok else 'FAIL'} total "
          f"{time.time() - t0:.0f}s", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
