"""Multi-chip sharding: the full frame step over a virtual 8-device mesh.

Both tests execute in subprocesses that pin JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=8, so the rest of the suite runs on
a plain single-device backend (SPMD partitioning taxes every compile when
the mesh is forced globally)."""

import os
import subprocess
import sys

N_DEV = 8
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mesh_env(n_dev: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        flags = (flags + f" --xla_force_host_platform_device_count={n_dev}").strip()
    env["XLA_FLAGS"] = flags
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_sharded_frame_matches_single_device():
    impl = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_multichip_impl.py")
    proc = subprocess.run(
        [sys.executable, impl, str(N_DEV)],
        env=_mesh_env(N_DEV), cwd=_REPO,
        # ~8 min standalone on the one-core box (cold SPMD compiles incl.
        # the mesh-session profiling prefixes, no persistent cache — see
        # _multichip_impl.py); headroom for suite runs that share the core
        capture_output=True, text=True, timeout=2100,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"


def test_sharded_frame_at_flagship_resolution():
    """Realistic-shape SPMD evidence (round-4 verdict): the default-options
    frame at 1920x1080 over the 8-device mesh (tolerance vs single-device)
    and the stream backend under shard_map against the full ~250k-tri
    colonnade scene (exact equality). One frame each — see
    _multichip_scale_impl.py for the size rationale."""
    impl = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "_multichip_scale_impl.py")
    proc = subprocess.run(
        [sys.executable, impl, str(N_DEV)],
        env=_mesh_env(N_DEV), cwd=_REPO,
        capture_output=True, text=True, timeout=3000,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"


def test_graft_dryrun():
    # dryrun_multichip spawns its own CPU-pinned subprocess (the driver gate)
    sys.path.insert(0, _REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)

    ge.dryrun_multichip(N_DEV)
