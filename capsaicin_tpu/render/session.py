"""RenderSession: the host-side orchestration layer.

Replaces the reference's RenderSystem + RaytracingSystem host plumbing
(render_system.cpp: frame executor, fencing, per-pass timings;
capsaicin.cpp: the public facade). On TPU almost all of that dissolves into
one jitted frame function with donated state; what remains here is device
placement, jit caching per (resolution, options), camera updates, frame
timing, and readback.
"""

from __future__ import annotations

import collections
import functools
import time
from typing import Dict, Optional

import os

import jax
import jax.numpy as jnp
import numpy as np

_cache_configured = False


def setup_compilation_cache():
    """Persistent XLA compilation cache: frame functions and the Pallas
    traversal kernels are expensive to compile (minutes at 1080p); cache
    across processes. TPU only — XLA:CPU AOT cache entries encode host
    machine features and can SIGILL when loaded on a different host profile.

    Called lazily from RenderSession.__init__ (NOT at import):
    jax.default_backend() initializes the device backend, and import-time
    init hangs the whole package import when the TPU tunnel is down.
    Ops-level tools that jit kernels WITHOUT a RenderSession (e.g.
    tools/profile_stream.py) must call this themselves or every run
    repays the multi-minute Pallas compile bill."""
    global _cache_configured
    if _cache_configured:
        return
    _cache_configured = True
    try:
        if jax.default_backend() == "tpu":
            _cache_dir = os.environ.get(
                "CAPSAICIN_CACHE_DIR",
                os.path.expanduser("~/.cache/capsaicin_tpu/xla"),
            )
            os.makedirs(_cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", _cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from ..ops.camera import Camera
from ..scene.scene import Scene
from ..scene import textures
from . import pipeline
from .settings import RenderOptions, Settings, default_settings
from .traversal import make_traversal, resolve_mode


# (mode, width, height, options) -> jitted frame fn, shared across sessions.
# LRU-bounded: interactive resizing emits a stream of distinct resolutions
# and each entry pins a compiled full-pipeline executable. Guarded by a
# lock: precompile_background mutates it from a daemon thread while the
# foreground render loop reads it.
import threading

_GLOBAL_FN_CACHE: collections.OrderedDict = collections.OrderedDict()
_GLOBAL_FN_CACHE_CAP = 32
_GLOBAL_FN_CACHE_LOCK = threading.Lock()


class RenderSession:
    def __init__(
        self,
        width: int = 1920,
        height: int = 1080,
        options: Optional[RenderOptions] = None,
        settings: Optional[Settings] = None,
        traversal: str = "auto",
        camera: Optional[Camera] = None,
        mesh=None,
        stream_block_tris: Optional[int] = None,
    ):
        """mesh: an optional `jax.sharding.Mesh` (see parallel.sharding).
        When set, frames render SPMD over the mesh: per-pixel state and the
        framebuffer are sharded over image rows, scene/BVH replicated, and
        the traversal kernels run per-shard via shard_map (the TPU-native
        multi-chip scale-out of the reference's single-GPU pixel
        parallelism, SURVEY.md §2.4). `height` must divide by the mesh
        size. Example:

            mesh = capsaicin_tpu.parallel.sharding.make_mesh()
            sess = RenderSession(1920, 1080, mesh=mesh)
        """
        if mesh is not None and height % mesh.size != 0:
            raise ValueError(
                f"height {height} must divide by mesh size {mesh.size}")
        setup_compilation_cache()
        self.mesh = mesh
        self.width = width
        self.height = height
        self.options = options or RenderOptions()
        self.settings = settings or default_settings()
        self.traversal_mode = traversal
        # stream-backend leaf-block size (None = ops.stream.BLOCK_TRIS);
        # 64 halves steps on union-wide dense-scene passes at 2x per-step
        # cost (PERF.md sim table) — pick per scene via the HW A/B
        self.stream_block_tris = stream_block_tris
        from ..ops.camera import default_camera

        self.camera = camera or default_camera(aspect=height / width)
        self.noise = jnp.asarray(textures.blue_noise_256())
        self.scene_dev: Optional[Scene] = None
        self.scene_host: Optional[Scene] = None
        self.bvh = None
        self.state: Optional[pipeline.FrameState] = None
        self._frame_fn = None
        # jitted frame fns per RenderOptions: precompiled variants so the
        # viewer can flip static options (output mode, bounces, denoise,
        # eaw5 — the ImGui toggles, gui_system.cpp:69-91) without a
        # recompile hitch (SURVEY.md §7 hard-part 7)
        self._fn_cache: Dict[RenderOptions, object] = {}
        self._precompile_lock = threading.Lock()
        self._bg_kick_lock = threading.Lock()
        self._bg_thread = None
        self._bg_pending = self._BG_IDLE
        self._timings: Dict[str, float] = {}

    # -- scene ------------------------------------------------------------

    def set_scene(self, scene: Scene):
        """Upload the scene and (re)build acceleration structures — the
        analog of AssetLoad + BLAS + TLAS systems firing on the next frame."""
        self.scene_host = scene
        if self.mesh is not None:
            from ..parallel import sharding as sh

            self.scene_dev = sh.shard_scene(self.mesh, scene)
        else:
            self.scene_dev = jax.device_put(scene)
        mode = resolve_mode(self.traversal_mode, scene.tri_v0.shape[0])
        from .traversal import build_accel

        # build from the HOST scene: the builders np.asarray the geometry,
        # and device->host pulls are pathologically slow on tunneled TPUs
        self.bvh = build_accel(
            scene, mode, stream_block_tris=self.stream_block_tris)
        if self.mesh is not None and self.bvh is not None:
            from ..parallel import sharding as sh

            self.bvh = jax.device_put(self.bvh, sh.replicated(self.mesh))
        self._resolved_mode = mode
        self._frame_fn = None
        self._fn_cache.clear()
        self.reset()

    def add_scene(self, scene: Scene):
        """Append another scene's meshes into the session's pooled geometry
        and rebuild acceleration — reference parity for calling
        LoadSceneFromOBJ repeatedly mid-session, where each call accumulates
        into the persistent pools and BLAS-builds the new meshes
        (asset_load_system.cpp:162-255, capsaicin.cpp:65-73)."""
        from ..scene.scene import merge_scenes

        if self.scene_dev is None:
            self.set_scene(scene)
            return
        self.set_scene(merge_scenes(self.scene_host, scene))

    def set_camera(self, camera: Camera):
        self.camera = camera

    def reset(self):
        """Reset temporal accumulation (history) — what the reference does
        implicitly through frame_count==0 disocclusion."""
        self.state = pipeline.init_state(self.width, self.height, self.camera, self.options)
        if self.mesh is not None:
            from ..parallel import sharding as sh

            self.state = sh.shard_frame_state(self.mesh, self.state, self.height)

    def set_options(self, options: RenderOptions):
        """Changing static options recompiles (like the reference rebuilding
        PSOs with different #defines) and resets accumulation."""
        self.use_options(options)
        self.reset()

    def use_options(self, options: RenderOptions):
        """Live-switch static options WITHOUT resetting temporal history —
        the analog of flipping an ImGui toggle mid-session
        (gui_system.cpp:69-91). Reuses a cached compiled variant when one
        exists (see precompile_variants); only a history-dtype change forces
        a reset (the state buffers change dtype)."""
        reset_needed = options.history_dtype != self.options.history_dtype
        self.options = options
        self._frame_fn = self._fn_cache.get(options)
        if reset_needed:
            self.reset()

    def panel_variants(self, base: Optional[RenderOptions] = None):
        """Every single-field flip the viewer panel exposes from `base`
        (gui_system.cpp:69-91): all 4 output modes, each toggle flipped,
        and the full bounce range 0..5 (gui_system.cpp:74), plus the most
        common multi-toggle combos (raw-preview and direct-only modes)."""
        import dataclasses

        base = self.options if base is None else base
        variants = [base]
        for mode_ in range(4):
            variants.append(dataclasses.replace(base, output=mode_))
        for field in ("denoise", "eaw5", "gather", "taa"):
            variants.append(
                dataclasses.replace(
                    base, **{field: not getattr(base, field)}))
        for b in range(6):
            variants.append(dataclasses.replace(base, num_diffuse_bounces=b))
        # likely combos: raw preview (all post off) and direct-only fast path
        variants.append(dataclasses.replace(
            base, denoise=False, gather=False, taa=False))
        variants.append(dataclasses.replace(
            base, output=1, denoise=False, gather=False, taa=False,
            num_diffuse_bounces=0))
        return list(dict.fromkeys(variants))

    def precompile_variants(self, variants=None):
        """Compile a set of RenderOptions variants ahead of time so runtime
        flips don't hitch (SURVEY.md §7 item 7: 'settings changes that flip
        kernel variants should be jit-static and precompiled'). Default set:
        panel_variants() — every single-field flip the viewer panel exposes
        plus the common combos. Deeper combinations are covered by the
        viewer kicking precompile_background() after each flip (the new
        state's neighborhood compiles while the old variant keeps
        rendering). Requires a scene. Returns the number compiled."""
        if self.scene_dev is None:
            raise RuntimeError("set_scene() first")
        if variants is None:
            variants = self.panel_variants()
        # Serialize concurrent precompiles: the viewer kicks
        # precompile_background on every option flip, and two threads
        # racing past the `opt in self._fn_cache` check would each pay the
        # same multi-minute compile on the single tunnel core. Under the
        # lock the second thread sees the first's cache inserts and exits
        # cheaply.
        with self._precompile_lock:
            return self._precompile_locked(variants)

    def _precompile_locked(self, variants):
        n = 0

        # lower() only needs shapes/dtypes; abstracting the example args
        # makes this safe to run on a background thread while the render
        # loop donates (deletes) the live state buffers
        def _abstract(x):
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return jax.ShapeDtypeStruct(x.shape, x.dtype)
            return x

        example = jax.tree.map(_abstract, (
            self.scene_dev, self.bvh, self.camera, self.state,
            self.settings, self.noise,
        ))
        for opt in dict.fromkeys(variants):
            if opt in self._fn_cache:
                continue
            fn = self._build_frame_fn(opt)
            # trace+compile now (populates the persistent XLA cache on TPU);
            # the jit dispatch itself then hits the warm cache on first use
            fn.lower(*example).compile()
            self._fn_cache[opt] = fn
            n += 1
        return n

    _BG_IDLE = object()  # sentinel: no pending background precompile

    def precompile_background(self, variants=None):
        """Compile variants on a daemon thread while the session keeps
        rendering the current variant — the reference's async PSO compile
        analog (variant changes there rebuild pipeline state without
        stalling the frame loop). Default set: the current options'
        panel_variants() neighborhood. Returns the thread (join() to wait;
        tests do, viewers don't).

        Kicks coalesce: the viewer calls this on EVERY panel flip, and on
        the one-core tunnel box a fresh thread per flip would stack
        duplicate multi-minute compiles. One worker drains the latest
        request; re-kicks while it runs just replace the pending set."""
        with self._bg_kick_lock:
            self._bg_pending = variants
            if self._bg_thread is not None:
                return self._bg_thread

            def worker():
                while True:
                    with self._bg_kick_lock:
                        pending = self._bg_pending
                        if pending is self._BG_IDLE:
                            # retire INSIDE the lock: a kick that observed
                            # a live worker must be guaranteed pickup
                            self._bg_thread = None
                            return
                        self._bg_pending = self._BG_IDLE
                    self.precompile_variants(pending)

            t = threading.Thread(target=worker, daemon=True)
            self._bg_thread = t
            t.start()
            return t

    def resize(self, width: int, height: int):
        """Change the render resolution, refitting the camera sensor to the
        new aspect (the reference refits sensor height to the window every
        frame, camera_system.cpp:10-17). Resets accumulation; compiled
        variants for the old resolution are dropped."""
        if (width, height) == (self.width, self.height):
            return
        self.width, self.height = width, height
        sensor = jnp.asarray(self.camera.sensor_size)
        self.camera = self.camera._replace(
            sensor_size=jnp.array(
                [sensor[0], sensor[0] * height / width], jnp.float32
            )
        )
        self._frame_fn = None
        self._fn_cache.clear()
        self.reset()

    # -- frame ------------------------------------------------------------

    def _trace_fns(self, scene, bvh, options, mode):
        """(closest, any_hit, bounce, bounce_any) trace fns for one frame:
        the per-mode sorting/balancing wrappers, shard_map-wrapped per-shard
        on mesh sessions (rays sharded, scene/BVH replicated, sorting local
        — parallel.sharding.shard_trace). scene/bvh may be traced values
        (called at trace time inside the jitted step) or concrete arrays.
        Shared by _build_frame_fn and profiling.measure_passes_inframe so
        the profiled frame IS the product frame."""
        mesh = self.mesh

        def make_fns(scene, bvh):
            """(closest, any, bounce, bounce_any) single-chip trace fns."""
            closest, any_hit = make_traversal(scene, mode, bvh)
            bounce = bounce_any = None
            if mode == "stream" and options.sort_bounce_rays:
                # incoherent bounce rays get finer direction binning and
                # the candidate-count load-balance pre-pass (each is ~2x on
                # dense scenes; see ops/stream._balance and PERF.md)
                from .traversal import (
                    make_stream_bounce_fns,
                    with_ray_sorting_any,
                )

                bounce, bounce_any = make_stream_bounce_fns(bvh)
                # direct-shadow rays too: pixel blocks are coherent in
                # IMAGE space but scatter in scene depth on dense scenes,
                # so sub-packet unions stay wide; origin-morton sorting is
                # 189 -> 25.7 steps/gang on real colonnade shadows
                # (tools/sim_stream.py --workload real-shadow
                # --shadow-sort morton). Exact: sorting is a permutation.
                any_hit = with_ray_sorting_any(any_hit)
            elif mode in ("bvh", "wavefront") and options.sort_bounce_rays:
                from .traversal import with_ray_sorting, with_ray_sorting_any

                bounce = with_ray_sorting(closest)
                bounce_any = with_ray_sorting_any(any_hit)
            elif mode == "cull":
                from .traversal import make_bounce_fns

                bounce, bounce_any = make_bounce_fns(bvh)
            return closest, any_hit, bounce, bounce_any

        if mesh is None:
            return make_fns(scene, bvh)
        from ..parallel import sharding as sh

        def pick(i):
            if make_fns(scene, bvh)[i] is None:
                return None
            return sh.shard_trace(
                mesh, scene, bvh, lambda s, b: make_fns(s, b)[i])

        return pick(0), pick(1), pick(2), pick(3)

    def _build_frame_fn(self, options: Optional[RenderOptions] = None,
                        loop_frames: Optional[int] = None,
                        loop_accumulate: bool = False):
        mode = self._resolved_mode
        width, height = self.width, self.height
        options = self.options if options is None else options
        # process-wide cache: the jitted step closes over ONLY
        # (mode, resolution, options, mesh, loop) — scene/bvh/state are
        # traced args — so identical configs across sessions share one
        # compile (the reference's PSO cache analog)
        key = (mode, width, height, options, self.mesh, loop_frames,
               loop_accumulate)
        with _GLOBAL_FN_CACHE_LOCK:
            cached = _GLOBAL_FN_CACHE.get(key)
            if cached is not None:
                _GLOBAL_FN_CACHE.move_to_end(key)
                return cached

        mesh = self.mesh

        def step(scene, bvh, camera, state, settings, noise):
            closest, any_hit, bounce, bounce_any = self._trace_fns(
                scene, bvh, options, mode)
            from contextlib import nullcontext

            from . import passes

            scope = passes.stencil_spmd_scope(mesh) if mesh is not None \
                else nullcontext()
            with scope:
                return pipeline.render_frame(
                    scene, closest, any_hit, camera, state, settings, noise,
                    width, height, options,
                    closest_bounce_fn=bounce, any_bounce_fn=bounce_any,
                    # packet traversal halves its footprint when
                    # primary/shadow rays arrive in 8x128 pixel blocks;
                    # brute/static kernels are order-insensitive so only
                    # bvh mode pays the transposes
                    trace_block_order=(mode in ("bvh", "cull", "stream")),
                )

        if loop_frames is None:
            body_fn = step
        else:
            k = int(loop_frames)

            def body_fn(scene, bvh, camera, state, settings, noise):
                # K frames in one dispatch: amortizes the per-frame host
                # dispatch round trip (~1-2 ms through the device tunnel —
                # what capped small configs) for offline/progressive
                # rendering. Camera is held for the whole dispatch.
                #
                # accumulate=True returns the MEAN of the K displays (the
                # offline antialiasing semantics: each frame jitters the
                # subpixel sample). It also guarantees every iteration's
                # image compute stays live: with the temporal passes off
                # (e.g. the direct-only config) the last-display-only
                # carry lets XLA dead-code-eliminate the first K-1 frames
                # entirely — a round-5 hardware capture read 2417 Mrays/s
                # (= exactly 16x the single-frame kernel rate) before
                # this was caught, so benches MUST use accumulate mode.
                def body(_, carry):
                    acc, st = carry
                    d, st = step(scene, bvh, camera, st, settings, noise)
                    return (acc + d if loop_accumulate else d), st

                disp0 = jnp.zeros((height, width, 3), jnp.float32)
                acc, st = jax.lax.fori_loop(0, k, body, (disp0, state))
                if loop_accumulate:
                    acc = acc / jnp.float32(k)
                return acc, st

        if mesh is None:
            fn = jax.jit(body_fn, donate_argnums=(3,))
        else:
            from ..parallel import sharding as sh

            fn = sh.build_sharded_step(
                mesh, body_fn, height, self.state,
                (self.scene_dev, self.bvh, self.camera, self.state,
                 self.settings, self.noise),
            )
        with _GLOBAL_FN_CACHE_LOCK:
            _GLOBAL_FN_CACHE[key] = fn
            while len(_GLOBAL_FN_CACHE) > _GLOBAL_FN_CACHE_CAP:
                _GLOBAL_FN_CACHE.popitem(last=False)
        return fn

    def render(self, camera: Optional[Camera] = None) -> np.ndarray:
        """Render one frame, advance state, return display image [H,W,3]."""
        if self.scene_dev is None:
            raise RuntimeError("set_scene() first")
        if camera is not None:
            self.camera = camera
        if self._frame_fn is None:
            self._frame_fn = self._fn_cache[self.options] = self._build_frame_fn()
        t0 = time.perf_counter()
        display, self.state = self._frame_fn(
            self.scene_dev, self.bvh, self.camera, self.state, self.settings, self.noise
        )
        display.block_until_ready()
        self._timings["frame"] = time.perf_counter() - t0
        return np.asarray(display)

    def render_loop(self, frames: int, camera: Optional[Camera] = None,
                    chunk: int = 16, accumulate: bool = False):
        """Render `frames` frames on-device (lax.fori_loop over the frame
        step with carried state) and return the last display image as a
        device array. Amortizes the per-frame host dispatch overhead
        (~1-2 ms through a tunneled device — what launch-bound small configs
        pay per frame); the camera is held constant across the loop, so
        this is the offline/progressive accumulation fast path.

        accumulate=True returns each chunk's MEAN display instead of the
        last frame's — the offline antialiasing semantics for configs
        without temporal accumulation (direct-only), and the mode benches
        must use: it keeps every loop iteration's image live (see
        _build_frame_fn).

        The device loop always runs a FIXED `chunk` trip count (the count
        bakes into the HLO, so every distinct value is a fresh multi-minute
        compile — PERF.md): `frames` is served as floor(frames/chunk)
        chunk dispatches plus single-frame dispatches for the remainder,
        reusing at most two compiled programs for ANY frame count."""
        if self.scene_dev is None:
            raise RuntimeError("set_scene() first")
        if camera is not None:
            self.camera = camera
        frames = int(frames)
        if frames <= 0:
            raise ValueError("frames must be >= 1")
        n_chunks, rem = divmod(frames, max(int(chunk), 1))
        display = None
        if n_chunks:
            fn = self._build_frame_fn(loop_frames=max(int(chunk), 1),
                                      loop_accumulate=accumulate)
            for _ in range(n_chunks):
                display, self.state = fn(
                    self.scene_dev, self.bvh, self.camera, self.state,
                    self.settings, self.noise,
                )
        for _ in range(rem):
            display = self.render_async()
        return display

    def render_async(self, camera: Optional[Camera] = None):
        """Dispatch a frame without blocking (XLA async dispatch replaces the
        reference's 2-frames-in-flight fencing). Returns the device array."""
        if camera is not None:
            self.camera = camera
        if self._frame_fn is None:
            self._frame_fn = self._fn_cache[self.options] = self._build_frame_fn()
        display, self.state = self._frame_fn(
            self.scene_dev, self.bvh, self.camera, self.state, self.settings, self.noise
        )
        return display

    # -- observability ----------------------------------------------------

    @property
    def timings(self) -> Dict[str, float]:
        """Last frame wall-clock timings (seconds), like the reference's
        named GPU timestamp table (render_system.cpp:271-281)."""
        return dict(self._timings)

    def measure_pass_timings(self, iters: int = 3,
                             method: str = "inframe") -> Dict[str, float]:
        """Per-pass timings; the analog of the reference's in-frame
        timestamp queries (render_system.cpp:271-281). method='inframe'
        (default) uses cumulative-prefix dispatches whose differences cancel
        the fixed dispatch overhead, so the table sums to ~frame time;
        method='isolated' times each pass as its own dispatch."""
        from . import profiling

        if method == "inframe":
            return profiling.measure_passes_inframe(self, iters=iters)
        return profiling.measure_passes(self, iters=iters)

    # -- checkpoint / resume ----------------------------------------------

    def save_state(self, path: str):
        """Serialize the temporal state (histories, prev gbuffer, camera,
        frame counter) so a progressive render can resume later — a
        capability the reference lacks entirely (SURVEY.md §5)."""
        state = self.state
        cam_arrays = {f"cam_{i}": np.asarray(x) for i, x in enumerate(state.prev_camera)}
        np.savez_compressed(
            path,
            color_history=np.asarray(state.color_history),
            moments_history=np.asarray(state.moments_history),
            combined_history=np.asarray(state.combined_history),
            prev_nd_oct=np.asarray(state.prev_nd_oct),
            prev_nd_inst=np.asarray(state.prev_nd_inst),
            prev_nd_depth=np.asarray(state.prev_nd_depth),
            frame_count=np.asarray(state.frame_count),
            **cam_arrays,
        )

    def load_state(self, path: str):
        data = np.load(path)
        n_cam = len(self.camera)
        cam = Camera(*[jnp.asarray(data[f"cam_{i}"]) for i in range(n_cam)])
        self.state = pipeline.FrameState(
            color_history=jnp.asarray(data["color_history"]),
            moments_history=jnp.asarray(data["moments_history"]),
            combined_history=jnp.asarray(data["combined_history"]),
            prev_nd_oct=jnp.asarray(data["prev_nd_oct"]),
            prev_nd_inst=jnp.asarray(data["prev_nd_inst"]),
            prev_nd_depth=jnp.asarray(data["prev_nd_depth"]),
            prev_camera=cam,
            frame_count=jnp.int32(data["frame_count"]),
        )

    def save_png(self, path: str, image: Optional[np.ndarray] = None):
        from PIL import Image

        img = image if image is not None else self.render()
        # Row 0 of the framebuffer is sensor -v (camera.h:44-58 maps pixel
        # y=0 to -up); flip for display like the reference's fullscreen blit.
        arr = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)[::-1]
        Image.fromarray(arr).save(path)
