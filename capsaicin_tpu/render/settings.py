"""Render settings.

Mirrors the reference's two-level configuration (SURVEY.md §5):
  - RenderOptions: compile-time variants (HLSL #defines at PSO build,
    raytracing_system.h:22-27) -> static jit arguments here
  - Settings: runtime knobs (SettingsComponent, gui_system.h:20-40) ->
    a float/int pytree traced as dynamic jit arguments, so changing a sigma
    does NOT retrigger XLA compilation
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple

import jax.numpy as jnp


def _env_eaw_fused() -> str:
    """Construction-time default for RenderOptions.eaw_fused.

    The env var is read ONCE, when the options object is built, and the
    value is baked into the hashable dataclass — so the jit variant cache
    and precompile_variants key on it like any other static option, and
    flipping the env var after a session is built has no silent effect on
    that session (build a new RenderOptions instead)."""
    v = os.environ.get("CAPSAICIN_EAW_FUSED", "0")
    if v in ("", "0"):
        return "0"
    if v in ("1", "13"):
        return v
    raise ValueError(f"CAPSAICIN_EAW_FUSED={v!r}: expected 0/1/13")


def _env_eaw_bf16() -> bool:
    v = os.environ.get("CAPSAICIN_EAW_BF16", "0")
    if v in ("", "0"):
        return False
    if v == "1":
        return True
    raise ValueError(f"CAPSAICIN_EAW_BF16={v!r}: expected 0/1")

# Output modes (OutputType, gui_system.h:11-17)
OUTPUT_COMBINED = 0
OUTPUT_DIRECT = 1
OUTPUT_INDIRECT = 2
OUTPUT_VARIANCE = 3


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Static (compile-time) options; hashable so it can be a jit static arg.

    Defaults match RaytracingOptions{false, true, true}
    (raytracing_system.h:22-27) and the SettingsComponent bools
    (gui_system.h:20-40).
    """

    lowres_indirect: bool = False  # LOWRES_INDIRECT / UPSCALE2X defines
    use_variance: bool = True  # CALCULATE_VARIANCE / USE_VARIANCE
    gbuffer_feedback: bool = True  # GBUFFER_FEEDBACK
    denoise: bool = True  # SettingsComponent.denoise
    gather: bool = True  # SettingsComponent.gather
    eaw5: bool = True  # SettingsComponent.eaw5 (5-stage EAW chain)
    taa: bool = True
    num_diffuse_bounces: int = 1  # 0..5 (gui_system.cpp:74)
    spp: int = 1  # indirect samples per pixel per frame, traced in ONE
    # dispatch (lax.fori_loop over disjoint blue-noise sample sets,
    # mean-accumulated before the post stack). spp=64 renders BASELINE
    # config 2 ("1080p 4-bounce GI+NEE 64 spp") in a single frame instead
    # of 64 progressive ones. The light animation and interleave phase stay
    # those of the real frame; only the sample-set seed varies.
    output: int = OUTPUT_COMBINED
    sort_bounce_rays: bool = True  # morton/octant-sort bounce rays before
    # BVH traversal (wavefront ray reordering). Essential for packet
    # traversal: unsorted bounce packets visit near the whole tree. Small
    # scenes use the static kernel and ignore this.
    use_material_kd: bool = False  # extension: use MTL Kd for untextured
    # meshes instead of the reference's constant 0.75 (scene.h:56-58)
    history_dtype: str = "float32"  # "float16" mirrors the RGBA16F history
    # EAW chain execution variants (same math, different schedule/storage;
    # see ops/pallas_stencil.denoise_chain). Static options like the
    # reference's compile-time defines (raytracing_system.h:22-27):
    #   eaw_fused: "0" sequential stages | "1" fused pairs (1+3)(5+7) |
    #              "13" fuse only the narrow (1+3) pair
    #   eaw_bf16:  store planar chain/gather buffers bf16 through HBM
    #              (compute stays f32 in VMEM)
    # Round-5 hardware A/B (PERF.md): fusion LOSES on the chip (the
    # stage-A recompute over the slab exceeds the saved HBM round trip:
    # flagship 161->152 at "13", progressive 111->92 at "1") and "1"
    # OOMs scoped VMEM at 1080p (26.3M vs the 16M limit) — "0" is the
    # measured-correct default; the variants stay for other shapes.
    # Defaults come from CAPSAICIN_EAW_FUSED / CAPSAICIN_EAW_BF16, read at
    # construction so the value is part of the hashable options key.
    eaw_fused: str = dataclasses.field(default_factory=_env_eaw_fused)
    eaw_bf16: bool = dataclasses.field(default_factory=_env_eaw_bf16)

    def __post_init__(self):
        if self.eaw_fused not in ("0", "1", "13"):
            raise ValueError(
                f"eaw_fused={self.eaw_fused!r}: expected '0'/'1'/'13'")
        if not isinstance(self.eaw_bf16, bool):
            raise ValueError(f"eaw_bf16={self.eaw_bf16!r}: expected bool")


class Settings(NamedTuple):
    """Dynamic (traced) knobs; defaults from gui_system.h:25-37."""

    eaw_normal_sigma: jnp.ndarray
    eaw_depth_sigma: jnp.ndarray
    eaw_luma_sigma: jnp.ndarray
    gather_normal_sigma: jnp.ndarray
    gather_depth_sigma: jnp.ndarray
    gather_luma_sigma: jnp.ndarray
    temporal_upscale_feedback: jnp.ndarray
    taa_feedback: jnp.ndarray
    exposure: jnp.ndarray  # display-only scale before gamma (extension;
    # 1.0 == reference behavior, which has no exposure control)


def default_settings() -> Settings:
    return Settings(
        eaw_normal_sigma=jnp.float32(128.0),
        eaw_depth_sigma=jnp.float32(3.0),
        eaw_luma_sigma=jnp.float32(3.0),
        gather_normal_sigma=jnp.float32(64.0),
        gather_depth_sigma=jnp.float32(2.0),
        gather_luma_sigma=jnp.float32(3.0),
        temporal_upscale_feedback=jnp.float32(0.975),
        taa_feedback=jnp.float32(0.9),
        exposure=jnp.float32(1.0),
    )
