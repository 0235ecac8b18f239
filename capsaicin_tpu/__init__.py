"""capsaicin_tpu — a TPU-native real-time path tracing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of yozhijk/capsaicin
(a DX12/DXR/HLSL path tracing engine). The public API mirrors the reference's
9-function facade (/root/reference/src/core/include/capsaicin.h:25-36) in
Python-idiomatic form; the engine itself is a jit-compiled frame function over
a Scene pytree with an LBVH built and traversed in XLA/Pallas.

Quick start::

    import capsaicin_tpu as cap

    cap.init()
    session = cap.create_session(width=512, height=512)
    scene = cap.load_scene_obj("assets/cornell_box.obj")
    session.set_scene(scene)
    image = session.render()          # one frame, [H,W,3] float in [0,1]
"""

from .ops.camera import Camera, default_camera
from .scene.scene import Scene, build_scene, load_scene_obj, merge_scenes
from .version import __version__

__all__ = [
    "Camera",
    "Scene",
    "__version__",
    "build_scene",
    "create_session",
    "default_camera",
    "init",
    "load_scene_obj",
    "merge_scenes",
    "shutdown",
]

_initialized = False


def init():
    """Engine bring-up (analog of capsaicin::Init, capsaicin.cpp:20-46).

    JAX owns device discovery, so this only validates backends and warms
    shared assets (blue-noise table)."""
    global _initialized
    from .scene import textures

    textures.blue_noise_256()
    _initialized = True


def shutdown():
    """Analog of capsaicin::Shutdown (capsaicin.cpp:94-103)."""
    global _initialized
    _initialized = False


def create_session(width: int = 1920, height: int = 1080, **options):
    """Create a render session (analog of InitRenderSession,
    capsaicin.cpp:48-63)."""
    from .render.session import RenderSession

    return RenderSession(width=width, height=height, **options)
