from .obj_loader import Material, MeshData, load_obj, parse_mtl  # noqa: F401
from .scene import Scene, build_scene, load_scene_obj, merge_scenes  # noqa: F401
