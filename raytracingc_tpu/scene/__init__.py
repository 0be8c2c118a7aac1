from raytracingc_tpu.scene.types import Triangles, Spheres, EnvParams, Scene  # noqa: F401
from raytracingc_tpu.scene.obj_loader import load_obj  # noqa: F401
from raytracingc_tpu.scene.triangles_txt import load_triangles_txt  # noqa: F401
from raytracingc_tpu.scene.builder import (  # noqa: F401
    default_spheres,
    scene_from_obj,
    scene_from_triangles_txt,
    pad_scene,
)
