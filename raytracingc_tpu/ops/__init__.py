from raytracingc_tpu.ops.env_light import environment_light  # noqa: F401
from raytracingc_tpu.ops.intersect import (  # noqa: F401
    nearest_hit,
    ray_triangle_dst,
    ray_sphere_dst,
    resolve_hit,
)
