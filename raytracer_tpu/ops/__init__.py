from raytracer_tpu.ops.raygen import camera_frame, generate_rays
from raytracer_tpu.ops.intersect import closest_hit, sphere_hit_ts, wall_hit_ts
from raytracer_tpu.ops.shading import background_color, shade_local
from raytracer_tpu.ops.tonemap import reinhard_tonemap, to_uint8

__all__ = [
    "camera_frame",
    "generate_rays",
    "closest_hit",
    "sphere_hit_ts",
    "wall_hit_ts",
    "background_color",
    "shade_local",
    "reinhard_tonemap",
    "to_uint8",
]
