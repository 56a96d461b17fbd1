from raytracer_tpu.ops.raygen import camera_frame, generate_rays
from raytracer_tpu.ops.tonemap import reinhard_tonemap, to_uint8
from raytracer_tpu.ops.trace import (
    background_soa,
    closest_hit_soa,
    fold_closest_jnp,
    shade_soa,
    trace_soa,
)

__all__ = [
    "camera_frame",
    "generate_rays",
    "background_soa",
    "closest_hit_soa",
    "fold_closest_jnp",
    "shade_soa",
    "trace_soa",
    "reinhard_tonemap",
    "to_uint8",
]
