from raytracer_tpu.core import math3
from raytracer_tpu.core.types import (
    Camera,
    CameraFrame,
    Lights,
    Materials,
    Scene,
    Sky,
    Spheres,
    Walls,
)

__all__ = [
    "math3",
    "Camera",
    "CameraFrame",
    "Lights",
    "Materials",
    "Scene",
    "Sky",
    "Spheres",
    "Walls",
]
