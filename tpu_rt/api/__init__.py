"""Drop-in replacement for the reference pybind11 module ``raytracer_cpp``.

``from tpu_rt.api import RayTracer, Scene, Sphere, Material, Vector3, Camera``
is the TPU-backed equivalent of the reference's
``from cpp_raytracer.raytracer_cpp import ...`` (interaction.py:13).
"""

from .compat import (  # noqa: F401
    Camera,
    DebugInfo,
    HitRecord,
    Material,
    Ray,
    RayTracer,
    Scene,
    Sphere,
    Vector3,
)
