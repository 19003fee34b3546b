from . import bvh, integrator, intersect, post, triangle  # noqa: F401
