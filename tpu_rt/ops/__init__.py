from . import integrator, intersect  # noqa: F401
