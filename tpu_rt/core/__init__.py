from . import camera, rng, types, vecmath  # noqa: F401
