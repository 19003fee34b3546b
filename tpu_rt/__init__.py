"""tpu-rt: a TPU-native interactive path-tracing framework (JAX/XLA/Pallas).

Brand-new implementation with the capabilities of the reference CPU ray
tracer (Samuel-2000/PGR-Raytracing-Project): progressive Monte-Carlo path
tracing over sphere scenes, BVH acceleration, a denoiser bank, a drop-in
v1-compatible Python API, and the interactive runtime/GUI on top.

Layer map (mirrors SURVEY.md §7):
  core/      math + SoA pytree types + stateless RNG + camera
  ops/       intersectors, BVH build/traverse, integrator, post kernels
  render/    frame rendering, tone map, progressive accumulation
  parallel/  device mesh + shard_map rendering (sample/tile sharding)
  api/       drop-in v1-compatible object surface (Vector3 ... RayTracer)
  app/       interaction runtime, previews, denoiser bank, GUI, launcher
  utils/     config, profiling, checkpointing
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compile cache: render-pipeline compiles take minutes on a
# slow host; cached reloads are near-instant. Harmless if already set.
_cache_dir = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.expanduser("~/.cache/jax_comp"),
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is an optimization only
    pass

from .core.types import (  # noqa: F401
    CameraP,
    SphereScene,
    demo_scene,
    make_camera,
    make_scene,
)
from .render.frame import render, tone_map, enhance_contrast, accumulate  # noqa: F401
