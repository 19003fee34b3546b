"""First-hit AOVs (arbitrary output variables): normal / depth / albedo.

Geometry feature buffers for guided denoising (ops.post.joint_bilateral)
and tooling. One deterministic primary-ray intersection pass through the
production intersectors (pixel centers, no bounces) — cheap relative to a
render batch, camera/scene-dependent only, so interactive callers cache it
per pose (app/interaction.py invalidates on every restart).

The reference has no AOV concept; this is the standard feature-buffer
contract (normal/depth/albedo) that modern denoisers (SVGF, OIDN) consume.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import camera as cammod
from ..core.types import T_MAX
from ..ops.intersect import attribute_matrix, combine_hits, intersect_brute


@partial(jax.jit, static_argnames=("width", "height"))
def render_aovs(scene, cam, width: int = 640, height: int = 480, mesh=None):
    """First-hit feature buffers at pixel centers.

    Returns a dict:
      normal (h, w, 3) — outward unit normal, zeros on miss
      depth  (h, w)    — hit distance t, T_MAX on miss
      albedo (h, w, 3) — surface albedo, background color on miss
      object_id (h, w) — winning object id, -1 on miss
      hit    (h, w)    — boolean coverage mask
    """
    R = height * width
    u, v = cammod.pixel_uv(width, height, None)
    o, d = cammod.generate_rays(cam, u.reshape(R), v.reshape(R))

    hit = intersect_brute(scene, o, d, attr=attribute_matrix(scene))
    if mesh is not None:
        from ..ops.triangle import intersect_mesh_brute

        hit = combine_hits(hit, intersect_mesh_brute(mesh, o, d))

    shape2 = (height, width)
    mask = hit.hit.reshape(shape2)
    normal = jnp.where(hit.hit[:, None], hit.normal, 0.0).reshape(
        height, width, 3)
    depth = jnp.where(hit.hit, hit.t, T_MAX).reshape(shape2)
    albedo = jnp.where(hit.hit[:, None], hit.albedo,
                       scene.background[None, :]).reshape(height, width, 3)
    return {
        "normal": normal,
        "depth": depth,
        "albedo": albedo,
        "object_id": hit.object_id.reshape(shape2),
        "hit": mask,
    }
