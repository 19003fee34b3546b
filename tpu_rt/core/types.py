"""Struct-of-arrays scene and camera pytrees.

These are the TPU-native equivalents of the reference's array-of-structs C++
types (``Sphere`` cpp_raytracer/raytracer_core.h:171-216, ``Material``
:160-169, ``Camera`` old/raytracer_core copy.h:150-202, ``Scene``
old/raytracer_core copy.h:223-241). Data lives as flat device arrays so every
field maps onto VPU lanes / MXU tiles; the object-oriented Python shells in
``tpu_rt.api`` build these on demand.

Sphere counts are padded to static buckets (powers of two, min 16) so that
interactive scene edits only change buffer *values*, never traced shapes —
add/remove sphere does not trigger XLA recompilation until a bucket boundary
is crossed (SURVEY.md §7 "interactive latency").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Minimum padded sphere-count bucket. 16 keeps the (R, N) intersection
# matrices lane-friendly while wasting little on the 9-sphere demo scene.
MIN_SPHERE_BUCKET = 16

# Ray epsilon / infinity used by all intersectors
# (cpp_raytracer/raytracer_core.cpp:306: intersect(ray, 0.001f, 1e10f, ...)).
T_MIN = 1e-3
T_MAX = 1e10


class SphereScene(NamedTuple):
    """SoA sphere scene. All arrays share leading dim N (padded bucket size).

    ``valid`` masks real spheres vs padding. ``background`` is the v1
    ``Scene.background_color`` (old/raytracer_core copy.h:226).
    """

    center: jnp.ndarray     # (N, 3) f32
    radius: jnp.ndarray     # (N,)   f32
    albedo: jnp.ndarray     # (N, 3) f32
    metallic: jnp.ndarray   # (N,)   f32
    roughness: jnp.ndarray  # (N,)   f32
    emission: jnp.ndarray   # (N, 3) f32
    ior: jnp.ndarray        # (N,)   f32
    object_id: jnp.ndarray  # (N,)   i32
    valid: jnp.ndarray      # (N,)   bool
    background: jnp.ndarray  # (3,)  f32

    @property
    def capacity(self) -> int:
        return self.center.shape[0]


class CameraP(NamedTuple):
    """Camera parameters, v1 semantics: position/target/up + fov/aspect.

    Basis vectors are derived per render (old/raytracer_core copy.h:160-184),
    so mutating position/target is enough — no cached state to invalidate.
    """

    position: jnp.ndarray  # (3,) f32
    target: jnp.ndarray    # (3,) f32
    up: jnp.ndarray        # (3,) f32
    fov: jnp.ndarray       # ()   f32, degrees
    aspect: jnp.ndarray    # ()   f32
    # Thin-lens depth of field (beyond-reference; the reference camera is a
    # pinhole). aperture = lens radius in world units (0 = pinhole);
    # focus_dist = distance from the camera to the focal plane along
    # forward (<= 0 means focus at the look-at target).
    aperture: jnp.ndarray = None   # () f32
    focus_dist: jnp.ndarray = None  # () f32


def sphere_bucket(n: int) -> int:
    """Static padded capacity for ``n`` spheres."""
    cap = MIN_SPHERE_BUCKET
    while cap < n:
        cap *= 2
    return cap


def make_scene(
    centers,
    radii,
    albedos,
    metallics,
    roughnesses,
    emissions,
    iors=None,
    object_ids=None,
    background=(0.1, 0.1, 0.1),
    capacity: int | None = None,
) -> SphereScene:
    """Build a padded SphereScene from host data.

    Padding spheres get radius 0 and ``valid=False``; the intersectors also
    mask on ``valid`` so padding never produces hits.
    """
    centers = np.asarray(centers, np.float32).reshape(-1, 3)
    n = centers.shape[0]
    cap = capacity if capacity is not None else sphere_bucket(n)
    if cap < n:
        raise ValueError(f"capacity {cap} < sphere count {n}")

    def pad1(x, fill=0.0, dtype=np.float32):
        x = np.asarray(x, dtype).reshape(-1)
        out = np.full((cap,), fill, dtype)
        out[:n] = x
        return jnp.asarray(out)

    def pad3(x, fill=0.0):
        x = np.asarray(x, np.float32).reshape(-1, 3)
        out = np.full((cap, 3), fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    if iors is None:
        iors = np.full((n,), 1.5, np.float32)
    if object_ids is None:
        object_ids = np.arange(n, dtype=np.int32)
    valid = np.zeros((cap,), bool)
    valid[:n] = True
    return SphereScene(
        center=pad3(centers),
        radius=pad1(radii),
        albedo=pad3(albedos),
        metallic=pad1(metallics),
        roughness=pad1(roughnesses),
        emission=pad3(emissions),
        ior=pad1(iors, fill=1.5),
        object_id=pad1(object_ids, fill=-1, dtype=np.int32),
        valid=jnp.asarray(valid),
        background=jnp.asarray(np.asarray(background, np.float32)),
    )


def make_camera(
    position=(0.0, 2.0, 5.0),
    target=(0.0, 0.0, -1.0),
    up=(0.0, 1.0, 0.0),
    fov: float = 45.0,
    aspect: float = 4.0 / 3.0,
    aperture: float = 0.0,
    focus_dist: float = 0.0,
) -> CameraP:
    """Default pose matches the reference GUI init (interaction.py:638-643).

    ``aperture`` > 0 enables thin-lens depth of field (lens radius, world
    units); ``focus_dist`` <= 0 focuses at the look-at target."""
    f32 = np.float32
    return CameraP(
        position=jnp.asarray(np.asarray(position, f32)),
        target=jnp.asarray(np.asarray(target, f32)),
        up=jnp.asarray(np.asarray(up, f32)),
        fov=jnp.asarray(f32(fov)),
        aspect=jnp.asarray(f32(aspect)),
        aperture=jnp.asarray(f32(aperture)),
        focus_dist=jnp.asarray(f32(focus_dist)),
    )


def demo_scene(capacity: int | None = None) -> SphereScene:
    """The canonical 9-sphere interactive demo scene.

    Exact data of SceneManager.create_interactive_scene
    (interaction.py:293-355): ground, 5 material spheres, 3 emissive lights,
    background (0.05, 0.05, 0.1).
    """
    rows = [
        # center,               radius, albedo,          metal, rough, emission
        ((0.0, -100.5, 0.0), 100.0, (0.9, 0.9, 0.9), 0.0, 0.5, (0, 0, 0)),
        ((-2.0, 0.5, -3.0), 0.5, (0.9, 0.1, 0.1), 0.9, 0.1, (0, 0, 0)),
        ((0.0, 0.5, -3.0), 0.5, (0.1, 0.9, 0.1), 0.0, 0.3, (0, 0, 0)),
        ((2.0, 0.5, -3.0), 0.5, (0.1, 0.1, 0.9), 0.0, 0.0, (0, 0, 0)),
        ((-1.0, 0.3, -1.5), 0.3, (0.9, 0.9, 0.1), 0.5, 0.2, (0, 0, 0)),
        ((1.0, 0.3, -1.5), 0.3, (0.9, 0.1, 0.9), 0.2, 0.8, (0, 0, 0)),
        ((0.0, 3.0, -1.0), 0.3, (1.0, 1.0, 1.0), 0.0, 0.1, (10, 10, 8)),
        ((-2.0, 2.0, 0.0), 0.2, (1.0, 1.0, 1.0), 0.0, 0.1, (5, 3, 2)),
        ((2.0, 2.0, 0.0), 0.2, (1.0, 1.0, 1.0), 0.0, 0.1, (2, 3, 5)),
    ]
    return make_scene(
        centers=[r[0] for r in rows],
        radii=[r[1] for r in rows],
        albedos=[r[2] for r in rows],
        metallics=[r[3] for r in rows],
        roughnesses=[r[4] for r in rows],
        emissions=[r[5] for r in rows],
        background=(0.05, 0.05, 0.1),
        capacity=capacity,
    )


DEMO_SPHERE_NAMES = [
    "Ground", "Red Metallic", "Green Dielectric", "Blue Glass",
    "Yellow Mixed", "Purple Rough", "Main Light", "Warm Light", "Cool Light",
]
