"""Scene library: canonical and procedural test scenes.

``demo_scene`` (tpu_rt.core.types) is the reference's interactive scene;
these add coverage breadth: the classic random-spheres field for scaling
tests (stresses bucket sizes well beyond the demo's 9), and a Cornell-style
mesh box exercising the triangle path.
"""

from __future__ import annotations

import numpy as np

from .types import SphereScene, make_scene


def random_spheres(
    n: int = 64,
    seed: int = 0,
    spread: float = 10.0,
    emissive_fraction: float = 0.1,
    capacity: int | None = None,
) -> SphereScene:
    """A field of n random spheres over a ground sphere (the classic
    many-spheres benchmark scene). Deterministic in ``seed``."""
    rng = np.random.default_rng(seed)
    m = n - 1  # ground takes one slot
    centers = np.zeros((n, 3), np.float32)
    radii = np.zeros((n,), np.float32)
    albedos = np.zeros((n, 3), np.float32)
    metallics = np.zeros((n,), np.float32)
    roughnesses = np.full((n,), 0.5, np.float32)
    emissions = np.zeros((n, 3), np.float32)

    centers[0] = (0, -1000.0, 0)
    radii[0] = 1000.0
    albedos[0] = (0.5, 0.5, 0.5)

    r = rng.uniform(0.2, 0.6, m).astype(np.float32)
    centers[1:, 0] = rng.uniform(-spread, spread, m)
    centers[1:, 2] = rng.uniform(-spread - 4.0, -1.0, m)
    centers[1:, 1] = r
    radii[1:] = r
    albedos[1:] = rng.uniform(0.1, 0.95, (m, 3))
    kind = rng.uniform(size=m)
    metallics[1:] = np.where(kind < 0.3, rng.uniform(0.6, 1.0, m), 0.0)
    roughnesses[1:] = rng.uniform(0.0, 0.8, m)
    emissive = kind > 1.0 - emissive_fraction
    emissions[1:][emissive] = rng.uniform(2.0, 8.0, (int(emissive.sum()), 3))

    return make_scene(
        centers=centers, radii=radii, albedos=albedos, metallics=metallics,
        roughnesses=roughnesses, emissions=emissions,
        background=(0.3, 0.4, 0.6), capacity=capacity,
    )


def terrain_mesh(n: int = 24, extent: float = 12.0, seed: int = 0):
    """Procedural sinusoidal-heightfield terrain: 2*(n-1)^2 triangles.

    n=24 gives 1058 triangles — the >=1k-triangle workload for mesh-BVH
    equivalence and crossover benchmarks (BASELINE config #2). Returns
    (sphere_scene, mesh): a couple of spheres above a rolling lit terrain.
    """
    from ..ops.triangle import make_mesh

    rng = np.random.default_rng(seed)
    xs = np.linspace(-extent, extent, n, dtype=np.float32)
    zs = np.linspace(-2.0, -2.0 - 2 * extent, n, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    gy = (0.8 * np.sin(gx * 0.7) * np.cos(gz * 0.5)
          + 0.3 * np.sin(gx * 1.9 + 1.0) * np.sin(gz * 1.3)
          ).astype(np.float32)
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

    idx = np.arange(n * n).reshape(n, n)
    a = idx[:-1, :-1].ravel()
    b = idx[1:, :-1].ravel()
    c = idx[1:, 1:].ravel()
    d = idx[:-1, 1:].ravel()
    faces = np.concatenate(
        [np.stack([a, b, c], -1), np.stack([a, c, d], -1)], axis=0)

    f = faces.shape[0]
    albedo = rng.uniform(0.3, 0.9, (f, 3)).astype(np.float32)
    mesh = make_mesh(verts, faces, albedo=albedo, roughness=0.6)

    spheres = make_scene(
        centers=[(-3.0, 2.0, -8.0), (3.0, 2.5, -12.0), (0.0, 9.0, -12.0)],
        radii=[1.2, 1.5, 2.0],
        albedos=[(0.9, 0.3, 0.3), (0.85, 0.85, 0.9), (0.0, 0.0, 0.0)],
        metallics=[0.0, 1.0, 0.0],
        roughnesses=[0.4, 0.05, 0.0],
        emissions=[(0, 0, 0), (0, 0, 0), (10.0, 10.0, 9.0)],
        background=(0.2, 0.3, 0.5),
    )
    return spheres, mesh


def cornell_box():
    """Cornell-style box as a TriangleMesh + a mirror/diffuse sphere pair.

    Returns (sphere_scene, mesh): render with
    ``render(sphere_scene, cam, ..., mesh=mesh)``.
    """
    from ..ops.triangle import merge_meshes, quad

    s = 2.0  # half-size
    white = dict(albedo=(0.73, 0.73, 0.73))
    red = dict(albedo=(0.65, 0.05, 0.05))
    green = dict(albedo=(0.12, 0.45, 0.15))
    z0, z1 = -1.0, -1.0 - 2 * s

    walls = [
        quad((-s, 0, z0), (-s, 0, z1), (-s, 2 * s, z1), (-s, 2 * s, z0),
             object_id=1, **red),                                   # left
        quad((s, 0, z1), (s, 0, z0), (s, 2 * s, z0), (s, 2 * s, z1),
             object_id=2, **green),                                 # right
        quad((-s, 0, z1), (-s, 0, z0), (s, 0, z0), (s, 0, z1),
             object_id=3, **white),                                 # floor
        quad((-s, 2 * s, z0), (-s, 2 * s, z1), (s, 2 * s, z1), (s, 2 * s, z0),
             object_id=4, **white),                                 # ceiling
        quad((-s, 0, z1), (s, 0, z1), (s, 2 * s, z1), (-s, 2 * s, z1),
             object_id=5, **white),                                 # back
        quad((-0.7, 2 * s - 0.01, z0 - s + 0.7), (0.7, 2 * s - 0.01, z0 - s + 0.7),
             (0.7, 2 * s - 0.01, z0 - s - 0.7), (-0.7, 2 * s - 0.01, z0 - s - 0.7),
             emission=(12.0, 12.0, 10.0), albedo=(0, 0, 0),
             object_id=6),                                          # light
    ]
    mesh = merge_meshes(walls)

    spheres = make_scene(
        centers=[(-0.8, 0.6, z0 - s - 0.5), (0.8, 0.5, z0 - s + 0.5)],
        radii=[0.6, 0.5],
        albedos=[(0.95, 0.95, 0.95), (0.8, 0.7, 0.3)],
        metallics=[1.0, 0.0],
        roughnesses=[0.02, 0.4],
        emissions=[(0, 0, 0), (0, 0, 0)],
        background=(0.0, 0.0, 0.0),
    )
    return spheres, mesh
