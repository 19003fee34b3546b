"""Independent scalar NumPy oracle.

A deliberately naive re-statement of the reference algorithms (scalar loops,
sequential closest-so-far updates) used to validate the vectorized JAX
implementations. Mirrors, without copying, the C++ semantics:
  * Sphere::intersect        cpp_raytracer/raytracer_core.h:192-215
  * brute-force scene loop   cpp_raytracer/raytracer_core.cpp:252-270
  * v1 Camera::get_ray       old/raytracer_core copy.h:160-184
"""

from __future__ import annotations

import math

import numpy as np

T_MIN, T_MAX = 1e-3, 1e10
REF_PI = 3.14159


def sphere_hit(center, radius, o, d, t_min, t_max):
    """Nearest root in [t_min, t_max] or None (two-root quadratic test)."""
    oc = o - center
    a = float(np.dot(d, d))
    half_b = float(np.dot(oc, d))
    c = float(np.dot(oc, oc)) - radius * radius
    disc = half_b * half_b - a * c
    if disc < 0:
        return None
    sq = math.sqrt(disc)
    root = (-half_b - sq) / a
    if root < t_min or root > t_max:
        root = (-half_b + sq) / a
        if root < t_min or root > t_max:
            return None
    return root


def scene_hit(centers, radii, o, d, t_min=T_MIN, t_max=T_MAX):
    """Sequential closest-so-far scan. Returns (index, t) or (None, None)."""
    closest = t_max
    best = None
    for i in range(len(radii)):
        t = sphere_hit(centers[i], radii[i], o, d, t_min, closest)
        if t is not None:
            closest = t
            best = i
    return best, (closest if best is not None else None)


def normalize(v):
    n = np.linalg.norm(v)
    if n == 0:
        return np.array([0.0, 0.0, 1.0])
    return v / n


def camera_ray(position, target, u, v, fov_deg, aspect):
    """v1 get_ray: ndc = (u-.5)*2 / (.5-v)*2, basis from target."""
    ndc_x = (u - 0.5) * 2.0
    ndc_y = (0.5 - v) * 2.0
    tan_fov = math.tan(fov_deg * REF_PI / 360.0)
    forward = normalize(np.asarray(target, float) - np.asarray(position, float))
    right = np.cross(forward, [0.0, 1.0, 0.0])
    if np.linalg.norm(right) < 1e-3:
        right = np.array([1.0, 0.0, 0.0])
    else:
        right = normalize(right)
    up = normalize(np.cross(right, forward))
    direction = normalize(
        forward + right * (ndc_x * aspect * tan_fov) + up * (ndc_y * tan_fov)
    )
    return np.asarray(position, float), direction


def render_depth1(scene_rows, background, position, target, fov, width, height):
    """Deterministic depth-1 render at pixel centers (hit->emission,
    miss->background), sqrt-gamma'd and clamped — the golden-image oracle."""
    img = np.zeros((height, width, 3))
    aspect = width / height
    centers = np.array([r["center"] for r in scene_rows])
    radii = np.array([r["radius"] for r in scene_rows])
    emissions = np.array([r.get("emission", (0, 0, 0)) for r in scene_rows])
    for j in range(height):
        for i in range(width):
            u = (i + 0.5) / width
            v = (j + 0.5) / height
            o, d = camera_ray(position, target, u, v, fov, aspect)
            idx, _t = scene_hit(centers, radii, o, d)
            col = np.asarray(background, float) if idx is None else emissions[idx]
            img[j, i] = np.clip(np.sqrt(np.maximum(col, 0.0)), 0.0, 1.0)
    return img
