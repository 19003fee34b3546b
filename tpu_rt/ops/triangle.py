"""Triangle meshes: SoA type + MXU-decomposed Moller-Trumbore intersection.

Extends the framework beyond the reference's sphere-only scenes to the
triangle-mesh target (BASELINE.json config #2: "triangle-mesh scene with BVH
traversal parity"). The reference's bvh.cpp carries a templated traversal
intended for exactly this generalization (BVHTraversal::intersect,
cpp_raytracer/bvh.cpp:133-195, never wired in); here it is first-class.

TPU-native trick: every Moller-Trumbore determinant is a scalar triple
product, and triple products are *bilinear* in (ray) x (triangle). With
per-triangle constants precomputed once —

    N      = e1 x e2          (unnormalized geometric normal)
    e2xv0  = e2 x v0
    e1xv0  = e1 x v0
    v0N    = v0 . N

— the whole (R rays x T triangles) test reduces to five (R,3)@(3,T) matmuls:

    det =  -(D @ N')
    t_n =   O @ N' - v0N              (t = t_n / det)
    u_n =  (O x D) @ e2' - D @ e2xv0' (u = u_n / det)
    v_n = -(O x D) @ e1' + D @ e1xv0' (v = v_n / det)

plus VPU elementwise for the division and the u/v/t window tests. No
per-pair 3-vectors are ever materialized. Winner attributes come from the
same one-hot matmul fetch as spheres (tpu_rt.ops.intersect).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import T_MAX, T_MIN

HIGHEST = jax.lax.Precision.HIGHEST

# Minimum padded triangle bucket (lane-friendly).
MIN_TRI_BUCKET = 128
# MT determinant cutoff for parallel rays.
DET_EPS = 1e-9


class TriangleMesh(NamedTuple):
    """SoA triangle soup, padded to a static bucket. Per-triangle material
    (same Material fields as spheres, raytracer_core.h:160-169)."""

    v0: jnp.ndarray         # (T, 3)
    e1: jnp.ndarray         # (T, 3)  v1 - v0
    e2: jnp.ndarray         # (T, 3)  v2 - v0
    normal: jnp.ndarray     # (T, 3)  normalize(e1 x e2)
    albedo: jnp.ndarray     # (T, 3)
    metallic: jnp.ndarray   # (T,)
    roughness: jnp.ndarray  # (T,)
    emission: jnp.ndarray   # (T, 3)
    ior: jnp.ndarray        # (T,)
    object_id: jnp.ndarray  # (T,) i32
    valid: jnp.ndarray      # (T,) bool

    @property
    def capacity(self) -> int:
        return self.v0.shape[0]


def tri_bucket(n: int) -> int:
    cap = MIN_TRI_BUCKET
    while cap < n:
        cap *= 2
    return cap


def make_mesh(
    vertices,
    faces,
    albedo=(0.8, 0.8, 0.8),
    metallic=0.0,
    roughness=0.5,
    emission=(0.0, 0.0, 0.0),
    ior=1.5,
    object_id=0,
    capacity: int | None = None,
) -> TriangleMesh:
    """Build a padded TriangleMesh from (V,3) vertices and (F,3) int faces.

    Scalar material values broadcast to all faces; per-face arrays are also
    accepted.
    """
    vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
    faces = np.asarray(faces, np.int64).reshape(-1, 3)
    n = faces.shape[0]
    cap = capacity if capacity is not None else tri_bucket(n)
    if cap < n:
        raise ValueError(f"capacity {cap} < face count {n}")

    tri = vertices[faces]            # (F, 3, 3)
    v0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    nrm = np.cross(e1, e2)
    ln = np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = np.where(ln > 0, nrm / np.maximum(ln, 1e-20), [0.0, 0.0, 1.0])

    def pad3(x, fill=0.0):
        x = np.broadcast_to(np.asarray(x, np.float32), (n, 3))
        out = np.full((cap, 3), fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    def pad1(x, fill=0.0, dtype=np.float32):
        x = np.broadcast_to(np.asarray(x, dtype), (n,))
        out = np.full((cap,), fill, dtype)
        out[:n] = x
        return jnp.asarray(out)

    valid = np.zeros((cap,), bool)
    valid[:n] = True
    return TriangleMesh(
        v0=pad3(v0), e1=pad3(e1), e2=pad3(e2), normal=pad3(nrm),
        albedo=pad3(albedo), metallic=pad1(metallic),
        roughness=pad1(roughness), emission=pad3(emission),
        ior=pad1(ior, fill=1.5),
        object_id=pad1(object_id, fill=-1, dtype=np.int32),
        valid=jnp.asarray(valid),
    )


def merge_meshes(meshes: list[TriangleMesh],
                 capacity: int | None = None) -> TriangleMesh:
    """Concatenate meshes into one padded soup (for multi-object scenes)."""
    counts = [int(np.asarray(m.valid).sum()) for m in meshes]
    total = sum(counts)
    cap = capacity if capacity is not None else tri_bucket(total)
    fields = {}
    for name in TriangleMesh._fields:
        parts = [np.asarray(getattr(m, name))[: c]
                 for m, c in zip(meshes, counts)]
        cat = np.concatenate(parts, axis=0)
        shape = (cap,) + cat.shape[1:]
        fill = False if name == "valid" else (-1 if name == "object_id" else 0)
        out = np.full(shape, fill, cat.dtype)
        out[:total] = cat
        fields[name] = jnp.asarray(out)
    return TriangleMesh(**fields)


def tri_attribute_matrix(mesh: TriangleMesh) -> jnp.ndarray:
    """Packed (T, 16) attribute matrix for the one-hot winner fetch.

    Columns: normal xyz, albedo rgb, metallic, roughness, emission rgb, ior,
    object_id, pad x3.
    """
    zeros = jnp.zeros_like(mesh.ior)[:, None]
    return jnp.concatenate(
        [
            mesh.normal,                                   # 0:3
            mesh.albedo,                                   # 3:6
            mesh.metallic[:, None],                        # 6
            mesh.roughness[:, None],                       # 7
            mesh.emission,                                 # 8:11
            mesh.ior[:, None],                             # 11
            mesh.object_id.astype(jnp.float32)[:, None],   # 12
            zeros, zeros, zeros,                           # 13:16 pad
        ],
        axis=-1,
    )


def triangle_ts(
    mesh: TriangleMesh,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min: float = T_MIN,
    t_max: float = T_MAX,
) -> jnp.ndarray:
    """Hit parameter per (ray, triangle) via the matmul decomposition;
    T_MAX where no hit. origins/directions: (R, 3) -> (R, T)."""
    N = jnp.cross(mesh.e1, mesh.e2)            # (T, 3) unnormalized
    e2xv0 = jnp.cross(mesh.e2, mesh.v0)
    e1xv0 = jnp.cross(mesh.e1, mesh.v0)
    v0N = jnp.sum(mesh.v0 * N, axis=-1)        # (T,)

    oxd = jnp.cross(origins, directions)       # (R, 3)

    def mm(a, b):
        return jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                       precision=HIGHEST)

    det = -mm(directions, N)                   # (R, T)
    t_num = mm(origins, N) - v0N[None, :]
    u_num = mm(oxd, mesh.e2) - mm(directions, e2xv0)
    v_num = -mm(oxd, mesh.e1) + mm(directions, e1xv0)

    ok_det = jnp.abs(det) > DET_EPS
    inv = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
    t = t_num * inv
    u = u_num * inv
    v = v_num * inv

    ok = (
        ok_det
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= t_min) & (t <= t_max)
        & mesh.valid[None, :]
    )
    return jnp.where(ok, t, T_MAX)


def intersect_mesh_brute(
    mesh: TriangleMesh,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min: float = T_MIN,
    t_max: float = T_MAX,
    attr: jnp.ndarray | None = None,
):
    """Closest triangle hit with one-hot attribute fetch.

    Returns the same Hit SoA as sphere intersection (tpu_rt.ops.intersect);
    the normal is the face normal flipped to oppose the ray (triangles have
    no interior, so ray-opposing orientation is the standard choice).
    """
    from .intersect import Hit, _first_hit_onehot

    if attr is None:
        attr = tri_attribute_matrix(mesh)
    ts = triangle_ts(mesh, origins, directions, t_min, t_max)
    t = jnp.min(ts, axis=-1)
    hit = t < T_MAX
    sel = _first_hit_onehot(ts, t)
    fetched = jnp.dot(sel, attr, preferred_element_type=jnp.float32,
                      precision=HIGHEST)

    n = fetched[:, 0:3]
    facing = jnp.sum(n * directions, axis=-1, keepdims=True) < 0.0
    n = jnp.where(facing, n, -n)

    return Hit(
        hit=hit,
        t=jnp.where(hit, t, T_MAX),
        normal=n,
        albedo=fetched[:, 3:6],
        metallic=fetched[:, 6],
        roughness=fetched[:, 7],
        emission=fetched[:, 8:11],
        ior=fetched[:, 11],
        object_id=jnp.where(hit, fetched[:, 12], -1.0),
    )


def mesh_lbvh(mesh: TriangleMesh):
    """LBVH over triangles (centroid Morton order, tri AABBs)."""
    from .bvh import build_lbvh

    tri_min = jnp.minimum(mesh.v0,
                          jnp.minimum(mesh.v0 + mesh.e1, mesh.v0 + mesh.e2))
    tri_max = jnp.maximum(mesh.v0,
                          jnp.maximum(mesh.v0 + mesh.e1, mesh.v0 + mesh.e2))
    centroid = (tri_min + tri_max) * 0.5
    return build_lbvh(centroid, tri_min, tri_max, mesh.valid)


def triangle_leaf_fn(mesh: TriangleMesh, prim_index):
    """Scalar MT test for one sorted leaf (for bvh.traverse)."""
    def leaf_t(slot, o, d, cur_t, t_min=T_MIN):
        idx = prim_index[slot]
        i = jnp.maximum(idx, 0)
        v0, e1, e2 = mesh.v0[i], mesh.e1[i], mesh.e2[i]
        pvec = jnp.cross(d, e2)
        det = jnp.sum(e1 * pvec)
        ok = (jnp.abs(det) > DET_EPS) & (idx >= 0)
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tvec = o - v0
        u = jnp.sum(tvec * pvec) * inv
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(d * qvec) * inv
        t = jnp.sum(e2 * qvec) * inv
        ok &= (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        ok &= (t >= t_min) & (t <= cur_t)
        return jnp.where(ok, t, T_MAX)

    return leaf_t


def intersect_mesh_bvh(mesh: TriangleMesh, bvh, origins, directions):
    """BVH-accelerated closest triangle: (t, original tri index) per ray."""
    from .bvh import traverse

    leaf_fn = triangle_leaf_fn(mesh, bvh.prim_index)
    t, slot = traverse(bvh, origins, directions, leaf_fn, T_MIN, T_MAX)
    prim = jnp.where(slot >= 0, bvh.prim_index[jnp.maximum(slot, 0)], -1)
    hit = (t < T_MAX) & (prim >= 0)
    return jnp.where(hit, t, T_MAX), jnp.where(hit, prim, -1)


def intersect_mesh_bvh_hit(mesh: TriangleMesh, bvh, origins, directions):
    """BVH-accelerated closest triangle hit returning the same Hit SoA as
    intersect_mesh_brute — the drop-in mesh intersector for the integrator's
    ``use_bvh`` path (the generalization the reference's templated
    BVHTraversal::intersect was written for, cpp_raytracer/bvh.cpp:133-195,
    but never wired in).

    Attribute fetch is a per-ray gather on the winning triangle index:
    O(1) per ray, appropriate past the brute-force crossover where the
    one-hot (R, T) matmul would dominate.
    """
    from .intersect import Hit

    t, prim = intersect_mesh_bvh(mesh, bvh, origins, directions)
    hit = prim >= 0
    idx = jnp.maximum(prim, 0)
    n = mesh.normal[idx]
    facing = jnp.sum(n * directions, axis=-1, keepdims=True) < 0.0
    n = jnp.where(facing, n, -n)
    return Hit(
        hit=hit,
        t=jnp.where(hit, t, T_MAX),
        normal=n,
        albedo=mesh.albedo[idx],
        metallic=mesh.metallic[idx],
        roughness=mesh.roughness[idx],
        emission=mesh.emission[idx],
        ior=mesh.ior[idx],
        object_id=jnp.where(hit, mesh.object_id[idx].astype(jnp.float32),
                            -1.0),
    )


# ---------------------------------------------------------------------------
# mesh factories (test/demo geometry)
# ---------------------------------------------------------------------------

def quad(p0, p1, p2, p3, **mat) -> TriangleMesh:
    """Two-triangle quad with corners in winding order."""
    verts = np.asarray([p0, p1, p2, p3], np.float32)
    return make_mesh(verts, [[0, 1, 2], [0, 2, 3]], **mat)


def box(center=(0, 0, 0), size=(1, 1, 1), **mat) -> TriangleMesh:
    """Axis-aligned box, 12 triangles, outward winding."""
    c = np.asarray(center, np.float32)
    h = np.asarray(size, np.float32) / 2
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)], np.float32)
    verts = c + corners * h
    # faces as corner indices (bit pattern: x*4 + y*2 + z), outward normals
    f = [
        (0, 1, 3, 2), (4, 6, 7, 5),  # -x, +x
        (0, 4, 5, 1), (2, 3, 7, 6),  # -y, +y
        (0, 2, 6, 4), (1, 5, 7, 3),  # -z, +z
    ]
    faces = []
    for a, b, cc, d in f:
        faces += [[a, b, cc], [a, cc, d]]
    return make_mesh(verts, faces, **mat)
