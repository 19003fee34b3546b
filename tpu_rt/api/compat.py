"""Drop-in replacement for the reference's pybind11 module surface.

Re-creates, class for class and method for method, the v1 binding the GUI was
written against (cpp_raytracer/binding.cpp:17-108): ``Vector3``, ``Ray``,
``Material``, ``Sphere`` (with ``.name``/``.hit``), ``Camera`` (with
``.target``/``.rotate``/``.move``/``.get_ray``), ``DebugInfo``, ``Scene``
(``.spheres``/``.background_color``/``.use_bvh``/``.debug_mode``/CRUD/
``.hit``/``.cast_ray_for_selection``) and ``RayTracer``
(``.set_scene``/``.render``/``.get_camera``/``.set_camera``/
``.select_object``/``.move_camera``/``.trace_ray``/``.set_debug_mode``/
``.get_debug_info``) — so code shaped like the reference's interaction.py
runs unchanged on the TPU backend.

These shells are thin: scene edits mutate plain Python objects; ``set_scene``
snapshots them into SoA device arrays (the copy-assign the C++ Scene does,
old/raytracer_core copy.cpp:69-90), and ``render`` drives the jitted TPU
pipeline. Sphere counts are bucketed so interactive add/remove never
recompiles (tpu_rt.core.types.sphere_bucket).
"""

from __future__ import annotations

import math

import jax
import numpy as np

from ..core import types as _T
from ..core.types import CameraP
from ..render import frame as _F


class Vector3:
    """Mutable 3-vector with the reference's full operator set
    (binding.cpp:18-41)."""

    __slots__ = ("x", "y", "z")

    def __init__(self, x: float = 0.0, y: float = 0.0, z: float = 0.0):
        self.x = float(x)
        self.y = float(y)
        self.z = float(z)

    # -- operators (binding.cpp:24-32) --
    def __add__(self, o):
        return Vector3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o):
        return Vector3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __mul__(self, o):
        if isinstance(o, Vector3):
            return Vector3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vector3(self.x * o, self.y * o, self.z * o)

    def __rmul__(self, s):
        return Vector3(self.x * s, self.y * s, self.z * s)

    def __truediv__(self, s):
        inv = 1.0 / s
        return Vector3(self.x * inv, self.y * inv, self.z * inv)

    def __neg__(self):
        return Vector3(-self.x, -self.y, -self.z)

    def __iadd__(self, o):
        self.x += o.x
        self.y += o.y
        self.z += o.z
        return self

    def __imul__(self, s):
        self.x *= s
        self.y *= s
        self.z *= s
        return self

    # -- methods (binding.cpp:34-38) --
    def dot(self, o) -> float:
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o) -> "Vector3":
        return Vector3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_squared(self) -> float:
        return self.x * self.x + self.y * self.y + self.z * self.z

    def length(self) -> float:
        return math.sqrt(self.length_squared())

    def normalize(self) -> "Vector3":
        n = self.length()
        if n > 0.0:
            inv = 1.0 / n
            return Vector3(self.x * inv, self.y * inv, self.z * inv)
        # v1 normalize returns self unchanged for zero vectors
        # (old/raytracer_core copy.h:81-88).
        return Vector3(self.x, self.y, self.z)

    def __repr__(self):
        return f"Vector3({self.x:.6f}, {self.y:.6f}, {self.z:.6f})"

    def to_array(self) -> np.ndarray:
        return np.array([self.x, self.y, self.z], np.float32)

    @staticmethod
    def from_array(a) -> "Vector3":
        a = np.asarray(a, float)
        return Vector3(float(a[0]), float(a[1]), float(a[2]))


class Ray:
    """Origin + normalized direction (binding.cpp:43-47)."""

    def __init__(self, origin: Vector3, direction: Vector3):
        self.origin = Vector3(origin.x, origin.y, origin.z)
        self.direction = direction.normalize()

    def at(self, t: float) -> Vector3:
        return self.origin + self.direction * t


class Material:
    """Albedo/metallic/roughness/emission/ior with reference defaults
    (raytracer_core.h:160-169, binding.cpp:49-55)."""

    def __init__(self):
        self.albedo = Vector3(0.8, 0.8, 0.8)
        self.metallic = 0.0
        self.roughness = 0.5
        self.emission = Vector3(0.0, 0.0, 0.0)
        self.ior = 1.5


class HitRecord:
    """Scalar hit record (old/raytracer_core copy.h:121-136)."""

    def __init__(self):
        self.t = 0.0
        self.point = Vector3()
        self.normal = Vector3()
        self.material = Material()
        self.front_face = True
        self.object_id = 0

    def set_face_normal(self, ray: Ray, outward_normal: Vector3):
        self.front_face = ray.direction.dot(outward_normal) < 0
        self.normal = outward_normal if self.front_face else outward_normal * -1.0


class Sphere:
    """Sphere with ``.name`` and scalar ``.hit`` (binding.cpp:57-64)."""

    def __init__(self):
        self.center = Vector3(0.0, 0.0, 0.0)
        self.radius = 1.0
        self.material = Material()
        self.object_id = 0
        self.name = ""

    def hit(self, ray: Ray, t_min: float, t_max: float, rec: HitRecord) -> bool:
        """Two-root quadratic test with face-normal flip
        (old/raytracer_core copy.cpp:21-52)."""
        oc = ray.origin - self.center
        a = ray.direction.dot(ray.direction)
        half_b = oc.dot(ray.direction)
        c = oc.dot(oc) - self.radius * self.radius
        disc = half_b * half_b - a * c
        if disc < 0:
            return False
        sqrtd = math.sqrt(disc)
        root = (-half_b - sqrtd) / a
        if root < t_min or root > t_max:
            root = (-half_b + sqrtd) / a
            if root < t_min or root > t_max:
                return False
        rec.t = root
        rec.point = ray.at(root)
        outward = (rec.point - self.center) * (1.0 / self.radius)
        rec.set_face_normal(ray, outward)
        rec.material = self.material
        rec.object_id = self.object_id
        return True


class Camera:
    """v1 camera: position/target/up/fov/aspect (binding.cpp:66-75)."""

    def __init__(self):
        self.position = Vector3(0.0, 2.0, 3.0)
        self.target = Vector3(0.0, 0.0, -3.0)
        self.up = Vector3(0.0, 1.0, 0.0)
        self.fov = 45.0
        self.aspect_ratio = 1.333
        # Thin-lens DOF (beyond-reference; 0 = reference pinhole behavior).
        self.aperture = 0.0
        self.focus_dist = 0.0

    def get_ray(self, u: float, v: float) -> Ray:
        """NDC (u-.5)*2 mapping (old/raytracer_core copy.h:160-184)."""
        ndc_x = (u - 0.5) * 2.0
        ndc_y = (0.5 - v) * 2.0
        tan_fov = math.tan(self.fov * 3.14159 / 360.0)
        forward = (self.target - self.position).normalize()
        right = forward.cross(Vector3(0, 1, 0)).normalize()
        if right.length() < 0.001:
            right = Vector3(1, 0, 0)
        up = right.cross(forward).normalize()
        direction = (
            forward
            + right * (ndc_x * self.aspect_ratio * tan_fov)
            + up * (ndc_y * tan_fov)
        )
        return Ray(self.position, direction)

    def move(self, delta: Vector3):
        self.position = self.position + delta

    def rotate(self, dx: float, dy: float):
        # Deliberate no-op, like the v1 core (old/raytracer_core
        # copy.h:190-201 recomputes and reassigns the same position);
        # rotation is done by the interaction layer's CameraController.
        pass

    def to_params(self) -> CameraP:
        return _T.make_camera(
            position=(self.position.x, self.position.y, self.position.z),
            target=(self.target.x, self.target.y, self.target.z),
            up=(self.up.x, self.up.y, self.up.z),
            fov=self.fov,
            aspect=self.aspect_ratio,
            aperture=getattr(self, "aperture", 0.0),
            focus_dist=getattr(self, "focus_dist", 0.0),
        )


class DebugInfo:
    """Build/render counters (old/raytracer_core copy.h:207-221,
    binding.cpp:77-82)."""

    def __init__(self):
        self.enable_debug = False
        self.build_count = 0
        self.render_count = 0

    def reset(self):
        self.build_count = 0
        self.render_count = 0

    def get_stats(self) -> str:
        return f"Builds: {self.build_count}, Renders: {self.render_count}"


class Scene:
    """Python-side scene container (binding.cpp:84-94).

    ``build_bvh`` marks the device snapshot dirty; the actual acceleration
    structure is (re)built lazily on device at the next render — scene edits
    never round-trip through host rebuilds (BASELINE.json north star).
    """

    def __init__(self):
        self.spheres: list[Sphere] = []
        self.background_color = Vector3(0.1, 0.1, 0.1)
        self.use_bvh = True
        self.debug_mode = False
        self._dirty = True
        self._build_count = 0

    def add_sphere(self, sphere: Sphere):
        self.spheres.append(sphere)
        self._dirty = True

    def remove_sphere(self, object_id: int):
        self.spheres = [s for s in self.spheres if s.object_id != object_id]
        self._dirty = True

    def build_bvh(self):
        self._dirty = True
        self._build_count += 1

    def hit(self, ray: Ray, t_min: float, t_max: float, rec: HitRecord) -> bool:
        """Sequential closest-so-far scan (old/raytracer_core copy.cpp:112-131)."""
        temp = HitRecord()
        found = False
        closest = t_max
        for s in self.spheres:
            if s.hit(ray, t_min, closest, temp):
                found = True
                closest = temp.t
                rec.t = temp.t
                rec.point = temp.point
                rec.normal = temp.normal
                rec.material = temp.material
                rec.front_face = temp.front_face
                rec.object_id = temp.object_id
        return found

    def cast_ray_for_selection(self, ray: Ray, t_min: float, t_max: float) -> int:
        """Closest object id, -1 on miss (old/raytracer_core copy.cpp:133-146)."""
        rec = HitRecord()
        selected = -1
        closest = t_max
        for s in self.spheres:
            if s.hit(ray, t_min, closest, rec):
                closest = rec.t
                selected = s.object_id
        return selected

    def to_arrays(self, capacity: int | None = None) -> _T.SphereScene:
        """Snapshot to the SoA device pytree (bucketed, see module doc)."""
        n = len(self.spheres)
        if n == 0:
            return _T.make_scene(
                centers=np.zeros((0, 3)), radii=[], albedos=np.zeros((0, 3)),
                metallics=[], roughnesses=[], emissions=np.zeros((0, 3)),
                background=self.background_color.to_array(), capacity=capacity,
            )
        return _T.make_scene(
            centers=[s.center.to_array() for s in self.spheres],
            radii=[s.radius for s in self.spheres],
            albedos=[s.material.albedo.to_array() for s in self.spheres],
            metallics=[s.material.metallic for s in self.spheres],
            roughnesses=[s.material.roughness for s in self.spheres],
            emissions=[s.material.emission.to_array() for s in self.spheres],
            iors=[s.material.ior for s in self.spheres],
            object_ids=[s.object_id for s in self.spheres],
            background=self.background_color.to_array(),
            capacity=capacity,
        )


class RayTracer:
    """Drop-in RayTracer service (binding.cpp:96-107).

    ``set_scene`` snapshots the scene (the C++ copy-assignment semantics,
    old/raytracer_core copy.cpp:69-90 — later Python-side edits are invisible
    until the next ``set_scene``). ``render`` runs the jitted TPU pipeline;
    successive calls advance a frame counter folded into the RNG key so
    progressive batches draw fresh samples.
    """

    def __init__(self, seed: int = 0, mode: str = "v2",
                 enable_refraction: bool = False, linear: bool = False,
                 nee: bool = False):
        self.camera = Camera()
        self.camera.position = Vector3(0, 2, 5)
        self.camera.target = Vector3(0, 0, -1)
        self.camera.fov = 45.0
        self._scene_snapshot = Scene()
        self._scene_arrays: _T.SphereScene | None = None
        self._key = jax.random.key(seed)
        self._seed_base = int(seed) + 1
        self._frame = 0
        self._mode = mode
        self._enable_refraction = enable_refraction
        # Beyond-reference: next-event estimation (direct light via shadow
        # rays). Fused into the megakernel (ops/pallas_megakernel.py) and
        # in the lax pipeline (ops/integrator.py); only the cluster engine
        # falls back to lax when on.
        self._nee = nee
        # Beyond-reference: R2 low-discrepancy pixel sampling
        # (render/frame.py stratify=True).
        self._stratify = False
        # linear=True returns pre-gamma radiance batches (for the app's
        # correct-averaging mode); False keeps the reference's sqrt-gamma'd
        # output contract
        self._linear = linear
        self._debug = DebugInfo()
        # Cached at set_scene time (host-side): avoids a device->host pull
        # of scene.valid on every render batch (steady-state interactive
        # loops stay transfer-free).
        self._n_active: int | None = None
        # Observability: engine + intersector the last render() resolved to.
        self._last_engine: str | None = None
        self._last_use_bvh: bool | None = None
        self._last_adaptive: bool = False
        # Per-static-config jitted batch steps (render_device): one
        # compiled computation -> one dispatch per interactive batch.
        self._jit_steps: dict = {}
        # Optional triangle mesh rendered alongside the sphere scene
        # (beyond-reference capability; the nearer surface wins per bounce).
        self._mesh = None
        self._n_tri_active: int | None = None

    # -- scene ----------------------------------------------------------
    def set_scene(self, scene: Scene):
        snap = Scene()
        snap.background_color = Vector3(
            scene.background_color.x, scene.background_color.y,
            scene.background_color.z,
        )
        snap.use_bvh = scene.use_bvh
        snap.debug_mode = scene.debug_mode
        for s in scene.spheres:
            c = Sphere()
            c.center = Vector3(s.center.x, s.center.y, s.center.z)
            c.radius = s.radius
            m = Material()
            m.albedo = Vector3(s.material.albedo.x, s.material.albedo.y,
                               s.material.albedo.z)
            m.metallic = s.material.metallic
            m.roughness = s.material.roughness
            m.emission = Vector3(s.material.emission.x, s.material.emission.y,
                                 s.material.emission.z)
            m.ior = s.material.ior
            c.material = m
            c.object_id = s.object_id
            c.name = s.name
            snap.spheres.append(c)
        self._scene_snapshot = snap
        self._scene_arrays = snap.to_arrays()
        self._n_active = _F.quantize_count(
            len(snap.spheres), self._scene_arrays.capacity)
        self._debug.build_count += 1

    def set_mesh(self, mesh) -> None:
        """Attach (or clear, with None) a TriangleMesh (ops.triangle) to be
        rendered alongside the sphere scene. Engine selection accounts for
        it: large meshes route to the Pallas cluster engine."""
        self._mesh = mesh
        if mesh is None:
            self._n_tri_active = None
        else:
            n = int(np.asarray(mesh.valid).sum())
            self._n_tri_active = _F.quantize_count(n, mesh.capacity)

    # -- camera ---------------------------------------------------------
    def get_camera(self) -> Camera:
        c = Camera()
        c.position = Vector3(self.camera.position.x, self.camera.position.y,
                             self.camera.position.z)
        c.target = Vector3(self.camera.target.x, self.camera.target.y,
                           self.camera.target.z)
        c.up = Vector3(self.camera.up.x, self.camera.up.y, self.camera.up.z)
        c.fov = self.camera.fov
        c.aspect_ratio = self.camera.aspect_ratio
        c.aperture = getattr(self.camera, "aperture", 0.0)
        c.focus_dist = getattr(self.camera, "focus_dist", 0.0)
        return c

    def set_camera(self, cam: Camera):
        self.camera = cam

    def move_camera(self, delta: Vector3):
        self.camera.move(delta)

    # -- rendering ------------------------------------------------------
    def render(self, width: int, height: int, samples_per_pixel: int,
               max_depth: int) -> np.ndarray:
        """One progressive batch; flat (h*w*3,) float32 like the v1 binding
        (old/raytracer_core copy.h:262 returns vector<double>)."""
        img = self.render_device(width, height, samples_per_pixel, max_depth)
        if img is None:
            return np.zeros((width * height * 3,), np.float32)
        return np.asarray(img).reshape(-1)

    def render_device(self, width: int, height: int, samples_per_pixel: int,
                      max_depth: int, tile_mask=None):
        """Same batch as :meth:`render` but returned as the DEVICE-resident
        (h, w, 3) array (or None for an empty scene) — the interactive loop
        accumulates and post-processes on device and pulls one stacked
        display frame per batch (render/display.py), instead of the
        reference's pull-per-batch (interaction.py:1294-1306).

        ``tile_mask`` (adaptive sampling, megakernel engine only): int32
        (n_tiles,) — tiles with 0 are skipped at ~zero cost and return
        zeros; merge with render/frame.accumulate_tiled. Ignored (with
        ``_last_adaptive = False``) when the batch resolves to another
        engine."""
        self.camera.aspect_ratio = width / height
        if self._scene_arrays is None or not self._scene_snapshot.spheres:
            return None
        # host-side seed arithmetic: no device round-trips per batch; the
        # lax engine still gets a properly folded key
        seed = (self._seed_base * 1000003 + self._frame) & 0x7FFFFFFF
        key = jax.random.key(seed)
        self._frame += 1
        # Honor the scene's use_bvh flag (old/binding copy.cpp:88 — the
        # reference flag switches Scene::hit between BVH and brute force,
        # old/raytracer_core copy.cpp:112-131): the lax engine swaps its
        # dense sweeps for LBVH traversal; the megakernel's fused unroll is
        # already the accelerated path at its scene sizes.
        use_bvh = bool(self._scene_snapshot.use_bvh)
        # Resolve the engine ONCE and force it through render(), so the
        # observability fields can never diverge from the engine actually
        # used (select_engine is deterministic in these arguments). NEE is
        # fused into all three engines (round 4 closed the feature matrix),
        # so no flag combination downgrades the engine.
        engine = _F.select_engine(
            self._scene_arrays, self._mode, self._enable_refraction,
            not self._linear, self._mesh, "auto")
        self._last_engine = engine
        self._last_use_bvh = use_bvh and engine == "lax"
        self._last_adaptive = tile_mask is not None and engine == "pallas"
        if not self._last_adaptive:
            tile_mask = None
        statics = dict(
            width=width, height=height, spp=samples_per_pixel,
            max_depth=max_depth, mode=self._mode,
            enable_refraction=self._enable_refraction,
            gamma=not self._linear, use_bvh=use_bvh,
            n_active=self._n_active, n_tri_active=self._n_tri_active,
            engine=engine, nee=self._nee, stratify=self._stratify,
            # resolved host-side so the jitted step stays static
            enable_dof=float(getattr(self.camera, "aperture", 0.0)
                             or 0.0) > 0.0,
        )
        if engine in ("pallas", "lax"):
            # One compiled computation per static config: an interactive
            # batch is ONE dispatch over the tunneled chip instead of a
            # dozen eager ops (camera packing, seed arrays, reshapes each
            # pay the host<->device RTT; measured ~2x lower batch latency
            # at the reference's 640x480 interactive workload). The
            # cluster engine stays eager: its memoized prebuilt tables
            # must enter the computation as concrete parameters
            # (ops/pallas_cluster.ensure_distinct_tables).
            ck = (tuple(sorted(statics.items())), self._mesh is not None,
                  tile_mask is not None)
            fn = self._jit_steps.get(ck)
            if fn is None:
                if tile_mask is None:
                    def fn(sa, cp, seed32, mesh, _st=dict(statics)):
                        return _F.render(sa, cp, jax.random.key(seed32),
                                         seed=seed32, mesh=mesh, **_st)
                else:
                    def fn(sa, cp, seed32, mesh, mask, _st=dict(statics)):
                        return _F.render(sa, cp, jax.random.key(seed32),
                                         seed=seed32, mesh=mesh,
                                         tile_mask=mask, **_st)
                fn = jax.jit(fn, static_argnames=())
                self._jit_steps[ck] = fn
            args = [self._scene_arrays, self.camera.to_params(),
                    np.int32(seed), self._mesh]
            if tile_mask is not None:
                args.append(tile_mask)
            img = fn(*args)
        else:
            img = _F.render(
                self._scene_arrays, self.camera.to_params(), key,
                seed=seed, mesh=self._mesh, tile_mask=tile_mask, **statics)
        self._debug.render_count += 1
        return img

    def trace_ray(self, ray: Ray, depth: int, max_depth: int) -> Vector3:
        """Single-ray radiance estimate (binding.cpp:105)."""
        from ..ops.integrator import trace

        if self._scene_arrays is None:
            return Vector3(0, 0, 0)
        o = np.array([[ray.origin.x, ray.origin.y, ray.origin.z]], np.float32)
        d = np.array([[ray.direction.x, ray.direction.y, ray.direction.z]],
                     np.float32)
        key = jax.random.fold_in(self._key, self._frame)
        self._frame += 1
        c = np.asarray(trace(self._scene_arrays, o, d, key, max_depth=max_depth,
                             mode=self._mode,
                             enable_refraction=self._enable_refraction))[0]
        return Vector3(float(c[0]), float(c[1]), float(c[2]))

    def select_object(self, x: float, y: float, width: int, height: int) -> int:
        """Raycast selection through the camera
        (old/raytracer_core copy.cpp:245-248)."""
        ray = self.camera.get_ray(x, y)
        return self._scene_snapshot.cast_ray_for_selection(ray, 0.001, 1000.0)

    # -- debug ----------------------------------------------------------
    def set_nee(self, enable: bool):
        """Toggle next-event estimation (beyond-reference; see __init__)."""
        self._nee = bool(enable)

    def set_stratify(self, enable: bool):
        """Toggle stratified (R2 low-discrepancy) pixel sampling
        (beyond-reference; render/frame.py ``stratify``)."""
        self._stratify = bool(enable)

    def set_debug_mode(self, enable: bool):
        self._debug.enable_debug = enable

    def get_debug_info(self) -> DebugInfo:
        return self._debug
