"""Drop-in v1 API surface tests — exercises exactly the calls
interaction.py/gui.py make against the pybind11 module (binding.cpp:17-108)."""

import numpy as np

from tpu_rt.api import (
    Camera, DebugInfo, HitRecord, Material, Ray, RayTracer, Scene, Sphere,
    Vector3,
)


def build_demo_scene() -> Scene:
    """Reconstruct the interactive scene the way SceneManager does
    (interaction.py:293-355) — through the public API only."""
    scene = Scene()
    scene.background_color = Vector3(0.05, 0.05, 0.1)

    ground_material = Material()
    ground_material.albedo = Vector3(0.9, 0.9, 0.9)
    ground = Sphere()
    ground.center = Vector3(0, -100.5, 0)
    ground.radius = 100.0
    ground.material = ground_material
    ground.object_id = 0
    ground.name = "Ground"
    scene.add_sphere(ground)

    rows = [
        {"pos": (-2.0, 0.5, -3.0), "color": (0.9, 0.1, 0.1), "metal": 0.9,
         "rough": 0.1, "radius": 0.5, "name": "Red Metallic"},
        {"pos": (0.0, 0.5, -3.0), "color": (0.1, 0.9, 0.1), "metal": 0.0,
         "rough": 0.3, "radius": 0.5, "name": "Green Dielectric"},
        {"pos": (0, 3, -1), "color": (1, 1, 1), "emission": (10, 10, 8),
         "metal": 0.0, "rough": 0.1, "radius": 0.3, "name": "Main Light"},
    ]
    for i, data in enumerate(rows, 1):
        material = Material()
        material.albedo = Vector3(*data["color"])
        material.metallic = data["metal"]
        material.roughness = data["rough"]
        if "emission" in data:
            material.emission = Vector3(*data["emission"])
        sphere = Sphere()
        sphere.center = Vector3(*data["pos"])
        sphere.radius = data["radius"]
        sphere.material = material
        sphere.object_id = i
        sphere.name = data["name"]
        scene.add_sphere(sphere)
    scene.build_bvh()
    return scene


def test_vector3_operator_set():
    a, b = Vector3(1, 2, 3), Vector3(4, 5, 6)
    assert (a + b).x == 5 and (b - a).z == 3
    assert (a * 2.0).y == 4 and (2.0 * a).y == 4
    assert (a * b).x == 4  # hadamard
    assert (b / 2).x == 2
    assert (-a).x == -1
    c = Vector3(1, 1, 1)
    c += a
    assert c.y == 3
    c *= 2.0
    assert c.z == 8
    assert a.dot(b) == 32
    assert a.cross(b).x == 2 * 6 - 3 * 5
    assert abs(Vector3(3, 4, 0).length() - 5) < 1e-12
    n = Vector3(0, 0, 5).normalize()
    assert n.z == 1.0
    assert "Vector3(" in repr(a)


def test_ray_normalizes_and_at():
    r = Ray(Vector3(0, 0, 0), Vector3(0, 0, -5))
    assert abs(r.direction.z + 1.0) < 1e-12
    assert r.at(3.0).z == -3.0


def test_material_defaults():
    m = Material()
    assert m.albedo.x == 0.8 and m.metallic == 0.0 and m.roughness == 0.5
    assert m.emission.length() == 0.0 and m.ior == 1.5


def test_sphere_hit_face_normal():
    s = Sphere()
    s.center = Vector3(0, 0, -3)
    rec = HitRecord()
    assert s.hit(Ray(Vector3(0, 0, 0), Vector3(0, 0, -1)), 1e-3, 1e10, rec)
    assert abs(rec.t - 2.0) < 1e-9
    assert rec.front_face and abs(rec.normal.z - 1.0) < 1e-9
    # from inside: flipped
    rec2 = HitRecord()
    assert s.hit(Ray(Vector3(0, 0, -3), Vector3(0, 0, -1)), 1e-3, 1e10, rec2)
    assert not rec2.front_face


def test_camera_get_ray_center():
    cam = Camera()
    cam.position = Vector3(0, 0, 0)
    cam.target = Vector3(0, 0, -1)
    r = cam.get_ray(0.5, 0.5)
    assert abs(r.direction.z + 1) < 1e-9
    cam.rotate(10, 10)  # no-op like v1
    assert cam.position.x == 0
    cam.move(Vector3(1, 0, 0))
    assert cam.position.x == 1


def test_scene_crud_and_selection():
    scene = build_demo_scene()
    assert len(scene.spheres) == 4
    scene.remove_sphere(2)
    assert len(scene.spheres) == 3
    assert all(s.object_id != 2 for s in scene.spheres)
    # selection ray toward red metallic
    origin = Vector3(0, 2, 5)
    direction = (Vector3(-2, 0.5, -3) - origin).normalize()
    assert scene.cast_ray_for_selection(Ray(origin, direction), 1e-3, 1000) == 1
    rec = HitRecord()
    assert scene.hit(Ray(origin, direction), 1e-3, 1e10, rec)
    assert rec.object_id == 1


def test_raytracer_render_like_interaction_py():
    """The exact call shape of the render worker (interaction.py:1293-1306)."""
    rt = RayTracer()
    scene = build_demo_scene()
    rt.set_scene(scene)
    cam = rt.get_camera()
    cam.position = Vector3(0, 2, 5)
    cam.target = Vector3(0, 0, -1)
    cam.up = Vector3(0, 1, 0)
    cam.fov = 45.0
    rt.set_camera(cam)

    w, h = 40, 30
    result = rt.render(w, h, 2, 3)
    batch = np.array(result, dtype=np.float32).reshape((h, w, 3))
    assert batch.min() >= 0 and batch.max() <= 1
    # successive batches draw fresh samples
    batch2 = np.array(rt.render(w, h, 2, 3), np.float32).reshape((h, w, 3))
    assert not np.array_equal(batch, batch2)
    assert rt.get_debug_info().render_count == 2

    # edits after set_scene are invisible until the next set_scene
    # (C++ copy semantics, old/raytracer_core copy.cpp:69-90)
    scene.spheres[1].material.albedo = Vector3(0, 0, 0)
    assert rt._scene_snapshot.spheres[1].material.albedo.x == 0.9


def test_raytracer_empty_scene_black():
    rt = RayTracer()
    rt.set_scene(Scene())
    out = rt.render(8, 8, 1, 2)
    assert out.shape == (8 * 8 * 3,)
    assert out.max() == 0.0


def test_raytracer_select_and_trace():
    rt = RayTracer()
    rt.set_scene(build_demo_scene())
    cam = rt.get_camera()
    cam.aspect_ratio = 4 / 3
    rt.set_camera(cam)
    # Main light at (0,3,-1): find its screen position by projection through
    # get_ray search — simpler: ray straight at it from camera
    rid = rt.select_object(0.5, 0.5, 640, 480)
    assert rid in (-1, 0, 1, 2, 3)  # valid id or miss
    # trace_ray toward the light sphere: expect bright emission
    origin = Vector3(0, 2, 5)
    direction = (Vector3(0, 3, -1) - origin).normalize()
    c = rt.trace_ray(Ray(origin, direction), 4, 4)
    assert c.x > 5.0  # emission (10,10,8) dominates


def test_debug_info():
    d = DebugInfo()
    d.build_count = 3
    d.render_count = 2
    assert d.get_stats() == "Builds: 3, Renders: 2"
    d.reset()
    assert d.get_stats() == "Builds: 0, Renders: 0"


def test_add_remove_stays_in_bucket_no_recompile():
    rt = RayTracer()
    scene = build_demo_scene()
    rt.set_scene(scene)
    rt.render(8, 8, 1, 2)
    cap0 = rt._scene_arrays.capacity
    s = Sphere()
    s.center = Vector3(0, 2, -3)
    s.object_id = 99
    scene.add_sphere(s)
    rt.set_scene(scene)
    assert rt._scene_arrays.capacity == cap0  # same bucket
    rt.render(8, 8, 1, 2)


def test_use_bvh_flag_switches_intersector_same_image():
    """Scene.use_bvh is honored end-to-end (old/binding copy.cpp:88): the
    intersector switches, the image does not change (same RNG stream)."""
    import numpy as np

    imgs = {}
    for flag in (True, False):
        rt = RayTracer(seed=7)
        scene = build_demo_scene()
        scene.use_bvh = flag
        rt.set_scene(scene)
        imgs[flag] = rt.render(16, 16, 2, 3)
        # On the CPU test backend the lax engine runs; use_bvh must reach it.
        assert rt._last_engine == "lax"
        assert rt._last_use_bvh is flag
    a, b = imgs[True], imgs[False]
    assert (np.abs(a - b) < 1e-3).mean() > 0.995


def test_set_scene_caches_quantized_active_count():
    """The quantized n_active is computed once at set_scene (no per-batch
    device->host pull of scene.valid)."""
    rt = RayTracer()
    scene = build_demo_scene()
    rt.set_scene(scene)
    n = len(scene.spheres)
    expect = min(rt._scene_arrays.capacity, -4 * (-n // 4))
    assert rt._n_active == expect


def test_nee_keeps_resolved_engine(monkeypatch):
    """Round-5 regression: render_device must NOT downgrade nee=True off
    the cluster engine (NEE is fused into all three engines since round
    4; a leftover app-layer fallback reintroduced the ~40x lax cliff for
    every interactive NEE batch past 64 spheres)."""
    from tpu_rt.render import frame as fr

    rt = RayTracer(seed=3)
    rt.set_nee(True)
    scene = Scene()
    for i in range(70):  # past the 64-sphere megakernel bucket
        s = Sphere()
        s.center = Vector3((i % 10) - 5.0, 0.5, -3.0 - i // 10)
        s.radius = 0.4
        s.object_id = i
        scene.add_sphere(s)
    rt.set_scene(scene)

    monkeypatch.setattr(fr, "_on_tpu", lambda s: True)
    seen = {}

    def fake_render(*a, **kw):
        seen.update(kw)
        return np.zeros((8, 8, 3), np.float32)

    monkeypatch.setattr(fr, "render", fake_render)
    rt.render_device(8, 8, 1, 2)
    assert rt._last_engine == "cluster"
    assert seen.get("engine") == "cluster"
    assert seen.get("nee") is True
