"""OBJ import/export round-trips and render integration."""

import numpy as np

import tpu_rt
from tpu_rt.utils.objio import load_obj, save_obj

OBJ = """\
# two-object test file
mtllib test.mtl
o red_quad
usemtl red
v -1 0 -3
v  1 0 -3
v  1 2 -3
v -1 2 -3
f 1 2 3 4
o glowing_tri
usemtl lamp
v -1 3 -3
v  1 3 -3
v  0 4 -3
f -3/-3 -2//-1 -1
"""

MTL = """\
newmtl red
Kd 0.9 0.1 0.1
Ns 500
Ni 1.5
newmtl lamp
Kd 0.0 0.0 0.0
Ke 5 5 4
Pm 0.0
Pr 0.2
"""


def _write(tmp_path):
    (tmp_path / "test.mtl").write_text(MTL)
    p = tmp_path / "test.obj"
    p.write_text(OBJ)
    return str(p)


def test_load_obj_geometry_and_materials(tmp_path):
    mesh = load_obj(_write(tmp_path))
    valid = np.asarray(mesh.valid)
    assert int(valid.sum()) == 3  # quad fans into 2 tris + 1 tri
    v0 = np.asarray(mesh.v0)[valid]
    assert np.isclose(v0[:, 2], -3).all()
    alb = np.asarray(mesh.albedo)[valid]
    np.testing.assert_allclose(alb[0], [0.9, 0.1, 0.1])
    np.testing.assert_allclose(alb[2], [0.0, 0.0, 0.0])
    em = np.asarray(mesh.emission)[valid]
    assert (em[2] > 0).all() and (em[0] == 0).all()
    rgh = np.asarray(mesh.roughness)[valid]
    assert np.isclose(rgh[0], 0.5)   # Ns 500 -> 1 - 0.5
    assert np.isclose(rgh[2], 0.2)   # Pr wins
    oid = np.asarray(mesh.object_id)[valid]
    assert oid[0] == oid[1] != oid[2]


def test_load_obj_scale_translate(tmp_path):
    mesh = load_obj(_write(tmp_path), scale=2.0, translate=(0, 0, 1))
    v0 = np.asarray(mesh.v0)[np.asarray(mesh.valid)]
    assert np.isclose(v0[:, 2], -5).all()  # -3*2 + 1


def test_save_load_roundtrip(tmp_path):
    mesh = load_obj(_write(tmp_path))
    out = str(tmp_path / "soup.obj")
    save_obj(out, mesh)
    mesh2 = load_obj(out)
    assert int(np.asarray(mesh2.valid).sum()) == 3
    # same triangle geometry (soup order preserved)
    for fld in ("v0", "e1", "e2"):
        a = np.asarray(getattr(mesh, fld))[np.asarray(mesh.valid)]
        b = np.asarray(getattr(mesh2, fld))[np.asarray(mesh2.valid)]
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_loaded_mesh_renders(tmp_path):
    import jax

    mesh = load_obj(_write(tmp_path))
    scene = tpu_rt.make_scene(
        centers=[(0.0, -100.5, 0.0)], radii=[100.0],
        albedos=[(0.5, 0.5, 0.5)], metallics=[0.0], roughnesses=[0.5],
        emissions=[(0, 0, 0)], background=(0.2, 0.25, 0.4))
    cam = tpu_rt.make_camera(position=(0, 1.5, 2), target=(0, 1.5, -3),
                             aspect=1.0)
    img = np.asarray(tpu_rt.render(scene, cam, jax.random.key(0), width=48,
                                   height=48, spp=4, max_depth=3,
                                   engine="lax", mesh=mesh))
    assert np.isfinite(img).all()
    # the red quad fills the center view
    c = img[20:34, 18:30]
    assert c[..., 0].mean() > c[..., 1].mean() * 1.5
