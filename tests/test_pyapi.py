"""pyOpenMVS-parity Scene API (PythonWrapper.cpp:116-137): the reference's
Python-bindings surface — load/save, stage methods, mesh IO, transforms,
leveled volume — must work as Scene methods with the same names/defaults."""

import inspect

import numpy as np
import pytest

from openmvs_tpu.scene import Mesh, Scene

from test_mesh import sphere_scene


REFERENCE_SCENE = "/root/reference/apps/Tests/data/scene.mvs"


def test_binding_surface_names_and_defaults():
    """Every pyOpenMVS method exists with the reference default args."""
    for name in ("load", "save", "save_pointcloud", "load_mesh", "save_mesh",
                 "scale_images", "transform34", "align_to",
                 "dense_reconstruction", "reconstruct_mesh", "clean_mesh",
                 "refine_mesh", "texture_mesh", "compute_leveled_volume"):
        assert hasattr(Scene, name), name
    sig = inspect.signature(Scene.refine_mesh)
    assert sig.parameters["scales"].default == 2
    assert sig.parameters["regularity_weight"].default == pytest.approx(0.2)
    sig = inspect.signature(Scene.reconstruct_mesh)
    assert sig.parameters["dist_insert"].default == pytest.approx(2.0)
    sig = inspect.signature(Scene.texture_mesh)
    assert sig.parameters["empty_color"].default == 0x00FF7F27


def test_mesh_stage_methods_and_volume(tmp_path):
    scene = sphere_scene(n=3000)
    assert scene.reconstruct_mesh(dist_insert=0.0)
    nf_raw = len(scene.mesh.faces)
    assert scene.clean_mesh(decimate=0.5, close_holes=0, smooth_mesh=0)
    assert 0 < len(scene.mesh.faces) < nf_raw
    # watertight unit sphere: volume ~ 4/3 pi (plane_threshold<0 skips the
    # ground-plane leveling like the reference)
    vol = scene.compute_leveled_volume(plane_threshold=-1)
    assert vol == pytest.approx(4.0 / 3.0 * np.pi, rel=0.15)

    # mesh IO roundtrip through the binding methods
    p = tmp_path / "m.ply"
    scene.save_mesh(str(p))
    nf = len(scene.mesh.faces)
    scene.mesh = Mesh()
    scene.load_mesh(str(p))
    assert len(scene.mesh.faces) == nf

    # point-cloud save
    pc = tmp_path / "pc.ply"
    scene.save_pointcloud(str(pc))
    assert pc.stat().st_size > 0

    # transform34 moves the mesh
    T = np.hstack([np.eye(3), np.array([[1.0], [0.0], [0.0]])])
    c0 = scene.mesh.vertices.mean(axis=0).copy()
    scene.transform34(T)
    np.testing.assert_allclose(scene.mesh.vertices.mean(axis=0),
                               c0 + [1, 0, 0], atol=1e-5)


def test_leveled_volume_open_ground_contact():
    """An open hemisphere dome leveled to its rim plane: volume ~ 2/3 pi r^3
    (the divergence-theorem sum closes the open boundary against z=0)."""
    rng = np.random.default_rng(3)
    # dense dome sampling via subdivided icosahedron-ish: use spherical grid
    n_t, n_p = 28, 56
    th = np.linspace(0.02, np.pi / 2, n_t)
    ph = np.linspace(0, 2 * np.pi, n_p, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    v = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                  np.cos(tt)], -1).reshape(-1, 3)
    faces = []
    for i in range(n_t - 1):
        for j in range(n_p):
            a = i * n_p + j
            b = i * n_p + (j + 1) % n_p
            c = (i + 1) * n_p + j
            d = (i + 1) * n_p + (j + 1) % n_p
            faces += [(a, b, c), (b, d, c)]
    scene = Scene()
    scene.mesh = Mesh(vertices=v.astype(np.float32),
                      faces=np.asarray(faces, np.int32))
    from openmvs_tpu.mesh_ops import compute_volume

    assert compute_volume(scene.mesh) == pytest.approx(2 / 3 * np.pi,
                                                       rel=0.05)


def test_scale_images():
    import openmvs_tpu.io.mvs as mvsio
    from openmvs_tpu.geometry.camera import Camera
    from openmvs_tpu.scene import SceneImage

    scene = Scene()
    meta = mvsio.ImageMeta()
    meta.id = 0
    meta.name = "a.png"
    K = np.array([[100, 0, 40], [0, 100, 30], [0, 0, 1.0]])
    img = SceneImage(meta=meta, camera=Camera(K, np.eye(3), np.zeros(3)),
                     width=80, height=60)
    img.gray = np.random.default_rng(0).uniform(0, 1, (60, 80)).astype(np.float32)
    scene.images.append(img)
    n = scene.scale_images(scale=0.5)
    assert n == 1 and img.width == 40 and img.height == 30
    assert img.gray.shape == (30, 40)
