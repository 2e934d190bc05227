"""Texturing tests on a synthetic textured-plane scene."""

import numpy as np
import pytest

from openmvs_tpu.config import TextureOptions
from openmvs_tpu.geometry.camera import Camera
from openmvs_tpu.io import mvs as mvsio
from openmvs_tpu.scene import Mesh, Scene, SceneImage


@pytest.fixture(scope="module")
def plane_scene(tmp_path_factory):
    """A textured quad seen by 2 cameras; images rendered analytically."""
    rng = np.random.default_rng(0)
    H, W = 240, 320
    f = 300.0
    K = np.array([[f, 0, W / 2 - 0.5], [0, f, H / 2 - 0.5], [0, 0, 1.0]])
    scene = Scene()
    tmp = tmp_path_factory.mktemp("imgs")
    tex = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    import cv2

    for i, cx in enumerate((0.0, 0.4)):
        C = np.array([cx, 0, 0.0])
        cam = Camera(K, np.eye(3), C)
        # plane z=4, textured by world x, y
        uu, vv = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
        x = (uu - K[0, 2]) / f * 4.0 + C[0]
        y = (vv - K[1, 2]) / f * 4.0 + C[1]
        tu = (x * 16 + 32) % 64
        tv = (y * 16 + 32) % 64
        img = cv2.remap(tex, tu.astype(np.float32), tv.astype(np.float32), cv2.INTER_LINEAR)
        p = str(tmp / f"img{i}.png")
        cv2.imwrite(p, img)
        meta = mvsio.ImageMeta()
        meta.id = i
        meta.name = p
        si = SceneImage(meta=meta, camera=cam, width=W, height=H, path=p)
        si.load()
        scene.images.append(si)

    # quad mesh on the plane z=4 (in view of both cameras)
    gx, gy = np.meshgrid(np.linspace(-0.8, 0.8, 9), np.linspace(-0.6, 0.6, 7))
    verts = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 4.0)], -1).astype(np.float32)
    faces = []
    for r in range(6):
        for c in range(8):
            a = r * 9 + c
            faces.append([a, a + 1, a + 9])
            faces.append([a + 1, a + 10, a + 9])
    mesh = Mesh(vertices=verts, faces=np.asarray(faces, np.int32))
    return scene, mesh


def test_texture_mesh(plane_scene):
    from openmvs_tpu.texture import texture_mesh

    scene, mesh = plane_scene
    tex = texture_mesh(scene, mesh, TextureOptions())
    assert tex.has_texture
    assert tex.face_tex_coords.shape == (len(mesh.faces), 3, 2)
    assert (tex.face_tex_coords >= 0).all() and (tex.face_tex_coords <= 1).all()
    # every face should be labeled (fully visible plane)
    assert tex.texture.size > 0


def test_texture_obj_roundtrip(plane_scene, tmp_path):
    from openmvs_tpu.texture import texture_mesh
    from openmvs_tpu.io.obj import load_mesh_obj, save_mesh_obj

    scene, mesh = plane_scene
    tex = texture_mesh(scene, mesh, TextureOptions())
    p = str(tmp_path / "m.obj")
    save_mesh_obj(p, tex.vertices, tex.faces, tex.face_tex_coords, tex.texture)
    v, f, ftc, timg = load_mesh_obj(p)
    assert len(v) == len(tex.vertices) and len(f) == len(tex.faces)
    assert ftc is not None and timg is not None
    np.testing.assert_allclose(ftc, tex.face_tex_coords, atol=1e-5)


def test_texture_colors_match_source(plane_scene):
    """Sampled atlas colors at face centroids should match the image colors
    at the projected centroids (same-view pixels are copied verbatim)."""
    from openmvs_tpu.texture import texture_mesh, _project

    scene, mesh = plane_scene
    tex = texture_mesh(scene, mesh, TextureOptions())
    th, tw, _ = tex.texture.shape
    errs = []
    for fi in range(0, len(mesh.faces), 7):
        tc = tex.face_tex_coords[fi].mean(axis=0)
        tx = int(tc[0] * tw)
        ty = int((1 - tc[1]) * th)
        atlas_col = tex.texture[np.clip(ty, 0, th - 1), np.clip(tx, 0, tw - 1)].astype(float)
        # reference color: project centroid into view 0
        cen = mesh.vertices[mesh.faces[fi]].mean(axis=0)
        pr = _project(scene.images[0].camera, cen[None])[0]
        img_col = scene.images[0].color[int(pr[1]), int(pr[0])].astype(float)
        errs.append(np.abs(atlas_col - img_col).mean())
    # at least half the sampled faces should match closely (faces labeled to
    # view 1 may differ slightly by resampling)
    assert np.median(errs) < 30.0
