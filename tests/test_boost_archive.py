"""Boost-serialization 'MVS project' archive codec tests.

The wire format cannot be validated against a real boost build in this image
(no boost anywhere), so validation is layered:
  1. cross-validation against an independent C++ emitter of the documented
     grammar (native/src/project_emitter.cpp) — byte-for-byte both ways;
  2. round-trips through all four archive variants;
  3. Scene-level round-trip preserving composed cameras, cloud, mesh, obb;
  4. loud, actionable failures on out-of-subset archives.
"""

import os

import numpy as np
import pytest

from openmvs_tpu import native
from openmvs_tpu.io import boost_archive as bar
from openmvs_tpu.io import mvs as mvsio


def _tiny_project() -> bar.ProjectScene:
    """The same tiny scene native/src/project_emitter.cpp hard-codes."""
    K = np.array([[1.2, 0, 0.5], [0, 1.2, 0.48], [0, 0, 1]], np.float64)
    rig = mvsio.CameraRig(name="", K=K, R=np.eye(3),
                          C=np.array([0.01, -0.02, 0.03]))
    poses = [mvsio.Pose(R=np.eye(3), C=np.array([0.5 * p, 0.0, -0.25 * p]))
             for p in range(2)]
    plat = mvsio.Platform(name="rig0", cameras=[rig], poses=poses)

    images = [
        bar.ProjectImage(platform_id=0, camera_id=0, pose_id=0, id=7,
                         name="images/00000.jpg", width=640, height=480,
                         neighbors=[mvsio.ViewScore(id=1, points=123, scale=1.0,
                                                    angle=0.2, area=0.8,
                                                    score=3.5)],
                         avg_depth=2.5),
        bar.ProjectImage(platform_id=0, camera_id=0, pose_id=1, id=8,
                         name="images/00001.jpg", width=640, height=480,
                         neighbors=[], avg_depth=2.25),
    ]

    pts = np.array([[0, 0, 2], [1, 0, 2.5], [0, 1, 3]], np.float32)
    ps = bar.ProjectScene(
        platforms=[plat], images=images, points=pts,
        point_views=[np.array([0, 1], np.uint32), np.array([0], np.uint32),
                     np.array([1], np.uint32)],
        point_weights=[np.array([0.5, 0.25], np.float32),
                       np.array([1.0], np.float32),
                       np.array([2.0], np.float32)],
        normals=np.tile(np.array([[0, 0, -1]], np.float32), (3, 1)),
        colors=np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8),
        obb_rot=np.eye(3, dtype=np.float32),
        obb_pos=np.array([1, 2, 3], np.float32),
        obb_ext=np.array([4, 5, 6], np.float32),
    )
    ps.mesh = bar.ProjectMesh(
        vertices=pts.copy(),
        faces=np.array([[0, 1, 2]], np.uint32),
        face_texcoords=np.array([[0.5, 0.5], [1.5, 0.5], [0.5, 1.5]], np.float32),
        face_texindices=np.array([0], np.uint8),
        textures=[np.arange(1, 13, dtype=np.uint8).reshape(2, 2, 3)],
    )
    return ps


def _check_tiny(ps: bar.ProjectScene):
    assert len(ps.platforms) == 1
    plat = ps.platforms[0]
    assert plat.name == "rig0"
    assert len(plat.cameras) == 1 and len(plat.poses) == 2
    np.testing.assert_allclose(plat.cameras[0].K[0, 0], 1.2)
    np.testing.assert_allclose(plat.cameras[0].C, [0.01, -0.02, 0.03])
    np.testing.assert_allclose(plat.poses[1].C, [0.5, 0.0, -0.25])

    assert len(ps.images) == 2
    im0 = ps.images[0]
    assert os.path.basename(im0.name) == "00000.jpg"
    assert (im0.width, im0.height, im0.id) == (640, 480, 7)
    assert len(im0.neighbors) == 1
    vs = im0.neighbors[0]
    assert (vs.id, vs.points) == (1, 123)
    np.testing.assert_allclose([vs.scale, vs.angle, vs.area, vs.score],
                               [1.0, 0.2, 0.8, 3.5], rtol=1e-6)
    np.testing.assert_allclose(im0.avg_depth, 2.5)
    assert ps.images[1].neighbors == []

    np.testing.assert_allclose(ps.points,
                               [[0, 0, 2], [1, 0, 2.5], [0, 1, 3]])
    assert [list(v) for v in ps.point_views] == [[0, 1], [0], [1]]
    np.testing.assert_allclose(ps.point_weights[0], [0.5, 0.25])
    np.testing.assert_allclose(ps.normals[2], [0, 0, -1])
    assert ps.colors[2].tolist() == [0, 0, 255]

    m = ps.mesh
    assert m.vertices.shape == (3, 3) and m.faces.tolist() == [[0, 1, 2]]
    np.testing.assert_allclose(m.face_texcoords,
                               [[0.5, 0.5], [1.5, 0.5], [0.5, 1.5]])
    assert m.face_texindices.tolist() == [0]
    assert len(m.textures) == 1 and m.textures[0].shape == (2, 2, 3)
    assert m.textures[0].ravel().tolist() == list(range(1, 13))

    np.testing.assert_allclose(ps.obb_rot, np.eye(3))
    np.testing.assert_allclose(ps.obb_pos, [1, 2, 3])
    np.testing.assert_allclose(ps.obb_ext, [4, 5, 6])


def test_cpp_emitter_decodes(tmp_path):
    """The independent C++ emitter's bytes decode to the expected scene."""
    p = str(tmp_path / "golden_project.mvs")
    native.emit_test_project(p)
    _check_tiny(bar.load_project(p))


def test_python_writer_matches_cpp_emitter(tmp_path):
    """Two independent implementations of the wire format agree byte-for-byte."""
    p_cpp = str(tmp_path / "cpp.mvs")
    p_py = str(tmp_path / "py.mvs")
    native.emit_test_project(p_cpp)
    bar.save_project(_tiny_project(), p_py, archive_type="binary")
    with open(p_cpp, "rb") as f:
        cpp = f.read()
    with open(p_py, "rb") as f:
        py = f.read()
    assert cpp == py


@pytest.mark.parametrize("atype", ["binary", "zip", "zstd", "text"])
def test_roundtrip_variants(tmp_path, atype):
    p = str(tmp_path / f"rt_{atype}.mvs")
    bar.save_project(_tiny_project(), p, archive_type=atype)
    _check_tiny(bar.load_project(p))


def test_scene_level_roundtrip(tmp_path):
    """Scene.save_project -> Scene.load preserves cameras/cloud/mesh/obb."""
    from openmvs_tpu.scene import Scene

    ref = Scene.load("/root/reference/apps/Tests/data/scene.mvs")
    # give it a small textured mesh + obb so every branch is exercised
    from openmvs_tpu.scene import Mesh

    ref.mesh = Mesh(
        vertices=np.array([[0, 0, 2], [1, 0, 2], [0, 1, 2]], np.float32),
        faces=np.array([[0, 1, 2]], np.int32),
        face_tex_coords=np.array([[[0.1, 0.2], [0.9, 0.2], [0.1, 0.8]]],
                                 np.float32),
        texture=np.random.default_rng(0).integers(
            0, 255, (16, 16, 3), dtype=np.uint8),
    )
    ref.obb_rot = np.eye(3)
    ref.obb_min = np.array([-1.0, -2.0, 0.0])
    ref.obb_max = np.array([3.0, 2.0, 8.0])

    p = str(tmp_path / "scene_project.mvs")
    ref.save_project(p)
    out = Scene.load(p)

    assert len(out.images) == len(ref.images)
    for a, b in zip(ref.images, out.images):
        np.testing.assert_allclose(b.camera.K, a.camera.K, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(b.camera.R, a.camera.R, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(b.camera.C, a.camera.C, rtol=1e-6, atol=1e-8)
        assert (b.width, b.height) == (a.width, a.height)
        assert os.path.basename(b.path) == os.path.basename(a.path)
    assert len(out.pointcloud) == len(ref.pointcloud)
    np.testing.assert_allclose(out.pointcloud.points[:100],
                               ref.pointcloud.points[:100], rtol=1e-6)
    assert [v.tolist() for v in out.pointcloud.views[:50]] == \
        [np.asarray(v).tolist() for v in ref.pointcloud.views[:50]]
    assert out.mesh.faces.tolist() == ref.mesh.faces.tolist()
    np.testing.assert_allclose(out.mesh.vertices, ref.mesh.vertices)
    assert out.mesh.has_texture
    # uv -> pixel -> uv is lossy only to float32 rounding
    np.testing.assert_allclose(out.mesh.face_tex_coords,
                               ref.mesh.face_tex_coords, atol=1e-5)
    np.testing.assert_array_equal(out.mesh.texture, ref.mesh.texture)
    np.testing.assert_allclose(out.obb_min, ref.obb_min, atol=1e-6)
    np.testing.assert_allclose(out.obb_max, ref.obb_max, atol=1e-6)


def test_unsupported_variants_fail_loudly(tmp_path):
    # bad magic
    p = str(tmp_path / "bad.mvs")
    with open(p, "wb") as f:
        f.write(b"NOPE" + b"\0" * 32)
    with pytest.raises(bar.UnsupportedArchive):
        bar.load_project(p)

    # pointer-tracked archive: tracking byte set on the first class
    import struct

    p2 = str(tmp_path / "tracked.mvs")
    with open(p2, "wb") as f:
        f.write(bar.PROJECT_MAGIC)
        f.write(struct.pack("<IIQ", 1, bar.ARCHIVE_BINARY, 0))
        f.write(b"\x01" + b"\x00" * 64)
    with pytest.raises(bar.UnsupportedArchive, match="MVSI"):
        bar.load_project(p2)

    # truncated stream
    golden = str(tmp_path / "g.mvs")
    native.emit_test_project(golden)
    with open(golden, "rb") as f:
        data = f.read()
    p3 = str(tmp_path / "trunc.mvs")
    with open(p3, "wb") as f:
        f.write(data[: len(data) // 2])
    with pytest.raises(bar.UnsupportedArchive):
        bar.load_project(p3)

    # unknown archive type
    p4 = str(tmp_path / "unk.mvs")
    with open(p4, "wb") as f:
        f.write(bar.PROJECT_MAGIC)
        f.write(struct.pack("<IIQ", 1, 9, 0))
    with pytest.raises(bar.UnsupportedArchive, match="archive type"):
        bar.load_project(p4)
