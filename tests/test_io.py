"""IO codec tests: .mvs round-trip vs the bundled scene, .dmap round-trip, PLY."""

import os

import numpy as np
import pytest

from openmvs_tpu.io import dmap as dmapio
from openmvs_tpu.io import mvs as mvsio
from openmvs_tpu.io import ply as plyio
from openmvs_tpu.scene import Scene


def test_load_bundled_scene(test_scene_path):
    itf = mvsio.load(test_scene_path)
    assert itf.version == 6
    assert len(itf.platforms) == 1
    assert len(itf.platforms[0].cameras) == 1
    cam = itf.platforms[0].cameras[0]
    assert (cam.width, cam.height) == (640, 479)
    np.testing.assert_allclose(cam.K[0, 0], 672.62, atol=1e-6)
    assert len(itf.platforms[0].poses) == 4
    assert len(itf.images) == 4
    assert len(itf.points) == 2663
    assert len(itf.colors) == 2663
    # every sparse point sees >= 2 views
    assert min(len(v) for v in itf.point_views) >= 2


def test_mvs_roundtrip(test_scene_path, tmp_path):
    itf = mvsio.load(test_scene_path)
    out = str(tmp_path / "roundtrip.mvs")
    mvsio.save(itf, out)
    itf2 = mvsio.load(out)
    assert itf2.version == mvsio.VERSION
    assert len(itf2.images) == len(itf.images)
    np.testing.assert_array_equal(itf2.points, itf.points)
    np.testing.assert_array_equal(itf2.colors, itf.colors)
    for a, b in zip(itf.point_views, itf2.point_views):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(itf2.platforms[0].cameras[0].K, itf.platforms[0].cameras[0].K)
    for p1, p2 in zip(itf.platforms[0].poses, itf2.platforms[0].poses):
        np.testing.assert_allclose(p1.R, p2.R)
        np.testing.assert_allclose(p1.C, p2.C)


def test_mvs_roundtrip_matches_reference_reader(test_scene_path, tmp_path):
    """Our v7 writer must be parseable by the reference's own numpy loader."""
    import sys

    sys.path.insert(0, "/root/reference/scripts/python")
    try:
        from MvsUtils import loadMVSInterface
    except ImportError:
        pytest.skip("reference MvsUtils not importable")
    itf = mvsio.load(test_scene_path)
    out = str(tmp_path / "v7.mvs")
    mvsio.save(itf, out)
    ref = loadMVSInterface(out)
    assert ref["project_stream_version"] == 7
    assert len(ref["images"]) == 4
    assert len(ref["vertices"]) == 2663
    np.testing.assert_allclose(
        np.array(ref["platforms"][0]["cameras"][0]["K"]),
        itf.platforms[0].cameras[0].K,
    )


def test_dmap_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    h, w = 37, 53
    dd = dmapio.DepthData(
        depth=rng.uniform(1, 10, (h, w)).astype(np.float32),
        image_width=w * 2,
        image_height=h * 2,
        depth_min=1.0,
        depth_max=10.0,
        file_name="images/00000.jpg",
        view_ids=np.array([0, 1, 3], np.uint32),
        K=np.diag([100.0, 100.0, 1.0]),
        R=np.eye(3),
        C=np.array([0.5, -0.25, 1.0]),
        normal=rng.normal(size=(h, w, 3)).astype(np.float32),
        conf=rng.uniform(0, 1, (h, w)).astype(np.float32),
    )
    path = str(tmp_path / "depth0000.dmap")
    dmapio.save(dd, path)
    dd2 = dmapio.load(path)
    np.testing.assert_array_equal(dd2.depth, dd.depth)
    np.testing.assert_array_equal(dd2.normal, dd.normal)
    np.testing.assert_array_equal(dd2.conf, dd.conf)
    np.testing.assert_array_equal(dd2.view_ids, dd.view_ids)
    np.testing.assert_allclose(dd2.K, dd.K)
    assert dd2.file_name == dd.file_name
    assert dd2.views is None


def test_dmap_matches_reference_reader(tmp_path):
    """Our .dmap writer must be parseable by the reference's loadDMAP."""
    import sys

    sys.path.insert(0, "/root/reference/scripts/python")
    try:
        from MvsUtils import loadDMAP
    except ImportError:
        pytest.skip("reference MvsUtils not importable")
    h, w = 24, 31
    dd = dmapio.DepthData(
        depth=np.full((h, w), 2.5, np.float32),
        image_width=62,
        image_height=48,
        depth_min=1.0,
        depth_max=5.0,
        file_name="img.jpg",
        view_ids=np.array([2, 0, 1], np.uint32),
        K=np.diag([50.0, 50.0, 1.0]),
        R=np.eye(3),
        C=np.zeros(3),
        normal=np.tile(np.array([0, 0, -1], np.float32), (h, w, 1)),
        conf=np.ones((h, w), np.float32),
    )
    path = str(tmp_path / "d.dmap")
    dmapio.save(dd, path)
    ref = loadDMAP(path)
    assert ref is not None
    assert ref["depth_width"] == w and ref["depth_height"] == h
    assert ref["reference_view_id"] == 2
    np.testing.assert_array_equal(ref["depth_map"], dd.depth)
    np.testing.assert_allclose(ref["K"], dd.K)
    assert ref["has_normal"] and ref["has_conf"] and not ref["has_views"]


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    normals = rng.normal(size=(100, 3)).astype(np.float32)
    colors = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    plyio.save_point_cloud(path, pts, normals=normals, colors=colors)
    data = plyio.load(path)
    np.testing.assert_allclose(data.vertices, pts)
    np.testing.assert_array_equal(data.elements["vertex"]["red"], colors[:, 0])

    faces = rng.integers(0, 100, (50, 3)).astype(np.int32)
    mpath = str(tmp_path / "mesh.ply")
    plyio.save_mesh(mpath, pts, faces)
    mdata = plyio.load(mpath)
    np.testing.assert_allclose(mdata.vertices, pts)
    np.testing.assert_array_equal(mdata.faces, faces)


def test_scene_load_save(test_scene_path, tmp_path):
    scene = Scene.load(test_scene_path)
    assert scene.n_views == 4
    assert len(scene.pointcloud) == 2663
    cam = scene.images[0].camera
    # all sparse points should project inside (or near) every viewing image
    pts = scene.pointcloud.points
    for img in scene.images:
        sel = [i for i, v in enumerate(scene.pointcloud.views) if img.meta.id in v]
        proj = img.camera.project(pts[sel].astype(np.float64))
        inside = (
            (proj[:, 0] >= -1) & (proj[:, 0] <= img.width) &
            (proj[:, 1] >= -1) & (proj[:, 1] <= img.height)
        )
        assert inside.mean() > 0.95
        depth = img.camera.point_depth(pts[sel].astype(np.float64))
        assert (depth > 0).all()
    out = str(tmp_path / "scene_out.mvs")
    scene.save(out)
    scene2 = Scene.load(out)
    assert scene2.n_views == 4
    np.testing.assert_allclose(scene2.images[0].camera.K, cam.K)
    np.testing.assert_array_equal(scene2.pointcloud.points, scene.pointcloud.points)


def test_scene_load_ply_pointcloud(tmp_path):
    """Scene.load imports a raw .ply directly (Scene.cpp:483-632 role)."""
    from openmvs_tpu.io import ply as plyio
    from openmvs_tpu.scene import Scene

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    p = str(tmp_path / "cloud.ply")
    plyio.save_point_cloud(p, pts, colors=cols)
    sc = Scene.load(p)
    assert len(sc.pointcloud) == 100
    np.testing.assert_allclose(sc.pointcloud.points, pts, atol=1e-6)
    assert sc.pointcloud.has_colors


def test_scene_load_mesh_formats(tmp_path):
    from openmvs_tpu.io import ply as plyio
    from openmvs_tpu.io import obj as objio
    from openmvs_tpu.scene import Scene

    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    p1 = str(tmp_path / "m.ply")
    plyio.save_mesh(p1, v, f)
    sc = Scene.load(p1)
    assert len(sc.mesh.faces) == 2
    p2 = str(tmp_path / "m.obj")
    objio.save_mesh_obj(p2, v, f)
    sc2 = Scene.load(p2)
    assert len(sc2.mesh.vertices) == 4


def test_scene_load_dmap(tmp_path):
    from openmvs_tpu.io import dmap as dmapio
    from openmvs_tpu.scene import Scene

    H = W = 24
    K = np.array([[20.0, 0, 12], [0, 20.0, 12], [0, 0, 1]])
    depth = np.zeros((H, W), np.float32)
    depth[8:16, 8:16] = 4.0
    dd = dmapio.DepthData(
        depth=depth, image_width=W, image_height=H, depth_min=1.0,
        depth_max=8.0, file_name="a.jpg", view_ids=np.array([5], np.uint32),
        K=K, R=np.eye(3), C=np.array([1.0, 0, 0]))
    p = str(tmp_path / "depth0005.dmap")
    dmapio.save(dd, p)
    sc = Scene.load(p)
    assert len(sc.images) == 1 and sc.images[0].meta.id == 5
    assert len(sc.pointcloud) == 64
    # unprojected depths reproject to z=4 in the camera
    Xc = (sc.pointcloud.points - np.array([1.0, 0, 0])) @ np.eye(3).T
    np.testing.assert_allclose(Xc[:, 2], 4.0, atol=1e-5)


def test_glb_multipage_roundtrip(tmp_path):
    """Multi-page atlases export one primitive+material per page; the
    single-page path and empty-mesh error stay intact."""
    import json
    import struct

    from openmvs_tpu.io.gltf import load_mesh_glb, save_mesh_glb

    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    ftc = np.tile(np.array([[0, 0], [1, 0], [0, 1]], np.float32), (2, 1, 1))
    pages = [np.full((8, 8, 3), 60, np.uint8), np.full((8, 8, 3), 200, np.uint8)]
    p = str(tmp_path / "m.glb")
    save_mesh_glb(p, v, f, face_tex_coords=ftc, textures=pages,
                  face_page=np.array([0, 1], np.int32))
    with open(p, "rb") as fh:
        fh.read(12)
        jlen, _ = struct.unpack("<II", fh.read(8))
        doc = json.loads(fh.read(jlen))
    prims = doc["meshes"][0]["primitives"]
    assert len(prims) == 2 and len(doc["images"]) == 2
    assert [pr["material"] for pr in prims] == [0, 1]
    p2 = str(tmp_path / "s.glb")
    save_mesh_glb(p2, v, f, face_tex_coords=ftc, texture=pages[0])
    _, f2 = load_mesh_glb(p2)[:2]
    assert len(f2) == 2
    with pytest.raises(ValueError):
        save_mesh_glb(str(tmp_path / "e.glb"), np.zeros((0, 3)),
                      np.zeros((0, 3), np.int32))


def test_ply_polygon_faces_triangulate(tmp_path):
    """Polygon PLY faces (ascii and binary, uniform quads and ragged) load
    as fan-triangulated (n, 3) arrays for every consumer."""
    import struct

    from openmvs_tpu.io import ply as plyio

    p = str(tmp_path / "q.ply")
    open(p, "w").write(
        "ply\nformat ascii 1.0\nelement vertex 4\nproperty float x\n"
        "property float y\nproperty float z\nelement face 1\n"
        "property list uchar int vertex_indices\nend_header\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n4 0 1 2 3\n")
    assert plyio.load(p).faces.shape == (2, 3)
    p2 = str(tmp_path / "qb.ply")
    with open(p2, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\nelement vertex 4\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"element face 2\n"
                b"property list uchar int vertex_indices\nend_header\n")
        for vv in [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]:
            f.write(struct.pack("<fff", *vv))
        f.write(struct.pack("<Biiii", 4, 0, 1, 2, 3))
        f.write(struct.pack("<Biii", 3, 0, 1, 2))
    assert plyio.load(p2).faces.shape == (3, 3)
    # empty face element round-trips
    p3 = str(tmp_path / "e.ply")
    plyio.save_mesh(p3, np.zeros((3, 3), np.float32),
                    np.zeros((0, 3), np.int32))
    assert len(plyio.load(p3).faces) == 0


def test_sml_config_roundtrip(tmp_path):
    """SML text-config codec (libs/Common/SML.cpp format): parse the
    reference's save layout (values + nested bracket sections), map OPTDENSE
    titles onto DenseOptions, and round-trip our writer through our reader."""
    from openmvs_tpu.io import sml
    from openmvs_tpu.config import DenseOptions

    text = (
        "NCC Threshold Keep = 0.8\n"
        "Min Views Fuse = 3\n"
        "Filter Adjust = 0\n"
        "Optim Angle = 10\n"
        "Pairwise Mul = 0.3\n"          # role-less: accepted, ignored
        "\n"
        "[Child]\n"
        "{\n"
        "\tInner = 42\n"
        "}\n"
    )
    node = sml.parse_sml(text)
    assert node["NCC Threshold Keep"] == "0.8"
    assert node.children["Child"]["Inner"] == "42"
    # writer -> parser round trip preserves everything
    node2 = sml.parse_sml(sml.dump_sml(node))
    assert node2.values == node.values
    assert node2.children["Child"].values == {"Inner": "42"}

    p = tmp_path / "Densify.ini"
    p.write_text(text)
    opts = sml.dense_options_from_sml(str(p))
    assert opts.ncc_threshold_keep == 0.8
    assert opts.min_views_fuse == 3
    assert opts.filter_adjust is False
    assert opts.optim_angle == 10.0
    # unset titles keep defaults
    assert opts.max_views == DenseOptions().max_views

    # our writer produces a file our reader (and format-wise, the
    # reference's SML::Load) accepts with identical values
    out = tmp_path / "out.ini"
    sml.dense_options_to_sml(opts, str(out))
    opts2 = sml.dense_options_from_sml(str(out))
    assert opts2 == opts


def test_tga_and_sci_image_decode(tmp_path):
    """TGA (ImageTGA.cpp role, via the PIL fallback) and SCI (ImageSCI.cpp
    raw codec) images load as RGB through the standard loader."""
    from openmvs_tpu.io import images as imio

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)

    from PIL import Image as PImage
    tga = tmp_path / "img.tga"
    PImage.fromarray(rgb).save(str(tga))
    got = imio.load_color(str(tga))
    assert got.shape == (20, 30, 3)
    assert np.array_equal(got, rgb)

    sci = tmp_path / "img.sci"
    imio.save_sci(str(sci), rgb)
    got = imio.load_color(str(sci))
    assert np.array_equal(got, rgb)


def test_dds_image_decode(tmp_path):
    """DDS (ImageDDS.cpp role): an uncompressed 24-bit RGB DDS decodes
    through the standard loader's PIL fallback.  The file is hand-built
    (128-byte DX9 header + BGR scanlines) since no writer is available."""
    import struct
    from openmvs_tpu.io import images as imio

    h, w = 6, 8
    rgb = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    DDSD = 0x1 | 0x2 | 0x4 | 0x1000 | 0x8  # caps|h|w|pixelformat|pitch
    header = struct.pack(
        "<4s I I I I I I I 44x I I I I I I I I I I 12x",
        b"DDS ", 124, DDSD, h, w, w * 3, 0, 0,
        32, 0x40, 0, 24, 0xFF0000, 0x00FF00, 0x0000FF, 0x0,
        0x1000, 0)
    assert len(header) == 128
    p = tmp_path / "img.dds"
    p.write_bytes(header + rgb[..., ::-1].tobytes())
    got = imio.load_color(str(p))
    assert np.array_equal(got, rgb)
