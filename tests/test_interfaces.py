"""Importer/exporter + CLI + transform tests."""

import os

import numpy as np
import pytest

from openmvs_tpu.interfaces import colmap
from openmvs_tpu.io import mvs as mvsio


def _make_colmap_text_model(folder, n_imgs=3, n_pts=50):
    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(0)
    with open(os.path.join(folder, "cameras.txt"), "w") as f:
        f.write("# cams\n1 PINHOLE 640 480 600 600 320 240\n")
    with open(os.path.join(folder, "images.txt"), "w") as f:
        f.write("# imgs\n")
        for i in range(n_imgs):
            # camera at x=i*0.5 looking down +z, identity rotation
            q = np.array([1.0, 0, 0, 0])
            C = np.array([0.5 * i, 0, 0])
            t = -C  # R = I
            f.write(f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} 1 im{i}.jpg\n")
            f.write("\n")
    with open(os.path.join(folder, "points3D.txt"), "w") as f:
        f.write("# pts\n")
        for i in range(n_pts):
            p = rng.uniform(-1, 1, 3) + [0, 0, 5]
            f.write(f"{i+1} {p[0]} {p[1]} {p[2]} 100 150 200 0.5 1 0 2 0 3 0\n")


def test_colmap_import(tmp_path):
    folder = str(tmp_path / "sparse")
    _make_colmap_text_model(folder)
    itf = colmap.import_colmap(folder)
    assert len(itf.images) == 3
    assert len(itf.points) == 50
    assert itf.platforms[0].cameras[0].width == 640
    # camera centers recovered
    plat = itf.platforms[itf.images[1].platform_id]
    C = plat.poses[itf.images[1].pose_id].C
    np.testing.assert_allclose(C, [0.5, 0, 0], atol=1e-9)
    # every point sees >= 2 views
    assert all(len(v) >= 2 for v in itf.point_views)


def test_colmap_roundtrip(tmp_path):
    folder = str(tmp_path / "sparse")
    _make_colmap_text_model(folder)
    itf = colmap.import_colmap(folder)
    out = str(tmp_path / "export")
    colmap.export_colmap(itf, out)
    itf2 = colmap.import_colmap(out)
    assert len(itf2.images) == len(itf.images)
    assert len(itf2.points) == len(itf.points)
    for im1, im2 in zip(itf.images, itf2.images):
        p1 = itf.platforms[im1.platform_id].poses[im1.pose_id]
        p2 = itf2.platforms[im2.platform_id].poses[im2.pose_id]
        np.testing.assert_allclose(p1.C, p2.C, atol=1e-9)
        np.testing.assert_allclose(p1.R, p2.R, atol=1e-9)


def test_colmap_binary_roundtrip(tmp_path):
    """export_colmap(binary=True) writes the COLMAP .bin model
    (InterfaceCOLMAP.cpp:1417-1443 role) that import_colmap reads back
    identically: poses, intrinsics, points, colors, and tracks."""
    folder = str(tmp_path / "sparse")
    _make_colmap_text_model(folder)
    itf = colmap.import_colmap(folder)
    out = str(tmp_path / "export_bin")
    colmap.export_colmap(itf, out, binary=True)
    for stem in ("cameras", "images", "points3D"):
        assert os.path.exists(os.path.join(out, stem + ".bin"))
        assert not os.path.exists(os.path.join(out, stem + ".txt"))
    itf2 = colmap.import_colmap(out)
    assert len(itf2.images) == len(itf.images)
    assert len(itf2.points) == len(itf.points)
    for im1, im2 in zip(itf.images, itf2.images):
        p1 = itf.platforms[im1.platform_id].poses[im1.pose_id]
        p2 = itf2.platforms[im2.platform_id].poses[im2.pose_id]
        np.testing.assert_allclose(p1.C, p2.C, atol=1e-9)
        np.testing.assert_allclose(p1.R, p2.R, atol=1e-9)
    rig1 = itf.platforms[0].cameras[0]
    rig2 = itf2.platforms[0].cameras[0]
    assert (rig1.width, rig1.height) == (rig2.width, rig2.height)
    np.testing.assert_allclose(rig1.K, rig2.K, atol=1e-9)
    np.testing.assert_allclose(itf2.points, itf.points, atol=1e-5)
    np.testing.assert_array_equal(itf2.colors, itf.colors)
    for v1, v2 in zip(itf.point_views, itf2.point_views):
        np.testing.assert_array_equal(np.sort(v1), np.sort(v2))


def test_colmap_to_mvs_file(tmp_path):
    folder = str(tmp_path / "sparse")
    _make_colmap_text_model(folder)
    itf = colmap.import_colmap(folder)
    p = str(tmp_path / "scene.mvs")
    mvsio.save(itf, p)
    back = mvsio.load(p)
    assert len(back.images) == 3
    np.testing.assert_allclose(back.points, itf.points, atol=1e-6)


def test_qvec_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = colmap.qvec_to_R(q)
        q2 = colmap.R_to_qvec(R)
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q, q2, atol=1e-9)


def test_scene_transform():
    from openmvs_tpu.scene import Scene, SceneImage, PointCloud
    from openmvs_tpu.geometry.camera import Camera

    scene = Scene()
    K = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1.0]])
    meta = mvsio.ImageMeta()
    meta.id = 0
    scene.platforms = [mvsio.Platform(cameras=[mvsio.CameraRig(K=K)],
                                      poses=[mvsio.Pose()])]
    scene.images = [SceneImage(meta=meta, camera=Camera(K, np.eye(3), np.zeros(3)))]
    pts = np.array([[0, 0, 5], [1, 1, 6]], np.float32)
    scene.pointcloud = PointCloud(points=pts.copy(),
                                  views=[np.array([0], np.uint32)] * 2)
    # a similarity transform: scale 2, rotate 90deg about z, translate
    th = np.pi / 2
    Q = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    T = np.eye(4)
    T[:3, :3] = 2.0 * Q
    T[:3, 3] = [1, 2, 3]
    # projection of a point before transform
    cam0 = scene.images[0].camera
    u0 = cam0.project(pts.astype(np.float64))
    scene.apply_transform(T)
    cam1 = scene.images[0].camera
    pts1 = scene.pointcloud.points.astype(np.float64)
    u1 = cam1.project(pts1)
    np.testing.assert_allclose(u0, u1, atol=1e-4)


def test_cli_import_and_mesh(tmp_path):
    from openmvs_tpu.__main__ import main

    folder = str(tmp_path / "sparse")
    _make_colmap_text_model(folder)
    scene_path = str(tmp_path / "scene.mvs")
    main(["import-colmap", folder, "-o", scene_path])
    assert os.path.exists(scene_path)
    out = str(tmp_path / "model")
    main(["export-colmap", scene_path, "-o", out])
    assert os.path.exists(os.path.join(out, "cameras.txt"))


def test_openmvg_import(tmp_path):
    import json
    from openmvs_tpu.interfaces.openmvg import import_openmvg

    doc = {
        "root_path": "/imgs",
        "views": [
            {"key": i, "value": {"ptr_wrapper": {"data": {
                "id_view": i, "id_intrinsic": 0, "id_pose": i,
                "filename": f"im{i}.jpg"}}}}
            for i in range(3)
        ],
        "intrinsics": [{"key": 0, "value": {
            "polymorphic_name": "pinhole",
            "ptr_wrapper": {"data": {"width": 640, "height": 480,
                                     "focal_length": 600.0,
                                     "principal_point": [320, 240]}}}}],
        "extrinsics": [
            {"key": i, "value": {"rotation": np.eye(3).tolist(),
                                 "center": [0.4 * i, 0, 0]}}
            for i in range(3)
        ],
        "structure": [
            {"key": k, "value": {"X": [0, 0, 5.0 + 0.01 * k],
                                 "rgb": [10, 20, 30],
                                 "observations": [{"key": 0}, {"key": 1}]}}
            for k in range(10)
        ],
    }
    p = str(tmp_path / "sfm_data.json")
    json.dump(doc, open(p, "w"))
    itf = import_openmvg(p)
    assert len(itf.images) == 3
    assert len(itf.points) == 10
    pose = itf.platforms[0].poses[itf.images[2].pose_id]
    np.testing.assert_allclose(pose.C, [0.8, 0, 0], atol=1e-12)


def test_nvm_import(tmp_path):
    from openmvs_tpu.interfaces.visualsfm import import_nvm

    nvm = ["NVM_V3", "", "2"]
    for i in range(2):
        nvm.append(f"im{i}.jpg 600 1 0 0 0 {0.5*i} 0 0 0 0")
    nvm += ["", "2"]
    nvm.append("0 0 5 100 110 120 2 0 0 10 10 1 0 20 20")
    nvm.append("1 0 5 100 110 120 2 0 1 10 10 1 1 20 20")
    p = str(tmp_path / "model.nvm")
    open(p, "w").write("\n".join(nvm))
    itf = import_nvm(p)
    assert len(itf.images) == 2
    assert len(itf.points) == 2
    np.testing.assert_allclose(itf.platforms[1].poses[0].C, [0.5, 0, 0])

    # the CLI path must actually write the output file (regression: the
    # import-bundler branch once swallowed import-nvm's save)
    from openmvs_tpu.__main__ import main

    out = str(tmp_path / "model.mvs")
    main(["import-nvm", p, "-o", out])
    assert os.path.exists(out)


def test_metashape_import(tmp_path):
    from openmvs_tpu.interfaces.metashape import import_metashape

    xml = """<document><chunk>
      <sensors><sensor id="0" type="frame">
        <resolution width="640" height="480"/>
        <calibration type="frame" class="adjusted">
          <resolution width="640" height="480"/>
          <f>600</f><cx>1.5</cx><cy>-2.0</cy>
        </calibration></sensor></sensors>
      <cameras>
        <camera id="0" sensor_id="0" label="im0">
          <transform>1 0 0 0  0 1 0 0  0 0 1 0  0 0 0 1</transform>
        </camera>
        <camera id="1" sensor_id="0" label="im1">
          <transform>1 0 0 0.5  0 1 0 0  0 0 1 0  0 0 0 1</transform>
        </camera>
      </cameras></chunk></document>"""
    p = str(tmp_path / "doc.xml")
    open(p, "w").write(xml)
    itf = import_metashape(p)
    assert len(itf.images) == 2
    K = itf.platforms[0].cameras[0].K
    assert K[0, 2] == 321.5 and K[1, 2] == 238.0
    np.testing.assert_allclose(itf.platforms[0].poses[1].C, [0.5, 0, 0])


def test_polycam_import(tmp_path):
    import json
    from PIL import Image
    from openmvs_tpu.interfaces.polycam import import_polycam

    kf = tmp_path / "keyframes"
    (kf / "cameras").mkdir(parents=True)
    (kf / "images").mkdir(parents=True)
    for i, ts in enumerate(("100", "200")):
        cam = {"fx": 600.0, "fy": 600.0, "cx": 320.0, "cy": 240.0,
               "width": 640, "height": 480,
               "t_00": 1, "t_01": 0, "t_02": 0, "t_03": 0.3 * i,
               "t_10": 0, "t_11": 1, "t_12": 0, "t_13": 0,
               "t_20": 0, "t_21": 0, "t_22": 1, "t_23": 0}
        json.dump(cam, open(kf / "cameras" / f"{ts}.json", "w"))
        Image.new("RGB", (640, 480)).save(kf / "images" / f"{ts}.jpg")
    itf = import_polycam(str(tmp_path))
    assert len(itf.images) == 2
    np.testing.assert_allclose(itf.platforms[1].poses[0].C, [0.3, 0, 0], atol=1e-12)


def test_mvsnet_import_real_cam_format(tmp_path):
    """Real MVSNet *_cam.txt files carry literal 'extrinsic'/'intrinsic'
    header lines (InterfaceMVSNet.cpp:277-294); the parser must not read the
    lone 'e' of 'extrinsic' as a number."""
    from PIL import Image
    from openmvs_tpu.interfaces.mvsnet import import_mvsnet

    (tmp_path / "cams").mkdir()
    (tmp_path / "images").mkdir()
    cam_txt = """extrinsic
1.0 0.0 0.0 0.5
0.0 1.0 0.0 0.0
0.0 0.0 1.0 0.0
0.0 0.0 0.0 1.0

intrinsic
600.0 0.0 320.0
0.0 600.0 240.0
0.0 0.0 1.0

2.5 0.01 192 4.42
"""
    (tmp_path / "cams" / "00000000_cam.txt").write_text(cam_txt)
    Image.new("RGB", (640, 480)).save(tmp_path / "images" / "00000000.jpg")
    itf = import_mvsnet(str(tmp_path))
    assert len(itf.images) == 1
    np.testing.assert_allclose(itf.platforms[0].poses[0].C, [-0.5, 0, 0])
    np.testing.assert_allclose(itf.platforms[0].cameras[0].K[0, 0] /
                               itf.platforms[0].cameras[0].width * 640, 600.0)
    assert itf.images[0].min_depth == 2.5
    assert itf.images[0].max_depth == 4.42


def test_select_pairs_global_mutual():
    """Every pair reported by the global stereo pairing must be mutual."""
    from openmvs_tpu.view_selection import select_pairs_global
    from openmvs_tpu.config import DenseOptions

    class _M:  # minimal stand-ins
        def __init__(self, id, vs):
            self.id = id
            self.view_scores = vs

    class _I:
        def __init__(self, meta):
            self.meta = meta

    class _S:
        pass

    # scores engineered to produce a 3-cycle on the symmetrized matrix:
    # 0->1 strong, 1->2 strong, 2->0 strong
    VS = mvsio.ViewScore
    sc = _S()
    sc.images = [
        _I(_M(0, [VS(id=1, score=10.0), VS(id=2, score=9.0)])),
        _I(_M(1, [VS(id=2, score=10.0), VS(id=0, score=1.0)])),
        _I(_M(2, [VS(id=0, score=10.0), VS(id=1, score=1.0)])),
        _I(_M(3, [VS(id=0, score=0.5)])),
    ]
    sc.n_views = 4
    pairs = select_pairs_global(sc, DenseOptions())
    for a, b in pairs.items():
        assert pairs.get(b) == a, f"pair {a}->{b} not mutual"


def test_colmap_distorted_import_undistorts(tmp_path):
    """A SIMPLE_RADIAL model must import with images undistorted on disk
    (reference behavior: undistort before densify, InterfaceVisualSFM.cpp:457;
    COLMAP models via image_undistorter)."""
    import cv2

    rng = np.random.default_rng(3)
    H, W, f, k1 = 120, 160, 140.0, -0.25
    # ground-truth pinhole image: smooth random texture
    base = cv2.GaussianBlur(rng.uniform(0, 255, (H, W)).astype(np.float32), (0, 0), 2.0)
    # synthesize the DISTORTED observation: sample base at undistorted coords
    # x_u such that distort(x_u) = pixel — i.e. remap with the inverse model,
    # approximated by cv2.undistortPoints on the pixel grid
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    dist = np.array([k1, 0, 0, 0, 0.0])
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    pts = np.stack([uu.ravel(), vv.ravel()], -1)[:, None, :]
    und = cv2.undistortPoints(pts, K, dist, P=K).reshape(H, W, 2)
    distorted = cv2.remap(base, und[..., 0], und[..., 1], cv2.INTER_LINEAR)

    folder = tmp_path / "sparse"
    folder.mkdir()
    cv2.imwrite(str(tmp_path / "im0.png"), distorted.astype(np.uint8))
    cv2.imwrite(str(tmp_path / "im1.png"), distorted.astype(np.uint8))
    (folder / "cameras.txt").write_text(
        f"1 SIMPLE_RADIAL {W} {H} {f} {W/2} {H/2} {k1}\n")
    lines = ["# imgs"]
    for i in range(2):
        lines.append(f"{i+1} 1 0 0 0 0 0 {0.5*i} 1 im{i}.png")
        lines.append("")
    (folder / "images.txt").write_text("\n".join(lines) + "\n")
    (folder / "points3D.txt").write_text(
        "1 0 0 5 10 20 30 0.1 1 0 2 0\n")

    itf = colmap.import_colmap(str(folder), str(tmp_path),
                               undistort_dir=str(tmp_path / "und"))
    # meta now points at undistorted copies
    assert all("und" in m.name for m in itf.images)
    out = cv2.imread(itf.images[0].name, cv2.IMREAD_UNCHANGED).astype(np.float32)
    # interior must match the pinhole ground truth closely
    c = 25
    err = np.abs(out[c:-c, c:-c] - base[c:-c, c:-c])
    assert err.mean() < 3.0, err.mean()


def test_bundler_import(tmp_path):
    from PIL import Image
    from openmvs_tpu.interfaces.visualsfm import import_bundler

    for i in range(2):
        Image.new("RGB", (64, 48)).save(tmp_path / f"im{i}.jpg")
    (tmp_path / "list.txt").write_text("im0.jpg\nim1.jpg\n")
    # camera 0: identity (OpenGL), at origin; camera 1 shifted +x
    out = ["# Bundle file v0.3", "2 1"]
    for i in range(2):
        out += ["100 0 0", "1 0 0", "0 1 0", "0 0 1", f"{-0.4*i} 0 0"]
    out += ["0 0 -5", "10 20 30", "2 0 0 0 0 1 0 0 0"]
    (tmp_path / "bundle.out").write_text("\n".join(out) + "\n")
    itf = import_bundler(str(tmp_path / "bundle.out"))
    assert len(itf.images) == 2
    # GL->CV: R = diag(1,-1,-1) @ I; C = -R^T t = [0.4, 0, 0] for camera 1
    np.testing.assert_allclose(itf.platforms[1].poses[0].C, [0.4, 0, 0], atol=1e-12)
    # GL point (0,0,-5) should be IN FRONT in CV convention: z_cam > 0
    R = itf.platforms[0].poses[0].R
    X = itf.points[0].astype(float)
    z = (R @ X)[2]
    assert z > 0
    assert len(itf.point_views[0]) == 2


class _CerealWriter:
    """Spec-faithful cereal PortableBinaryOutputArchive encoder used to
    fabricate sfm_data.bin fixtures (no cereal/openMVG in this image; the
    format is implemented from cereal portable_binary.hpp / polymorphic.hpp
    semantics documented in openmvg._CerealReader)."""

    MSB = 0x80000000
    MSB2 = 0x40000000

    def __init__(self):
        self.out = bytearray([1])        # little-endian flag
        self.poly_ids = {}
        self.next_poly = 2
        self.next_ptr = 1

    def u8(self, v): self.out += bytes([v])
    def u32(self, v): self.out += int(v).to_bytes(4, "little")
    def u64(self, v): self.out += int(v).to_bytes(8, "little")
    def f64(self, v): self.out += np.float64(v).tobytes()

    def string(self, s):
        b = s.encode()
        self.u64(len(b)); self.out += b

    def dvec(self, v):
        v = np.asarray(v, np.float64).ravel()
        self.u64(len(v)); self.out += v.tobytes()

    def dmat(self, m):
        self.u64(len(m))
        for row in m: self.dvec(row)

    def poly_ptr(self, name):
        """Emit polymorphic_id (+name) and a fresh ptr_wrapper id with data."""
        if name is None:
            self.u32(self.MSB2)          # static (non-polymorphic) type
        elif name in self.poly_ids:
            self.u32(self.poly_ids[name])
        else:
            self.poly_ids[name] = self.next_poly
            self.u32(self.next_poly | self.MSB)
            self.next_poly += 1
            self.string(name)
        self.u32(self.next_ptr | self.MSB)   # first sight: data follows
        self.next_ptr += 1


def _make_sfm_data_bin(path, distorted=False):
    w = _CerealWriter()
    w.string("0.3")                      # sfm_data_version
    w.string("/imgs")                    # root_path
    w.u64(3)                             # views
    for i in range(3):
        w.u32(i)
        w.poly_ptr(None)                 # plain View via msb2 path
        w.string("")                     # local_path
        w.string(f"im{i}.jpg")
        w.u32(640); w.u32(480)
        w.u32(i); w.u32(0); w.u32(i)     # id_view, id_intrinsic, id_pose
    w.u64(1)                             # intrinsics
    w.u32(0)
    w.poly_ptr("pinhole_radial_k3" if distorted else "pinhole")
    w.u32(640); w.u32(480)
    w.f64(600.0)
    w.dvec([320.0, 240.0])
    if distorted:
        w.dvec([-0.1, 0.01, 0.001])
    w.u64(3)                             # extrinsics
    for i in range(3):
        w.u32(i)
        w.dmat(np.eye(3).tolist())
        w.dvec([0.4 * i, 0.0, 0.0])
    w.u64(5)                             # structure
    for k in range(5):
        w.u32(k)
        w.dvec([0.0, 0.0, 5.0 + 0.01 * k])
        w.u64(2)                         # observations
        for v in range(2):
            w.u32(v); w.u32(100 + k); w.dvec([10.0, 20.0])
    w.u64(0)                             # control_points
    open(path, "wb").write(bytes(w.out))


def test_openmvg_bin_import(tmp_path):
    from openmvs_tpu.interfaces.openmvg import import_openmvg

    p = str(tmp_path / "sfm_data.bin")
    _make_sfm_data_bin(p)
    itf = import_openmvg(p)
    assert len(itf.images) == 3
    assert len(itf.points) == 5
    assert itf.images[1].name.endswith("im1.jpg")
    K = itf.platforms[0].cameras[0].K
    np.testing.assert_allclose(np.diag(K), [600, 600, 1], atol=1e-12)
    pose = itf.platforms[0].poses[itf.images[2].pose_id]
    np.testing.assert_allclose(pose.C, [0.8, 0, 0], atol=1e-12)
    assert len(itf.point_views[0]) == 2


def test_openmvg_bin_distorted_names_reuse(tmp_path):
    """Polymorphic-name reuse across entries + disto parsing."""
    from openmvs_tpu.interfaces.openmvg import _load_sfm_data_bin, _opencv_dist

    p = str(tmp_path / "sfm_data.bin")
    _make_sfm_data_bin(p, distorted=True)
    doc = _load_sfm_data_bin(p)
    it = doc["intrinsics"][0]["value"]
    assert it["polymorphic_name"] == "pinhole_radial_k3"
    d = _opencv_dist("pinhole_radial_k3", it["ptr_wrapper"]["data"])
    np.testing.assert_allclose(d, [-0.1, 0.01, 0, 0, 0.001])


def test_blocks_exchange_import(tmp_path):
    from openmvs_tpu.interfaces.metashape import import_metashape

    photos = "\n".join(f"""
      <Photo><Id>{i}</Id><ImagePath>im{i}.jpg</ImagePath>
        <Pose>
          <Rotation><M_00>1</M_00><M_01>0</M_01><M_02>0</M_02>
                    <M_10>0</M_10><M_11>1</M_11><M_12>0</M_12>
                    <M_20>0</M_20><M_21>0</M_21><M_22>1</M_22></Rotation>
          <Center><x>{0.3*i}</x><y>0</y><z>0</z></Center>
        </Pose></Photo>""" for i in range(3))
    xml = f"""<?xml version="1.0"?>
    <BlocksExchange version="2.1">
     <Block><Name>b</Name>
      <Photogroups>
       <Photogroup>
        <Name>g0</Name>
        <CameraModelType>Perspective</CameraModelType>
        <ImageDimensions><Width>640</Width><Height>480</Height></ImageDimensions>
        <FocalLengthPixels>600</FocalLengthPixels>
        <PrincipalPoint><x>321</x><y>239</y></PrincipalPoint>
        {photos}
       </Photogroup>
      </Photogroups>
      <TiePoints>
       <TiePoint>
        <Position><x>0</x><y>0</y><z>5</z></Position>
        <Color><Red>0.5</Red><Green>0.25</Green><Blue>1.0</Blue></Color>
        <Measurement><PhotoId>0</PhotoId><x>1</x><y>2</y></Measurement>
        <Measurement><PhotoId>2</PhotoId><x>3</x><y>4</y></Measurement>
       </TiePoint>
      </TiePoints>
     </Block>
    </BlocksExchange>"""
    p = tmp_path / "block.xml"
    p.write_text(xml)
    itf = import_metashape(str(p))
    assert len(itf.images) == 3
    assert len(itf.points) == 1
    K = itf.platforms[0].cameras[0].K
    np.testing.assert_allclose([K[0, 0], K[0, 2], K[1, 2]], [600, 321, 239])
    pose = itf.platforms[0].poses[itf.images[2].pose_id]
    np.testing.assert_allclose(pose.C, [0.6, 0, 0], atol=1e-12)
    np.testing.assert_array_equal(itf.point_views[0], [0, 2])
    np.testing.assert_array_equal(itf.colors[0], [127, 63, 255])


def test_cli_transform_align(tmp_path):
    """transform --align-file recovers a known similarity between two copies
    of the same scene (TransformScene --align-file role)."""
    import sys
    sys.path.insert(0, "tests")
    import numpy as np
    from test_mesh import sphere_scene
    from openmvs_tpu.__main__ import main

    def with_platforms(scene):
        from openmvs_tpu.io import mvs as mvsio
        for i, im in enumerate(scene.images):
            im.meta.platform_id = i
            scene.platforms.append(mvsio.Platform(
                name=f"p{i}",
                cameras=[mvsio.CameraRig(K=im.camera.K, width=im.width,
                                         height=im.height)],
                poses=[mvsio.Pose(R=im.camera.R, C=im.camera.C)]))
        return scene

    a = with_platforms(sphere_scene(n=300))
    pa = str(tmp_path / "a.mvs")
    a.save(pa)
    # b = a moved by a rigid transform
    b = with_platforms(sphere_scene(n=300))
    T = np.eye(4)
    T[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]]) * 2.0  # rot+scale
    T[:3, 3] = [1.0, -2.0, 3.0]
    b.apply_transform(T)
    pb = str(tmp_path / "b.mvs")
    b.save(pb)
    out = str(tmp_path / "b_aligned.mvs")
    main(["transform", pb, "--align-file", pa, "-o", out])
    from openmvs_tpu.scene import Scene
    back = Scene.load(out)
    # camera centers must coincide with the originals again
    ca = np.stack([im.camera.C for im in a.images])
    cb = np.stack([im.camera.C for im in back.images])
    np.testing.assert_allclose(cb, ca, atol=1e-6)


def test_cli_dump(tmp_path, capsys):
    """dump subcommand (MvsReadMVS.py/MvsReadDMAP.py example roles)."""
    import json

    import numpy as np

    from openmvs_tpu.__main__ import main
    from openmvs_tpu.io import dmap as dmapio
    from openmvs_tpu.io import mvs as mvsio

    # minimal .mvs
    itf = mvsio.Interface()
    cam = mvsio.CameraRig(K=np.eye(3) * 100, width=64, height=48)
    itf.platforms.append(mvsio.Platform(
        name="p0", cameras=[cam],
        poses=[mvsio.Pose(R=np.eye(3), C=np.zeros(3))]))
    im = mvsio.ImageMeta(); im.name = "a.jpg"; im.id = 0
    itf.images.append(im)
    scene_p = str(tmp_path / "s.mvs")
    mvsio.save(itf, scene_p)
    out_json = str(tmp_path / "s.json")
    main(["dump", scene_p, "-o", out_json])
    doc = json.load(open(out_json))
    assert len(doc["platforms"]) == 1 and len(doc["images"]) == 1
    assert "Camera model loaded" in capsys.readouterr().out

    # minimal .dmap + PNG export
    dd = dmapio.DepthData(
        depth=np.full((16, 16), 2.0, np.float32), image_width=16,
        image_height=16, depth_min=1.0, depth_max=3.0, file_name="a.jpg",
        view_ids=np.array([0], np.uint32), K=np.eye(3), R=np.eye(3),
        C=np.zeros(3),
        normal=np.tile(np.float32([0, 0, -1]), (16, 16, 1)),
        conf=np.full((16, 16), 0.5, np.float32))
    dmap_p = str(tmp_path / "depth0000.dmap")
    dmapio.save(dd, dmap_p)
    viz = tmp_path / "viz"
    main(["dump", dmap_p, "-o", str(viz)])
    assert (viz / "depth0000.png").exists()
    assert (viz / "normal0000.png").exists()
    assert (viz / "conf0000.png").exists()


def test_colmap_radial_K():
    """RADIAL params are f cx cy k1 k2 — single focal, not fx/fy
    (COLMAP src/colmap/sensor/models.h)."""
    from openmvs_tpu.interfaces.colmap import _K_from_params

    K = _K_from_params("RADIAL", np.array([500.0, 320.0, 240.0, 0.1, 0.01]))
    assert K[0, 0] == K[1, 1] == 500.0
    assert (K[0, 2], K[1, 2]) == (320.0, 240.0)
    K = _K_from_params("FOV", np.array([500.0, 510.0, 320.0, 240.0, 0.9]))
    assert (K[0, 0], K[1, 1], K[0, 2], K[1, 2]) == (500.0, 510.0, 320.0, 240.0)


def test_openmvg_brown_t2_tangential_order(tmp_path):
    """openMVG disto_t2 [k1 k2 k3 t1 t2] maps to OpenCV [k1 k2 p1 p2 k3]
    with t1->p1, t2->p2 (distoFunction: t_x = t2*(r2+2x^2) + 2*t1*x*y)."""
    from openmvs_tpu.interfaces.openmvg import _opencv_dist

    d = _opencv_dist("pinhole_brown_t2",
                     {"disto_t2": [0.1, 0.02, 0.003, 0.004, 0.005]})
    np.testing.assert_allclose(d, [0.1, 0.02, 0.004, 0.005, 0.003])


def test_mvsnet_pair_indices_survive_missing_image(tmp_path):
    """pair.txt uses ORIGINAL cam indices; a cam without an image must not
    shift every later neighbor id (InterfaceMVSNet role)."""
    from PIL import Image

    from openmvs_tpu.interfaces.mvsnet import import_mvsnet

    root = tmp_path
    (root / "cams").mkdir()
    (root / "images").mkdir()
    cam_txt = ("extrinsic\n"
               "1 0 0 0\n0 1 0 {ty}\n0 0 1 0\n0 0 0 1\n\n"
               "intrinsic\n100 0 32\n0 100 24\n0 0 1\n\n"
               "1.0 0.1 64 7.4\n")
    for i in range(3):
        (root / "cams" / f"{i:08d}_cam.txt").write_text(
            cam_txt.format(ty=0.1 * i))
        if i != 1:     # cam 1 has NO image
            Image.new("L", (64, 48)).save(root / "images" / f"{i:08d}.jpg")
    (root / "pair.txt").write_text(
        "2\n0\n2 2 10.0 1 5.0\n2\n1 0 8.0\n")
    itf = import_mvsnet(str(root))
    assert len(itf.images) == 2            # cams 0 and 2
    # view 0's neighbors: original ids 2 (kept, remapped to 1) and 1 (gone)
    vs = itf.images[0].view_scores
    assert [v.id for v in vs] == [1]
    assert vs[0].score == 10.0
    # original ref 2 -> compacted image 1; its neighbor 0 keeps id 0
    assert [v.id for v in itf.images[1].view_scores] == [0]


def test_undistort_collision_unique_names(tmp_path, monkeypatch):
    """Same basename from different subfolders must not overwrite in the
    flat undistort output dir."""
    import cv2

    from openmvs_tpu.interfaces import undistort as und
    from openmvs_tpu.io import mvs as mvsio

    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    itf = mvsio.Interface()
    for sub, val in (("a", 10), ("b", 200)):
        d = tmp_path / sub
        d.mkdir()
        img = np.full((48, 64), val, np.uint8)
        cv2.imwrite(str(d / "img.png"), img)
        itf.platforms.append(mvsio.Platform(
            name=sub, cameras=[mvsio.CameraRig(width=64, height=48, K=K)]))
        itf.images.append(mvsio.ImageMeta(
            name=str(d / "img.png"), platform_id=len(itf.platforms) - 1,
            camera_id=0, pose_id=0, id=len(itf.images)))
    dists = {0: np.array([0.01, 0, 0, 0, 0]), 1: np.array([0.01, 0, 0, 0, 0])}
    out = tmp_path / "und"
    n = und.undistort_interface_images(itf, dists, str(out))
    assert n == 2
    names = {im.name for im in itf.images}
    assert len(names) == 2                 # distinct outputs
    a = cv2.imread(itf.images[0].name, 0)
    b = cv2.imread(itf.images[1].name, 0)
    assert abs(int(a[24, 32]) - 10) < 3 and abs(int(b[24, 32]) - 200) < 6
