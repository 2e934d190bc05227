"""Dataset eval adapters (ETH3D/DTU) on synthetic mocks of the real layouts."""

import os

import numpy as np
import pytest

from openmvs_tpu import datasets
from openmvs_tpu.io import ply as plyio


def _write_png(path, w=64, h=48):
    from PIL import Image

    rng = np.random.default_rng(hash(path) % 2**31)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


def _make_eth3d_mock(root):
    """Tiny ETH3D training-scene layout: COLMAP txt calibration + scan GT."""
    scene = os.path.join(root, "courtyard")
    calib = os.path.join(scene, "dslr_calibration_undistorted")
    imgdir = os.path.join(scene, "images", "dslr_images_undistorted")
    scandir = os.path.join(scene, "scan_clean")
    for d in (calib, imgdir, scandir):
        os.makedirs(d)

    with open(os.path.join(calib, "cameras.txt"), "w") as f:
        f.write("# comment\n1 PINHOLE 64 48 60 60 32 24\n")
    with open(os.path.join(calib, "images.txt"), "w") as f:
        for i in range(3):
            # identity rotation, camera centers on the x axis
            f.write(f"{i+1} 1 0 0 0 {-0.2*i} 0 0 1 "
                    f"images/dslr_images_undistorted/img{i}.png\n\n")
    rng = np.random.default_rng(0)
    pts = rng.uniform([-0.5, -0.5, 2.0], [0.5, 0.5, 3.0], (20, 3))
    with open(os.path.join(calib, "points3D.txt"), "w") as f:
        for j, p in enumerate(pts):
            f.write(f"{j+1} {p[0]} {p[1]} {p[2]} 128 128 128 0.5 "
                    "1 0 2 0 3 0\n")
    for i in range(3):
        _write_png(os.path.join(imgdir, f"img{i}.png"))

    gt = rng.uniform([-0.5, -0.5, 2.0], [0.5, 0.5, 3.0], (2000, 3))
    plyio.save_point_cloud(os.path.join(scandir, "scan1.ply"), gt.astype(np.float32))
    return scene, gt


def test_eth3d_scene_loads(tmp_path):
    scene_dir, _ = _make_eth3d_mock(str(tmp_path))
    scene, gt_paths = datasets.load_eth3d_scene(scene_dir)
    assert len(scene.images) == 3
    assert len(gt_paths) == 1
    np.testing.assert_allclose(scene.images[1].camera.C, [0.2, 0, 0], atol=1e-9)
    np.testing.assert_allclose(scene.images[0].camera.K[0, 0], 60)
    assert len(scene.pointcloud) == 20
    # sparse points carry >=2 views (seedable)
    assert all(len(v) >= 2 for v in scene.pointcloud.views)


def test_eth3d_eval_runner(tmp_path):
    scene_dir, gt = _make_eth3d_mock(str(tmp_path))
    rng = np.random.default_rng(1)
    est = gt + rng.normal(0, 0.002, gt.shape)   # 2mm noise
    est_ply = str(tmp_path / "est.ply")
    plyio.save_point_cloud(est_ply, est.astype(np.float32))
    out_json = str(tmp_path / "res.json")
    res = datasets.run_eval("eth3d", scene_dir, est_ply=est_ply,
                            out_json=out_json)
    assert res["protocol"] == "eth3d"
    # 2mm gaussian noise: nearly everything within 2cm
    assert res["fscore@2cm"] > 0.99
    assert res["headline_f1_2cm"] == res["fscore@2cm"]
    assert 0.0 <= res["fscore@1cm"] <= 1.0
    assert os.path.exists(out_json)


def test_decompose_P_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(10):
        K = np.array([[800 + rng.uniform(0, 100), 0, 320],
                      [0, 800 + rng.uniform(0, 100), 240],
                      [0, 0, 1.0]])
        # random rotation via QR
        Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        C = rng.normal(size=3)
        P = K @ Q @ np.concatenate([np.eye(3), -C[:, None]], axis=1)
        K2, R2, C2 = datasets.decompose_P(P * rng.uniform(0.5, 2.0))
        np.testing.assert_allclose(K2, K, rtol=1e-9, atol=1e-6)
        np.testing.assert_allclose(R2, Q, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(C2, C, rtol=1e-9, atol=1e-9)


def _make_dtu_mock(root):
    cal = os.path.join(root, "Calibration", "cal18")
    rect = os.path.join(root, "Rectified", "scan6")
    stl = os.path.join(root, "Points", "stl")
    for d in (cal, rect, stl):
        os.makedirs(d)
    K = np.array([[1200.0, 0, 800], [0, 1200, 600], [0, 0, 1]])
    for i in range(1, 4):
        ang = 0.1 * i
        R = np.array([[np.cos(ang), 0, -np.sin(ang)], [0, 1, 0],
                      [np.sin(ang), 0, np.cos(ang)]])
        C = np.array([50.0 * i, 0, -500.0])
        P = K @ R @ np.concatenate([np.eye(3), -C[:, None]], axis=1)
        np.savetxt(os.path.join(cal, f"pos_{i:03d}.txt"), P)
        _write_png(os.path.join(rect, f"rect_{i:03d}_max.png"), 160, 120)
    rng = np.random.default_rng(3)
    gt = rng.uniform([-100, -100, 500], [100, 100, 700], (3000, 3))
    plyio.save_point_cloud(os.path.join(stl, "stl006_total.ply"),
                           gt.astype(np.float32))
    return root, K, gt


def test_dtu_scan_loads(tmp_path):
    root, K, _ = _make_dtu_mock(str(tmp_path))
    scene, gt_path = datasets.load_dtu_scan(root, 6)
    assert len(scene.images) == 3
    assert gt_path and gt_path.endswith("stl006_total.ply")
    np.testing.assert_allclose(scene.images[0].camera.K, K, atol=1e-6)
    np.testing.assert_allclose(scene.images[2].camera.C, [150, 0, -500],
                               atol=1e-6)
    assert scene.images[0].width == 160


def test_dtu_eval_runner(tmp_path):
    root, _, gt = _make_dtu_mock(str(tmp_path))
    rng = np.random.default_rng(4)
    est = gt + rng.normal(0, 0.3, gt.shape)  # 0.3mm noise
    est_ply = str(tmp_path / "est.ply")
    plyio.save_point_cloud(est_ply, est.astype(np.float32))
    res = datasets.run_eval("dtu", root, est_ply=est_ply, scan=6)
    assert res["protocol"] == "dtu"
    assert res["mean_accuracy_mm"] < 1.0
    assert res["fscore@2mm"] > 0.95


def test_missing_gt_fails_loudly(tmp_path):
    scene = os.path.join(str(tmp_path), "s")
    calib = os.path.join(scene, "dslr_calibration_undistorted")
    os.makedirs(calib)
    with pytest.raises(FileNotFoundError):
        datasets.find_eth3d_calibration(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        datasets.load_dtu_scan(str(tmp_path), 1)
