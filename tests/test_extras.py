"""Similarity alignment, ground plane, dimap IO, merge fusion, pair MRF."""

import numpy as np

from openmvs_tpu.geometry.camera import Camera
from openmvs_tpu.io import mvs as mvsio
from openmvs_tpu.scene import PointCloud, Scene, SceneImage


def test_umeyama_roundtrip():
    from openmvs_tpu.geometry.similarity import umeyama

    rng = np.random.default_rng(0)
    src = rng.normal(size=(40, 3))
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    s, t = 2.3, np.array([1.0, -2.0, 0.5])
    dst = s * src @ R.T + t
    T, scale = umeyama(src, dst)
    assert abs(scale - s) < 1e-9
    got = (np.c_[src, np.ones(len(src))] @ T.T)[:, :3]
    np.testing.assert_allclose(got, dst, atol=1e-9)


def _mini_scene(offset=np.zeros(3), scale=1.0):
    scene = Scene()
    K = np.array([[400, 0, 320], [0, 400, 240], [0, 0, 1.0]])
    for i in range(5):
        meta = mvsio.ImageMeta()
        meta.id = i
        meta.name = f"cam{i}.jpg"
        meta.platform_id = i
        C = scale * np.array([i * 1.0, (i % 2) * 2.0, i * 0.5]) + offset
        scene.platforms.append(mvsio.Platform(
            name=f"p{i}", cameras=[mvsio.CameraRig(K=K, width=640, height=480)],
            poses=[mvsio.Pose(R=np.eye(3), C=C)]))
        scene.images.append(SceneImage(meta=meta, camera=Camera(K, np.eye(3), C),
                                       width=640, height=480))
    return scene


def test_align_to():
    ref = _mini_scene()
    moved = _mini_scene(offset=np.array([5.0, -1.0, 2.0]), scale=0.5)
    T = moved.align_to(ref)
    got = np.stack([im.camera.C for im in moved.images])
    want = np.stack([im.camera.C for im in ref.images])
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert T.shape == (4, 4)


def test_ground_plane():
    from openmvs_tpu.geometry.similarity import estimate_ground_plane

    rng = np.random.default_rng(1)
    ground = np.c_[rng.uniform(-5, 5, (500, 2)), rng.normal(0, 0.01, 500)]
    clutter = rng.uniform(-2, 2, (100, 3)) + [0, 0, 3.0]
    n, d = estimate_ground_plane(np.vstack([ground, clutter]))
    assert abs(abs(n[2]) - 1.0) < 1e-2
    assert abs(d) < 0.05
    # above-ground orientation: clutter on positive side
    assert np.median(clutter @ n + d) > 0


def test_dimap_roundtrip(tmp_path):
    from openmvs_tpu.io import dimap

    rng = np.random.default_rng(2)
    disp = np.round(rng.uniform(-64, 64, (120, 160)) * 4) / 4.0
    dd = dimap.DisparityData(
        disparity=disp.astype(np.float32), image_width=160, image_height=120,
        H=rng.normal(size=(3, 3)), Q=rng.normal(size=(4, 4)),
        subpixel_steps=4,
        cost=rng.integers(0, 1000, (120, 160)).astype(np.uint16))
    p = str(tmp_path / "x.dimap")
    dimap.save(dd, p)
    back = dimap.load(p)
    np.testing.assert_allclose(back.disparity, disp, atol=1e-6)
    np.testing.assert_allclose(back.H, dd.H)
    np.testing.assert_allclose(back.Q, dd.Q)
    np.testing.assert_array_equal(back.cost, dd.cost)
    assert (back.image_width, back.image_height) == (160, 120)


def test_merge_depth_maps():
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu.ops import fusion

    K = np.array([[100, 0, 32], [0, 100, 24], [0, 0, 1.0]])
    views = []
    for i in range(2):
        cam = Camera(K, np.eye(3), np.array([i * 0.1, 0, 0]))
        depth = np.zeros((48, 64), np.float32)
        depth[10:20, 10:20] = 5.0
        views.append(fusion.ViewDepthData(
            image_idx=i, image_id=i, camera=cam, depth=depth,
            normal=None, conf=None, color=None, neighbor_ids=[1 - i]))
    pc = fusion.merge_depth_maps(views, DenseOptions(), estimate_color=False,
                                 estimate_normal=False)
    assert len(pc) == 200  # 100 valid px per view, no cross-view merging
    assert all(len(v) == 1 for v in pc.views)
    # back-projected depth is preserved
    z = pc.points[:, 2]
    np.testing.assert_allclose(z, 5.0, atol=1e-5)


def test_select_pairs_global():
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu.view_selection import select_pairs_global
    from openmvs_tpu.io.mvs import ViewScore

    scene = _mini_scene()

    def vs(i, s):
        v = ViewScore()
        v.id = i
        v.score = s
        return v

    # 0<->1 strong, 2<->3 strong, 4 weakly sees 0
    scene.images[0].meta.view_scores = [vs(1, 10.0), vs(2, 1.0)]
    scene.images[1].meta.view_scores = [vs(0, 9.0)]
    scene.images[2].meta.view_scores = [vs(3, 8.0), vs(0, 1.0)]
    scene.images[3].meta.view_scores = [vs(2, 7.0)]
    scene.images[4].meta.view_scores = [vs(0, 0.5)]
    pairs = select_pairs_global(scene, DenseOptions(num_views=1))
    assert pairs[0] == 1 and pairs[1] == 0
    assert pairs[2] == 3 and pairs[3] == 2
    assert len(scene.images[0].meta.view_scores) == 1
    assert scene.images[0].meta.view_scores[0].id == 1
