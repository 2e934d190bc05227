"""Scene split/chunk tests."""

import os

import numpy as np

from openmvs_tpu.io import mvs as mvsio
from openmvs_tpu.geometry.camera import Camera
from openmvs_tpu.scene import PointCloud, Scene, SceneImage


def _scene(n=10000, seed=0):
    rng = np.random.default_rng(seed)
    scene = Scene()
    K = np.array([[400, 0, 320], [0, 400, 240], [0, 0, 1.0]])
    for i in range(6):
        meta = mvsio.ImageMeta()
        meta.id = i
        meta.name = f"img{i}.jpg"
        C = np.array([i * 2.0, 0, -5.0])
        scene.platforms.append(mvsio.Platform(
            name=f"p{i}", cameras=[mvsio.CameraRig(K=K, width=640, height=480)],
            poses=[mvsio.Pose(R=np.eye(3), C=C)]))
        meta.platform_id = i
        scene.images.append(SceneImage(meta=meta, camera=Camera(K, np.eye(3), C),
                                       width=640, height=480))
    pts = rng.uniform([0, -2, 0], [10, 2, 2], (n, 3)).astype(np.float32)
    # each point seen by the 2 nearest cameras (by x)
    cam_x = np.arange(6) * 2.0
    order = np.argsort(np.abs(pts[:, 0, None] - cam_x[None]), axis=1)[:, :2]
    views = [np.sort(order[i]).astype(np.uint32) for i in range(n)]
    scene.pointcloud = PointCloud(points=pts, views=views,
                                  weights=[np.ones(2, np.float32)] * n)
    return scene


def test_split_counts():
    from openmvs_tpu.split import split_scene

    scene = _scene()
    chunks = split_scene(scene, max_points=3000)
    assert len(chunks) >= 4
    assert sum(len(c.point_idx) for c in chunks) == len(scene.pointcloud.points)
    for c in chunks:
        assert len(c.point_idx) <= 3000
        assert len(c.image_idx) >= 1


def test_export_chunks_roundtrip(tmp_path):
    from openmvs_tpu.split import export_chunks, split_scene

    scene = _scene()
    chunks = split_scene(scene, max_points=4000)
    paths = export_chunks(scene, chunks, str(tmp_path))
    assert len(paths) >= 2
    total = 0
    for p in paths:
        sub = Scene.load(p)
        assert len(sub.images) >= 1
        assert len(sub.pointcloud) > 0
        total += len(sub.pointcloud)
        # views must reference only images present in the chunk
        ids = {im.meta.id for im in sub.images}
        for v in sub.pointcloud.views[:100]:
            assert all(int(x) in ids for x in v)
    # overlap duplicates points, so total >= original in-box sum
    assert total >= len(scene.pointcloud.points) * 0.8
