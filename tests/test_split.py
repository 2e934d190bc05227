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


def test_dense_reconstruction_multidevice_parity():
    """View distribution over devices must not change results (8 virtual CPU
    devices in the suite)."""
    import jax

    try:
        cpu_devs = jax.local_devices(backend="cpu")
    except RuntimeError:
        cpu_devs = []
    if len(cpu_devs) < 2:
        import pytest

        pytest.skip("needs multiple CPU devices")
    import numpy as np
    import cv2
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu.densify import dense_reconstruction

    # tiny synthetic textured-plane scene with 3 views + sparse seeds
    rng = np.random.default_rng(0)
    H, W = 96, 128
    f = 110.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    tex = cv2.GaussianBlur(rng.uniform(0, 255, (256, 256, 3)).astype(np.uint8), (0, 0), 1.0)
    scene = _scene(n=0)  # reuse builder scaffolding then replace
    scene.images = scene.images[:3]
    scene.platforms = scene.platforms[:3]
    import tempfile, os

    tmp = tempfile.mkdtemp()
    pts = []
    for i in range(3):
        C = np.array([0.4 * i, 0, 0.0])
        scene.platforms[i].poses[0].C = C
        scene.platforms[i].cameras[0].K = K
        scene.platforms[i].cameras[0].width = W
        scene.platforms[i].cameras[0].height = H
        from openmvs_tpu.geometry.camera import Camera

        scene.images[i].camera = Camera(K, np.eye(3), C)
        scene.images[i].width = W
        scene.images[i].height = H
        uu, vv = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
        x = (uu - K[0, 2]) / f * 5.0 + C[0]
        y = (vv - K[1, 2]) / f * 5.0
        img = cv2.remap(tex, ((x * 24 + 128) % 256).astype(np.float32),
                        ((y * 24 + 128) % 256).astype(np.float32), cv2.INTER_LINEAR)
        p = os.path.join(tmp, f"im{i}.png")
        cv2.imwrite(p, img)
        scene.images[i].path = p
        scene.images[i].meta.name = p
    # sparse seeds on the plane z=5
    sp = rng.uniform([-1, -1], [1, 1], (60, 2))
    pts = np.concatenate([sp, np.full((60, 1), 5.0)], axis=1).astype(np.float32)
    from openmvs_tpu.scene import PointCloud

    scene.pointcloud = PointCloud(
        points=pts,
        views=[np.array([0, 1, 2], np.uint32)] * 60,
        weights=[np.ones(3, np.float32)] * 60,
    )
    opts = DenseOptions(sub_resolution_levels=0, estimation_iters=2,
                        estimation_geometric_iters=1, max_resolution=W)
    pc_par = dense_reconstruction(scene, opts, max_dim=W,
                                  devices=cpu_devs[:4])
    pc_seq = dense_reconstruction(scene, opts, max_dim=W, devices=[])
    assert len(pc_par) == len(pc_seq)
    np.testing.assert_allclose(pc_par.points, pc_seq.points, atol=1e-5)


def test_densify_deterministic():
    """Counter-based RNG => identical clouds across runs (SURVEY §7 hard
    part 4; the reference is nondeterministic under threading)."""
    import jax
    import numpy as np
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu.densify import dense_reconstruction

    # reuse the tiny synthetic textured scene from the multidevice test
    import cv2, tempfile, os
    from openmvs_tpu.geometry.camera import Camera
    from openmvs_tpu.scene import PointCloud

    rng = np.random.default_rng(0)
    H, W = 96, 128
    f = 110.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    tex = cv2.GaussianBlur(rng.uniform(0, 255, (256, 256, 3)).astype(np.uint8), (0, 0), 1.0)
    scene = _scene(n=0)
    scene.images = scene.images[:3]
    scene.platforms = scene.platforms[:3]
    tmp = tempfile.mkdtemp()
    for i in range(3):
        C = np.array([0.4 * i, 0, 0.0])
        scene.platforms[i].poses[0].C = C
        scene.platforms[i].cameras[0].K = K
        scene.platforms[i].cameras[0].width = W
        scene.platforms[i].cameras[0].height = H
        scene.images[i].camera = Camera(K, np.eye(3), C)
        scene.images[i].width = W
        scene.images[i].height = H
        uu, vv = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
        x = (uu - K[0, 2]) / f * 5.0 + C[0]
        y = (vv - K[1, 2]) / f * 5.0
        img = cv2.remap(tex, ((x * 24 + 128) % 256).astype(np.float32),
                        ((y * 24 + 128) % 256).astype(np.float32), cv2.INTER_LINEAR)
        p = os.path.join(tmp, f"im{i}.png")
        cv2.imwrite(p, img)
        scene.images[i].path = p
        scene.images[i].meta.name = p
    sp = rng.uniform([-1, -1], [1, 1], (60, 2))
    pts = np.concatenate([sp, np.full((60, 1), 5.0)], axis=1).astype(np.float32)
    scene.pointcloud = PointCloud(points=pts,
                                  views=[np.array([0, 1, 2], np.uint32)] * 60,
                                  weights=[np.ones(3, np.float32)] * 60)
    opts = DenseOptions(sub_resolution_levels=0, estimation_iters=2,
                        estimation_geometric_iters=0, max_resolution=W)
    pc1 = dense_reconstruction(scene, opts, max_dim=W, devices=[])
    pc2 = dense_reconstruction(scene, opts, max_dim=W, devices=[])
    assert len(pc1) == len(pc2)
    np.testing.assert_array_equal(pc1.points, pc2.points)


def test_octree_structure_and_queries():
    """Morton linear octree (Octree.h TOctree role): cells partition the
    cloud, box/sphere collects match brute force, SplitVolume respects the
    budget."""
    from openmvs_tpu.utils.octree import Octree

    rng = np.random.default_rng(5)
    P = np.r_[rng.normal(0, 1, (3000, 3)), rng.normal(4, 0.3, (2000, 3))]
    tree = Octree.build(P)

    # cells at depth 2 partition all points
    total = sum(len(idx) for _, idx in tree.cells(2))
    assert total == len(P)
    # every cell's points lie inside its box
    for cell, idx in tree.cells(2):
        lo, hi = tree.cell_box(2, cell)
        assert (P[idx] >= lo - 1e-9).all() and (P[idx] <= hi + 1e-9).all()

    # sphere collect == brute force
    c, r = np.array([4.0, 4.0, 4.0]), 0.5
    got = np.sort(tree.collect_sphere(c, r))
    want = np.flatnonzero(np.linalg.norm(P - c, axis=1) <= r)
    np.testing.assert_array_equal(got, want)

    # box collect == brute force
    got = np.sort(tree.collect_box([-1, -1, -1], [1, 1, 1]))
    want = np.flatnonzero(np.all((P >= -1) & (P <= 1), axis=1))
    np.testing.assert_array_equal(got, want)

    # split_volume: budget respected, full coverage, disjoint
    parts = tree.split_volume(600)
    seen = np.concatenate([idx for _, _, idx in parts])
    assert len(seen) == len(P) and len(np.unique(seen)) == len(P)
    assert all(len(idx) <= 600 for _, _, idx in parts)


def test_split_scene_octree_method():
    from openmvs_tpu.split import split_scene

    scene = _scene(6000)
    chunks = split_scene(scene, max_points=2000, method="octree")
    seen = np.concatenate([c.point_idx for c in chunks])
    assert len(np.unique(seen)) == len(scene.pointcloud.points)
    assert all(len(c.point_idx) <= 2000 for c in chunks)
