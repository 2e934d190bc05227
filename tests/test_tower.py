"""Tower-mode cylindrical prior tests (Scene.cpp:1749-2078 parity)."""

import numpy as np

from openmvs_tpu.geometry.camera import Camera
from openmvs_tpu.io import mvs as mvsio
from openmvs_tpu.scene import PointCloud, Scene, SceneImage


def _look_at(C, target):
    z = target - C
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(z, up)
    if np.linalg.norm(x) < 1e-6:
        x = np.array([1.0, 0.0, 0.0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z])


def _tower_scene(n_rings=6, per_ring=10, cam_r=6.0, seed=0):
    """Cameras orbit a vertical axis at several heights, all looking at it."""
    rng = np.random.default_rng(seed)
    scene = Scene()
    K = np.array([[400, 0, 320], [0, 400, 240], [0, 0, 1.0]])
    idx = 0
    for ring in range(n_rings):
        z = 6.0 * ring
        for k in range(per_ring):
            a = 2 * np.pi * k / per_ring
            C = np.array([cam_r * np.cos(a), cam_r * np.sin(a), z])
            R = _look_at(C, np.array([0.0, 0.0, z]))
            meta = mvsio.ImageMeta()
            meta.id = idx
            meta.name = f"cam{idx}.jpg"
            meta.platform_id = idx
            scene.platforms.append(mvsio.Platform(
                name=f"p{idx}",
                cameras=[mvsio.CameraRig(K=K, width=640, height=480)],
                poses=[mvsio.Pose(R=R, C=C)]))
            scene.images.append(SceneImage(meta=meta, camera=Camera(K, R, C),
                                           width=640, height=480))
            idx += 1
    # sparse points on a radius-2 cylinder surface
    n = 600
    ang = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(0, 6.0 * (n_rings - 1), n)
    pts = np.stack([2.0 * np.cos(ang), 2.0 * np.sin(ang), z], 1).astype(np.float32)
    scene.pointcloud = PointCloud(
        points=pts,
        views=[np.array([0, 1], np.uint32)] * n,
        weights=[np.ones(2, np.float32)] * n,
    )
    return scene


def test_detect_tower():
    from openmvs_tpu.tower import compute_tower_cylinder

    scene = _tower_scene()
    cyl = compute_tower_cylinder(scene, tower_mode=2)
    assert cyl is not None
    center, radius, roi_radius, z_min, z_max, min_cam_z = cyl
    np.testing.assert_allclose(center, [0, 0], atol=0.3)
    assert 0.2 <= radius < 8.0
    assert roi_radius > radius
    assert z_min < 0 and z_max >= 8.0
    assert min_cam_z == 0.0


def test_reject_non_tower():
    from openmvs_tpu.tower import compute_tower_cylinder

    # flat lateral rig: cameras along x at equal height -> not a tower
    scene = _tower_scene(n_rings=1, per_ring=25)
    for i, im in enumerate(scene.images):
        im.camera = Camera(im.camera.K, im.camera.R,
                           np.array([i * 1.0, 0.0, 0.0]))
    assert compute_tower_cylinder(scene, tower_mode=1) is None
    # too few cameras
    small = _tower_scene(n_rings=1, per_ring=10)
    assert compute_tower_cylinder(small, tower_mode=1) is None


def test_ring_cloud_geometry():
    from openmvs_tpu.tower import build_tower_cloud, compute_tower_cylinder

    scene = _tower_scene()
    center, radius, roi, z_min, z_max, min_cam_z = compute_tower_cylinder(scene, 2)
    pc = build_tower_cloud(scene, center, radius, roi, z_min, z_max, min_cam_z)
    assert len(pc) > 100
    assert pc.has_normals
    # every ring point is seen by >= 2 cameras and its normal points outward
    d = np.linalg.norm(pc.points[:, :2] - center[None], axis=1)
    assert np.all([len(v) >= 2 for v in pc.views])
    outward = np.einsum("ij,ij->i", pc.normals[:, :2],
                        pc.points[:, :2] - center[None])
    assert np.all(outward > 0)
    # adaptive radii hug the sparse cylinder (r=2) in the point-covered band
    band = (pc.points[:, 2] > 1.0) & (pc.points[:, 2] < 25.0)
    assert abs(np.median(d[band]) - 2.0) < 1.0


def test_init_tower_modes():
    from openmvs_tpu.tower import init_tower_scene

    s1 = _tower_scene()
    n_orig = len(s1.pointcloud)
    assert init_tower_scene(s1, 1)
    assert len(s1.pointcloud) > 0 and len(s1.pointcloud) != n_orig

    s2 = _tower_scene()
    assert init_tower_scene(s2, 2)
    assert len(s2.pointcloud) > n_orig

    s3 = _tower_scene()
    assert init_tower_scene(s3, 3)
    assert len(s3.pointcloud) == n_orig          # cloud untouched
    assert s3.images[0].meta.view_scores         # but views selected

    s0 = _tower_scene()
    assert not init_tower_scene(s0, 0)
