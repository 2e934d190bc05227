"""Sharded-vs-serial parity on a MIXED-resolution scene (exercises the
per-view upsample fallback at pyramid level transitions)."""
import numpy as np
import pytest
import jax


def _mixed_scene():
    import scipy.ndimage as ndi

    from openmvs_tpu.geometry.camera import Camera
    from openmvs_tpu.io import mvs as mvsio
    from openmvs_tpu.scene import PointCloud, Scene, SceneImage

    rng = np.random.default_rng(0)
    tex = ndi.gaussian_filter(
        rng.uniform(0.2, 0.8, (512, 512)).astype(np.float32), 1.2)

    def render(cam, H, W):
        ys, xs = np.mgrid[0:H, 0:W]
        ray = np.stack([(xs - cam.K[0, 2]) / cam.K[0, 0],
                        (ys - cam.K[1, 2]) / cam.K[1, 1],
                        np.ones_like(xs, float)], -1)
        d_w = ray @ cam.R
        t = (5.0 - cam.C[2]) / d_w[..., 2]
        Xw = cam.C + d_w * t[..., None]
        return tex[((Xw[..., 1] % 4) / 4 * 511).astype(int),
                   ((Xw[..., 0] % 4) / 4 * 511).astype(int)]

    scene = Scene()
    sizes = [(96, 128), (64, 96), (96, 128)]   # mixed resolutions
    for i, (H, W) in enumerate(sizes):
        K = np.array([[0.9 * W, 0, W / 2 - 0.5],
                      [0, 0.9 * W, H / 2 - 0.5], [0, 0, 1.0]])
        cam = Camera(K, np.eye(3), np.array([i * 0.25, 0.0, 0.0]))
        meta = mvsio.ImageMeta()
        meta.id = i
        meta.name = f"v{i}.jpg"
        img = SceneImage(meta=meta, camera=cam, width=W, height=H)
        img.gray = render(cam, H, W).astype(np.float32)
        scene.images.append(img)
    pts = np.c_[rng.uniform(0.5, 2.0, (120, 2)), np.full(120, 5.0)]
    scene.pointcloud = PointCloud(
        points=pts.astype(np.float32),
        views=[np.arange(3, dtype=np.uint32)] * 120,
        weights=[np.ones(3, np.float32)] * 120)
    return scene


def test_sharded_mixed_sizes_match_serial(monkeypatch):
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs >= 4 virtual devices")
    monkeypatch.setenv("OMVS_NO_PALLAS", "1")
    from openmvs_tpu import densify
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu.parallel import sharded
    from openmvs_tpu.view_selection import select_views_for_scene

    opts = DenseOptions(sub_resolution_levels=1, estimation_iters=2,
                        estimation_geometric_iters=0)
    scene = _mixed_scene()
    select_views_for_scene(scene, opts)

    mesh = sharded.make_mesh(4)
    res_sh = sharded.estimate_views_sharded(scene, opts, mesh)

    res_se = {}
    for i in range(scene.n_views):
        r = densify.estimate_depth_map(scene, i, opts)
        if r is not None:
            res_se[scene.images[i].meta.id] = r

    assert set(res_sh) == set(res_se)
    for rid in res_se:
        a, b = res_sh[rid].depth, res_se[rid].depth
        assert a.shape == b.shape, (rid, a.shape, b.shape)
        va, vb = a > 0, b > 0
        agree_valid = (va == vb).mean()
        both = va & vb
        rel = np.abs(a[both] - b[both]) / np.maximum(b[both], 1e-6)
        close = (rel < 1e-3).mean() if both.any() else 1.0
        assert agree_valid > 0.98, f"view {rid}: mask agreement {agree_valid:.4f}"
        assert close > 0.98, f"view {rid}: depth agreement {close:.4f}"
