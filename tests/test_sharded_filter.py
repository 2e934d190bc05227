"""Sharded cross-view depth filter == serial host filter (pass-3 parity).

The device path projects in float32 (host is float64), so agreement is
asserted at >99% of pixels rather than bitwise.
"""
import dataclasses

import numpy as np
import pytest
import jax


def _make_results(n_views=5, seed=0):
    from openmvs_tpu.densify import DepthMapResult
    from openmvs_tpu.geometry.camera import Camera
    import scipy.ndimage as ndi

    rng = np.random.default_rng(seed)
    sizes = [(96, 128), (96, 128), (64, 96), (96, 128), (64, 96)][:n_views]
    results = {}
    for i, (H, W) in enumerate(sizes):
        K = np.array([[0.9 * W, 0, W / 2 - 0.5],
                      [0, 0.9 * W, H / 2 - 0.5], [0, 0, 1.0]])
        cam = Camera(K, np.eye(3), np.array([i * 0.15, 0.02 * i, 0.0]))
        # smooth plane-ish depth + speckle invalidation
        base = 5.0 + 0.3 * np.sin(np.linspace(0, 3, W))[None, :]
        depth = (base + ndi.gaussian_filter(
            rng.normal(0, 0.05, (H, W)), 2)).astype(np.float32)
        depth[rng.random((H, W)) < 0.1] = 0.0
        conf = rng.uniform(0.2, 1.0, (H, W)).astype(np.float32)
        conf[depth == 0] = 0
        nbrs = [j for j in range(n_views) if j != i][:3 + (i % 2)]
        results[i] = DepthMapResult(
            image_idx=i, depth=depth, normal=None, conf=conf,
            d_min=3.0, d_max=8.0, neighbor_ids=nbrs, camera=cam)
    return results


def _serial_filter(results, opts):
    from openmvs_tpu.ops import filters

    filtered = {}
    for rid, r in results.items():
        projected = []
        for nb_id in r.neighbor_ids:
            nb = results.get(nb_id)
            if nb is None:
                continue
            projected.append(filters.project_depth_to_view(
                nb.depth, nb.conf, nb.camera, r.camera, r.depth.shape))
        if len(projected) < opts.min_views_filter:
            filtered[rid] = r
            continue
        nd, nc = filters.filter_depth_adjust(
            r.depth, r.conf, projected, opts, r.d_min, r.d_max)
        filtered[rid] = dataclasses.replace(r, depth=nd, conf=nc)
    return filtered


@pytest.mark.parametrize("mesh_shape", [(2, 2), (4, 2), (2, 4)])
def test_sharded_filter_matches_serial(mesh_shape):
    cpus = jax.devices("cpu")
    need = mesh_shape[0] * mesh_shape[1]
    if len(cpus) < need:
        pytest.skip(f"needs >= {need} virtual devices")
    from jax.sharding import Mesh
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu.parallel.sharded_filter import filter_views_sharded

    opts = DenseOptions()
    results = _make_results()
    mesh = Mesh(np.array(cpus[:need]).reshape(mesh_shape),
                ("views", "tile"))
    got = filter_views_sharded(results, opts, mesh)
    want = _serial_filter(results, opts)

    assert set(got) == set(want)
    for rid in want:
        a, b = got[rid].depth, want[rid].depth
        va, vb = a > 0, b > 0
        agree = (va == vb).mean()
        assert agree > 0.99, f"view {rid}: valid-mask agreement {agree:.4f}"
        both = va & vb
        if both.any():
            rel = np.abs(a[both] - b[both]) / np.maximum(b[both], 1e-6)
            assert (rel < 1e-3).mean() > 0.99, f"view {rid} depth mismatch"


def test_sharded_filter_skip_ids_pass_through():
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from jax.sharding import Mesh
    from openmvs_tpu.config import DenseOptions
    from openmvs_tpu.parallel.sharded_filter import filter_views_sharded

    opts = DenseOptions()
    results = _make_results()
    mesh = Mesh(np.array(cpus[:4]).reshape(2, 2), ("views", "tile"))
    got = filter_views_sharded(results, opts, mesh, skip_ids={1})
    # skipped view unchanged (same array object semantics: equal content)
    np.testing.assert_array_equal(got[1].depth, results[1].depth)
    # but it still contributed as a source: other views were filtered
    assert not np.array_equal(got[0].depth, results[0].depth)
