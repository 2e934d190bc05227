"""Sharded (label-axis) LBP face labeling == serial labeler, exactly."""
import numpy as np
import pytest
import jax


def _random_face_graph(nf=400, V=5, seed=0):
    """A random triangle-strip-ish dual graph + qualities."""
    rng = np.random.default_rng(seed)
    adj = np.full((nf, 3), -1, np.int64)
    # chain + random chords, mutual entries
    slots = np.zeros(nf, np.int64)
    def link(a, b):
        if slots[a] < 3 and slots[b] < 3:
            adj[a, slots[a]] = b
            adj[b, slots[b]] = a
            slots[a] += 1
            slots[b] += 1
    for i in range(nf - 1):
        link(i, i + 1)
    for _ in range(nf // 2):
        a, b = rng.integers(0, nf, 2)
        if a != b:
            link(a, b)
    quality = rng.uniform(0, 1, (nf, V)).astype(np.float32)
    quality[rng.random((nf, V)) < 0.3] = 0  # occlusions
    quality[rng.random(nf) < 0.05] = 0      # fully unseen faces
    return quality, adj


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_lbp_matches_serial(n_dev):
    cpus = jax.devices("cpu")
    if len(cpus) < n_dev:
        pytest.skip(f"needs >= {n_dev} virtual devices")
    from openmvs_tpu.texture import label_faces_lbp, label_faces_lbp_sharded

    quality, adj = _random_face_graph(V=5)   # V=5 is uneven over 2/4/8
    want = label_faces_lbp(quality, adj, smoothness=0.1, iters=20)
    got = label_faces_lbp_sharded(quality, adj, 0.1, cpus[:n_dev], iters=20)
    assert (got == want).mean() > 0.999, (got != want).sum()


def test_sharded_lbp_lam_edge():
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from openmvs_tpu.texture import label_faces_lbp, label_faces_lbp_sharded

    quality, adj = _random_face_graph(V=7, seed=3)
    rng = np.random.default_rng(1)
    lam_edge = rng.uniform(0.05, 0.3, adj.shape).astype(np.float32)
    want = label_faces_lbp(quality, adj, 0.1, iters=15, lam_edge=lam_edge)
    got = label_faces_lbp_sharded(quality, adj, 0.1, cpus[:4], iters=15,
                                  lam_edge=lam_edge)
    assert (got == want).mean() > 0.999
