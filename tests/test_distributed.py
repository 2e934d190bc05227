"""True multi-PROCESS jax.distributed test (SURVEY §4: "multi-host tests on a
fake/local jax.distributed mesh").

Two OS processes form a jax.distributed cluster over localhost (the DCN
analogue), split a synthetic scene into chunks, and each processes its
round-robin share through the REAL pipeline driver (scripts/pipeline.py) —
the production multi-host scale-out path (MvsScalablePipeline.py role,
SURVEY §2.7 "Scene sharding").

Gated behind OMVS_RUN_DIST_TEST=1: it spawns subprocesses and runs a few
minutes of CPU densify, too heavy for the default suite.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.environ.get("OMVS_RUN_DIST_TEST"),
    reason="set OMVS_RUN_DIST_TEST=1 (spawns a 2-process jax.distributed "
           "cluster, ~4 min CPU)",
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_pipeline(tmp_path):
    import cv2

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from quality_harness import build_gt_scene

    scene, _, _ = build_gt_scene(n_views=3, W=128, H=96, grid=64)
    # write the rendered views to disk so the subprocess pipelines can load
    # the scene from the .mvs file alone
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for im in scene.images:
        p = str(img_dir / f"v{im.meta.id}.png")
        cv2.imwrite(p, (np.clip(im.gray, 0, 1) * 255).astype(np.uint8))
        im.meta.name = p
    scene_p = str(tmp_path / "scene.mvs")
    scene.save(scene_p)

    port = _free_port()
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # axon sitecustomize blocks CPU runs
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for host_id in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts", "pipeline.py"),
             scene_p, "-o", out, "--no-refine",
             "--split-max-points", "300",
             "--dense-opt", "estimation_iters=2",
             "--dense-opt", "estimation_geometric_iters=0",
             "--dense-opt", "min_resolution=96",
             "--dense-opt", "max_resolution=128",
             "--coordinator", f"localhost:{port}",
             "--num-hosts", "2", "--host-id", str(host_id)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = []
    for host_id, pr in enumerate(procs):
        log, _ = pr.communicate(timeout=900)
        logs.append(log)
        assert pr.returncode == 0, f"host {host_id} failed:\n{log[-3000:]}"

    # both processes joined ONE distributed runtime
    assert "jax.distributed: process 0/2" in logs[0], logs[0][-2000:]
    assert "jax.distributed: process 1/2" in logs[1], logs[1][-2000:]

    # chunks were dealt round-robin: each host densified a DISJOINT share
    chunk_dir = os.path.join(out, "chunks")
    chunks = sorted(f for f in os.listdir(chunk_dir) if f.endswith(".mvs"))
    assert len(chunks) >= 2, chunks
    done = []
    for ci, c in enumerate(chunks):
        stem = os.path.splitext(c)[0]
        dense = os.path.join(out, stem, f"{stem}_dense.mvs")
        if os.path.exists(dense):
            done.append(ci)
            owner = ci % 2
            assert f"{stem}_dense.mvs" in logs[owner]
            assert f"{stem}_dense.mvs" not in logs[1 - owner]
    assert len(done) == len(chunks), (done, chunks)
