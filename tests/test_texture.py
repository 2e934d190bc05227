"""Texturing tests on a synthetic textured-plane scene."""

import numpy as np
import pytest

from openmvs_tpu.config import TextureOptions
from openmvs_tpu.geometry.camera import Camera
from openmvs_tpu.io import mvs as mvsio
from openmvs_tpu.scene import Mesh, Scene, SceneImage


@pytest.fixture(scope="module")
def plane_scene(tmp_path_factory):
    """A textured quad seen by 2 cameras; images rendered analytically."""
    rng = np.random.default_rng(0)
    H, W = 240, 320
    f = 300.0
    K = np.array([[f, 0, W / 2 - 0.5], [0, f, H / 2 - 0.5], [0, 0, 1.0]])
    scene = Scene()
    tmp = tmp_path_factory.mktemp("imgs")
    tex = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    import cv2

    for i, cx in enumerate((0.0, 0.4)):
        C = np.array([cx, 0, 0.0])
        cam = Camera(K, np.eye(3), C)
        # plane z=4, textured by world x, y
        uu, vv = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
        x = (uu - K[0, 2]) / f * 4.0 + C[0]
        y = (vv - K[1, 2]) / f * 4.0 + C[1]
        tu = (x * 16 + 32) % 64
        tv = (y * 16 + 32) % 64
        img = cv2.remap(tex, tu.astype(np.float32), tv.astype(np.float32), cv2.INTER_LINEAR)
        p = str(tmp / f"img{i}.png")
        cv2.imwrite(p, img)
        meta = mvsio.ImageMeta()
        meta.id = i
        meta.name = p
        si = SceneImage(meta=meta, camera=cam, width=W, height=H, path=p)
        si.load()
        scene.images.append(si)

    # quad mesh on the plane z=4 (in view of both cameras)
    gx, gy = np.meshgrid(np.linspace(-0.8, 0.8, 9), np.linspace(-0.6, 0.6, 7))
    verts = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 4.0)], -1).astype(np.float32)
    faces = []
    for r in range(6):
        for c in range(8):
            a = r * 9 + c
            faces.append([a, a + 1, a + 9])
            faces.append([a + 1, a + 10, a + 9])
    mesh = Mesh(vertices=verts, faces=np.asarray(faces, np.int32))
    return scene, mesh


def test_texture_mesh(plane_scene):
    from openmvs_tpu.texture import texture_mesh

    scene, mesh = plane_scene
    tex = texture_mesh(scene, mesh, TextureOptions())
    assert tex.has_texture
    assert tex.face_tex_coords.shape == (len(mesh.faces), 3, 2)
    assert (tex.face_tex_coords >= 0).all() and (tex.face_tex_coords <= 1).all()
    # every face should be labeled (fully visible plane)
    assert tex.texture.size > 0


def test_texture_obj_roundtrip(plane_scene, tmp_path):
    from openmvs_tpu.texture import texture_mesh
    from openmvs_tpu.io.obj import load_mesh_obj, save_mesh_obj

    scene, mesh = plane_scene
    tex = texture_mesh(scene, mesh, TextureOptions())
    p = str(tmp_path / "m.obj")
    save_mesh_obj(p, tex.vertices, tex.faces, tex.face_tex_coords, tex.texture)
    v, f, ftc, timg = load_mesh_obj(p)
    assert len(v) == len(tex.vertices) and len(f) == len(tex.faces)
    assert ftc is not None and timg is not None
    np.testing.assert_allclose(ftc, tex.face_tex_coords, atol=1e-5)


def test_texture_colors_match_source(plane_scene):
    """Sampled atlas colors at face centroids should match the image colors
    at the projected centroids (same-view pixels are copied verbatim)."""
    from openmvs_tpu.texture import texture_mesh, _project

    scene, mesh = plane_scene
    tex = texture_mesh(scene, mesh, TextureOptions())
    th, tw, _ = tex.texture.shape
    errs = []
    for fi in range(0, len(mesh.faces), 7):
        tc = tex.face_tex_coords[fi].mean(axis=0)
        tx = int(tc[0] * tw)
        ty = int((1 - tc[1]) * th)
        atlas_col = tex.texture[np.clip(ty, 0, th - 1), np.clip(tx, 0, tw - 1)].astype(float)
        # reference color: project centroid into view 0
        cen = mesh.vertices[mesh.faces[fi]].mean(axis=0)
        pr = _project(scene.images[0].camera, cen[None])[0]
        img_col = scene.images[0].color[int(pr[1]), int(pr[0])].astype(float)
        errs.append(np.abs(atlas_col - img_col).mean())
    # at least half the sampled faces should match closely (faces labeled to
    # view 1 may differ slightly by resampling)
    assert np.median(errs) < 30.0


def test_maxrects_packing_valid():
    from openmvs_tpu.texture import _pack_maxrects

    rng = np.random.default_rng(3)
    sizes = [(int(w), int(h)) for w, h in rng.integers(4, 90, (300, 2))]
    pos, used_w, used_h = _pack_maxrects(sizes, max_w=512)
    assert used_w <= 512
    # no pairwise overlaps
    boxes = np.array([(x, y, x + w, y + h) for (x, y), (w, h) in zip(pos, sizes)])
    x1, y1, x2, y2 = boxes.T
    ox = np.maximum(x1[:, None], x1[None]) < np.minimum(x2[:, None], x2[None])
    oy = np.maximum(y1[:, None], y1[None]) < np.minimum(y2[:, None], y2[None])
    over = ox & oy
    np.fill_diagonal(over, False)
    assert not over.any()
    # MaxRects should beat (or match) the shelf packer on area
    from openmvs_tpu.texture import _pack_skyline

    _, sw, sh = _pack_skyline(sizes, 512)
    assert used_h <= sh


def test_trws_labeling(plane_scene):
    from openmvs_tpu.texture import texture_mesh

    scene, mesh = plane_scene
    tex = texture_mesh(scene, mesh, TextureOptions(inference="trws"))
    assert tex.texture is not None and tex.face_tex_coords.shape[0] == len(mesh.faces)


def test_virtual_faces_coherence(plane_scene):
    """On a perfectly planar mesh, a virtual-face threshold must bind all
    faces to a single view label."""
    from openmvs_tpu.texture import (
        _face_adjacency, compute_face_qualities, label_faces_lbp,
        virtual_face_lambda,
    )

    scene, mesh = plane_scene
    quality, _ = compute_face_qualities(scene, mesh, 320)
    adj = _face_adjacency(mesh.faces)
    lam_edge = virtual_face_lambda(mesh, adj, 1.0, threshold_deg=5.0)
    assert np.all(lam_edge[adj >= 0] > 1.0)  # coplanar edges strengthened
    labels = label_faces_lbp(quality, adj, 1.0, lam_edge=lam_edge)
    seen = labels[labels >= 0]
    assert len(np.unique(seen)) == 1


def test_global_seam_leveling_runs_and_smooths(plane_scene):
    """GLOBAL leveling end-to-end through the corner-split rasterization
    (the 10M stress caught an UnboundLocal in the chunked path that the
    suite previously never reached): a brightness step between the views
    must not grow, and the atlas must stay a valid uint8 image."""
    from openmvs_tpu.texture import texture_mesh

    scene, mesh = plane_scene
    bright = [im.color.copy() for im in scene.images]
    try:
        scene.images[1].color = np.clip(
            scene.images[1].color.astype(np.int32) + 40, 0, 255
        ).astype(np.uint8)
        opts_off = TextureOptions(global_seam_leveling=False,
                                  local_seam_leveling=False,
                                  ratio_data_smoothness=0.001)
        opts_on = TextureOptions(global_seam_leveling=True,
                                 local_seam_leveling=False,
                                 ratio_data_smoothness=0.001)
        t0 = texture_mesh(scene, mesh, opts_off)
        t1 = texture_mesh(scene, mesh, opts_on)
        assert t1.texture.dtype == np.uint8
        assert t1.texture.shape == t0.texture.shape

        def spread(tex):
            tw = tex.texture.shape[1]
            th = tex.texture.shape[0]
            uv = tex.face_tex_coords.mean(axis=1)
            x = np.clip((uv[:, 0] * tw).astype(int), 0, tw - 1)
            y = np.clip(((1 - uv[:, 1]) * th).astype(int), 0, th - 1)
            return tex.texture[y, x].astype(float).mean(axis=1).std()

        assert spread(t1) <= spread(t0) + 1e-6
    finally:
        for im, c in zip(scene.images, bright):
            im.color = c


def test_local_seam_leveling_smooths(plane_scene):
    """A brightness step between the two views must shrink after leveling."""
    from openmvs_tpu.texture import texture_mesh

    scene, mesh = plane_scene
    bright = [im.color.copy() for im in scene.images]
    try:
        scene.images[1].color = np.clip(
            scene.images[1].color.astype(np.int32) + 40, 0, 255
        ).astype(np.uint8)
        opts_off = TextureOptions(global_seam_leveling=False,
                                  local_seam_leveling=False,
                                  ratio_data_smoothness=0.001)
        opts_on = TextureOptions(global_seam_leveling=False,
                                 local_seam_leveling=True,
                                 ratio_data_smoothness=0.001)
        t0 = texture_mesh(scene, mesh, opts_off)
        t1 = texture_mesh(scene, mesh, opts_on)

        def seam_step(tex):
            # sample face centers of each label side via texcoords
            import numpy as np
            tw = tex.texture.shape[1]; th = tex.texture.shape[0]
            uv = tex.face_tex_coords.mean(axis=1)
            x = np.clip((uv[:, 0] * tw).astype(int), 0, tw - 1)
            y = np.clip(((1 - uv[:, 1]) * th).astype(int), 0, th - 1)
            c = tex.texture[y, x].astype(float).mean(axis=1)
            return c

        # brightness histogram spread shrinks when leveling is on
        s0 = seam_step(t0).std()
        s1 = seam_step(t1).std()
        assert s1 <= s0 + 1e-6
    finally:
        for im, c in zip(scene.images, bright):
            im.color = c


def test_oversized_component_splits(plane_scene):
    """A patch wider than the atlas page must be split, not raise
    (SceneTexture.cpp re-splits oversized components)."""
    import numpy as np
    from openmvs_tpu.config import TextureOptions
    from openmvs_tpu import texture as T

    scene, mesh = plane_scene
    opts = TextureOptions(max_texture_size=64, global_seam_leveling=False,
                          local_seam_leveling=False, sharpness_weight=0)
    labels = np.zeros(len(mesh.faces), np.int64)
    out = T.generate_texture(scene, mesh, labels, opts, max_dim=256)
    assert out.has_texture
    # every page fits the cap
    pages = out.textures if out.textures is not None else [out.texture]
    for pg in pages:
        assert pg.shape[0] <= 64 and pg.shape[1] <= 64


def test_trws_energy_competitive_with_lbp():
    """The TRW-S variant must reach Potts energies <= LBP's on random
    3-regular face-dual MRFs (the reference exposes TRWS as the
    higher-quality alternative to LBP, SceneTexture.cpp TRWSInference)."""
    from openmvs_tpu.texture import label_faces_lbp, label_faces_trws

    rng = np.random.default_rng(3)
    nf, V = 400, 5

    # random 3-regular-ish adjacency from a triangle strip ring
    adj = np.full((nf, 3), -1, np.int64)
    for i in range(nf):
        adj[i, 0] = (i + 1) % nf
        adj[i, 1] = (i - 1) % nf
        adj[i, 2] = (i + nf // 2) % nf
    # make it symmetric (k-th neighbor relation is mutual by construction)

    def potts_energy(labels, data, lam):
        e = data[np.arange(nf), labels].sum()
        for k in range(3):
            nb = adj[:, k]
            ok = nb >= 0
            e += 0.5 * (lam * (labels[nb[ok]] != labels[ok])).sum()
        return float(e)

    worse = 0
    for trial in range(5):
        quality = rng.uniform(0.05, 1.0, (nf, V)).astype(np.float32)
        qmax = quality.max(axis=1, keepdims=True)
        data = (1.0 - quality / qmax).astype(np.float32)
        lam = 0.3
        l_lbp = label_faces_lbp(quality, adj, lam, iters=60)
        l_trw = label_faces_trws(quality, adj, lam, iters=120)
        e_lbp = potts_energy(l_lbp, data, lam)
        e_trw = potts_energy(l_trw, data, lam)
        if e_trw > e_lbp * 1.02:
            worse += 1
    assert worse <= 1, f"TRW-S worse than LBP in {worse}/5 trials"


def test_lbp_jax_path_matches_numpy(monkeypatch):
    """The device LBP path (OMVS_LBP_JAX=1 / big-mesh auto-switch) must
    reproduce the numpy message schedule label-for-label."""
    from openmvs_tpu.texture import label_faces_lbp

    rng = np.random.default_rng(7)
    nf, V = 400, 5
    adj = np.full((nf, 3), -1, np.int64)
    for i in range(nf):
        adj[i, 0] = (i + 1) % nf
        adj[i, 1] = (i - 1) % nf
        adj[i, 2] = (i + nf // 2) % nf

    for trial in range(3):
        quality = rng.uniform(0.0, 1.0, (nf, V)).astype(np.float32)
        quality[rng.uniform(size=(nf, V)) < 0.2] = 0
        quality[3] = 0  # fully unseen face -> label -1 on both paths
        lam_edge = (rng.uniform(0.1, 2.0, (nf, 3)).astype(np.float32)
                    if trial % 2 else None)
        monkeypatch.delenv("OMVS_LBP_JAX", raising=False)
        l_np = label_faces_lbp(quality, adj, 0.5, iters=30, lam_edge=lam_edge)
        monkeypatch.setenv("OMVS_LBP_JAX", "1")
        l_jx = label_faces_lbp(quality, adj, 0.5, iters=30, lam_edge=lam_edge)
        monkeypatch.delenv("OMVS_LBP_JAX", raising=False)
        assert np.array_equal(l_np, l_jx)
        assert l_np[3] == -1


def test_viewer_textured_mesh_export(plane_scene, tmp_path):
    """The WebGL viewer embeds the textured mesh (atlas PNG + per-corner
    UVs in the stacked-page coordinate system)."""
    import base64
    import json
    import re

    import cv2

    from openmvs_tpu.texture import texture_mesh
    from openmvs_tpu.config import TextureOptions
    from openmvs_tpu.viewer_web import export_html
    from openmvs_tpu.scene import PointCloud

    scene, mesh = plane_scene
    tex = texture_mesh(scene, mesh, TextureOptions())
    assert tex.has_texture
    scene.mesh = tex
    scene.pointcloud = PointCloud(
        points=tex.vertices.copy(),
        views=[np.zeros(0, np.uint32)] * len(tex.vertices),
        weights=[np.zeros(0, np.float32)] * len(tex.vertices))
    out = str(tmp_path / "tex.html")
    export_html(scene, out)
    html = open(out).read()
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    data = json.loads(m.group(1))
    assert "tex_png" in data and "tex_v" in data and "tex_uv" in data
    png = np.frombuffer(base64.b64decode(data["tex_png"]), np.uint8)
    atlas = cv2.imdecode(png, cv2.IMREAD_COLOR)
    assert atlas is not None and atlas.shape[0] >= tex.texture.shape[0]
    uv = np.frombuffer(base64.b64decode(data["tex_uv"]), np.float32)
    assert len(uv) == 2 * 3 * len(tex.faces)
    assert np.all(uv >= -1e-5) and np.all(uv <= 1 + 1e-5)
    pos = np.frombuffer(base64.b64decode(data["tex_v"]), np.float32)
    assert len(pos) == 3 * 3 * len(tex.faces)


def test_trws_sequential_bound_monotone_and_valid():
    """Sequential TRW-S (Kolmogorov schedule): the LP-dual lower bound must
    be monotonically non-decreasing across iterations and must lower-bound
    the energy of the returned labeling (libs/Math/TRWS/MRFEnergy.h role)."""
    from openmvs_tpu.texture import label_faces_trws

    rng = np.random.default_rng(11)
    nf, V = 300, 6
    adj = np.full((nf, 3), -1, np.int64)
    for i in range(nf):
        adj[i, 0] = (i + 1) % nf
        adj[i, 1] = (i - 1) % nf
        adj[i, 2] = (i + nf // 2) % nf

    for trial in range(3):
        quality = rng.uniform(0.05, 1.0, (nf, V)).astype(np.float32)
        lam = float(rng.uniform(0.1, 0.6))
        labels, bounds = label_faces_trws(quality, adj, lam, iters=40,
                                          return_bound=True)
        assert len(bounds) == 40
        assert np.all(np.diff(bounds) >= -1e-4), \
            f"bound decreased: {np.diff(bounds).min()}"
        # energy of the returned labeling (each undirected edge once)
        qmax = quality.max(axis=1, keepdims=True)
        data = (1.0 - quality / qmax).astype(np.float32)
        e = data[np.arange(nf), labels].sum()
        for k in range(3):
            nb = adj[:, k]
            ok = nb >= 0
            e += 0.5 * (lam * (labels[nb[ok]] != labels[ok])).sum()
        assert bounds[-1] <= e + 1e-3, (bounds[-1], e)
        # bound should be reasonably tight on these easy problems
        assert bounds[-1] > 0.5 * e
