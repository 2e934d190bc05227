"""Dev: texture-stage scaling benchmark on a synthetic heightfield mesh.

Usage: python scripts/dev_texture_scale.py [n_faces] [n_views]

Builds a wavy heightfield mesh with ~n_faces triangles, 5 synthetic
640x480 views looking at it, runs the FULL texture_mesh pipeline and
reports per-stage wall times + peak RSS.  Round-3 gate (VERDICT r2 #7):
10M faces in <200 s / <6 GB peak RSS.
"""
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_scene(n_faces=2_000_000, n_views=5, W=640, H=480, seed=0):
    from openmvs_tpu.geometry.camera import Camera
    from openmvs_tpu.io import mvs as mvsio
    from openmvs_tpu.scene import Scene, SceneImage
    from openmvs_tpu.mesh_ops import Mesh

    rng = np.random.default_rng(seed)
    g = int(np.sqrt(n_faces / 2))          # grid cells per side
    xs = np.linspace(-2, 2, g + 1)
    ys = np.linspace(-2, 2, g + 1)
    xx, yy = np.meshgrid(xs, ys)
    zz = 5.0 + 0.3 * np.sin(xx * 3) * np.cos(yy * 2)
    verts = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
    ii = np.arange(g + 1)
    q = (ii[:-1, None] * (g + 1) + ii[None, :-1]).reshape(-1)   # cell corners
    f1 = np.stack([q, q + 1, q + g + 1], -1)
    f2 = np.stack([q + 1, q + g + 2, q + g + 1], -1)
    faces = np.concatenate([f1, f2], 0).astype(np.int32)

    scene = Scene()
    for i in range(n_views):
        K = np.array([[0.9 * W, 0, W / 2 - 0.5],
                      [0, 0.9 * W, H / 2 - 0.5], [0, 0, 1.0]])
        ang = (i - n_views / 2) * 0.08
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        cam = Camera(K, R, np.array([0.4 * (i - n_views / 2), 0.0, 0.0]))
        meta = mvsio.ImageMeta()
        meta.id = i
        meta.name = f"v{i}.jpg"
        img = SceneImage(meta=meta, camera=cam, width=W, height=H)
        # textured image: smooth color ramps + noise (gradient-rich)
        base = np.zeros((H, W, 3), np.float32)
        base[..., 0] = np.linspace(0, 255, W)[None, :]
        base[..., 1] = np.linspace(0, 255, H)[:, None]
        base[..., 2] = 128 + 100 * np.sin(np.linspace(0, 20, W))[None, :]
        base += rng.normal(0, 12, (H, W, 3))
        img.color = np.clip(base, 0, 255).astype(np.uint8)
        img.gray = img.color.astype(np.float32).mean(-1) / 255.0
        scene.images.append(img)
    scene.mesh = Mesh(vertices=verts, faces=faces)
    return scene


def main():
    n_faces = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_views = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from openmvs_tpu.config import TextureOptions
    from openmvs_tpu.texture import texture_mesh

    t0 = time.time()
    scene = make_scene(n_faces, n_views)
    print(f"scene: {len(scene.mesh.faces)} faces, {n_views} views "
          f"({time.time()-t0:.1f}s)", flush=True)

    t1 = time.time()
    out = texture_mesh(scene, opts=TextureOptions())
    wall = time.time() - t1
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    npages = len(out.textures) if out.textures is not None else 1
    print(f"RESULT texture: faces={len(scene.mesh.faces)} wall={wall:.1f}s "
          f"peak_rss={rss:.2f}GB pages={npages} "
          f"atlas={out.texture.shape[1]}x{out.texture.shape[0]}", flush=True)


if __name__ == "__main__":
    main()
