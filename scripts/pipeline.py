#!/usr/bin/env python
"""End-to-end MVS pipeline driver (MvgMvsPipeline.py equivalent).

Runs the four reconstruction stages — densify, mesh, refine, texture — on an
input .mvs scene (produced by an SfM frontend or one of the importers), with
per-stage resume: an existing output artifact skips its stage, matching the
reference pipeline's file-level checkpointing (SURVEY.md 5.3-5.4).

  python scripts/pipeline.py scene.mvs -o work/ [--preset MVS|MVS_SGM]
        [--no-refine] [--split-max-points N]

With --split-max-points the scene is first divided into sub-scene chunks and
each chunk is processed independently (MvsScalablePipeline.py role).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_stage(name, out_path, fn, resume=True):
    if resume and os.path.exists(out_path):
        print(f"[{name}] exists, skipping: {out_path}")
        return None
    t0 = time.time()
    result = fn()
    print(f"[{name}] done in {time.time() - t0:.0f}s -> {out_path}")
    return result


def process_scene(scene_path: str, out: str, args) -> None:
    import numpy as np
    from openmvs_tpu.scene import Scene, Mesh
    from openmvs_tpu.config import DenseOptions, MeshOptions, RefineOptions, TextureOptions
    from openmvs_tpu import mesh_ops

    os.makedirs(out, exist_ok=True)
    stem = os.path.splitext(os.path.basename(scene_path))[0]
    dense_mvs = os.path.join(out, f"{stem}_dense.mvs")
    mesh_ply = os.path.join(out, f"{stem}_dense_mesh.ply")
    refine_ply = os.path.join(out, f"{stem}_dense_mesh_refine.ply")
    texture_obj = os.path.join(out, f"{stem}_dense_mesh_texture.obj")

    # 1. densify
    def densify():
        from openmvs_tpu.densify import dense_reconstruction

        scene = Scene.load(scene_path)
        opts = DenseOptions(estimator="sgm" if args.preset == "MVS_SGM" else "patchmatch")
        pc = dense_reconstruction(scene, opts, save_dmaps_to=out,
                                  mesh=getattr(args, "mesh", None))
        scene.pointcloud = pc
        scene.save(dense_mvs)
        pc.save_ply(dense_mvs.replace(".mvs", ".ply"))
    run_stage("densify", dense_mvs, densify)

    # 2. mesh
    def mesh():
        from openmvs_tpu.reconstruct import reconstruct_mesh

        scene = Scene.load(dense_mvs)
        m = reconstruct_mesh(scene, MeshOptions())
        m = mesh_ops.clean_mesh(m, decimate=args.decimate)
        m.save_ply(mesh_ply)
    run_stage("mesh", mesh_ply, mesh)

    # 3. refine
    if not args.no_refine:
        def refine():
            from openmvs_tpu.refine import refine_mesh
            from openmvs_tpu.io import ply as plyio

            scene = Scene.load(dense_mvs)
            pd = plyio.load(mesh_ply)
            m = Mesh(vertices=pd.vertices.astype(np.float32),
                     faces=pd.faces.astype(np.int32))
            rm = refine_mesh(scene, m, RefineOptions(scales=2, iters=16))
            rm.save_ply(refine_ply)
        run_stage("refine", refine_ply, refine)
    mesh_for_texture = refine_ply if (not args.no_refine and os.path.exists(refine_ply)) else mesh_ply

    # 4. texture
    def texture():
        from openmvs_tpu.texture import texture_mesh
        from openmvs_tpu.io import ply as plyio
        from openmvs_tpu.io.obj import save_mesh_obj

        scene = Scene.load(dense_mvs)
        pd = plyio.load(mesh_for_texture)
        m = Mesh(vertices=pd.vertices.astype(np.float32),
                 faces=pd.faces.astype(np.int32))
        tm = texture_mesh(scene, m, TextureOptions())
        save_mesh_obj(texture_obj, tm.vertices, tm.faces, tm.face_tex_coords, tm.texture)
    run_stage("texture", texture_obj, texture)


def init_distributed(args):
    """Multi-host runtime: jax.distributed over DCN + a local (views, tile)
    device mesh over ICI.

    Each host runs this same driver; chunks are dealt round-robin by
    process_index (the DCN-level scale-out — the analogue of farming
    `Scene::Split` chunks to machines by hand, MvsScalablePipeline.py:11-27),
    while the chips local to a host cooperate through the sharded estimation
    mesh (parallel.sharded — ICI collectives).
    """
    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id,
        )
    mesh = None
    if args.mesh_shape:
        import numpy as np
        from jax.sharding import Mesh

        nv, nt = (int(x) for x in args.mesh_shape.split("x"))
        devs = jax.local_devices()[: nv * nt]
        if len(devs) == nv * nt:
            mesh = Mesh(np.array(devs).reshape(nv, nt), ("views", "tile"))
        else:
            print(f"warning: {nv*nt} devices requested, "
                  f"{len(devs)} available; running unsharded")
    return mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("-o", "--out", default="mvs_out")
    ap.add_argument("--preset", default="MVS", choices=["MVS", "MVS_SGM"])
    ap.add_argument("--no-refine", action="store_true")
    ap.add_argument("--decimate", type=float, default=1.0)
    ap.add_argument("--split-max-points", type=int, default=0,
                    help="split into sub-scene chunks first (scalable pipeline)")
    ap.add_argument("--coordinator", default="",
                    help="jax.distributed coordinator host:port (multi-host)")
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-id", type=int, default=int(os.environ.get("OMVS_HOST_ID", "0")))
    ap.add_argument("--mesh-shape", default="",
                    help="local (views x tile) estimation mesh, e.g. 2x4")
    args = ap.parse_args()

    mesh = init_distributed(args)
    args.mesh = mesh

    if args.split_max_points > 0:
        from openmvs_tpu.scene import Scene
        from openmvs_tpu.split import split_scene, export_chunks

        scene = Scene.load(args.scene)
        chunks = split_scene(scene, max_points=args.split_max_points)
        paths = export_chunks(scene, chunks, os.path.join(args.out, "chunks"))
        # deal chunks round-robin across hosts (per-host resume still applies)
        for ci, p in enumerate(paths):
            if ci % max(args.num_hosts, 1) != args.host_id % max(args.num_hosts, 1):
                continue
            process_scene(p, os.path.join(args.out, os.path.splitext(os.path.basename(p))[0]), args)
    else:
        process_scene(args.scene, args.out, args)


if __name__ == "__main__":
    main()
