#!/usr/bin/env python
"""End-to-end MVS pipeline driver (MvgMvsPipeline.py equivalent).

Runs the four reconstruction stages — densify, mesh, refine, texture — on an
input .mvs scene (produced by an SfM frontend or one of the importers), with
per-stage resume: an existing output artifact skips its stage, matching the
reference pipeline's file-level checkpointing (SURVEY.md 5.3-5.4).

  python scripts/pipeline.py scene.mvs -o work/ [--preset MVS|MVS_SGM]
        [--no-refine] [--split-max-points N]

When the input is a DIRECTORY of images, the full photogrammetry
orchestration runs instead (MvgMvsPipeline.py:19-67 step table): the SfM
frontend steps shell out to openMVG / COLMAP binaries when they are on PATH
(SEQUENTIAL / GLOBAL / COLMAP_MVS presets), the export-to-MVS step uses the
built-in InterfaceCOLMAP importer, and the MVS steps run in-process.  Use
--steps to run a subset, exactly like the reference script.

With --split-max-points the scene is first divided into sub-scene chunks and
each chunk is processed independently (MvsScalablePipeline.py role).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_opt_overrides(pairs, cls):
    """--dense-opt NAME=VALUE overrides, typed from the dataclass field
    (the reference pipeline forwards per-stage options to its binaries the
    same way, MvgMvsPipeline.py step args)."""
    import dataclasses

    out = {}
    types = {f.name: f.type for f in dataclasses.fields(cls)}
    for pair in pairs or []:
        name, _, val = pair.partition("=")
        name = name.replace("-", "_")
        if name not in types:
            raise SystemExit(f"unknown {cls.__name__} field: {name}")
        t = types[name]
        if t in ("bool", bool):
            out[name] = val.lower() in ("1", "true", "yes")
        elif t in ("int", int):
            out[name] = int(val)
        elif t in ("float", float):
            out[name] = float(val)
        else:
            out[name] = val
    return out


def _done_marker(out_path):
    d, b = os.path.split(out_path)
    return os.path.join(d, f".{b}.done")


def run_stage(name, out_path, fn, resume=True):
    # resume requires the artifact AND its completion marker: stage savers
    # write in place, so a crash mid-write leaves a truncated file that a
    # bare exists() check would skip forever
    marker = _done_marker(out_path)
    if resume and os.path.exists(out_path) and os.path.exists(marker):
        print(f"[{name}] exists, skipping: {out_path}")
        return None
    if os.path.exists(out_path) and not os.path.exists(marker):
        print(f"[{name}] found incomplete {out_path} (no marker); redoing")
    t0 = time.time()
    result = fn()
    with open(marker, "w") as f:
        f.write("done\n")
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
        kw = dict(estimator="sgm" if args.preset == "MVS_SGM" else "patchmatch")
        kw.update(_parse_opt_overrides(getattr(args, "dense_opt", None),
                                       DenseOptions))
        opts = DenseOptions(**kw)
        pc = dense_reconstruction(scene, opts, save_dmaps_to=out,
                                  mesh=getattr(args, "mesh", None))
        scene.pointcloud = pc
        scene.save(dense_mvs)
        pc.save_ply(dense_mvs.replace(".mvs", ".ply"))
    run_stage("densify", dense_mvs, densify)

    # 2. mesh (very large clouds switch to the chunked memory-bounded path)
    def mesh():
        from openmvs_tpu.reconstruct import reconstruct_mesh, reconstruct_mesh_chunked

        scene = Scene.load(dense_mvs)
        cap = getattr(args, "mesh_chunk_points", 0) or 8_000_000
        if len(scene.pointcloud) > cap:
            m = reconstruct_mesh_chunked(scene, MeshOptions(), max_points=cap)
        else:
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


# --------------------------------------------------------- SfM orchestration
#
# Step table mirroring MvgMvsPipeline.py:19-67.  External steps invoke the
# named binary when it is on PATH (or $OPENMVG_BIN / $COLMAP_BIN); internal
# steps run this package's own implementations.

PRESETS = {
    "SEQUENTIAL": [0, 1, 2, 3, 4, 5, 11, 17, 18, 19, 20],
    "GLOBAL": [0, 1, 2, 3, 4, 6, 11, 17, 18, 19, 20],
    "MVG_SEQ": [0, 1, 2, 3, 4, 5, 7, 8, 9, 11],
    "MVG_GLOBAL": [0, 1, 2, 3, 4, 6, 7, 8, 9, 11],
    "COLMAP_MVS": [12, 13, 14, 15, 16, 17, 18, 19, 20],
    "COLMAP": [12, 13, 14, 15, 16],
    "MVS": [17, 18, 19, 20],
    "MVS_SGM": [21, 22],
}


def _find_bin(name, env):
    import shutil

    folder = os.environ.get(env, "")
    if folder and os.path.exists(os.path.join(folder, name)):
        return os.path.join(folder, name)
    return shutil.which(name)


def _sfm_steps(input_dir, out):
    """(name, binary, env, argv builder) for external steps 0-16."""
    mvg = os.path.join(out, "sfm")
    matches = os.path.join(mvg, "matches")
    recon = os.path.join(mvg, "reconstruction")
    db = os.path.join(out, "colmap", "database.db")
    sparse = os.path.join(out, "colmap", "sparse")
    dense = os.path.join(out, "colmap", "dense")
    return {
        0: ("Intrinsics analysis", "openMVG_main_SfMInit_ImageListing", "OPENMVG_BIN",
            ["-i", input_dir, "-o", matches, "-d",
             os.environ.get("OMVS_SENSOR_DB", "sensor_width_camera_database.txt")]),
        1: ("Compute features", "openMVG_main_ComputeFeatures", "OPENMVG_BIN",
            ["-i", f"{matches}/sfm_data.json", "-o", matches]),
        2: ("Compute pairs", "openMVG_main_PairGenerator", "OPENMVG_BIN",
            ["-i", f"{matches}/sfm_data.json", "-o", f"{matches}/pairs.bin"]),
        3: ("Compute matches", "openMVG_main_ComputeMatches", "OPENMVG_BIN",
            ["-i", f"{matches}/sfm_data.json", "-p", f"{matches}/pairs.bin",
             "-o", f"{matches}/matches.putative.bin"]),
        4: ("Filter matches", "openMVG_main_GeometricFilter", "OPENMVG_BIN",
            ["-i", f"{matches}/sfm_data.json",
             "-m", f"{matches}/matches.putative.bin",
             "-o", f"{matches}/matches.f.bin"]),
        5: ("Incremental reconstruction", "openMVG_main_SfM", "OPENMVG_BIN",
            ["--sfm_engine", "INCREMENTAL", "--input_file", f"{matches}/sfm_data.json",
             "--match_dir", matches, "--output_dir", recon]),
        6: ("Global reconstruction", "openMVG_main_SfM", "OPENMVG_BIN",
            ["--sfm_engine", "GLOBAL", "--input_file", f"{matches}/sfm_data.json",
             "--match_dir", matches, "--output_dir", recon]),
        7: ("Colorize structure", "openMVG_main_ComputeSfM_DataColor", "OPENMVG_BIN",
            ["-i", f"{recon}/sfm_data.bin", "-o", f"{recon}/colorized.ply"]),
        8: ("Structure from known poses", "openMVG_main_ComputeStructureFromKnownPoses",
            "OPENMVG_BIN",
            ["-i", f"{recon}/sfm_data.bin", "-m", matches,
             "-o", f"{recon}/robust.bin"]),
        9: ("Colorized robust triangulation", "openMVG_main_ComputeSfM_DataColor",
            "OPENMVG_BIN",
            ["-i", f"{recon}/robust.bin", "-o", f"{recon}/robust_colorized.ply"]),
        12: ("Feature extractor", "colmap", "COLMAP_BIN",
             ["feature_extractor", "--database_path", db, "--image_path", input_dir]),
        13: ("Exhaustive matcher", "colmap", "COLMAP_BIN",
             ["exhaustive_matcher", "--database_path", db]),
        14: ("Mapper", "colmap", "COLMAP_BIN",
             ["mapper", "--database_path", db, "--image_path", input_dir,
              "--output_path", sparse]),
        15: ("Image undistorter", "colmap", "COLMAP_BIN",
             ["image_undistorter", "--image_path", input_dir,
              "--input_path", os.path.join(sparse, "0"), "--output_path", dense]),
    }


def run_photogrammetry(input_dir: str, args) -> str:
    """Run the selected steps on an image folder; returns the scene path the
    MVS stages consume (steps 17-22 then run via process_scene)."""
    import subprocess

    out = args.out
    os.makedirs(out, exist_ok=True)
    steps = args.steps or PRESETS[args.preset]
    table = _sfm_steps(input_dir, out)
    scene_mvs = os.path.join(out, "scene.mvs")
    for s in steps:
        if s in table:
            name, binary, env, argv = table[s]
            exe = _find_bin(binary, env)
            if exe is None:
                raise SystemExit(
                    f"step {s} ({name}) needs `{binary}` on PATH or ${env}; "
                    f"install the SfM frontend or start from a scene file "
                    f"(preset MVS) / an importer (python -m openmvs_tpu "
                    f"import-colmap ...)")
            for a in argv:
                d = os.path.dirname(a) if os.path.splitext(a)[1] else a
                if d and not d.startswith("-") and not os.path.isdir(d) \
                        and os.sep in d:
                    os.makedirs(d, exist_ok=True)
            print(f"[{s}] {name}: {exe} {' '.join(argv)}")
            subprocess.run([exe] + argv, check=True)
        elif s in (10,):
            print(f"[{s}] Control-points registration is interactive; skipping")
        elif s in (11, 16):
            # export to MVS via the built-in importers
            if s == 11:
                from openmvs_tpu.interfaces.openmvg import import_openmvg
                from openmvs_tpu.io import mvs as mvsio

                recon = os.path.join(out, "sfm", "reconstruction")
                src = next((os.path.join(recon, f) for f in
                            ("sfm_data.bin", "sfm_data.json", "robust.bin")
                            if os.path.exists(os.path.join(recon, f))), None)
                if src is None:
                    raise SystemExit(f"step 11: no sfm_data found in {recon}")
                itf = import_openmvg(src, input_dir)
                mvsio.save(itf, scene_mvs)
            else:
                from openmvs_tpu.interfaces.colmap import import_colmap
                from openmvs_tpu.io import mvs as mvsio

                dense = os.path.join(out, "colmap", "dense")
                itf = import_colmap(os.path.join(dense, "sparse"),
                                    os.path.join(dense, "images"))
                mvsio.save(itf, scene_mvs)
            print(f"[{s}] exported -> {scene_mvs}")
        elif s in (17, 18, 19, 20, 21, 22):
            pass  # handled by process_scene below
        else:
            print(f"[{s}] unknown step, skipping")
    if any(s in (17, 18, 19, 20) for s in steps):
        if not os.path.exists(scene_mvs):
            raise SystemExit(
                f"{scene_mvs} does not exist: the selected steps {steps} "
                f"include MVS stages but no SfM+export step produced a "
                f"scene.  For a directory input pick a preset with an SfM "
                f"frontend (SEQUENTIAL/GLOBAL/COLMAP_MVS) or import a "
                f"reconstruction first (python -m openmvs_tpu "
                f"import-colmap/-nvm/... -o {scene_mvs})")
        args.no_refine = args.no_refine or 19 not in steps
        process_scene(scene_mvs, out, args)
    if any(s in (21, 22) for s in steps):
        sgm_args = argparse.Namespace(**vars(args))
        sgm_args.preset = "MVS_SGM"
        process_scene(scene_mvs, out, sgm_args)
    return scene_mvs


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
        print(f"jax.distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices",
              flush=True)
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
    ap.add_argument("--preset", default="MVS", choices=sorted(PRESETS))
    ap.add_argument("--steps", type=int, nargs="+", default=None,
                    help="explicit step list (MvgMvsPipeline step numbers)")
    ap.add_argument("--no-refine", action="store_true")
    ap.add_argument("--decimate", type=float, default=1.0)
    ap.add_argument("--mesh-chunk-points", type=int, default=0,
                    help="chunked Delaunay threshold (points); 0 = default "
                         "8M — clouds above it mesh in memory-bounded "
                         "spatial chunks with automatic seam stitching")
    ap.add_argument("--split-max-points", type=int, default=0,
                    help="split into sub-scene chunks first (scalable pipeline)")
    ap.add_argument("--coordinator", default="",
                    help="jax.distributed coordinator host:port (multi-host)")
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-id", type=int, default=int(os.environ.get("OMVS_HOST_ID", "0")))
    ap.add_argument("--dense-opt", action="append", default=[],
                    metavar="NAME=VALUE",
                    help="override a DenseOptions field for the densify "
                         "stage (repeatable), e.g. --dense-opt "
                         "estimation-iters=3")
    ap.add_argument("--mesh-shape", default="",
                    help="local (views x tile) estimation mesh, e.g. 2x4")
    args = ap.parse_args()

    mesh = init_distributed(args)
    args.mesh = mesh

    if os.path.isdir(args.scene):
        run_photogrammetry(args.scene, args)
    elif args.split_max_points > 0:
        from openmvs_tpu.scene import Scene
        from openmvs_tpu.split import split_scene, export_chunks

        scene = Scene.load(args.scene)
        chunks = split_scene(scene, max_points=args.split_max_points)
        chunk_dir = os.path.join(args.out, "chunks")
        if args.num_hosts <= 1 or args.host_id == 0:
            paths = export_chunks(scene, chunks, chunk_dir)
            if args.num_hosts > 1:
                # publish atomically (write + rename): peers poll the marker
                marker = os.path.join(chunk_dir, ".chunks_ready")
                with open(marker + ".tmp", "w") as f:
                    f.write("\n".join(paths))
                os.replace(marker + ".tmp", marker)
        else:
            # chunk splitting is deterministic but only host 0 WRITES the
            # chunk files (concurrent writers would race); peers wait for
            # its ready marker, matching per-host resume semantics
            marker = os.path.join(chunk_dir, ".chunks_ready")
            deadline = time.time() + 600
            while not os.path.exists(marker):
                if time.time() > deadline:
                    raise RuntimeError("timed out waiting for host 0 chunks")
                time.sleep(1.0)
            paths = [p for p in open(marker).read().splitlines() if p]
        # deal chunks round-robin across hosts (per-host resume still applies)
        for ci, p in enumerate(paths):
            if ci % max(args.num_hosts, 1) != args.host_id % max(args.num_hosts, 1):
                continue
            process_scene(p, os.path.join(args.out, os.path.splitext(os.path.basename(p))[0]), args)
    else:
        process_scene(args.scene, args.out, args)


if __name__ == "__main__":
    main()
