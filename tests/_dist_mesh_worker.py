"""Worker for the cross-process jax.distributed mesh test.

Each of the 2 OS processes owns 4 virtual CPU devices; together they form
ONE 8-device global mesh (the multi-host analogue of a TPU pod slice, with
localhost gRPC standing in for DCN).  The worker runs:

  1. the flagship PatchMatch sweep (the densify inner step) sharded over a
     global ``('views',)`` mesh axis spanning BOTH processes — each process
     computes only its addressable shards, exactly how a pod runs
     per-view estimation (SURVEY §2.7; reference scale-out analogue:
     scripts/python/MvsScalablePipeline.py run as separate processes);
  2. a cross-process collective: a `shard_map` + `psum` global reduction
     over the same mesh (the DCN-crossing all-reduce every multi-host
     training/fusion step depends on);
  3. parity: results are allgathered and compared against a serial
     single-device evaluation of ALL views computed locally.

Usage: _dist_mesh_worker.py <coordinator> <num_procs> <proc_id>
Prints "DIST_MESH_OK ..." on success.
"""
import os
import sys


def main() -> None:
    coord, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("OMVS_NO_PALLAS", "1")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils
    from jax.experimental.shard_map import shard_map

    assert jax.process_count() == nprocs, jax.process_count()
    devs = jax.devices()
    assert len(devs) == 4 * nprocs, len(devs)
    print(f"joined: process {pid}/{nprocs}, "
          f"{jax.local_device_count()}/{len(devs)} devices", flush=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge
    from openmvs_tpu.ops import patchmatch

    # identical deterministic problem on every process (the scene data a
    # real deployment would read from shared storage)
    data, state, opts, v = ge._make_example(h=96, w=128, v=2)
    n_views = len(devs)

    def perturb(i):
        # per-view variation so shards are distinguishable
        return jax.tree.map(
            lambda x: x * (1.0 + 0.01 * i) if x.dtype == jnp.float32 else x,
            state)

    states = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[perturb(i) for i in range(n_views)])
    key = jnp.zeros(2, jnp.uint32)

    mesh = Mesh(np.array(devs).reshape(n_views), ("views",))
    sh = NamedSharding(mesh, P("views"))
    rep = NamedSharding(mesh, P())

    def put_batched(tree, sharding):
        # build global arrays from per-process local shards: each process
        # materializes only the rows its devices own
        def make(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding.with_memory_kind(None)
                if hasattr(sharding, "with_memory_kind") else sharding,
                lambda idx, _x=x: _x[idx])
        return jax.tree.map(make, tree)

    states_g = put_batched(states, sh)
    data_g = jax.device_put(data, rep)
    key_g = jax.device_put(key, rep)

    @jax.jit
    def sweep_all(st, dat, k):
        return jax.vmap(
            lambda s: patchmatch.sweep(s, dat, opts, k, v, False))(st)

    out = sweep_all(states_g, data_g, key_g)
    # the sharded result, gathered across processes
    depth_g = np.asarray(multihost_utils.process_allgather(
        out.depth, tiled=True))

    # serial single-device reference: all views on local device 0
    local0 = jax.local_devices()[0]
    st_l = jax.device_put(states, local0)
    dat_l = jax.device_put(data, local0)
    serial = np.asarray(jax.jit(sweep_all)(st_l, dat_l,
                                           jax.device_put(key, local0)).depth)
    rel = np.abs(depth_g - serial) / np.maximum(np.abs(serial), 1e-6)
    close = (rel < 1e-3).mean()
    assert close > 0.999, f"sweep parity {close:.5f}"

    # cross-process collective: psum over the global views axis
    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=P("views"), out_specs=P())
    def global_mean(d):
        return jax.lax.psum(jnp.sum(d), "views") / (
            n_views * d.shape[-1] * d.shape[-2])

    # the psum output is replicated on every device: read this process's
    # own addressable shard (allgather of a replicated global array is
    # unsupported for non-fully-addressable arrays)
    gm = float(np.asarray(global_mean(out.depth).addressable_shards[0].data))
    want = float(serial.mean())
    assert abs(gm - want) < 1e-3 * max(abs(want), 1.0), (gm, want)

    print(f"DIST_MESH_OK process={pid} views={n_views} "
          f"parity={close:.5f} global_mean={gm:.5f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
