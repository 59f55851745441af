"""Worker for tests/test_distributed.py: one process of a CPU cluster.

Joins the group, builds the global (dp,) mesh, loads ONLY this process's
slice of a deterministic global batch, runs one Trainer train step on a
tiny HAET model, and prints loss + parameter-gradient fingerprints for the
parent test to compare across processes and against single-process truth.

Run: python distributed_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "dp"

    from haet_tpu.parallel.distributed import (
        global_mesh,
        init_distributed,
        process_batch_slice,
        shard_host_batch,
    )

    multi = init_distributed(coordinator=f"127.0.0.1:{port}",
                             num_processes=nproc, process_id=pid)
    assert multi == (nproc > 1)
    if mode == "pp":
        return main_pp(pid, nproc)
    if mode == "tp":
        return main_tp(pid, nproc)
    mesh = global_mesh()  # dp over all processes' devices

    import jax.numpy as jnp

    from haet_tpu.models import HAETransolver_Irregular_Mesh
    from haet_tpu.train import Trainer
    from haet_tpu.utils.config import TrainConfig

    model = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=1, n_layers=1, n_hidden=16,
        n_head=2, slice_num=8, mlp_ratio=1)
    cfg = TrainConfig(lr=1e-3, schedule="constant", weight_decay=0.0)
    trainer = Trainer(
        model=model,
        loss_fn=lambda out, b: (jnp.mean((out - b["y"]) ** 2), {}),
        cfg=cfg, total_steps=4, mesh=mesh,
    )

    # deterministic GLOBAL batch; this process materializes only its slice
    gb = 8
    rng = np.random.RandomState(0)
    x = rng.rand(gb, 64, 3).astype(np.float32)
    fx = rng.randn(gb, 64, 1).astype(np.float32)
    y = rng.randn(gb, 64, 1).astype(np.float32)
    sl = process_batch_slice(gb)
    local = {"x": x[sl], "fx": fx[sl], "y": y[sl]}
    batch = shard_host_batch(local, mesh)

    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    # pass the RAW host-local numpy slice: train_step's internal
    # shard_batch must recognize the multi-process mesh and assemble the
    # global array from per-process data (the fit()-path contract)
    state, metrics = trainer.train_step(state, local, jax.random.PRNGKey(1))

    # fingerprints: loss + a few fully-replicated gradient-derived values
    loss = float(metrics["loss"])
    gnorm = float(metrics["grad_norm"])  # KeyError > silent -1==-1
    psum = float(
        sum(jnp.sum(jnp.abs(p)) for p in jax.tree_util.tree_leaves(
            state.params)))
    print(f"RESULT {pid} loss={loss:.10f} gnorm={gnorm:.10f} "
          f"psum={psum:.10f} nglobal={len(jax.devices())} "
          f"nlocal={len(jax.local_devices())}", flush=True)


def main_pp(pid: int, nproc: int):
    """Pipeline-parallel across the PROCESS boundary: the pp mesh axis is
    the slow (process-major) one, so with 2 processes x 4 devices the
    stage-1 -> stage-2 ``lax.ppermute`` hop crosses processes (Gloo) —
    exactly the pod-scale pp layout. dp is held at 2 for every cluster
    size so the per-dp-shard BatchNorm statistics are identical and the
    2-process run must match the single-process run bit-for-bit up to f32
    reduction noise (pp stage count is numerics-invariant,
    tests/test_pipeline.py::test_pipeline_dropout_stage_count_invariance
    and the parity suite)."""
    import jax
    import jax.numpy as jnp

    from haet_tpu.models import HAETransolver_Irregular_Mesh
    from haet_tpu.parallel import PipelinedModel
    from haet_tpu.train import Trainer
    from haet_tpu.utils.config import TrainConfig
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices.reshape(-1, 2), ("pp", "dp"))  # pp spans processes

    model = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=1, n_layers=4, n_hidden=16,
        n_head=2, slice_num=8, mlp_ratio=1)
    pm = PipelinedModel(model, mesh, num_microbatches=2,
                        pp_axis="pp", dp_axis="dp")
    trainer = Trainer(
        model=pm,
        loss_fn=lambda out, b: (jnp.mean((out - b["y"]) ** 2), {}),
        cfg=TrainConfig(lr=1e-3, schedule="constant", weight_decay=0.0),
        total_steps=4, mesh=mesh,
    )

    # The batch is sharded over dp only and REPLICATED over the
    # process-spanning pp axis, so every process's local view is the full
    # global batch (shard_batch's make_array_from_process_local_data
    # assembles it per-process).
    gb = 8
    rng = np.random.RandomState(0)
    batch = {"x": rng.rand(gb, 64, 3).astype(np.float32),
             "fx": rng.randn(gb, 64, 1).astype(np.float32),
             "y": rng.randn(gb, 64, 1).astype(np.float32)}

    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))

    loss = float(metrics["loss"])
    gnorm = float(metrics["grad_norm"])
    # params are pp-sharded across processes (not fully addressable) —
    # reduce under jit so every process sees the replicated scalar
    psum = float(jax.jit(lambda t: sum(
        jnp.sum(jnp.abs(p)) for p in jax.tree_util.tree_leaves(t)))(
        state.params))
    print(f"RESULT {pid} loss={loss:.10f} gnorm={gnorm:.10f} "
          f"psum={psum:.10f} nglobal={len(jax.devices())} "
          f"nlocal={len(jax.local_devices())}", flush=True)


def main_tp(pid: int, nproc: int):
    """Head tensor parallelism across the PROCESS boundary: the tp mesh
    axis is the slow (process-major) one, so the [B, H, N, *] head shards
    — and the head-merge all-gather in particular — cross the 2-process
    Gloo cluster. dp is held at 2 for every cluster size, so the
    single-process run (tp=2) differs from the 2-process run (tp=4) only
    in the tp partitioning, which is numerics-invariant up to f32
    reduction order (tests/test_tensor_parallel.py pins tp == replicated
    single-host)."""
    import jax
    import jax.numpy as jnp

    from haet_tpu.models import HAETransolver_Irregular_Mesh
    from haet_tpu.train import Trainer
    from haet_tpu.utils.config import TrainConfig
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices.reshape(-1, 2), ("tp", "dp"))  # tp spans processes

    model = HAETransolver_Irregular_Mesh(
        space_dim=3, fun_dim=1, out_dim=1, n_layers=1, n_hidden=16,
        n_head=4, slice_num=8, mlp_ratio=1, shard_axes=("dp", "tp"))
    trainer = Trainer(
        model=model,
        loss_fn=lambda out, b: (jnp.mean((out - b["y"]) ** 2), {}),
        cfg=TrainConfig(lr=1e-3, schedule="constant", weight_decay=0.0),
        total_steps=4, mesh=mesh,
    )

    # batch sharded over dp, replicated over the process-spanning tp axis
    # — each process's local view is the full global batch (shard_batch
    # assembles per-process via make_array_from_process_local_data)
    gb = 8
    rng = np.random.RandomState(0)
    batch = {"x": rng.rand(gb, 64, 3).astype(np.float32),
             "fx": rng.randn(gb, 64, 1).astype(np.float32),
             "y": rng.randn(gb, 64, 1).astype(np.float32)}

    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))

    loss = float(metrics["loss"])
    gnorm = float(metrics["grad_norm"])
    psum = float(jax.jit(lambda t: sum(
        jnp.sum(jnp.abs(p)) for p in jax.tree_util.tree_leaves(t)))(
        state.params))
    print(f"RESULT {pid} loss={loss:.10f} gnorm={gnorm:.10f} "
          f"psum={psum:.10f} nglobal={len(jax.devices())} "
          f"nlocal={len(jax.local_devices())}", flush=True)


if __name__ == "__main__":
    main()
