"""Shared glue for the PDE benchmark drivers."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from haet_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()


def base_parser(name: str) -> argparse.ArgumentParser:
    """Argparse surface mirroring the reference exp_* drivers."""
    p = argparse.ArgumentParser(name)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--batch-size", type=int, default=4, dest="batch_size")
    p.add_argument("--n-hidden", type=int, default=128, dest="n_hidden")
    p.add_argument("--n-layers", type=int, default=8, dest="n_layers")
    p.add_argument("--n-heads", type=int, default=8, dest="n_heads")
    p.add_argument("--slice_num", type=int, default=64)
    p.add_argument("--mlp_ratio", type=int, default=1)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--max_grad_norm", type=float, default=None)
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient accumulation: microbatches per optimizer "
                        "step (must divide --batch-size); peak activation "
                        "memory follows batch_size/accum_steps")
    p.add_argument("--unified_pos", type=int, default=0)
    p.add_argument("--ref", type=int, default=8)
    p.add_argument("--ntrain", type=int, default=1000)
    p.add_argument("--ntest", type=int, default=200)
    p.add_argument("--bf16", type=int, default=0)
    p.add_argument("--mu_bf16", type=int, default=0,
                   help="store Adam's first moment in bfloat16 "
                        "(saves 2 bytes/param of optimizer-state HBM)")
    p.add_argument("--use_checkpoint", type=int, default=0,
                   help="rematerialize each block in the backward pass "
                        "(trades FLOPs for activation memory)")
    p.add_argument("--data_path", type=str, default="./data/fno")
    p.add_argument("--out_dir", type=str, default="./runs")
    p.add_argument("--save_name", type=str, default=name)
    p.add_argument("--smoke", action="store_true")
    return add_mesh_args(p)


def shrink_for_smoke(args):
    args.epochs = 2
    args.n_hidden = 32
    args.n_layers = 2
    args.n_heads = 4
    args.slice_num = 16
    args.batch_size = 2
    args.ntrain, args.ntest = 8, 4
    return args


def apply_model_args(cfg, args):
    cfg.train.lr = args.lr
    cfg.train.weight_decay = args.weight_decay
    cfg.train.epochs = args.epochs
    if cfg.train.t_max is not None:
        # cosine_annealing presets tie T_max to the epoch count, like the
        # reference's CosineAnnealingLR(T_max=epochs) (exp_elas.py:128)
        cfg.train.t_max = args.epochs
    cfg.train.batch_size = args.batch_size
    cfg.train.max_grad_norm = args.max_grad_norm
    cfg.train.accum_steps = getattr(args, "accum_steps", 1)
    cfg.train.mu_bf16 = bool(getattr(args, "mu_bf16", 0))
    cfg.model.n_hidden = args.n_hidden
    cfg.model.n_layers = args.n_layers
    cfg.model.n_head = args.n_heads
    cfg.model.slice_num = args.slice_num
    cfg.model.mlp_ratio = args.mlp_ratio
    cfg.model.dropout = args.dropout
    cfg.model.unified_pos = bool(args.unified_pos)
    cfg.model.ref = args.ref
    cfg.model.bf16 = bool(args.bf16)
    cfg.model.use_checkpoint = bool(getattr(args, "use_checkpoint", 0))
    return cfg


def add_mesh_args(p: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """--dp/--tp flags: multi-chip SPMD from any driver CLI (the reference
    has no distributed path at all, SURVEY.md §2.7)."""
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh size (0 = no mesh)")
    p.add_argument("--tp", type=int, default=1,
                   help="head tensor-parallel mesh size (requires "
                        "n_heads %% tp == 0)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stage count over the Transolver "
                        "block stack (requires n_layers %% pp == 0; "
                        "composes with --dp and --tp on a (dp, pp, tp) "
                        "mesh)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="microbatches per pipelined step (0 = one per "
                        "stage; must divide the per-step batch)")
    p.add_argument("--multihost", action="store_true",
                   help="join the JAX process group first (TPU pods "
                        "autodetect; elsewhere set HAET_COORDINATOR / "
                        "HAET_NUM_PROCESSES / HAET_PROCESS_ID). The mesh "
                        "then spans ALL processes' devices.")
    return p


def make_mesh_from_args(cfg, args):
    """Build the (dp, tp) mesh and enable the model's head-TP sharding
    constraints when tp > 1. Returns the mesh (or None) to pass to
    Trainer(mesh=...). Mutates cfg.model.shard_axes."""
    if getattr(args, "multihost", False):
        from haet_tpu.parallel.distributed import init_distributed

        init_distributed()
    n_pp = max(1, getattr(args, "pp", 1))
    if (not getattr(args, "dp", 0) and getattr(args, "tp", 1) <= 1
            and n_pp <= 1):
        return None
    from haet_tpu.parallel import make_mesh

    import jax

    n_tp = max(1, getattr(args, "tp", 1))
    # --tp without --dp = tensor-parallel only (dp=1); data parallelism is
    # opted into explicitly because it needs batch_size % dp == 0.
    n_dp = getattr(args, "dp", 0) or 1
    if n_pp > 1:
        # Pipeline mesh: (dp, pp) — or (dp, pp, tp) with --tp: the
        # pipeline body is manual over (pp, dp) only, head-TP constraints
        # stay XLA-automatic over tp (parallel/pipeline.py composition
        # note).
        if cfg.model.n_layers % n_pp:
            raise SystemExit(
                f"--pp {n_pp} must divide n_layers ({cfg.model.n_layers})")
        if n_tp > 1 and cfg.model.n_head % n_tp:
            raise SystemExit(
                f"--tp {n_tp} must divide n_heads ({cfg.model.n_head})")
        if n_dp * n_pp * n_tp > len(jax.devices()):
            raise SystemExit(
                f"--dp {n_dp} x --pp {n_pp} x --tp {n_tp} needs "
                f"{n_dp * n_pp * n_tp} devices, have {len(jax.devices())}")
        from haet_tpu.parallel import make_pp_mesh

        mesh = make_pp_mesh(n_dp=n_dp, n_pp=n_pp, n_tp=n_tp,
                            devices=jax.devices()[: n_dp * n_pp * n_tp])
        if n_tp > 1:
            cfg.model.shard_axes = ("dp", "tp")
        mb = getattr(args, "pp_microbatches", 0) or n_pp
        if cfg.train.batch_size % (mb * n_dp):
            # not fatal — uneven batches fall back to replicated placement
            # (parallel/mesh.shard_batch) and the pipeline pads internally
            # — but EVERY full-size step would then lose the dp speedup
            # and compute pad rows, so say so
            print(f"[mesh] note: batch size {cfg.train.batch_size} is not "
                  f"divisible by pp_microbatches x dp ({mb} x {n_dp}); "
                  "every step will pad + replicate (wasted compute)")
        print(f"[mesh] dp={n_dp} pp={n_pp} tp={n_tp} microbatches={mb} "
              f"({n_dp * n_pp * n_tp} devices)")
        return mesh
    if n_dp * n_tp > len(jax.devices()):
        raise SystemExit(
            f"--dp {n_dp} x --tp {n_tp} needs {n_dp * n_tp} devices, "
            f"have {len(jax.devices())}")
    # Use the first dp*tp devices — an explicit --dp below the device count
    # is allowed (e.g. --dp 2 --tp 2 on an 8-device host).
    mesh = make_mesh(n_dp=n_dp, n_tp=n_tp,
                     devices=jax.devices()[: n_dp * n_tp])
    if n_tp > 1:
        if cfg.model.n_head % n_tp:
            raise SystemExit(
                f"--tp {n_tp} must divide n_heads ({cfg.model.n_head})")
        cfg.model.shard_axes = ("dp", "tp")
    n_dp_actual = mesh.shape["dp"]
    if cfg.train.batch_size % n_dp_actual:
        raise SystemExit(
            f"batch size {cfg.train.batch_size} must be divisible by the "
            f"dp mesh size {n_dp_actual}")
    print(f"[mesh] dp={mesh.shape['dp']} tp={mesh.shape['tp']} "
          f"({len(mesh.devices.ravel())} devices)")
    return mesh


def maybe_pipeline(model, mesh, args):
    """Wrap the built model in :class:`haet_tpu.parallel.PipelinedModel`
    when ``--pp > 1``. The returned object keeps the flax ``init``/``apply``
    surface, so Trainer wiring is unchanged."""
    n_pp = getattr(args, "pp", 1)
    if not mesh or n_pp <= 1:
        return model
    from haet_tpu.parallel import PipelinedModel

    mb = getattr(args, "pp_microbatches", 0) or None
    return PipelinedModel(model, mesh, num_microbatches=mb, dp_axis="dp")


def init_custom_loop_state(model, tx, mesh, rng, *args):
    """``(variables, opt_state)`` for the custom-loop drivers, sharded
    from birth when the model declares ``state_sharding`` (mirrors
    ``Trainer.init_state`` — a pipelined config whose params/optimizer
    state exceed one chip must never materialize the full tree on one
    device first)."""
    import contextlib

    import jax

    placer = (getattr(model, "state_sharding", None)
              if mesh is not None else None)
    ctx = mesh if mesh is not None else contextlib.nullcontext()
    with ctx:
        # TP sharding constraints (and pipeline out_shardings) need the
        # mesh at trace time
        if placer is not None:
            var_sh = placer(jax.eval_shape(model.init, rng, *args))
            variables = jax.jit(model.init, out_shardings=var_sh)(rng, *args)
            opt_sh = placer(jax.eval_shape(tx.init, variables["params"]))
            opt_state = jax.jit(
                tx.init, out_shardings=opt_sh)(variables["params"])
        else:
            variables = jax.jit(model.init)(rng, *args)
            opt_state = tx.init(variables["params"])
    return variables, opt_state


def custom_loop_mesh(mesh, model=None):
    """Shared scaffolding for the custom-loop drivers (exp_ns / exp_plas):
    returns ``(mesh_ctx, place, put_state)`` — trace/execute context, batch
    placement (dp-sharded, multi-process aware via
    :func:`haet_tpu.parallel.mesh.shard_batch`), and state placement
    (replicated, or the model's ``state_sharding`` layout when it declares
    one — the pipelined model's stage-sharded parameter stacks). Keeping
    this in one place stops the two drivers drifting (they once diverged
    on batch_stats handling)."""
    import contextlib

    mesh_ctx = (lambda: mesh) if mesh is not None else contextlib.nullcontext

    def place(batch):
        if mesh is None:
            return batch
        from haet_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, mesh)

    def put_state(state):
        if mesh is None:
            return state
        import jax

        placer = getattr(model, "state_sharding", None)
        if placer is not None:
            return jax.device_put(state, placer(state))
        from haet_tpu.parallel.mesh import replicate

        return jax.device_put(state, replicate(mesh))

    return mesh_ctx, place, put_state


def weighted_eval(trainer, state, test, bs):
    """Per-SAMPLE-weighted mean eval loss over the full test set.

    The reference sums per-sample losses and divides by ntest
    (``TestLoss(size_average=False)``, e.g. exp_pipe.py:229-236); a plain
    mean over batch means would misweight the trailing partial batch that
    ``batch_iter(drop_last=False)`` now yields.
    """
    from haet_tpu.data import batch_iter

    tot, n = 0.0, 0
    for b in batch_iter(test, bs, False)():
        k = len(next(iter(b.values())))
        tot += float(trainer.eval_step(state, b)["loss"]) * k
        n += k
    return tot / max(n, 1)
