"""Training engine: one ``jit``-compiled step, data-parallel over the mesh.

The reference has a per-benchmark hand-written loop (AdamW/Adam + OneCycleLR,
grad-clip, AMP + GradScaler, per-epoch eval — SURVEY.md §2.5); here a single
engine covers all benchmarks:

* whole fwd+bwd+update step under one ``jax.jit`` with donated state — the
  TPU equivalent of (and replacement for) ``torch.compile`` + AMP autocast;
  bf16 is set per-model via its ``dtype``, no loss scaling needed;
* data parallelism by construction: batches are placed with a ``dp``
  sharding, parameters replicated; XLA inserts the gradient ``psum``
  (SURVEY.md §2.7 — the reference has no distributed path at all);
* OneCycle is a torch-EXACT closed form of
  ``torch.optim.lr_scheduler.OneCycleLR`` (cos anneal, three_phase=False),
  including the default ``cycle_momentum=True`` behavior: torch cycles
  Adam's beta1 between ``max_momentum`` (0.95) and ``base_momentum``
  (0.85) along the same phases, so the reference's Adam/AdamW runs train
  with a *scheduled* beta1 — reproduced here via
  ``optax.inject_hyperparams`` (value-parity tests:
  ``tests/test_train.py::test_onecycle_matches_torch`` and the K-step
  ``test_trajectory_parity_vs_torch``);
* checkpointing via orbax with true mid-training resume (the reference can
  only load for eval, ``exp_darcy.py:147``);
* early stopping with patience (reference ``train.py:21-46``).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..utils.config import TrainConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def _onecycle_phased(total_steps: int, v_start: float, v_peak: float,
                     v_end: float, pct_start: float):
    """torch ``OneCycleLR`` (``anneal_strategy='cos'``,
    ``three_phase=False``) as a closed-form ``step -> value`` callable,
    bit-matching torch's phase geometry: phase boundaries at
    ``float(pct_start*T) - 1`` and ``T - 1``, cosine interpolation
    ``end + (start-end)/2 * (cos(pi*pct) + 1)`` — torch
    ``lr_scheduler.py::OneCycleLR._schedule_phases`` / ``_annealing_cos``.
    Used for both the LR cycle (start->peak->end) and torch's
    ``cycle_momentum`` beta1 cycle (max->base->max)."""
    warm_end = pct_start * total_steps - 1.0
    total_end = float(total_steps - 1)
    assert warm_end > 0.0, "caller must stretch tiny horizons first"

    def sched(step):
        # torch raises past total_steps; clamp instead so a stray extra
        # step (e.g. a final eval probing sched(T)) stays finite.
        s = jnp.minimum(jnp.asarray(step, jnp.float32),
                        float(total_steps))
        pct1 = s / warm_end
        # torch does NOT clamp pct in phase 2 (step_num == total_steps
        # gives pct > 1 and a value slightly past v_end) — keep that.
        pct2 = (s - warm_end) / (total_end - warm_end)

        def interp(a, b, pct):
            # == b + (a-b)/2 * (cos(pi*pct)+1) (torch _annealing_cos), via
            # the half-angle identity: the direct form catastrophically
            # cancels in f32 near pct=1 where the value approaches b
            # (measured 3e-4 relative error at the OneCycle tail; this
            # form stays < 2e-6 of torch's f64 values).
            c = jnp.cos(jnp.pi * 0.5 * pct)
            return b + (a - b) * c * c

        return jnp.where(s <= warm_end, interp(v_start, v_peak, pct1),
                         interp(v_peak, v_end, pct2))

    return sched


def _onecycle_horizon(cfg: TrainConfig, total_steps: int) -> int:
    """The (possibly stretched) OneCycle horizon. torch's first phase
    boundary is ``pct_start*T - 1``; when that is <= 0 (tiny T) the
    interpolation divides by a non-positive span, so the horizon is
    stretched to the smallest T with a positive warmup phase. Real runs
    (T >> 1/pct_start) are unaffected; a stretch is warned loudly because
    the run then ends mid-decay at an elevated LR."""
    p = float(cfg.pct_start)
    if not 0.0 < p < 1.0:
        raise ValueError(f"pct_start must be in (0, 1), got {p}")
    if p * total_steps > 1.0:
        return total_steps
    import warnings

    stretched = int(np.floor(1.0 / p)) + 1
    while p * stretched <= 1.0:  # guard float rounding at e.g. p=0.5
        stretched += 1
    warnings.warn(
        f"onecycle horizon stretched from {total_steps} to {stretched} "
        f"steps (pct_start={p} needs pct_start*total_steps > 1): the run "
        "will end mid-decay at an elevated LR. Use more steps or a larger "
        "pct_start if this is a real training run.", stacklevel=3)
    return stretched


def make_schedule(cfg: TrainConfig, total_steps: int):
    """The learning-rate schedule as a ``step -> lr`` callable."""
    if cfg.schedule == "onecycle":
        horizon = _onecycle_horizon(cfg, total_steps)
        # torch-exact OneCycleLR (reference exp_darcy.py:138-139 defaults;
        # the car run passes final_div_factor=1000, train.py:211-216):
        # initial_lr = max_lr/div_factor, min_lr = initial_lr/final_div.
        v0 = cfg.lr / cfg.div_factor
        return _onecycle_phased(horizon, v0, cfg.lr,
                                v0 / cfg.final_div_factor, cfg.pct_start)
    if cfg.schedule == "cosine_annealing":
        # torch CosineAnnealingLR closed form, eta_min=0:
        #   lr(t) = lr * (1 + cos(pi * t / T_max)) / 2
        # The reference's exp_elas.py:128,226 constructs it with
        # T_max=EPOCHS but calls scheduler.step() per BATCH, so the LR
        # oscillates with period 2*epochs optimizer steps (cos is
        # periodic). cfg.t_max reproduces that: the period is t_max
        # scheduler steps, counted per optimizer step like the reference.
        t_max = cfg.t_max if cfg.t_max is not None else total_steps
        if t_max <= 0:
            raise ValueError(
                f"cosine_annealing needs t_max > 0, got {t_max} "
                "(t_max=None uses the run's total step count)")
        return lambda step: cfg.lr * 0.5 * (1.0 + jnp.cos(
            jnp.pi * step / t_max))
    if cfg.schedule == "constant":
        return lambda step: cfg.lr
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def clip_by_global_norm_torch(max_norm: float):
    """``torch.nn.utils.clip_grad_norm_`` exactly: every reference run
    clips (``train.py:94``, all six ``exp_*.py``), and torch scales by
    ``max_norm / (total_norm + 1e-6)`` clamped to 1 — the 1e-6 makes the
    active-clipping scale differ from ``optax.clip_by_global_norm``'s
    ``max_norm / total_norm`` by ~1e-6/norm relative. Negligible per
    step, but trajectory exactness is the contract here."""
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        coef = jnp.minimum(max_norm / (norm + 1e-6), 1.0)
        return jax.tree_util.tree_map(lambda g: g * coef, updates), state

    return optax.GradientTransformation(init, update)


def weight_decay_mask(params):
    """True for every leaf AdamW should decay — all except ``sigma_att``.

    In the reference, ``sigma_att`` is only ever used under
    ``@torch.no_grad`` (``attention.py:27-33``), so its ``.grad`` stays
    ``None`` and ``torch.optim`` SKIPS the parameter entirely: no moment
    update and, crucially, no decoupled weight decay. An unmasked
    ``optax.adamw`` would instead decay it toward zero over a long run —
    silently shrinking a parameter whose *value* still shapes the forward
    pass (the distance bias). Masking the decay reproduces torch exactly:
    with an exactly-zero gradient (the stop_gradient boundary, pinned in
    ``tests/test_full_model_oracle.py``), Adam's moments stay zero and the
    remaining update is identically zero on both sides."""
    def keep(path, _):
        name = getattr(path[-1], "key", getattr(path[-1], "name", None))
        return name != "sigma_att"

    return jax.tree_util.tree_map_with_path(keep, params)


def make_optimizer(cfg: TrainConfig, total_steps: int):
    """AdamW/Adam + OneCycle (reference ``exp_darcy.py:132-139``,
    ``train.py:210-216``).

    Torch-parity details beyond the LR schedule:

    * ``cycle_momentum`` (torch OneCycleLR's default True): beta1 is
      cycled ``max_momentum -> base_momentum -> max_momentum`` along the
      LR phases (torch sets ``group['betas']`` as a side effect of
      ``scheduler.step()``). Implemented with ``optax.inject_hyperparams``
      so ``b1`` is a schedule; bias correction uses the current beta1 each
      step, exactly like torch.
    * weight decay skips ``sigma_att`` (see :func:`weight_decay_mask`).

    ``cfg.mu_bf16`` stores Adam's first moment in bfloat16 (optax
    ``mu_dtype``) — a TPU HBM lever worth ~2 bytes/param of optimizer
    state. The second moment stays f32 (it spans a wide dynamic range and
    directly scales the update); the first moment is a smoothed gradient
    where bf16's 8 mantissa bits cost noise far below gradient noise.
    """
    cycled = cfg.schedule == "onecycle" and cfg.cycle_momentum
    if cfg.schedule == "onecycle":
        # compute the (possibly stretched) horizon ONCE so the LR and
        # beta1 cycles always share it and a stretch warns once
        horizon = _onecycle_horizon(cfg, total_steps)
        v0 = cfg.lr / cfg.div_factor
        sched = _onecycle_phased(horizon, v0, cfg.lr,
                                 v0 / cfg.final_div_factor, cfg.pct_start)
        if cycled:
            b1 = _onecycle_phased(horizon, cfg.max_momentum,
                                  cfg.base_momentum, cfg.max_momentum,
                                  cfg.pct_start)
    else:
        sched = make_schedule(cfg, total_steps)

    mu_dtype = jnp.bfloat16 if cfg.mu_bf16 else None
    if cfg.optimizer == "adamw":
        if cycled:
            tx = optax.inject_hyperparams(
                optax.adamw, static_args=("mu_dtype", "mask"))(
                learning_rate=sched, b1=b1,
                weight_decay=cfg.weight_decay, mu_dtype=mu_dtype,
                mask=weight_decay_mask)
        else:
            tx = optax.adamw(sched, weight_decay=cfg.weight_decay,
                             mu_dtype=mu_dtype, mask=weight_decay_mask)
    elif cfg.optimizer == "adam":
        if cycled:
            tx = optax.inject_hyperparams(
                optax.adam, static_args=("mu_dtype",))(
                learning_rate=sched, b1=b1, mu_dtype=mu_dtype)
        else:
            tx = optax.adam(sched, mu_dtype=mu_dtype)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    if cfg.max_grad_norm is not None:
        tx = optax.chain(clip_by_global_norm_torch(cfg.max_grad_norm), tx)
    return tx


class EarlyStopping:
    """Patience-based early stopping (reference ``train.py:21-46``)."""

    def __init__(self, patience: int = 7, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best: float | None = None
        self.counter = 0
        self.should_stop = False

    def update(self, val_loss: float) -> bool:
        if self.best is None or val_loss < self.best - self.min_delta:
            self.best = val_loss
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop


class MetricsLogger:
    """JSON-lines metrics log with the reference's wandb key namespacing
    (``train.py:109-137``); streams to wandb too when the package is
    importable and ``use_wandb=True``."""

    def __init__(self, path: str | None = None, echo: bool = True,
                 use_wandb: bool = False, wandb_kwargs: dict | None = None):
        self.path = path
        self.echo = echo
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                wandb.init(**(wandb_kwargs or {}))
                self._wandb = wandb
            except Exception as e:  # wandb absent or offline
                print(f"[MetricsLogger] wandb unavailable ({e}); "
                      "falling back to JSONL only")
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, metrics: dict):
        rec = {k: (float(v) if hasattr(v, "__float__") else v)
               for k, v in metrics.items()}
        rec["_time"] = time.time()
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in rec.items() if k != "_time"})
        if self.echo:
            msg = " ".join(
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items() if k != "_time"
            )
            print(msg, flush=True)

    def close(self):
        """Flush and release the JSONL handle and finish the wandb run.
        Idempotent. Long-lived processes (sweeps, notebooks) that create
        many loggers must close them — one-shot drivers get it via the
        context-manager form ``with MetricsLogger(...) as logger:``."""
        if self._f is not None:
            try:
                self._f.close()
            finally:
                self._f = None
        if self._wandb is not None:
            try:
                self._wandb.finish()
            finally:
                self._wandb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


@dataclass
class Trainer:
    """Generic training engine.

    Args:
        model: a flax module whose ``apply`` takes ``(variables, *batch_args,
            train=..., mutable=..., rngs=...)``.
        loss_fn: ``loss_fn(apply_out, batch) -> (loss, aux_dict)`` where
            ``apply_out`` is the model output for ``batch``.
        batch_args: ``batch -> tuple`` of positional model inputs.
        cfg: TrainConfig.
        total_steps: schedule horizon (steps_per_epoch * epochs).
    """

    model: Any
    loss_fn: Callable
    cfg: TrainConfig
    total_steps: int
    batch_args: Callable = field(default=lambda b: (b["x"], b["fx"]))
    mesh: Any = None
    eval_fn: Optional[Callable] = None  # (apply_out, batch) -> metric dict
    # log per-batch metrics every K batches (reference logs every 10,
    # train.py:109-125); 0 disables per-batch logging.
    batch_log_every: int = 0
    # log per-leaf gradient norms every K epochs — the analogue of the
    # reference's wandb.watch(model, log="all") gradient histograms
    # (train.py:192-208). 0 disables. Computed once per K epochs on one
    # batch (a separate jitted program), not in the hot step.
    watch_every: int = 0

    def __post_init__(self):
        self.tx = make_optimizer(self.cfg, self.total_steps)
        self.sched = make_schedule(self.cfg, self.total_steps)
        self._train_step = jax.jit(self._step, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval)
        self._train_scan = jax.jit(self._scan_steps, donate_argnums=(0,))
        self._leaf_norms_jit = jax.jit(self._leaf_grad_norms)
        self._predict_jit = jax.jit(
            lambda params, batch_stats, batch:
            self._apply(params, batch_stats, batch, False, None)[0]
        )

    # -- state ------------------------------------------------------------
    def init_state(self, rng, sample_batch) -> TrainState:
        args = self.batch_args(sample_batch)
        placer = (getattr(self.model, "state_sharding", None)
                  if self.mesh is not None else None)
        if placer is not None:
            # Sharded-from-birth: jit out_shardings place the parameter
            # stacks (and the Adam moments below) directly on their stage
            # devices — a scaled-up config whose params/optimizer state
            # exceed one chip (pp's use case) must never materialize the
            # full tree on one device first.
            with self.mesh:
                var_sh = placer(jax.eval_shape(self.model.init, rng, *args))
                variables = jax.jit(
                    self.model.init, out_shardings=var_sh)(rng, *args)
                params = variables["params"]
                batch_stats = variables.get("batch_stats", FrozenDict())
                opt_sh = placer(jax.eval_shape(self.tx.init, params))
                opt_state = jax.jit(
                    self.tx.init, out_shardings=opt_sh)(params)
            from jax.sharding import NamedSharding, PartitionSpec

            return TrainState(
                # everything above is already placed by out_shardings —
                # only the fresh step scalar needs an explicit placement
                step=jax.device_put(
                    jnp.zeros((), jnp.int32),
                    NamedSharding(self.mesh, PartitionSpec())),
                params=params,
                batch_stats=batch_stats,
                opt_state=opt_state,
            )
        else:
            if self.mesh is not None:
                with self.mesh:
                    variables = jax.jit(self.model.init)(rng, *args)
            else:
                variables = jax.jit(self.model.init)(rng, *args)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", FrozenDict())
            opt_state = self.tx.init(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        if self.mesh is not None:
            state = self._place_state(state)
        return state

    def _place_state(self, state: TrainState) -> TrainState:
        """Place state on the mesh: replicated, unless the model declares a
        ``state_sharding`` hook (e.g. ``parallel.pipeline.PipelinedModel``
        shards per-layer parameter stacks over the pp axis so each stage
        stores only its layers + optimizer moments)."""
        placer = getattr(self.model, "state_sharding", None)
        if placer is not None:
            return jax.device_put(state, placer(state))
        from ..parallel.mesh import replicate
        return jax.device_put(state, replicate(self.mesh))

    def num_params(self, state: TrainState) -> int:
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(state.params))

    def maybe_restore(self, state: TrainState, checkpointer,
                      which: str = "last") -> TrainState:
        """Resume from a checkpoint if one exists (true mid-training resume —
        the reference can only load weights for eval, exp_darcy.py:147)."""
        # Resume intent: re-arm the best-val watermark so the first
        # post-restart eval cannot overwrite a better pre-restart `best`
        # (fresh runs into the same directory start at inf instead).
        if hasattr(checkpointer, "rearm_best"):
            checkpointer.rearm_best()
        # ABSTRACT template: materializing the live state to numpy would
        # gather every leaf to this host — with --multihost --pp the
        # stage-sharded layer stacks are not fully addressable per
        # process and the gather crashes before restore is even
        # attempted. Each ShapeDtypeStruct CARRIES the live leaf's
        # sharding (the current topology's): orbax then restores straight
        # into this run's placement even when the checkpoint was written
        # under a different device topology (shardingless abstract
        # templates make orbax read the saved topology from the file and
        # fail when those devices are absent — e.g. resuming a TPU
        # checkpoint on CPU, or a different chip count).
        template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                jnp.shape(x), jnp.result_type(x),
                sharding=getattr(x, "sharding", None)), state)
        try:
            restored = checkpointer.restore(template, which)
        except Exception as e:
            # Diagnose before blaming: only claim a pp/non-pp layout
            # mismatch when the checkpoint's actual tree confirms it —
            # corrupt/partial checkpoints, orbax drift, and I/O failures
            # must surface as themselves.
            is_pp = hasattr(self.model, "from_pipeline_variables")
            raw_fn = getattr(checkpointer, "restore_raw", None)
            raw = None
            if raw_fn is not None:
                try:
                    raw = raw_fn(which)
                except Exception:
                    pass
            if raw is None or (
                    "layers" in (raw.get("params") or {})) == is_pp:
                raise  # not a layout mismatch — original error stands
            raise RuntimeError(
                "checkpoint tree does not match this run's state layout: "
                "a checkpoint written "
                + ("without --pp cannot resume a --pp run"
                   if is_pp else
                   "by a --pp run cannot resume an unpipelined run")
                + " (the optimizer-state layouts differ). Resume with the "
                "original parallel flags, or evaluate/export via car_eval, "
                "which auto-converts pipeline-layout checkpoints."
            ) from e
        if restored is None:
            self._resume_epoch = None
            return state
        # Stored epoch (validated against the restored step — a crash-torn
        # sidecar is ignored); fit() resumes the epoch count from it
        # instead of deriving step//steps_per_epoch, which drifts when
        # drop_last=False trailing batches make steps-per-epoch uneven.
        epoch_of = getattr(checkpointer, "epoch_of", None)
        self._resume_epoch = (
            epoch_of(which, int(restored.step)) if epoch_of else None)
        print(f"[Trainer] resumed from step {int(restored.step)}"
              + (f" (epoch {self._resume_epoch})"
                 if self._resume_epoch is not None else ""))
        if self.mesh is not None:
            restored = self._place_state(restored)
        return restored

    # -- steps ------------------------------------------------------------
    def _apply(self, params, batch_stats, batch, train, rng):
        variables = {"params": params}
        has_bn = bool(jax.tree_util.tree_leaves(batch_stats))
        if has_bn:
            variables["batch_stats"] = batch_stats
        kwargs = dict(train=train)
        if train:
            kwargs["rngs"] = {"dropout": rng}
            if has_bn:
                out, updates = self.model.apply(
                    variables, *self.batch_args(batch),
                    mutable=["batch_stats"], **kwargs,
                )
                return out, updates["batch_stats"]
            out = self.model.apply(variables, *self.batch_args(batch), **kwargs)
            return out, batch_stats
        out = self.model.apply(variables, *self.batch_args(batch), **kwargs)
        return out, batch_stats

    def _accum(self) -> int:
        accum = getattr(self.cfg, "accum_steps", 1)
        accum = 1 if accum is None else int(accum)
        if accum < 1:
            raise ValueError(f"accum_steps must be >= 1, got {accum}")
        return accum

    def _step(self, state: TrainState, batch, rng):
        accum = self._accum()
        if accum > 1:
            l, aux, new_bs, grads = self._accum_grads(state, batch, rng,
                                                      accum)
        else:
            def loss(params):
                out, new_bs = self._apply(
                    params, state.batch_stats, batch, True, rng)
                l, aux = self.loss_fn(out, batch)
                return l, (aux, new_bs)

            (l, (aux, new_bs)), grads = jax.value_and_grad(
                loss, has_aux=True)(state.params)

        # Shared update tail for both paths: gradient clipping
        # (max_grad_norm, inside the optax chain) therefore applies to the
        # accumulated gradient, matching the reference's full-batch clip
        # (train.py:104-107).
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params,
            batch_stats=new_bs, opt_state=opt_state,
        )
        # grad_norm: the whole-step observability analogue of the
        # reference's wandb.watch gradient histograms (train.py:208) —
        # cheap inside the fused step (one extra reduction).
        metrics = {"loss": l, "grad_norm": optax.global_norm(grads), **aux}
        return new_state, metrics

    def _accum_grads(self, state: TrainState, batch, rng, accum: int):
        """Mean loss/aux, chained BatchNorm stats, and mean gradients over
        ``accum`` microbatches (gradient accumulation). A ``lax.scan`` runs
        the fwd+bwd per microbatch, so peak activation memory follows
        ``batch_size/accum`` while the caller sees the mean gradient of
        the full batch — for a mean-reduced loss this is exactly the
        full-batch gradient, so ``accum_steps=A`` at batch B matches a
        plain step at batch B (batch-coupled forward ops excepted:
        train-mode BatchNorm normalizes within each microbatch — stats
        chain through the scan in order — and the HAET models' batch-
        global pseudo-position min-max (physics_attention.py) is computed
        per microbatch, a monotone rescale that leaves ball grouping
        identical and perturbs outputs by a variant-dependent epsilon;
        both take sequential-small-batch semantics)."""

        def split(x):
            if x.shape[0] % accum:
                raise ValueError(
                    f"accum_steps={accum} must divide the batch dimension "
                    f"({x.shape[0]})")
            return x.reshape(accum, x.shape[0] // accum, *x.shape[1:])

        micro = jax.tree_util.tree_map(split, batch)
        rngs = jax.random.split(rng, accum)
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def body(carry, xs):
            bs, gacc = carry
            mb, r = xs

            def loss(params):
                out, new_bs = self._apply(params, bs, mb, True, r)
                l, aux = self.loss_fn(out, mb)
                return l, (aux, new_bs)

            (l, (aux, new_bs)), g = jax.value_and_grad(
                loss, has_aux=True)(state.params)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, g)
            return (new_bs, gacc), (l, aux)

        (new_bs, gacc), (ls, auxs) = jax.lax.scan(
            body, (state.batch_stats, zero_grads), (micro, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / accum, gacc)
        aux_mean = jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), auxs)
        return jnp.mean(ls), aux_mean, new_bs, grads

    def _leaf_grad_norms(self, state: TrainState, batch, rng):
        # Honor accum_steps: the probe must not single-shot a batch the
        # training step only ever sees microbatched — on a config where
        # accumulation exists because the full-batch fwd+bwd OOMs, a
        # full-batch probe would kill the run mid-training.
        accum = self._accum()
        if accum > 1:
            _, _, _, grads = self._accum_grads(state, batch, rng, accum)
        else:
            def loss(params):
                out, _ = self._apply(
                    params, state.batch_stats, batch, True, rng)
                l, _ = self.loss_fn(out, batch)
                return l

            grads = jax.grad(loss)(state.params)
        return jax.tree_util.tree_map(
            lambda g: jnp.sqrt(jnp.sum(jnp.square(g))), grads
        )

    def grad_leaf_norms(self, state, batch, rng) -> dict:
        """Per-parameter-leaf gradient L2 norms as a flat ``{path: norm}``
        dict — the scalar summary of the reference's ``wandb.watch``
        gradient histograms (train.py:192-208), usable every K epochs
        without per-step cost."""
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            batch = shard_batch(batch, self.mesh)
            with self.mesh:
                norms = self._leaf_norms_jit(state, batch, rng)
        else:
            norms = self._leaf_norms_jit(state, batch, rng)
        flat = jax.tree_util.tree_flatten_with_path(norms)[0]
        return {
            "/".join(str(getattr(k, "key", k)) for k in path): float(v)
            for path, v in flat
        }

    def _eval(self, state: TrainState, batch):
        out, _ = self._apply(state.params, state.batch_stats, batch, False, None)
        if self.eval_fn is not None:
            return self.eval_fn(out, batch)
        l, aux = self.loss_fn(out, batch)
        return {"loss": l, **aux}

    def train_step(self, state, batch, rng):
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            batch = shard_batch(batch, self.mesh)
            # Trace/compile under the mesh context so PartitionSpec-based
            # sharding constraints inside the model (head tensor
            # parallelism, models/physics_attention.py) resolve.
            with self.mesh:
                return self._train_step(state, batch, rng)
        return self._train_step(state, batch, rng)

    def eval_step(self, state, batch):
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            batch = shard_batch(batch, self.mesh)
            with self.mesh:
                return self._eval_step(state, batch)
        return self._eval_step(state, batch)

    def predict(self, state, batch):
        """Jitted forward pass on a batch (eval mode), mesh-aware: enters
        the mesh context so models with sharding constraints (head TP)
        trace correctly, and shards the batch over dp. One compiled
        program per batch shape (callers bucket-pad, so recompiles stay
        bounded) — eager apply would pay per-op dispatch latency, ~500x
        slower through a hosted runtime."""
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            batch = shard_batch(batch, self.mesh)
            with self.mesh:
                return self._predict_jit(state.params, state.batch_stats,
                                         batch)
        return self._predict_jit(state.params, state.batch_stats, batch)

    def _scan_steps(self, state, batches, rng):
        def body(carry, batch):
            st, r = carry
            r, sub = jax.random.split(r)
            st, metrics = self._step(st, batch, sub)
            return (st, r), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), batches)
        return state, metrics

    def train_steps(self, state, batches, rng):
        """Run several optimizer steps in ONE device program.

        ``batches``: list of batch pytrees (stacked internally along a new
        leading axis and consumed by ``lax.scan``). The per-step dropout rng
        is split from ``rng`` inside the program. Returns
        ``(state, metrics)`` with each metric stacked ``[K, ...]``.

        Why: on hosted/tunneled runtimes each dispatch pays tunnel latency
        and the time-shared chip's scheduling; batching K steps into one
        program measured up to ~2x faster per step in slow regimes
        (docs/benchmarks.md "Timing methodology, revisited"). With a mesh,
        the stacked batches are placed ``P(None, "dp")`` (scan axis
        replicated, batch axis over dp) and the scan traces under the mesh
        context — one device program per K steps on multi-chip too.
        """
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            s = NamedSharding(self.mesh, PartitionSpec(None, "dp"))
            stacked = jax.tree_util.tree_map(
                lambda *xs: jax.device_put(np.stack(xs), s), *batches)
            with self.mesh:
                return self._train_scan(state, stacked, rng)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *batches)
        return self._train_scan(state, stacked, rng)

    # -- loops ------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        train_batches: Callable[[], Iterable],
        eval_batches: Optional[Callable[[], Iterable]] = None,
        *,
        epochs: Optional[int] = None,
        rng=None,
        logger: Optional[MetricsLogger] = None,
        checkpointer: Optional["Checkpointer"] = None,
        eval_every: int = 1,
        stop_event: Optional["threading.Event"] = None,
    ) -> TrainState:
        """``stop_event``: optional :class:`threading.Event`; when set,
        the loop finishes the in-flight step, saves ``last`` (the last
        COMPLETED epoch's number — resume re-runs the interrupted epoch
        with the newer params; step-indexed schedules continue exactly)
        and returns the current state. Checked once per batch, so the
        stop granularity is one step (``train_steps=K`` scans stop at K).

        Without an explicit event, ``TrainConfig(preempt_save=True)``
        (the default) arms the same mechanism on SIGTERM — the signal
        SLURM, kubernetes and TPU-VM maintenance events send before the
        hard kill: save first, then re-deliver the signal so the process
        still exits through the normal path (typically code 143). At
        most one batch of progress is lost to a preemption. The handler
        is only installed in SINGLE-process runs: per-process signals
        land at different batch indices, and a process breaking into the
        (collective) orbax save while its peers still psum the next step
        deadlocks both — multi-host preemption needs an
        orchestrator-level barrier, so there fit() leaves SIGTERM alone
        and relies on the normal per-epoch ``last`` saves. The same
        caveat applies to a caller-provided ``stop_event`` under
        multi-host: set it at a synchronized point on every process or
        not at all."""
        import signal
        import threading

        did_install = False
        prev_handler = None
        _ev = None
        if stop_event is None and getattr(self.cfg, "preempt_save", True):
            if jax.process_count() > 1:
                print("[Trainer] preempt_save: multi-process run — "
                      "leaving SIGTERM alone (per-process stop points "
                      "would desynchronize the collectives); resume "
                      "from the per-epoch 'last' saves instead.",
                      flush=True)
            else:
                _ev = threading.Event()

                def _on_sigterm(signum, frame):
                    _ev.set()
                    print("[Trainer] SIGTERM: finishing the in-flight "
                          "step, saving 'last', then exiting...",
                          flush=True)

                try:
                    prev_handler = signal.signal(signal.SIGTERM,
                                                 _on_sigterm)
                    did_install = True
                    stop_event = _ev
                except ValueError:
                    _ev = None  # not the main thread: run plain
        self._preempted = False
        try:
            return self._fit_loop(
                state, train_batches, eval_batches, epochs=epochs,
                rng=rng, logger=logger, checkpointer=checkpointer,
                eval_every=eval_every, stop_event=stop_event)
        finally:
            if did_install:
                # restore on EVERY exit (incl. exceptions) — a leaked
                # handler would set a dead event and swallow SIGTERM.
                # prev_handler is None when the prior handler was
                # installed from C (signal-module contract); None is not
                # a valid argument to signal.signal, so fall back to the
                # default disposition.
                signal.signal(signal.SIGTERM,
                              prev_handler if prev_handler is not None
                              else signal.SIG_DFL)
                if _ev is not None and _ev.is_set():
                    # save-then-die: re-deliver so the process exits
                    # through the normal signal path (typically 143).
                    # Keyed on the EVENT, not on whether the loop broke:
                    # a signal landing during the final epoch's eval/
                    # checkpoint tail exits the loop normally (that
                    # epoch's 'last' is already saved) but must not be
                    # swallowed.
                    os.kill(os.getpid(), signal.SIGTERM)

    def _fit_loop(
        self,
        state: TrainState,
        train_batches,
        eval_batches,
        *,
        epochs,
        rng,
        logger,
        checkpointer,
        eval_every,
        stop_event,
    ) -> TrainState:
        epochs = epochs if epochs is not None else self.cfg.epochs
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        logger = logger or MetricsLogger()
        stopper = (
            EarlyStopping(self.cfg.early_stop_patience,
                          self.cfg.early_stop_min_delta)
            if self.cfg.early_stop_patience else None
        )
        resume_epoch = getattr(self, "_resume_epoch", None)
        if int(state.step) == 0:
            start_epoch = 0
        elif resume_epoch is not None:
            # stored with the checkpoint (save_last records the epoch it
            # completed); exact even with drop_last=False uneven epochs
            start_epoch = resume_epoch + 1
        else:
            # legacy fallback (pre-epoch-sidecar checkpoints): derive from
            # the nominal steps-per-epoch
            start_epoch = int(state.step) // max(
                1, self.total_steps // max(epochs, 1)
            )
        from ..utils.profiling import StepTimer, device_memory_mb, host_rss_mb

        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            timer = StepTimer()
            train_metrics = []
            watch_batch = None
            interrupted = False
            for i, batch in enumerate(train_batches()):
                if stop_event is not None and stop_event.is_set():
                    # preemption/stop: the in-flight step already
                    # finished; save below and leave. The flag (not a
                    # re-read of the event) distinguishes a real break
                    # from the event being set during the epoch's LAST
                    # batch — there the loop exhausts normally and the
                    # fully-completed epoch must run its eval/checkpoint
                    # tail (the next epoch's first check stops the run).
                    interrupted = True
                    break
                # Pin the probe batch only when watching is on — otherwise
                # a full (possibly 1M+-point) batch would stay alive the
                # whole epoch for nothing.
                if i == 0 and self.watch_every:
                    watch_batch = batch
                rng, step_rng = jax.random.split(rng)
                with timer.step():
                    state, m = self.train_step(state, batch, step_rng)
                train_metrics.append(m)
                if self.batch_log_every and i % self.batch_log_every == 0:
                    # Per-batch observability with the reference's metric
                    # names (train.py:115-125). forward/backward are fused
                    # into ONE device program here, so batch_time is the
                    # whole step; there is no separate fwd/bwd wall split.
                    step_no = int(state.step)
                    logger.log({
                        "batch/total_loss": float(m["loss"]),
                        # state.step was already incremented by the jitted
                        # step; the LR the optimizer APPLIED is sched(step-1)
                        # (optax counts previous updates — logging sched(step)
                        # would report the NEXT step's value, visibly wrong
                        # on OneCycle's steep warmup vs torch get_last_lr())
                        "batch/learning_rate":
                            float(self.sched(max(0, step_no - 1))),
                        "batch/memory_used_mb": host_rss_mb(),
                        "batch/batch_time": timer.times[-1],
                        "batch/eta_seconds":
                            timer.times[-1] * max(0, self.total_steps - step_no),
                    })
            if interrupted:
                # Stop requested (SIGTERM preemption or a programmatic
                # stop_event). Save 'last' under the last COMPLETED
                # epoch's number: resume re-runs this interrupted epoch
                # from its start with the newer (mid-epoch) params —
                # step-indexed schedules continue exactly, and at most
                # one batch of progress is lost.
                self._preempted = True
                if checkpointer is not None:
                    checkpointer.save_last(state, epoch - 1)
                    checkpointer.wait()
                logger.log({"epoch": epoch, "preempted": True,
                            "step": int(state.step)})
                self._resume_epoch = epoch - 1
                return state
            if not train_metrics and epoch == start_epoch:
                print("[Trainer] WARNING: train_batches yielded no batches "
                      "(batch size larger than the dataset?)")
            tm = {
                f"train/{k}": float(np.mean([float(m[k]) for m in train_metrics]))
                for k in (train_metrics[0] if train_metrics else {})
            }
            tm.update(timer.metrics("train/"))
            tm["train/learning_rate"] = float(
                self.sched(max(0, int(state.step) - 1)))  # LR applied last
            tm["train/memory_used_mb"] = host_rss_mb()
            dev_mb = device_memory_mb()
            if dev_mb is not None:
                tm["train/device_memory_mb"] = dev_mb
            rec = {"epoch": epoch, **tm,
                   "epoch/time_seconds": time.time() - t0}
            train_loss = tm.get("train/loss")
            if (
                getattr(self.cfg, "stop_on_nonfinite", True)
                and train_loss is not None
                and not np.isfinite(train_loss)
            ):
                # A diverged step leaves NaN/Inf in the params — every
                # later step stays NaN, so continuing only burns chip
                # time. Fail loudly; keep the state for forensics. (The
                # check reads the per-epoch mean the loop already fetched
                # — no extra device sync.)
                logger.log({**rec, "non_finite_loss": True})
                if checkpointer is not None:
                    # forensic save under a DISTINCT name — the diverged
                    # NaN state must not clobber 'last', the run's only
                    # resume point when no periodic/best saves exist
                    checkpointer.save_diverged(state, epoch)
                    checkpointer.wait()
                raise FloatingPointError(
                    f"non-finite training loss ({train_loss}) at epoch "
                    f"{epoch}; state saved to 'diverged' for inspection "
                    "('last' still holds the previous epoch). "
                    "Common causes: lr too high, bad input normalization, "
                    "a corrupt batch. Set TrainConfig("
                    "stop_on_nonfinite=False) to keep running anyway.")
            if (
                self.watch_every
                and watch_batch is not None
                and (epoch + 1) % self.watch_every == 0
            ):
                rng, watch_rng = jax.random.split(rng)
                rec.update({
                    f"gradients/{k}": v
                    for k, v in self.grad_leaf_norms(
                        state, watch_batch, watch_rng).items()
                })

            if eval_batches is not None and (epoch + 1) % eval_every == 0:
                ev = [self.eval_step(state, b) for b in eval_batches()]
                em = {
                    f"val/{k}": float(np.mean([float(m[k]) for m in ev]))
                    for k in (ev[0] if ev else {})
                }
                rec.update(em)
                val_loss = em.get("val/loss", None)
                if checkpointer is not None and val_loss is not None:
                    checkpointer.save_best(state, val_loss, epoch)
                if stopper is not None and val_loss is not None:
                    if stopper.update(val_loss):
                        logger.log({**rec, "early_stop": True})
                        # the final epoch's state must still reach 'last'
                        # or resume would silently lose it
                        if checkpointer is not None:
                            checkpointer.save_last(state, epoch)
                        break
            logger.log(rec)
            if checkpointer is not None:
                checkpointer.save_last(state, epoch)
                if (
                    self.cfg.checkpoint_every
                    and (epoch + 1) % self.cfg.checkpoint_every == 0
                ):
                    # Periodic policy (reference PDE drivers save every 100
                    # epochs, exp_darcy.py:259-263); pruned to `keep`.
                    checkpointer.save_periodic(state, epoch)
        # A later fit() on this Trainer continues the numbering from the
        # last epoch THIS loop completed — without this, the stale
        # restore-time value would restart a continuation run at the old
        # resume point (re-running epochs and corrupting the sidecar).
        if epochs > start_epoch:
            self._resume_epoch = epoch
        if checkpointer is not None:
            checkpointer.wait()
        return state
