"""GPipe-style pipeline parallelism over the Transolver block stack.

The reference framework is single-process, single-GPU (SURVEY.md §2.7); this
module adds the remaining classic parallel axis — **pipeline (pp)** — the
TPU-native way. The HAET models are ``embedding -> L structurally identical
pre-LN blocks -> LN+Linear head`` and after the embedding the ONLY
inter-block traffic is the activation ``fx [B, N, C]``
(``models/haet.py:_HAETBase.__call__`` — each block takes and returns just
``fx``), which makes the stack a textbook pipeline:

* the ``L`` blocks are split into ``S = mesh.shape['pp']`` contiguous
  stages of ``L/S`` blocks each, their parameters **stacked on a leading
  layer axis and sharded over pp** (each chip stores only its stage's
  parameters and optimizer state — the actual memory point of pp);
* the batch is split into ``M`` microbatches that stream stage-to-stage
  with ``lax.ppermute`` (one ICI neighbour hop per tick), overlapping
  stage compute exactly like GPipe (Huang et al., arXiv:1811.06965);
* ``jax.grad`` differentiates straight through the tick loop — ppermute's
  transpose is the reverse permute, so the backward pass is the standard
  reverse-order pipeline with no extra code;
* per-block ``jax.checkpoint`` (``remat=True``) stashes only the
  microbatch boundaries, GPipe's activation-memory recipe.

Composition / scope (validated at construction):

* composes with **dp**: pass ``dp_axis`` and a ``(dp, pp)`` mesh — the
  batch dim of every microbatch is sharded over dp while stages run over
  pp. Layout note: microbatches are *strided* subsets of the batch
  (``[B] -> [B/M, M]`` keeps a dp-sharded batch axis local, no resharding).
* composes with **head-TP**: wrap a model built with
  ``shard_axes=("dp", "tp")`` (or ``(None, "tp")``) and use a
  ``(dp, pp, tp)`` mesh (``make_pp_mesh(n_tp=...)``) — the pipeline body
  is manual over (pp, dp) only (``jax.shard_map`` ``axis_names``), so the
  model's head-axis sharding constraints stay in XLA-automatic mode inside
  each stage and the partitioner splits the per-head slice->Erwin->deslice
  work over tp with the same collectives as the unpipelined TP path
  (numerics parity pinned in ``tests/test_pipeline.py``). The batch
  component of ``shard_axes`` is dropped inside the body (the pipeline
  shards the batch itself).
* the fused Pallas kernels are their own ``shard_map`` wrapping and cannot
  nest inside the pipeline body — ``use_pallas`` raises.
* train-mode BatchNorm takes sequential-microbatch semantics (stats chain
  across a stage's microbatches in order) — the same documented semantics
  as gradient accumulation (``train/trainer.py:_accum_grads``); with
  ``num_microbatches=1`` and dp=1 training matches the unpipelined model
  exactly for dropout=0 configs (with dropout>0 the masks are derived from
  ``fold_in(key, (dp_shard, global_layer, microbatch))`` instead of flax's
  module-path folding, so they are valid but not bitwise the plain
  model's). Under a dp axis, batch statistics are additionally
  per-dp-shard (the shard_map body sees only its local microbatch slice;
  the plain dp path lets XLA compute global-batch statistics) and the
  running stats are pmean-averaged across dp on exit.
* batches whose size doesn't divide microbatches x dp (e.g. the trailing
  partial batch of an epoch) are transparently padded with wraparound
  copies and the pad rows sliced off the output.
* the reference's BATCH-GLOBAL pseudo-position min-max
  (``physics_attention.py``: ``feat.min/max`` over the flat ``[B*H*G]``
  token batch, mirroring ``StructuredMesh2D.py:228-234``) is computed
  per (microbatch x dp shard) inside the pipeline. The rescale is
  monotone, so the median-split ball grouping is IDENTICAL; only the
  ``pe_proj`` / distance-bias inputs shift, which perturbs outputs by a
  variant-dependent epsilon at M>1 or dp>1 (measured: ~2e-5 irregular,
  ~7e-3 structured-3D on random data; exact at M=1, dp=1). Same class
  of approximation as microbatched BatchNorm.
* bubble fraction is the usual ``(S-1)/(M+S-1)``: for HAET-scale models
  (1.76M params) pp is not a speed feature — it is the capacity axis for
  scaled-up configs whose parameters/optimizer state exceed one chip.

The wrapper exposes the flax surface :class:`haet_tpu.train.Trainer`
consumes (``init`` / ``apply(variables, x, fx, T, train=, mutable=,
rngs=)``), so ``Trainer(model=PipelinedModel(...), mesh=...)`` trains
pipelined with no trainer changes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax.core import unfreeze
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.haet import TransolverErwinBlock

# Parameters of the last block that belong to the output head (the
# ``last_layer=True`` extras: LN + Linear(out_dim), models/haet.py:100-105),
# split out so all L block subtrees share one tree structure and can stack.
_HEAD_KEYS = ("ln_3", "mlp2")


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _unstack(tree, n):
    return [jax.tree_util.tree_map(lambda a: a[i], tree) for i in range(n)]


def split_variables(variables, n_layers: int) -> dict:
    """Standard model variables -> pipeline layout.

    ``{'params': {blocks_i, preprocess, ...}}`` becomes
    ``{'params': {'pre': ..., 'layers': <stacked [L, ...]>, 'head': ...}}``
    (and ``batch_stats`` likewise under ``'layers'``). The stacked layout is
    what lets the pp mesh axis shard parameters by stage.
    """
    variables = unfreeze(variables)
    params = dict(variables["params"])
    blocks = [dict(params.pop(f"blocks_{i}")) for i in range(n_layers)]
    head = {k: blocks[-1].pop(k) for k in _HEAD_KEYS}
    out = {"params": {"pre": params, "layers": _stack(blocks), "head": head}}
    if "batch_stats" in variables and jax.tree_util.tree_leaves(
            variables["batch_stats"]):
        bs = dict(variables["batch_stats"])
        bls = [bs.pop(f"blocks_{i}") for i in range(n_layers)]
        if jax.tree_util.tree_leaves(bs):
            raise ValueError(
                f"unexpected non-block batch_stats keys: {list(bs)}")
        out["batch_stats"] = {"layers": _stack(bls)}
    return out


def merge_raw_variables(raw) -> dict:
    """Convert a RAW restored checkpoint tree in the stacked pipeline
    layout (``params = {pre, layers, head}``; ``Checkpointer.restore_raw``
    output) to standard model variables, inferring ``n_layers`` from the
    stacked leading axis. One helper for everything that reads --pp
    checkpoints unpipelined (``benchmarks/car_eval.py``,
    ``haet_tpu.serve_http``) so the layout conversion cannot drift between
    eval and serving."""
    params = raw.get("params", raw)
    if "layers" not in (params or {}):
        raise ValueError(
            "not a stacked pipeline checkpoint: params has no 'layers' "
            f"subtree (keys: {sorted(params or {})})")
    n_layers = int(jax.tree_util.tree_leaves(params["layers"])[0].shape[0])
    merged = merge_variables(
        {"params": params, "batch_stats": raw.get("batch_stats") or {}},
        n_layers)
    merged.setdefault("batch_stats", {})
    return merged


def merge_variables(pvars, n_layers: int) -> dict:
    """Pipeline layout -> standard model variables (checkpoint interchange,
    e.g. to evaluate an unpipelined copy or export via haet_tpu.export)."""
    pvars = unfreeze(pvars)
    params = dict(pvars["params"]["pre"])
    blocks = _unstack(pvars["params"]["layers"], n_layers)
    blocks[-1] = {**blocks[-1], **pvars["params"]["head"]}
    for i, b in enumerate(blocks):
        params[f"blocks_{i}"] = b
    out = {"params": params}
    bs = pvars.get("batch_stats") or {}
    if jax.tree_util.tree_leaves(bs):  # BN-free models store {} — skip
        bls = _unstack(bs["layers"], n_layers)
        out["batch_stats"] = {
            f"blocks_{i}": b for i, b in enumerate(bls)}
    return out


class PipelinedModel:
    """Pipeline-parallel execution wrapper for a HAET model.

    Args:
        model: an unbound ``_HAETBase`` subclass instance (2D/3D/irregular).
        mesh: a ``jax.sharding.Mesh`` containing ``pp_axis`` (and
            optionally ``dp_axis``).
        num_microbatches: microbatches per step (batches that don't divide
            microbatches x dp are padded transparently); default = number
            of stages (fills the pipeline).
        pp_axis / dp_axis: mesh axis names.
        remat: rematerialize each block in the backward pass, keeping only
            microbatch boundary activations (GPipe's memory recipe).
    """

    def __init__(self, model, mesh, *, num_microbatches: Optional[int] = None,
                 pp_axis: str = "pp", dp_axis: Optional[str] = None,
                 remat: bool = True):
        if pp_axis not in mesh.shape:
            raise ValueError(f"mesh has no {pp_axis!r} axis: {mesh.shape}")
        if dp_axis is not None and dp_axis not in mesh.shape:
            raise ValueError(f"mesh has no {dp_axis!r} axis: {mesh.shape}")
        if getattr(model, "use_pallas", False) or getattr(
                model, "use_pallas_erwin", False):
            raise ValueError(
                "PipelinedModel requires use_pallas=False / "
                "use_pallas_erwin=False: the fused kernels' own shard_map "
                "wrapping cannot nest inside the pipeline body.")
        # head-TP composition: the pipeline body is MANUAL over (pp, dp)
        # but leaves every other mesh axis AUTOMATIC (jax.shard_map
        # axis_names), so the model's with_sharding_constraint calls over
        # the tp axis resolve inside the stage body and XLA partitions the
        # per-head work + inserts the head-merge all-gather exactly as in
        # the unpipelined TP path. The batch component of shard_axes is
        # dropped: the pipeline shards the batch itself (dp is manual
        # here; a dp constraint inside the body would name a manual axis).
        self.tp_axis = None
        sa = getattr(model, "shard_axes", None)
        if sa is not None:
            b_ax, h_ax = sa
            if h_ax is not None:
                if h_ax not in mesh.shape:
                    raise ValueError(
                        f"model shard_axes head axis {h_ax!r} is not in "
                        f"the mesh: {dict(mesh.shape)}")
                if h_ax in (pp_axis, dp_axis):
                    raise ValueError(
                        f"head-TP axis {h_ax!r} collides with the "
                        "pipeline's pp/dp axes; use a distinct mesh axis "
                        "(make_pp_mesh(n_tp=...))")
                n_tp = int(mesh.shape[h_ax])
                if n_tp > 1 and int(model.n_head) % n_tp:
                    raise ValueError(
                        f"n_head ({model.n_head}) must be divisible by "
                        f"the tp mesh size ({n_tp})")
                self.tp_axis = h_ax
            if b_ax is not None and b_ax != dp_axis:
                raise ValueError(
                    f"model shard_axes batch axis {b_ax!r} must be the "
                    f"pipeline's dp_axis ({dp_axis!r}) or None — the "
                    "pipeline shards the batch itself")
        self.model = model
        self.mesh = mesh
        self.pp_axis = pp_axis
        self.dp_axis = dp_axis
        self.n_stages = int(mesh.shape[pp_axis])
        self.n_layers = int(model.n_layers)
        if self.n_layers % self.n_stages:
            raise ValueError(
                f"n_layers ({self.n_layers}) must be divisible by the "
                f"pipeline stage count ({self.n_stages})")
        self.num_microbatches = int(num_microbatches or self.n_stages)
        if self.num_microbatches < 1:
            raise ValueError("num_microbatches must be >= 1")
        self.remat = remat
        bk = model.block_kwargs()
        if self.tp_axis is not None:
            # stage blocks constrain ONLY the head axis (batch handled by
            # the pipeline's own in_specs; see composition note above)
            bk["attn_kwargs"] = {**bk.get("attn_kwargs", {}),
                                 "shard_axes": (None, self.tp_axis)}
        elif sa is not None:
            bk["attn_kwargs"] = {**bk.get("attn_kwargs", {}),
                                 "shard_axes": None}
        self.block = TransolverErwinBlock(last_layer=False, **bk)

    # -- variables ---------------------------------------------------------
    def init(self, rng, *args, **kwargs):
        return split_variables(
            self.model.init(rng, *args, **kwargs), self.n_layers)

    def to_pipeline_variables(self, variables):
        return split_variables(variables, self.n_layers)

    def from_pipeline_variables(self, pvars):
        return merge_variables(pvars, self.n_layers)

    def state_sharding(self, tree):
        """Sharding tree for a state pytree: every stacked per-layer leaf
        (path contains ``'layers'`` with the leading [L] axis) is sharded
        over pp — each stage's chips hold ONLY their layers' parameters and
        optimizer moments — everything else replicated. Consumed by
        ``Trainer.init_state`` / ``maybe_restore`` via the ``state_sharding``
        hook."""
        repl = NamedSharding(self.mesh, P())
        staged = NamedSharding(self.mesh, P(self.pp_axis))

        def pick(path, leaf):
            in_layers = any(
                getattr(k, "key", getattr(k, "name", None)) == "layers"
                for k in path)
            if (in_layers and hasattr(leaf, "ndim") and leaf.ndim >= 1
                    and leaf.shape[0] == self.n_layers):
                return staged
            return repl

        return jax.tree_util.tree_map_with_path(pick, tree)

    # -- forward -----------------------------------------------------------
    def apply(self, variables, x, fx=None, T=None, *, train: bool = False,
              mutable=None, rngs=None):
        m = self.model
        p = variables["params"]
        bs_layers = variables.get("batch_stats", {}).get("layers")
        has_bn = bs_layers is not None and bool(
            jax.tree_util.tree_leaves(bs_layers))

        # ---- embedding (tiny; runs outside the pipeline, dp-sharded) ----
        # _HAETBase.apply_pre re-states __call__'s pre-block section
        # against the 'pre' param subtree (kept in lockstep there);
        # test_pipeline.py pins exact parity with model.apply.
        h = m.apply_pre(p["pre"], x, fx, T)

        # ---- pipelined block stack ----
        dropout_key = None
        if train and float(m.dropout) > 0.0:
            if not rngs or "dropout" not in rngs:
                raise ValueError(
                    "train=True with dropout > 0 needs rngs={'dropout': key}")
            dropout_key = rngs["dropout"]
        h, new_bs_layers = self._pipeline(
            p["layers"], bs_layers, h, train, dropout_key, has_bn)

        # ---- head (last block's LN + Linear, models/haet.py) ----
        y = m.apply_head(p["head"], h)

        if mutable:
            upd = {"batch_stats": {"layers": new_bs_layers}} if has_bn \
                else {"batch_stats": {}}
            return y, upd
        return y

    __call__ = apply

    # -- the pipeline itself -------------------------------------------------
    def _pipeline(self, p_layers, bs_layers, h, train, dropout_key, has_bn):
        S, M = self.n_stages, self.num_microbatches
        L_loc = self.n_layers // S
        pp = self.pp_axis
        B, N, C = h.shape
        n_dp = int(self.mesh.shape[self.dp_axis]) if self.dp_axis else 1
        # Trailing partial batches (batch_iter(drop_last=False) yields them)
        # are transparently padded with wraparound copies up to the next
        # multiple of microbatches x dp and sliced off after; the loss never
        # sees pad rows so their cotangent is zero (train-mode BN batch
        # statistics on a padded batch do include the duplicate rows — the
        # same order of approximation as microbatch BN itself).
        unit = M * n_dp
        b_pad = -(-B // unit) * unit
        if b_pad != B:
            h = h[jnp.arange(b_pad) % B]

        # [B] -> [B/M, M]: microbatch m is the strided subset b*M+m, so a
        # dp sharding on the batch axis stays local through the reshape.
        micro = h.reshape(b_pad // M, M, N, C)
        micro_spec = (P(self.dp_axis, None, None, None)
                      if self.dp_axis else P(None, None, None, None))
        if self.dp_axis:
            micro = jax.lax.with_sharding_constraint(
                micro, NamedSharding(self.mesh, micro_spec))

        block, remat = self.block, self.remat
        if bs_layers is None:
            bs_layers = {}
        if dropout_key is None:
            # constant placeholder so the shard_map signature is static
            dropout_key = jnp.zeros((2,), jnp.uint32)
            use_dropout = False
        else:
            use_dropout = True

        def body(micro, p_loc, bs_loc, key):
            stage = jax.lax.axis_index(pp)
            Bl = micro.shape[0]
            if use_dropout and self.dp_axis:
                # distinct masks per dp shard (the replicated key would
                # otherwise repeat the same pattern on every shard)
                key = jax.random.fold_in(
                    key, jax.lax.axis_index(self.dp_axis))

            def run_stage(h_in, bs_loc, m_idx):
                def one_layer(h, xs):
                    p1, bs1, gl = xs
                    var = {"params": p1}
                    if has_bn:
                        var["batch_stats"] = bs1
                    rng_kw = {}
                    if use_dropout:
                        # deterministic in (global layer, microbatch) — the
                        # masks don't depend on the stage count S
                        rng_kw["rngs"] = {"dropout": jax.random.fold_in(
                            jax.random.fold_in(key, gl), m_idx)}
                    if train and has_bn:
                        out, mut = block.apply(
                            var, h, True, mutable=["batch_stats"], **rng_kw)
                        return out, mut["batch_stats"]
                    return block.apply(var, h, train, **rng_kw), bs1

                fn = jax.checkpoint(one_layer) if remat else one_layer
                gl = stage * L_loc + jnp.arange(L_loc)
                return jax.lax.scan(fn, h_in, (p_loc, bs_loc, gl))

            def tick(carry, t):
                state, bs_loc, acc = carry
                m_in = jnp.clip(t, 0, M - 1)
                x_t = jax.lax.dynamic_index_in_dim(
                    micro, m_in, axis=1, keepdims=False)
                inp = jnp.where(stage == 0, x_t, state)
                m_idx = jnp.clip(t - stage, 0, M - 1)
                out, bs_new = run_stage(inp, bs_loc, m_idx)
                if train and has_bn:
                    # keep stats only from real microbatches, not the
                    # warmup/drain bubble's garbage lanes
                    valid = ((t - stage) >= 0) & ((t - stage) < M)
                    bs_loc = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(valid, new, old),
                        bs_new, bs_loc)
                # Accumulate ONLY the valid outputs into a [M, ...] buffer
                # instead of stacking every tick as scan ys: the
                # warmup/drain bubble lanes would inflate the live output
                # stack by (1 + (S-1)/M)x on a feature whose point is
                # memory capacity. Every stage writes (same SPMD program);
                # the psum after the scan keeps only the last stage's.
                o_idx = jnp.clip(t - (S - 1), 0, M - 1)
                acc = jnp.where(
                    t >= S - 1,
                    jax.lax.dynamic_update_slice_in_dim(
                        acc, out[None], o_idx, axis=0),
                    acc)
                nxt = jax.lax.ppermute(
                    out, pp, [(i, (i + 1) % S) for i in range(S)])
                return (nxt, bs_loc, acc), None

            # VMA bookkeeping: the tick loop's carries become varying over
            # pp (ppermute/params) and, with a dp axis, over dp (microbatch
            # data) — pcast the initial values to the final varying set so
            # the scan carry types are stable from iteration 0.
            vary = (pp,) + ((self.dp_axis,) if self.dp_axis else ())
            state0 = jax.lax.pcast(
                jnp.zeros((Bl, N, C), micro.dtype), vary, to="varying")
            acc0 = jax.lax.pcast(
                jnp.zeros((M, Bl, N, C), micro.dtype), vary, to="varying")
            if train and has_bn and self.dp_axis:
                # bs_loc enters pp-varying (sharded params); add dp
                bs_loc = jax.tree_util.tree_map(
                    lambda a: jax.lax.pcast(
                        a, self.dp_axis, to="varying"), bs_loc)
            (_, bs_loc, outs), _ = jax.lax.scan(
                tick, (state0, bs_loc, acc0), jnp.arange(M + S - 1))
            if train and has_bn and self.dp_axis:
                # per-dp-shard BN stats are averaged (the framework keeps
                # ONE stats tree; mean of per-shard running stats)
                bs_loc = jax.lax.pmean(bs_loc, self.dp_axis)
            # only the last stage's accumulator holds real model outputs
            # (ticks S-1 .. S-1+M-1 for microbatches 0..M-1); broadcast
            # them pp-wide
            outs = jax.lax.psum(
                jnp.where(stage == S - 1, outs, jnp.zeros_like(outs)), pp)
            return jnp.moveaxis(outs, 0, 1), bs_loc

        # Manual ONLY over (pp, dp): any other mesh axis — the head-TP tp
        # axis in particular — stays automatic, so with_sharding_constraint
        # calls inside the block body partition the per-head work under
        # XLA's partitioner exactly like the unpipelined TP path.
        manual = {pp} | ({self.dp_axis} if self.dp_axis else set())
        out, new_bs = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(micro_spec, P(pp), P(pp), P()),
            out_specs=(micro_spec, P(pp)),
            axis_names=frozenset(manual),
        )(micro, p_layers, bs_layers, dropout_key)
        return out.reshape(b_pad, N, C)[:B], new_bs
