"""AOT export and serving artifacts (``jax.export`` / StableHLO).

Deployment path the reference does not have: its eval scripts re-import the
torch module and reload a ``state_dict`` on a machine with the full source
tree and CUDA stack (``benchmarks/02-.../eval.py``). Here a trained model is
exported ONCE to a self-contained StableHLO artifact that any later process
(or another host, or a C++ serving binary via the XLA runtime) can execute
without the model code, flax, or the config system — the TPU-native
equivalent of TorchScript/ONNX export.

Design notes:

- **Fully static shapes, including batch.** Everything under ``jit`` is
  traced with static shapes — that is what makes the MXU tiling and the
  ball-grouping permutations compile-time constants. The artifact pins the
  ENTIRE input signature: batch B, point count N (and grid H/W/D for the
  structured variants). A symbolic batch dim is deliberately not offered:
  the Erwin pooling depth follows the reference's flat leaf count ``B*N``
  (``ops/ball_groups.build_erwin_perms``, mirroring ``balltree.pyx:643``),
  so batch size is part of the PROGRAM, not just the data — B=1 vs B=4
  produce different hierarchies, exactly as in the reference. Reference
  eval serves per-sample (B=1, ``eval.py``); export one artifact per
  serving signature (``ServingBundle``).
- **No silent shape adaptation.** Padding a request's point cloud to a
  bigger exported N would silently change the rep-slice statistics
  (duplicate points contribute to the eidetic state means — see
  ``ops/ball_groups.pad_pow2``, which is only output-preserving *inside*
  the model where the mask travels with the pad). A shape mismatch
  therefore raises with the list of exported shapes; export one artifact
  per serving shape instead (``ServingBundle``).
- **Weights are arguments, not constants.** The artifact takes the
  variables pytree as its first argument, so a checkpoint refresh does not
  require re-exporting, and the .bin stays small. Pair it with the orbax
  checkpoints from :class:`haet_tpu.train.Checkpointer`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Sequence

import jax
import numpy as np

__all__ = [
    "export_apply",
    "export_rollout",
    "save_artifact",
    "save_rollout_artifact",
    "load_artifact",
    "ExportedModel",
    "ServingBundle",
]

_MANIFEST = "manifest.json"
_BLOB = "apply.stablehlo.bin"


def _apply_fn(model):
    # Positional (variables, x, fx, ...) with inference semantics: the
    # exported program is the eval path (dropout off, running BN stats).
    def fn(variables, *args):
        return model.apply(variables, *args, train=False)

    return fn


def export_apply(
    model,
    variables,
    example_args: Sequence[Any],
    *,
    platforms: Sequence[str] | None = None,
    mesh=None,
    data_axis: str = "dp",
):
    """Export ``model.apply`` (eval mode) to a ``jax.export.Exported``.

    Args:
        model: a flax module (any HAET variant).
        variables: its variables pytree (used for shapes/dtypes only).
        example_args: positional model inputs, e.g. ``(x, fx)``; arrays
            with the serving shapes (batch included — see the module
            docstring for why B is static). ``None`` entries are allowed
            (e.g. ``fx=None`` models) and are dropped before export.
        platforms: lowering platforms, e.g. ``("tpu", "cpu")``. Defaults
            to the current backend. Cross-platform export lets a CPU host
            build TPU artifacts.
        mesh: optional ``jax.sharding.Mesh`` — exports a MULTI-CHIP
            program: weights replicated, every data input (and the
            output) sharded on its leading batch axis over ``data_axis``.
            The artifact then requires the same device count at serving
            time (``ExportedModel.nr_devices``) and scales batch
            inference over the whole mesh with XLA-inserted collectives.
            The batch must divide the ``data_axis`` size. Incompatible
            with ``platforms`` (sharded lowering pins the backend).
        data_axis: mesh axis name for the batch dimension, or ``None``
            to replicate the inputs/outputs over the mesh. ``None`` is
            how a SINGLE sample spans several chips: build the model
            with head-TP sharding constraints
            (``shard_axes=(None, "tp")``, see
            ``models/physics_attention.py``) and export over a
            ``("tp",)`` mesh — the ``[B, H, N, *]`` intermediates are
            partitioned heads-over-chips by XLA SPMD while the b1
            input/output stay replicated. (The reference serves strictly
            per-sample on one GPU, ``main_evaluation.py``; dp-only
            export could never put one sample on >1 chip.)
    """
    args = tuple(a for a in example_args if a is not None)
    return _export_fn(_apply_fn(model), variables, args,
                      platforms=platforms, mesh=mesh, data_axis=data_axis)


def _rollout_fn(model, steps: int, step_width: int):
    """Autoregressive rollout as ONE compiled program: K model steps under
    ``lax.scan``, each feeding its prediction back into a sliding input
    window. The TPU-native form of the reference's per-frame python eval
    loop (``exp_ns.py`` T_OUT frames; here one dispatch, one program).

    ``fn(variables, pos, fx0) -> [B, N, steps*step_width]``: ``fx0`` is the
    ``[B, N, T_in]`` window of input frames; each step predicts
    ``[B, N, step_width]`` (the model's out_dim), which is appended to the
    window while the oldest ``step_width`` frames fall off.
    """
    import jax.numpy as jnp

    def fn(variables, pos, fx0):
        def body(fx, _):
            im = model.apply(variables, pos, fx, train=False)
            # keep the scan carry dtype-stable (a bf16 window must not be
            # promoted by an f32 head output)
            win = jnp.concatenate(
                [fx[..., step_width:], im.astype(fx.dtype)], axis=-1)
            return win, im

        _, preds = jax.lax.scan(body, fx0, None, length=steps)
        # [steps, B, N, W] -> [B, N, steps*W] (time-major frame order,
        # matching the benchmark harness' [B, N, T_OUT] target layout)
        return jnp.moveaxis(preds, 0, 2).reshape(
            preds.shape[1], preds.shape[2], steps * preds.shape[3])

    return fn


def export_rollout(
    model,
    variables,
    example_args: Sequence[Any],
    *,
    steps: int,
    step_width: int | None = None,
    platforms: Sequence[str] | None = None,
    mesh=None,
    data_axis: str = "dp",
):
    """Export a K-step autoregressive rollout (see :func:`_rollout_fn`).

    Args:
        example_args: ``(pos, fx0)`` — positions and the initial
            ``[B, N, T_in]`` frame window.
        steps: number of autoregressive steps in the exported program.
        step_width: frames predicted per step; defaults to the model's
            ``out_dim``. ``T_in`` must be >= step_width (the window
            slides by that much each step).
    """
    args = tuple(a for a in example_args if a is not None)
    if len(args) != 2:
        raise ValueError(
            f"rollout export takes exactly (pos, fx0), got {len(args)} "
            "array inputs")
    if step_width is None:
        step_width = getattr(model, "out_dim", None)
        if step_width is None:
            raise ValueError("pass step_width= (model has no out_dim)")
    step_width = int(step_width)
    out_dim = getattr(model, "out_dim", step_width)
    if int(out_dim) != step_width:
        raise ValueError(
            f"step_width ({step_width}) must equal the model's out_dim "
            f"({out_dim}): each step's prediction IS the appended frames")
    t_in = int(np.shape(args[1])[-1])
    if t_in < step_width:
        raise ValueError(
            f"the input window (fx0 last dim = {t_in}) must hold at least "
            f"step_width ({step_width}) frames to slide")
    if int(steps) < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    return _export_fn(_rollout_fn(model, int(steps), step_width),
                      variables, args, platforms=platforms, mesh=mesh,
                      data_axis=data_axis)


def _export_fn(fn, variables, args, *, platforms=None, mesh=None,
               data_axis="dp"):
    from jax import export as jexport

    # normalize FrozenDict -> dict BEFORE the trace: the exported
    # calling convention pins exact pytree types, and ExportedModel
    # normalizes the caller's tree the same way (_as_plain_dict)
    variables = _as_plain_dict(variables)
    if mesh is None:
        arg_specs = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype),
            (variables,) + args,
        )
        exported = jexport.export(jax.jit(fn),
                                  platforms=platforms)(*arg_specs)
        return exported

    from jax.sharding import NamedSharding, PartitionSpec as P

    if platforms is not None:
        raise ValueError(
            "mesh= and platforms= are mutually exclusive: a sharded "
            "lowering pins the backend the mesh lives on")
    repl = NamedSharding(mesh, P())
    if data_axis is None:
        # replicated inputs/outputs: the parallelism comes from the
        # model's OWN sharding constraints (head-TP / point sharding),
        # applied at trace time under the mesh context below — this is
        # the single-sample multi-chip route (export_apply docstring)
        data_s = repl
    else:
        n_dp = int(mesh.shape[data_axis])
        for a in args:
            if np.ndim(a) == 0:
                continue  # rank-0 conditioning inputs replicate below
            if np.shape(a)[0] % n_dp:
                raise ValueError(
                    f"batch {np.shape(a)[0]} does not divide the "
                    f"'{data_axis}' mesh axis ({n_dp}); export batch "
                    "sizes that are multiples of the data-parallel "
                    "degree, or pass data_axis=None for replicated "
                    "inputs (model-internal sharding)")
        data_s = NamedSharding(mesh, P(data_axis))

    def arg_s(a):
        # a 0-d arg has no batch axis to shard: replicate it (P on a
        # scalar aval is a jit error, not a friendly one)
        return repl if np.ndim(a) == 0 else data_s

    spec_w = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype,
                                       sharding=repl), variables)
    spec_x = tuple(jax.ShapeDtypeStruct(np.shape(a), a.dtype,
                                        sharding=arg_s(a)) for a in args)
    jf = jax.jit(fn,
                 in_shardings=(jax.tree_util.tree_map(lambda _: repl,
                                                      variables),)
                 + tuple(arg_s(a) for a in args),
                 out_shardings=data_s)
    # the model's own sharding constraints (head-TP etc.) need the mesh
    # context at trace time
    with mesh:
        exported = jexport.export(jf)(spec_w, *spec_x)
    return exported


def _as_plain_dict(tree):
    """Normalize Mapping nodes (flax FrozenDict) to plain dicts.

    The exported calling convention pins the EXACT pytree types — a
    FrozenDict where a dict was exported fails deep inside
    ``exported.call`` with an opaque structural diff. Exports normalize
    the variables tree here, and :class:`ExportedModel` normalizes the
    caller's tree the same way, so dict/FrozenDict checkpoints are
    interchangeable at the artifact boundary."""
    if hasattr(tree, "items"):
        return {k: _as_plain_dict(v) for k, v in tree.items()}
    return tree


def _variables_treedef_str(variables) -> str:
    # strict, matching jax.export's own calling-convention comparison
    # (even a leafless empty dict node is structure there); FrozenDict
    # normalized to dict so flax-version differences don't false-alarm
    return str(jax.tree_util.tree_structure(_as_plain_dict(variables)))


def _input_shapes(example_args) -> list[list[int]]:
    return [list(np.shape(a)) for a in example_args if a is not None]


def _input_dtypes(example_args) -> list[str]:
    # the array's ACTUAL dtype (canonicalizing here would let an f64
    # request slip past the check and be silently downcast by jit)
    return [np.dtype(getattr(a, "dtype", None) or np.asarray(a).dtype).name
            for a in example_args if a is not None]


def _canonical_input_dtypes(example_args) -> list[str]:
    """What the exported program ACTUALLY takes: jax.export traces with
    canonicalized dtypes (f64 -> f32 under the default x64-disabled
    config). The manifest must record these — recording the example
    args' raw dtypes made the dtype guard reject the very f32 inputs the
    program accepts whenever the example data happened to be f64 (the
    numpy default)."""
    from jax import dtypes as jdtypes

    return [np.dtype(jdtypes.canonicalize_dtype(
        getattr(a, "dtype", None) or np.asarray(a).dtype)).name
            for a in example_args if a is not None]


def save_artifact(
    path: str,
    model,
    variables,
    example_args: Sequence[Any],
    *,
    platforms: Sequence[str] | None = None,
    extra_manifest: dict | None = None,
    mesh=None,
    data_axis: str = "dp",
) -> str:
    """Export + write a self-contained artifact directory.

    Layout: ``path/manifest.json`` (shapes, dtypes, platforms, model repr)
    and ``path/apply.stablehlo.bin`` (the serialized Exported). Returns
    ``path``. With ``mesh``, the program is multi-chip data-parallel
    (see :func:`export_apply`) and the manifest records ``nr_devices``.
    """
    exported = export_apply(
        model, variables, example_args, platforms=platforms,
        mesh=mesh, data_axis=data_axis,
    )
    return _write_artifact(path, exported, model, variables, example_args,
                           mesh, data_axis, extra_manifest)


def save_rollout_artifact(
    path: str,
    model,
    variables,
    example_args: Sequence[Any],
    *,
    steps: int,
    step_width: int | None = None,
    platforms: Sequence[str] | None = None,
    extra_manifest: dict | None = None,
    mesh=None,
    data_axis: str = "dp",
) -> str:
    """Export + write a K-step autoregressive rollout artifact (see
    :func:`export_rollout`). Same directory layout as :func:`save_artifact`;
    the manifest additionally records ``rollout_steps`` / ``step_width``.
    The artifact serves through the same :class:`ExportedModel` /
    :class:`ServingBundle` / :class:`haet_tpu.serve.BatchingServer` path
    as a plain forward — its output is just ``[B, N, steps*step_width]``.
    """
    if step_width is None:
        step_width = getattr(model, "out_dim", None)
    exported = export_rollout(
        model, variables, example_args, steps=steps, step_width=step_width,
        platforms=platforms, mesh=mesh, data_axis=data_axis,
    )
    return _write_artifact(
        path, exported, model, variables, example_args, mesh, data_axis,
        # rollout fields AFTER caller extras: they are measured facts
        # about the exported program, not user annotations
        {**(extra_manifest or {}),
         "rollout_steps": int(steps), "step_width": int(step_width)})


def _write_artifact(path, exported, model, variables, example_args,
                    mesh, data_axis, extra_manifest) -> str:
    os.makedirs(path, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(path, _BLOB), "wb") as f:
        f.write(blob)
    manifest = {
        # caller extras FIRST: the measured integrity fields below (the
        # serving guards' ground truth) must not be silently overridable
        **(extra_manifest or {}),
        "input_shapes": _input_shapes(example_args),
        # what the traced program ACTUALLY takes (jax.export
        # canonicalizes, e.g. f64 example data -> an f32 program)
        "input_dtypes": _canonical_input_dtypes(example_args),
        "platforms": list(exported.platforms),
        "model": repr(model),
        "n_arrays_variables": len(jax.tree_util.tree_leaves(variables)),
        # the exported calling convention pins the variables PYTREE
        # STRUCTURE; recorded so a mismatched checkpoint (e.g. missing
        # batch_stats) raises a named error instead of an opaque
        # structural diff deep inside jax.export
        "variables_treedef": _variables_treedef_str(variables),
        "nr_devices": int(exported.nr_devices),
        **({"data_axis": data_axis} if mesh is not None else {}),
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return path


class ExportedModel:
    """A loaded artifact: ``__call__(variables, *args)`` runs the AOT
    program (under ``jit`` so results live on device and calls fuse into
    surrounding jitted code)."""

    def __init__(self, exported, manifest: dict, mesh=None):
        self.exported = exported
        self.manifest = manifest
        self._call = jax.jit(exported.call)
        self._mesh = None
        self._data_sharding = None
        self._repl_sharding = None
        if int(getattr(exported, "nr_devices", 1)) > 1:
            if mesh is None:
                raise ValueError(
                    f"this artifact is a multi-chip program "
                    f"({exported.nr_devices} devices, data axis "
                    f"{manifest.get('data_axis')!r}); pass a mesh of that "
                    "size to load_artifact(path, mesh=...)")
            if int(np.prod(list(mesh.shape.values()))) != int(
                    exported.nr_devices):
                raise ValueError(
                    f"mesh has {int(np.prod(list(mesh.shape.values())))} "
                    f"devices but the artifact was exported for "
                    f"{exported.nr_devices}")
            from jax.sharding import NamedSharding, PartitionSpec as P

            # data_axis None (stored as JSON null) = replicated inputs:
            # the single-sample head-TP route (export_apply docstring)
            axis = manifest.get("data_axis", "dp")
            self._mesh = mesh
            self._data_sharding = NamedSharding(
                mesh, P(axis) if axis is not None else P())
            self._repl_sharding = NamedSharding(mesh, P())

    @property
    def nr_devices(self) -> int:
        return int(getattr(self.exported, "nr_devices", 1))

    @property
    def input_shapes(self) -> list[list[int]]:
        return self.manifest["input_shapes"]

    def _place(self, tree, sharding):
        """Commit host arrays for a multi-chip program (single-chip
        artifacts take anything jit accepts). An input that already
        spans devices is passed through only when its sharding is
        EQUIVALENT to the artifact's — an array committed under a
        different mesh/spec is re-placed here rather than failing (or
        silently resharding) inside the multi-chip call."""
        if self._mesh is None:
            return tree

        def put(a):
            if (isinstance(a, jax.Array)
                    and len(a.sharding.device_set) > 1
                    and a.sharding.is_equivalent_to(sharding, a.ndim)):
                return a
            return jax.device_put(a, sharding)

        return jax.tree_util.tree_map(put, tree)

    def _check(self, args):
        want = self.input_shapes
        got = [list(np.shape(a)) for a in args if a is not None]
        if got != want:
            raise ValueError(
                f"shape mismatch: artifact was exported for inputs {want}, "
                f"got {got}. Padding is NOT applied implicitly — duplicate "
                "points would change the rep-slice statistics, and batch "
                "size is part of the program (module docstring); export an "
                "artifact per serving signature (ServingBundle)."
            )
        # dtype too: an f64 (or int) input to an f32 program would bypass
        # the friendly error and surface as an opaque XLA destination-
        # passing failure. Old artifacts without the manifest field skip.
        want_dt = self.manifest.get("input_dtypes")
        if want_dt is not None:
            got_dt = _input_dtypes(args)
            if got_dt != want_dt:
                raise ValueError(
                    f"dtype mismatch: artifact was exported for input "
                    f"dtypes {want_dt}, got {got_dt}. Cast the inputs "
                    "explicitly (no implicit casts at the serving "
                    "boundary).")

    def _check_variables(self, variables, *, force: bool = False):
        """The exported calling convention also pins the variables pytree
        STRUCTURE — a checkpoint missing (or adding) subtrees, most
        commonly an empty ``batch_stats`` where the model has BatchNorm,
        would otherwise fail with an opaque structural diff deep inside
        jax.export. Memoized on tree identity: the unbound serving path
        calls this per dispatch with the same checkpoint object, and the
        treedef stringification walks the whole ~200-leaf tree (~0.4 ms —
        real money against a ~3 ms dispatch). Identity memoization cannot
        see IN-PLACE structural mutation of the validated dict, so
        :meth:`__call__` re-runs this with ``force=True`` whenever the
        deep call fails (the curated message still surfaces, just after
        the failure instead of before). The memo holds at most one
        checkpoint generation per artifact and is overwritten on the next
        validation."""
        want = self.manifest.get("variables_treedef")
        if want is None:
            return  # pre-0.6 artifact without the field
        if (not force
                and variables is getattr(self, "_validated_variables",
                                         None)):
            return
        got = _variables_treedef_str(variables)
        if got == want:
            self._validated_variables = variables
        else:
            raise ValueError(
                "variables pytree mismatch: the artifact was exported "
                f"with structure\n  {want}\nbut was called with\n  {got}\n"
                "Common causes: serving a checkpoint without its "
                "batch_stats collection (BatchNorm models need it), an "
                "EMPTY batch_stats dict added for a BN-free model "
                "(drop the key — even a leafless node is structure), or "
                "a pipeline-layout checkpoint not converted with "
                "parallel.pipeline.merge_raw_variables.")

    def _arg_sharding(self, a):
        # rank-0 conditioning inputs were exported replicated (no batch
        # axis to shard); everything else rides the data sharding
        return (self._repl_sharding if np.ndim(a) == 0
                else self._data_sharding)

    def __call__(self, variables, *args):
        args = tuple(a for a in args if a is not None)
        self._check(args)
        self._check_variables(variables)
        # exports normalize FrozenDict -> dict (the calling convention
        # pins exact pytree types); normalize the caller's tree the same
        # way so frozen checkpoints serve without an opaque deep error
        raw_variables = variables
        variables = _as_plain_dict(variables)
        try:
            if self._mesh is None:
                return self._call(variables, *args)
            variables = self._place(variables, self._repl_sharding)
            args = tuple(self._place(a, self._arg_sharding(a))
                         for a in args)
            with self._mesh:
                return self._call(variables, *args)
        except Exception:
            # the identity memo in _check_variables cannot see in-place
            # structural mutation of a previously-validated dict; before
            # surfacing a deep jax.export failure, re-validate for real —
            # if the structure drifted, raise the curated message instead
            # of the opaque structural diff
            self._validated_variables = None
            self._check_variables(raw_variables, force=True)
            raise

    def bind(self, variables):
        """Pre-bind ``variables``: returns ``fn(*args)`` with the weights
        baked into the compiled executable as constants.

        The generic ``__call__`` passes every weight leaf as a runtime
        argument — flexible (one artifact, any checkpoint) but each
        dispatch then marshals the whole parameter tree through the
        runtime's argument path. For a server that holds ONE checkpoint,
        binding moves the weights into the executable: measured on the
        v5e via benchmarks/micro_serving_latency.py, the bound flagship
        artifact dispatches ~2x faster than the argument-passing path
        (see docs/benchmarks.md "Serving latency").
        """
        exported = self.exported
        self._check_variables(variables)
        variables = _as_plain_dict(variables)
        if self._mesh is not None:
            variables = self._place(variables, self._repl_sharding)
        call = jax.jit(lambda *a: exported.call(variables, *a))

        def fn(*args):
            args = tuple(a for a in args if a is not None)
            self._check(args)
            if self._mesh is None:
                return call(*args)
            args = tuple(self._place(a, self._arg_sharding(a))
                         for a in args)
            with self._mesh:
                return call(*args)

        return fn


def load_artifact(path: str, mesh=None) -> ExportedModel:
    """Load an artifact directory. Multi-chip artifacts (exported with
    ``mesh=``) require a mesh of the matching device count here."""
    from jax import export as jexport

    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    with open(os.path.join(path, _BLOB), "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    return ExportedModel(exported, manifest, mesh=mesh)


class ServingBundle:
    """Several exported shapes behind one ``predict``.

    The serving analogue of shape-bucketed TPU inference: each distinct
    input signature (batch x points x channels, or grid) gets its own AOT
    program; requests dispatch by exact shape. ``shapes()`` lists what is
    available; a miss raises (no silent padding — module docstring).
    """

    def __init__(self, models: Sequence[ExportedModel]):
        self._by_key = {}
        for m in models:
            key = tuple(tuple(s) for s in m.input_shapes)
            prev = self._by_key.get(key)
            if prev is not None:
                # dispatch is by SHAPE; two artifacts with the same
                # input signature would silently shadow one another with
                # sorted-dir-name order deciding the winner — a plain
                # forward next to a rollout of the same model, a stale
                # re-export next to a fresh one, or two dtype families.
                # Refuse loudly; keep one program per signature per root.
                def _what(x):
                    man = getattr(x, "manifest", {}) or {}
                    return {k: man.get(k) for k in
                            ("input_dtypes", "rollout_steps",
                             "batch_size", "model") if man.get(k)
                            is not None}

                raise ValueError(
                    f"ambiguous bundle: two artifacts share the input "
                    f"signature {key} ({_what(prev)} vs {_what(m)}); "
                    "dispatch is by shape, so one would silently shadow "
                    "the other — use a separate bundle root per program "
                    "family")
            self._by_key[key] = m

    @classmethod
    def load(cls, root: str, mesh=None) -> "ServingBundle":
        """Load every artifact directory directly under ``root``
        (``mesh`` is forwarded for multi-chip artifacts)."""
        subdirs = sorted(
            os.path.join(root, d) for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        return cls([load_artifact(d, mesh=mesh) for d in subdirs
                    if os.path.exists(os.path.join(d, _MANIFEST))])

    def shapes(self):
        return sorted(self._by_key)

    def predict(self, variables, *args):
        key = tuple(tuple(np.shape(a)) for a in args if a is not None)
        m = self._by_key.get(key)
        if m is None:
            raise ValueError(
                f"no artifact for input shapes {key}; "
                f"available: {self.shapes()}")
        return m(variables, *args)

    def bind(self, variables) -> "BoundBundle":
        """Pre-bind one checkpoint into every artifact (see
        :meth:`ExportedModel.bind`): returns a :class:`BoundBundle` whose
        ``predict(*args)`` dispatches weight-free. This is what a server
        holding a single checkpoint should use
        (:class:`haet_tpu.serve.BatchingServer` does it automatically)."""
        return BoundBundle(self, variables)


class BoundBundle:
    """A :class:`ServingBundle` with one checkpoint baked in; binding is
    lazy per signature (first dispatch of a shape compiles its bound
    program)."""

    def __init__(self, bundle: ServingBundle, variables):
        self._bundle = bundle
        self._variables = variables
        self._bound = {}

    @property
    def _by_key(self):
        # forward the artifact map: BatchingServer reads manifests from
        # it for submit-time dtype rejection, pad_to_points bucket
        # discovery, and checkpoint-structure validation — a bound
        # bundle must not silently lose those guards
        return self._bundle._by_key

    def shapes(self):
        return self._bundle.shapes()

    def predict(self, *args):
        key = tuple(tuple(np.shape(a)) for a in args if a is not None)
        fn = self._bound.get(key)
        if fn is None:
            m = self._bundle._by_key.get(key)
            if m is None:
                raise ValueError(
                    f"no artifact for input shapes {key}; "
                    f"available: {self.shapes()}")
            fn = self._bound[key] = m.bind(self._variables)
        return fn(*args)
