"""Reference-checkpoint interchange: torch ``state_dict`` <-> flax variables.

The reference trains with PyTorch and saves ``state_dict`` checkpoints
(``benchmarks/02-.../train.py:250-259`` saves ``model_state_dict`` dicts;
``exp_darcy.py:259-263`` saves bare state_dicts). A user switching to this
framework can carry those trained weights over:

    sd = torch.load("best_model.pt", map_location="cpu")
    variables = convert_state_dict(sd, template_variables)

and the other way (``to_torch_state_dict``) for serving a haet_tpu-trained
model from the reference code.

Key-schema provenance (all verified against stub-instantiated reference
models in ``tests/test_torch_import.py``):

- the three package models ``models/HAETransolver_*.py`` and the vendored
  ShapeNet-Car model (``benchmarks/02-.../models/Transolver.py``) share one
  naming schema (``blocks.N.Attn...``, ``preprocess.linear_pre.0...``);
- this package's flax module names deliberately mirror it
  (``blocks_N/Attn/...``), so the translation is mostly mechanical:
  dots to slashes, ``blocks.N`` -> ``blocks_N``, torch ``Sequential``
  indices dropped, Linear/Conv ``weight`` transposed into flax ``kernel``
  layout, norm ``weight`` -> ``scale``, BatchNorm running stats into the
  ``batch_stats`` collection.

Transpose conventions: torch ``nn.Linear.weight`` is ``[out, in]`` vs flax
``Dense.kernel`` ``[in, out]``; ``nn.Conv2d.weight`` is OIHW vs flax
``Conv.kernel`` HWIO; ``nn.Conv3d`` OIDHW vs DHWIO.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np
from flax import traverse_util

# torch.compile / DataParallel wrappers the reference eval already strips
# (``main_evaluation.py:229-240``).
_PREFIXES = ("_orig_mod.", "module.")

# Containers the reference wraps state_dicts in (``train.py:250-259``).
_CONTAINER_KEYS = ("model_state_dict", "state_dict", "model")

_EMPTY = traverse_util.empty_node


def _flatten(tree: Mapping, *, keep_empty: bool = False) -> Dict[tuple, Any]:
    return traverse_util.flatten_dict(dict(tree), keep_empty_nodes=keep_empty)


def _unflatten(flat: Mapping[tuple, Any]) -> dict:
    return traverse_util.unflatten_dict(dict(flat))


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu()
        try:
            return np.asarray(v.numpy())
        except TypeError:  # bf16 etc. -- numpy has no matching dtype
            return np.asarray(v.float().numpy())
    return np.asarray(v)


def _kernel_of(w: np.ndarray) -> np.ndarray:
    """torch Linear/Conv weight -> flax kernel layout."""
    if w.ndim == 2:  # [out, in] -> [in, out]
        return w.T
    if w.ndim == 4:  # OIHW -> HWIO
        return w.transpose(2, 3, 1, 0)
    if w.ndim == 5:  # OIDHW -> DHWIO
        return w.transpose(2, 3, 4, 1, 0)
    raise ValueError(
        f"unsupported torch weight ndim {w.ndim} for flax kernel layout "
        "(expected Linear [out,in], Conv2d OIHW, or Conv3d OIDHW)")


def _weight_of(k: np.ndarray, ndim: int) -> np.ndarray:
    """flax kernel -> torch weight layout (inverse of :func:`_kernel_of`)."""
    if ndim == 2:
        return k.T
    if ndim == 4:
        return k.transpose(3, 2, 0, 1)
    if ndim == 5:
        return k.transpose(4, 3, 0, 1, 2)
    raise ValueError(
        f"unsupported flax kernel ndim {ndim} for torch weight layout")


def _strip(key: str) -> str:
    changed = True
    while changed:
        changed = False
        for p in _PREFIXES:
            if key.startswith(p):
                key = key[len(p):]
                changed = True
    return key


def _translate_module_path(key: str) -> str:
    """Rewrite a reference module path (everything up to the leaf) into this
    package's flax naming. Returns a dot-separated path; the leaf is still
    torch-named (``weight``/``bias``/``running_mean``/...)."""
    k = key
    # Erwin internals first -- their '.blocks.N.' must not be confused with
    # the model's top-level '.blocks.N.' rewrite below.
    k = re.sub(r"erwin\.(encoder|decoder)\.(\d+)\.blocks\.(\d+)\.",
               r"erwin.\g<1>\g<2>.block\g<3>.", k)
    k = re.sub(r"erwin\.(encoder|decoder)\.(\d+)\.", r"erwin.\g<1>\g<2>.", k)
    k = re.sub(r"erwin\.bottleneck\.blocks\.(\d+)\.",
               r"erwin.bottleneck.block\g<1>.", k)
    # MPNN: fused Sequential(message Linear, GELU, non-affine LN) and
    # Sequential(update Linear, non-affine LN) -- only index 0 has params.
    k = re.sub(r"mpnn\.fused_message_update\.(\d+)\.0\.",
               r"mpnn.message_\g<1>.", k)
    k = re.sub(r"mpnn\.update_fns\.(\d+)\.0\.", r"mpnn.update_\g<1>.", k)
    # Top-level transformer blocks.
    k = re.sub(r"^blocks\.(\d+)\.", r"blocks_\g<1>.", k)
    # torch Sequential indices with a single parametrized member.
    k = k.replace(".linear_pre.0.", ".linear_pre.")
    k = k.replace(".to_out.0.", ".to_out.")
    # time_fc = Sequential(Linear, SiLU, Linear)
    # (``HAETransolver_Structured_Mesh_2D.py``); here two named Dense.
    k = re.sub(r"^time_fc\.0\.", "time_fc1.", k)
    k = re.sub(r"^time_fc\.2\.", "time_fc2.", k)
    return k


def convert_state_dict(state_dict: Mapping[str, Any], template: Mapping,
                       *, strict: bool = True,
                       rename: Mapping[str, str] | None = None) -> dict:
    """Convert a reference torch ``state_dict`` into flax ``variables``.

    Args:
      state_dict: mapping of reference parameter names to arrays (torch
        tensors or numpy). May be a whole checkpoint dict -- known containers
        (``model_state_dict``/``state_dict``/``model``) are unwrapped.
      template: flax variables from ``model.init`` for the matching config
        (``{"params": ..., "batch_stats": ...}``). Shapes/dtypes/tree
        structure come from here; values are ignored.
      strict: raise ``ValueError`` when any template leaf is unfilled or any
        checkpoint key is unused (BatchNorm ``num_batches_tracked`` counters
        are always ignored). With ``strict=False`` unfilled leaves keep the
        template's values.
      rename: optional prefix-rewrite map applied (longest prefix first,
        once per key, after wrapper-prefix stripping) for models whose
        wrapper naming differs from this package's -- e.g. the 02.1
        Erwin-only baseline: ``{"model.": "erwin.", "pred_head.0.":
        "head1.", "pred_head.2.": "head2."}``.

    Returns a new variables dict (numpy leaves, template dtypes).
    """
    for c in _CONTAINER_KEYS:
        if c in state_dict and isinstance(state_dict[c], Mapping):
            state_dict = state_dict[c]
            break

    rename = dict(sorted((rename or {}).items(),
                         key=lambda kv: -len(kv[0])))

    # keep_empty: an empty collection (e.g. batch_stats on a BN-free model)
    # must survive into the returned tree so callers can index it.
    flat_tmpl = _flatten(template, keep_empty=True)
    by_path = {p: v for p, v in flat_tmpl.items()
               if v is not _EMPTY}  # (col, ...) -> leaf template
    out: Dict[tuple, np.ndarray] = {}
    unused, errors = [], []

    for raw_key, raw_val in state_dict.items():
        key = _strip(raw_key)
        if key.endswith("num_batches_tracked"):
            continue
        for pre, sub in rename.items():
            if key.startswith(pre):
                key = sub + key[len(pre):]
                break
        val = _to_numpy(raw_val)
        k = _translate_module_path(key)
        parts = k.split(".")
        mod, leaf = parts[:-1], parts[-1]

        candidates = []  # (path, transform)
        if leaf == "running_mean":
            candidates = [(("batch_stats", *mod, "mean"), None)]
        elif leaf == "running_var":
            candidates = [(("batch_stats", *mod, "var"), None)]
        elif leaf == "weight":
            if mod and mod[-1] == "in_project_slice":
                candidates = [(("params", *mod[:-1],
                               "in_project_slice_kernel"), _kernel_of)]
            elif mod and mod[-1] == "ada_temp_linear":
                candidates = [(("params", *mod[:-1], "ada_temp_kernel"),
                               _kernel_of)]
            else:
                # Linear/Conv -> kernel (transposed); norms -> scale.
                candidates = [(("params", *mod, "kernel"), _kernel_of),
                              (("params", *mod, "scale"), None)]
        elif leaf == "bias":
            if mod and mod[-1] == "in_project_slice":
                candidates = [(("params", *mod[:-1],
                               "in_project_slice_bias"), None)]
            elif mod and mod[-1] == "ada_temp_linear":
                candidates = [(("params", *mod[:-1], "ada_temp_bias"), None)]
            else:
                candidates = [(("params", *mod, "bias"), None)]
        else:  # placeholder, sigma_att, ...
            candidates = [(("params", *mod, leaf), None)]

        hit = next(((p, t) for p, t in candidates if p in by_path), None)
        if hit is None:
            unused.append(raw_key)
            continue
        path, transform = hit
        arr = transform(val) if transform else val
        tmpl_leaf = by_path[path]
        if tuple(arr.shape) != tuple(np.shape(tmpl_leaf)):
            errors.append(
                f"{raw_key}: shape {tuple(arr.shape)} vs template "
                f"{tuple(np.shape(tmpl_leaf))} at {'/'.join(path)}")
            continue
        out[path] = arr.astype(np.asarray(tmpl_leaf).dtype)

    missing = [p for p in by_path if p not in out]
    if errors:
        raise ValueError("shape mismatches importing checkpoint:\n  "
                         + "\n  ".join(errors))
    if strict and (missing or unused):
        msg = []
        if missing:
            msg.append("template leaves not found in checkpoint:\n  "
                       + "\n  ".join("/".join(p) for p in sorted(missing)))
        if unused:
            msg.append("checkpoint keys not mapped:\n  "
                       + "\n  ".join(sorted(unused)))
        raise ValueError("\n".join(msg))

    merged = dict(flat_tmpl)
    for p, v in out.items():
        merged[p] = v
    merged = {p: (v if v is _EMPTY else np.asarray(v))
              for p, v in merged.items()}
    return _unflatten(merged)


# ---------------------------------------------------------------------------
# flax -> torch (the reverse direction, and the round-trip test's inverse)
# ---------------------------------------------------------------------------

def _torch_key(path: Tuple[str, ...]) -> str:
    """flax ('params'|'batch_stats', ...) path -> reference state_dict key."""
    col, *mod = path
    leaf = mod.pop()
    if col == "batch_stats":
        leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
    elif leaf == "kernel":
        leaf = "weight"
    elif leaf == "scale":
        leaf = "weight"
    elif leaf == "in_project_slice_kernel":
        mod, leaf = mod + ["in_project_slice"], "weight"
    elif leaf == "in_project_slice_bias":
        mod, leaf = mod + ["in_project_slice"], "bias"
    elif leaf == "ada_temp_kernel":
        mod, leaf = mod + ["ada_temp_linear"], "weight"
    elif leaf == "ada_temp_bias":
        mod, leaf = mod + ["ada_temp_linear"], "bias"
    k = ".".join(mod + [leaf])
    k = re.sub(r"^blocks_(\d+)\.", r"blocks.\g<1>.", k)
    k = re.sub(r"erwin\.(encoder|decoder)(\d+)\.block(\d+)\.",
               r"erwin.\g<1>.\g<2>.blocks.\g<3>.", k)
    k = re.sub(r"erwin\.(encoder|decoder)(\d+)\.", r"erwin.\g<1>.\g<2>.", k)
    k = re.sub(r"erwin\.bottleneck\.block(\d+)\.",
               r"erwin.bottleneck.blocks.\g<1>.", k)
    k = re.sub(r"mpnn\.message_(\d+)\.", r"mpnn.fused_message_update.\g<1>.0.",
               k)
    k = re.sub(r"mpnn\.update_(\d+)\.", r"mpnn.update_fns.\g<1>.0.", k)
    k = k.replace(".linear_pre.", ".linear_pre.0.")
    k = k.replace(".to_out.", ".to_out.0.")
    k = re.sub(r"^time_fc1\.", "time_fc.0.", k)
    k = re.sub(r"^time_fc2\.", "time_fc.2.", k)
    return k


def to_torch_state_dict(variables: Mapping) -> Dict[str, np.ndarray]:
    """Export flax ``variables`` as a reference-schema ``state_dict`` of
    numpy arrays (torch layouts). ``num_batches_tracked`` counters are not
    emitted -- load with ``model.load_state_dict(sd, strict=False)`` or add
    zeros. Feed through ``torch.from_numpy`` to load into a torch model."""
    out: Dict[str, np.ndarray] = {}
    for path, leaf in _flatten(variables).items():
        arr = np.asarray(leaf)
        key = _torch_key(path)
        is_kernel = path[-1] in ("kernel", "in_project_slice_kernel",
                                 "ada_temp_kernel")
        out[key] = _weight_of(arr, arr.ndim) if is_kernel else arr
    return out


def load_torch_checkpoint(path: str, template: Mapping, *,
                          strict: bool = True,
                          rename: Mapping[str, str] | None = None,
                          weights_only: bool = True) -> dict:
    """``torch.load`` a reference ``.pt`` checkpoint file and convert it.

    Accepts both bare state_dicts and the reference's training-checkpoint
    dicts (``{"epoch", "model_state_dict", ...}``, ``train.py:250-259``).
    Loads with ``weights_only=True`` by default: reference checkpoints are
    plain tensor/int/dict trees and need no pickle code execution. Only pass
    ``weights_only=False`` for a file you trust completely -- unpickling
    arbitrary files executes arbitrary code.

    ``rename`` is forwarded to :func:`convert_state_dict` (prefix rewrites
    for wrapper naming, e.g. the 02.1 Erwin-only baseline).
    """
    import pickle

    import torch

    if not weights_only:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    else:
        # The reference car checkpoints are NOT pure tensor trees: train.py
        # saves ``val_loss``/``train_loss`` as ``np.mean(...)`` numpy
        # float64 scalars (02-.../train.py:244-251), which the weights-only
        # unpickler rejects. Allowlist numpy's scalar-reconstruction
        # globals — still data-only, no code execution.
        from torch.serialization import safe_globals

        try:
            with safe_globals(_numpy_pickle_globals()):
                sd = torch.load(path, map_location="cpu", weights_only=True)
        except pickle.UnpicklingError as e:
            raise ValueError(
                f"{path} contains pickled objects beyond tensors and numpy "
                "scalars, which the safe weights-only loader rejects. If "
                "you trust this file completely, pass weights_only=False "
                "(unpickling arbitrary files executes arbitrary code)."
            ) from e
    return convert_state_dict(sd, template, strict=strict, rename=rename)


def _numpy_pickle_globals() -> list:
    """The globals numpy scalars pickle through (``multiarray.scalar``,
    ``np.dtype``, and the concrete DType classes) — data-only constructors
    safe to allowlist for ``torch.load(weights_only=True)``."""
    cands: list = [np.dtype]
    for mod_name in ("_core", "core"):  # numpy 2 / numpy 1 spellings
        mod = getattr(np, mod_name, None)
        scalar = getattr(getattr(mod, "multiarray", None), "scalar", None)
        if scalar is not None:
            cands.append(scalar)
            break
    try:
        import numpy.dtypes as _ndt

        cands += [v for n, v in vars(_ndt).items() if n.endswith("DType")]
    except ImportError:  # numpy < 1.25
        pass
    return cands
