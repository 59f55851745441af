"""Checkpointing with true mid-training resume (orbax).

The reference saves ``{epoch, model/optimizer/scheduler state, losses}`` at
best-val and final epoch (``train.py:250-259,297-306``) and the PDE drivers
additionally save a bare state_dict every 100 epochs
(``exp_darcy.py:259-263``) — but can only load for eval. Here the full
:class:`TrainState` (params, batch_stats, optimizer state, step) round-trips,
so training resumes exactly, with a best / last / periodic policy and
``keep``-bounded pruning of the periodic snapshots.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any

import jax
import orbax.checkpoint as ocp

_EPOCH_RE = re.compile(r"^epoch_(\d+)$")


class Checkpointer:
    """best / last / periodic checkpoint policy (reference train.py).

    Args:
        directory: checkpoint root. Names used: ``best``, ``last``,
            ``epoch_{N}`` (periodic).
        keep: how many periodic ``epoch_*`` checkpoints to retain (oldest
            pruned first); ``best``/``last`` are always kept.
    """

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.keep = keep
        # best_val is the watermark deciding whether a new eval beats the
        # stored `best` checkpoint. It must survive a restart: the reference
        # never resumes (best is monotone within a run, train.py:250-259),
        # but a framework with true mid-training resume must not let the
        # first post-restart eval overwrite a better pre-restart `best`.
        # Persisted in a sidecar json next to the checkpoints and re-armed
        # by rearm_best(), which Trainer.maybe_restore calls on the resume
        # path. Deliberately NOT re-armed on construction: a from-scratch
        # rerun into an existing run directory must start at inf, or its
        # genuinely-best epochs could never beat the previous run's stale
        # watermark and `best` would keep another run's weights.
        self.best_val = float("inf")
        self.best_epoch: int | None = None

    def rearm_best(self) -> bool:
        """Restore the best-val watermark from the sidecar meta (resume
        path). Returns True if a watermark backed by an existing `best`
        checkpoint was re-armed; stale meta without a finalized checkpoint
        behind it is ignored."""
        meta = self._read_meta()
        if meta is None:
            return False
        if not os.path.exists(os.path.join(self.directory, "best")):
            return False
        self.best_val = float(meta.get("best_val", float("inf")))
        be = meta.get("best_epoch")
        self.best_epoch = int(be) if be is not None else None
        return True

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.directory, "best_meta.json")

    # -- epoch sidecar ------------------------------------------------------
    # The epoch number is STORED with each checkpoint (reference saves it in
    # the state dict, train.py:250-259) instead of being derived from
    # step//steps_per_epoch — with drop_last=False trailing batches,
    # steps-per-epoch is not constant and a derived epoch can drift,
    # shifting checkpoint_every/eval_every phase after a resume. Kept in a
    # sidecar json (the orbax tree stays pure device state); each entry
    # records the state's step too, so a crash between an async save and
    # the sidecar write is DETECTED at restore (step mismatch -> the caller
    # falls back to derivation) rather than silently mis-numbering.
    @property
    def _epochs_path(self) -> str:
        return os.path.join(self.directory, "epochs.json")

    def _read_epochs(self) -> dict:
        try:
            with open(self._epochs_path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError, OSError):
            return {}

    def _record_epoch(self, name: str, epoch: int, state) -> None:
        rec = self._read_epochs()
        # non-TrainState trees (plain dict states are accepted by save_*)
        # carry no step; their entry is stored step-less and epoch_of with
        # step validation treats it as unknown (conservative)
        step = getattr(state, "step", None)
        rec[name] = {"epoch": int(epoch),
                     "step": int(step) if step is not None else None}
        tmp = self._epochs_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._epochs_path)

    def epoch_of(self, name: str, step: int | None = None):
        """Epoch recorded for checkpoint ``name`` (after ``_resolve``-style
        aliasing), or None if unknown. When ``step`` is given, the sidecar
        entry must match the restored state's step — a mismatched entry
        (crash between save and sidecar write, or a foreign sidecar) is
        treated as unknown."""
        if name == "latest_periodic":
            epochs = self.periodic_epochs()
            if not epochs:
                return None
            name = f"epoch_{epochs[-1]}"
        ent = self._read_epochs().get(name)
        if ent is None:
            return None
        if step is not None:
            stored = ent.get("step")
            if stored is None or int(stored) != int(step):
                return None
        return int(ent["epoch"])

    def _read_meta(self):
        try:
            with open(self._meta_path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError, OSError):
            return None

    def _write_meta(self):
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"best_val": self.best_val,
                       "best_epoch": self.best_epoch}, f)
        os.replace(tmp, self._meta_path)

    def _save(self, name: str, state: Any):
        path = os.path.join(self.directory, name)
        self._ckpt.save(path, state, force=True)

    def save_best(self, state, val_loss: float, epoch: int):
        if val_loss < self.best_val:
            self.best_val = val_loss
            self.best_epoch = epoch
            self._save("best", state)
            # Orbax saves are async: finalize before persisting the
            # watermark, so a crash mid-save cannot leave a meta that
            # suppresses future save_best calls with no valid `best`
            # checkpoint behind it. Best saves are rare (improvements
            # only), so the synchronous wait is cheap.
            self._ckpt.wait_until_finished()
            self._write_meta()
            self._record_epoch("best", epoch, state)

    def save_last(self, state, epoch: int):
        self._save("last", state)
        # Written WITHOUT waiting for the async save (last is per-epoch;
        # a wait would serialize save with the next epoch's compute) —
        # the step recorded alongside makes a crash-torn pair detectable.
        self._record_epoch("last", epoch, state)

    def save_diverged(self, state, epoch: int):
        """Save a non-finite (diverged) state under ``diverged`` for
        forensics. Deliberately NOT ``last``: clobbering the last good
        resume point with NaN params would make the run unsalvageable
        (with no periodic saves and no ``best`` yet, ``last`` is the only
        way back)."""
        self._save("diverged", state)
        self._record_epoch("diverged", epoch, state)

    def save_periodic(self, state, epoch: int):
        """Save ``epoch_{N}`` and prune to the ``keep`` most recent
        (reference periodic policy, ``exp_darcy.py:259-263``)."""
        self._save(f"epoch_{epoch}", state)
        self._record_epoch(f"epoch_{epoch}", epoch, state)
        self._ckpt.wait_until_finished()  # prune only fully-written dirs
        epochs = self.periodic_epochs()
        n_prune = max(0, len(epochs) - self.keep) if self.keep > 0 else 0
        for old in epochs[:n_prune]:
            shutil.rmtree(
                os.path.join(self.directory, f"epoch_{old}"),
                ignore_errors=True,
            )

    def periodic_epochs(self) -> list[int]:
        """Sorted epoch numbers of the periodic checkpoints on disk."""
        out = []
        for name in os.listdir(self.directory):
            m = _EPOCH_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _resolve(self, name: str):
        if name == "latest_periodic":
            epochs = self.periodic_epochs()
            if not epochs:
                return None
            name = f"epoch_{epochs[-1]}"
        path = os.path.join(self.directory, name)
        return path if os.path.exists(path) else None

    def restore(self, state_template: Any, name: str = "last"):
        """Restore by name: ``best`` / ``last`` / ``epoch_{N}`` /
        ``latest_periodic``. Returns None if absent."""
        path = self._resolve(name)
        if path is None:
            return None
        return self._ckpt.restore(path, state_template)

    def restore_raw(self, name: str = "last"):
        """Template-free restore to host numpy: the saved tree as nested
        dicts, with every leaf a ``np.ndarray`` regardless of the device
        topology it was saved under. Used to read checkpoints whose tree
        LAYOUT differs from the caller's state — e.g. evaluating a
        ``--pp`` run's pipeline-layout checkpoint with the plain model
        (``parallel.pipeline.merge_variables``). Returns None if absent."""
        path = self._resolve(name)
        if path is None:
            return None
        import numpy as np

        pt = ocp.PyTreeCheckpointer()
        try:
            meta = pt.metadata(path)
            # Checkpointer.metadata returns a StepMetadata wrapper (a
            # single pytree leaf!) — the saved tree's structure lives at
            # .item_metadata.tree. Mapping over the wrapper itself would
            # produce one bare RestoreArgs and restore() would reject it
            # ("Expected dict, got RestoreArgs"), silently demoting every
            # raw restore to the fallback path below.
            tree_meta = getattr(meta, "item_metadata", meta)
            tree_meta = getattr(tree_meta, "tree", tree_meta)
            restore_args = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
                tree_meta)
            return pt.restore(path, restore_args=restore_args)
        except Exception as meta_err:
            # Classify before falling back: a missing/corrupt checkpoint
            # must surface as itself, not as a mysterious topology
            # difference. Only the metadata-driven path is retried with
            # orbax's own defaults (which read sharding info from the file
            # — fine on the same topology); if THAT fails too, raise an
            # error naming both causes.
            print(f"[Checkpointer] metadata-driven raw restore of {path} "
                  f"failed ({type(meta_err).__name__}: {meta_err}); "
                  "retrying with orbax-default restore")
            try:
                raw = pt.restore(path)
            except Exception as raw_err:
                raise RuntimeError(
                    f"checkpoint at {path} could not be read at all — "
                    "likely corrupt or partially written. Metadata "
                    f"restore failed with: {meta_err!r}; default restore "
                    f"failed with: {raw_err!r}") from raw_err
            return jax.tree_util.tree_map(np.asarray, raw)

    def wait(self):
        self._ckpt.wait_until_finished()

    def __del__(self):
        try:
            self._ckpt.wait_until_finished()
        except Exception:
            pass
