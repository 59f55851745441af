#!/usr/bin/env python
"""End-to-end quickstart: train -> checkpoint -> resume -> export -> serve.

The smallest complete tour of the framework's public API, runnable on CPU in
about a minute (synthetic data, tiny config). The same code scales to TPU:
remove the platform override and raise the sizes.

    python examples/train_and_serve.py

Covers (reference parity in parentheses):
- model construction from the reference-spelling constructor surface
  (reference ``models/HAETransolver_Irregular_Mesh.py``);
- one-jit training with the ``Trainer`` engine: AdamW + OneCycle,
  gradient clipping, early stopping, JSONL metrics (reference
  ``exp_*.py`` hand-written loops, ``train.py:21-46``);
- orbax checkpointing with best/last and true mid-training resume;
- AOT StableHLO export (``haet_tpu/export.py``) and shape-bucketed
  serving via ``ServingBundle`` — no model code needed at serving time.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HAET_PLATFORM", "cpu")  # demo runs on CPU; drop on TPU

from haet_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from haet_tpu.models import HAETransolver_Irregular_Mesh  # noqa: E402
from haet_tpu.train import Checkpointer, MetricsLogger, Trainer  # noqa: E402
from haet_tpu.utils.config import TrainConfig  # noqa: E402

# --------------------------------------------------------------- model
N, B = 256, 4
model = HAETransolver_Irregular_Mesh(
    space_dim=3, fun_dim=1, out_dim=1,
    n_layers=1, n_hidden=32, n_head=4, slice_num=16,
)

# ------------------------------------------------- synthetic point clouds
rng = np.random.RandomState(0)


def make_batch():
    x = rng.rand(B, N, 3).astype(np.float32)
    fx = np.sin(4 * x[..., :1]).astype(np.float32)
    y = (fx * np.cos(3 * x[..., 1:2])).astype(np.float32)
    return {"x": x, "fx": fx, "y": y}


def train_batches():
    for _ in range(4):
        yield make_batch()


# ------------------------------------------------------------- training
cfg = TrainConfig(lr=1e-3, epochs=3, batch_size=B, max_grad_norm=1.0,
                  early_stop_patience=7)
trainer = Trainer(
    model=model,
    loss_fn=lambda out, b: (jnp.mean((out - b["y"]) ** 2), {}),
    cfg=cfg,
    total_steps=4 * cfg.epochs,
    batch_args=lambda b: (b["x"], b["fx"]),
)

workdir = tempfile.mkdtemp(prefix="haet_quickstart_")
state = trainer.init_state(jax.random.PRNGKey(0), make_batch())
print(f"params: {trainer.num_params(state)}")

ckpt = Checkpointer(os.path.join(workdir, "ckpt"))
logger = MetricsLogger(os.path.join(workdir, "metrics.jsonl"))
state = trainer.fit(state, train_batches, lambda: iter([make_batch()]),
                    logger=logger, checkpointer=ckpt)

# ------------------------------------------------------ resume from disk
template = jax.tree_util.tree_map(np.asarray, state)
restored = ckpt.restore(template, "best")
assert restored is not None
print("restored best checkpoint; continuing training works:")
state = trainer.fit(restored, train_batches, epochs=cfg.epochs)
logger.close()

# ---------------------------------------------------------------- export
from haet_tpu.export import ServingBundle, save_artifact  # noqa: E402

batch = make_batch()
artifact_root = os.path.join(workdir, "artifacts")
save_artifact(
    os.path.join(artifact_root, f"b{B}_n{N}"),
    model,
    {"params": state.params, "batch_stats": state.batch_stats},
    (batch["x"], batch["fx"]),
)

# ----------------------------------------------------------------- serve
bundle = ServingBundle.load(artifact_root)
print("serving shapes:", bundle.shapes())
pred = bundle.predict(
    {"params": state.params, "batch_stats": state.batch_stats},
    batch["x"], batch["fx"],
)
live = trainer.predict(state, batch)
err = float(np.max(np.abs(np.asarray(pred) - np.asarray(live))))
print(f"AOT artifact output == live model output (max diff {err:.2e})")
assert err < 1e-5
print(f"done; artifacts in {workdir}")
