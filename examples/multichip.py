#!/usr/bin/env python
"""Multi-chip SPMD quickstart on an 8-virtual-device CPU mesh.

Shows the framework's parallel axes without TPU hardware: the same code
runs unchanged on a real v5e pod slice (drop the XLA_FLAGS line; on a
multi-host pod call ``haet_tpu.parallel.init_distributed()`` first).

    python examples/multichip.py

- ``dp`` (data parallel): the batch axis sharded over the mesh; XLA
  inserts the gradient psum.
- ``tp`` (head tensor parallel): the model's ``[B, heads, N, *]``
  intermediates sharding-constrained over the second mesh axis
  (``shard_axes=("dp", "tp")`` — models/physics_attention.py).
- gradient accumulation + bf16 Adam moments compose with the mesh
  (the same levers the benchmark drivers expose as
  ``--dp/--tp/--accum_steps/--mu_bf16``).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HAET_PLATFORM", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

from haet_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from haet_tpu.parallel.mesh import make_mesh  # noqa: E402
from haet_tpu.train import Trainer  # noqa: E402
from haet_tpu.utils.config import ModelConfig, TrainConfig  # noqa: E402

mesh = make_mesh(n_dp=4, n_tp=2)
print(f"mesh: {mesh.shape}")

cfg = ModelConfig(
    variant="irregular", space_dim=3, fun_dim=1, out_dim=1,
    n_layers=1, n_hidden=32, n_head=4, slice_num=16,
    shard_axes=("dp", "tp"),  # REAL head tensor parallelism
)
trainer = Trainer(
    model=cfg.build(),
    loss_fn=lambda out, b: (jnp.mean((out - b["y"]) ** 2), {}),
    cfg=TrainConfig(lr=1e-3, epochs=2, batch_size=8, schedule="constant",
                    accum_steps=2, mu_bf16=True),
    total_steps=8,
    batch_args=lambda b: (b["x"], b["fx"]),
    mesh=mesh,
)

rng = np.random.RandomState(0)


def make_batch():
    x = rng.rand(8, 128, 3).astype(np.float32)
    fx = np.sin(4 * x[..., :1]).astype(np.float32)
    return {"x": x, "fx": fx, "y": fx * 0.5}


state = trainer.init_state(jax.random.PRNGKey(0), make_batch())
state = trainer.fit(state, lambda: (make_batch() for _ in range(4)))
pred = trainer.predict(state, make_batch())
print(f"sharded training + jitted predict OK; pred shape {pred.shape}")

# --- pipeline parallelism (pp): GPipe over the block stack --------------
# The L blocks become S stages on a (dp, pp) mesh: each stage's chips
# store ONLY its layers' parameters and Adam moments (sharded from init),
# microbatches stream stage-to-stage with lax.ppermute. The drivers
# expose this as --pp/--pp_microbatches. parallel/pipeline.py for the
# full design notes (bubble fraction, BN semantics, checkpoint layout).
from haet_tpu.parallel import PipelinedModel, make_pp_mesh  # noqa: E402

pp_mesh = make_pp_mesh(n_dp=2, n_pp=4)
pp_cfg = ModelConfig(
    variant="irregular", space_dim=3, fun_dim=1, out_dim=1,
    n_layers=4, n_hidden=32, n_head=4, slice_num=16,
)
pm = PipelinedModel(pp_cfg.build(), pp_mesh, num_microbatches=2,
                    dp_axis="dp")
pp_trainer = Trainer(
    model=pm,  # Trainer wiring is unchanged — the wrapper IS the model
    loss_fn=lambda out, b: (jnp.mean((out - b["y"]) ** 2), {}),
    cfg=TrainConfig(lr=1e-3, epochs=1, batch_size=8, schedule="constant"),
    total_steps=4,
    batch_args=lambda b: (b["x"], b["fx"]),
    mesh=pp_mesh,
)
pp_state = pp_trainer.init_state(jax.random.PRNGKey(0), make_batch())
layer_leaf = jax.tree_util.tree_leaves(pp_state.params["layers"])[0]
print(f"pp: layer stacks sharded {layer_leaf.sharding.spec} "
      f"({layer_leaf.shape[0]} layers over {pp_mesh.shape['pp']} stages)")
pp_state = pp_trainer.fit(pp_state, lambda: (make_batch() for _ in range(2)))
print("pipelined training OK")
