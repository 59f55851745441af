"""End-to-end learning check: a small HAET model must actually fit the
synthetic Darcy problem (guards against silent training breakage — dead
gradients, broken normalization, bad loss plumbing)."""

import numpy as np

import jax
import jax.numpy as jnp

from haet_tpu.data import batch_iter
from haet_tpu.data.synthetic import darcy_like
from haet_tpu.train import RelLpLoss, Trainer, UnitTransformer
from haet_tpu.utils.config import ModelConfig, TrainConfig


def test_darcy_synthetic_converges():
    s = 31
    pos, x, y = darcy_like(16, s, seed=0)

    x_norm = UnitTransformer(x)
    y_norm = UnitTransformer(y)
    train = {
        "pos": pos,
        "fx": x_norm.encode(x)[..., None].astype(np.float32),
        "y": y.astype(np.float32),
    }

    cfg = ModelConfig(variant="structured_2d", space_dim=2, fun_dim=1,
                      out_dim=1, n_layers=2, n_hidden=32, n_head=4,
                      slice_num=16, H=s, W=s)
    model = cfg.build()
    rel = RelLpLoss(size_average=False)
    y_mean = jnp.asarray(np.float32(y_norm.mean.squeeze()))
    y_std = jnp.asarray(np.float32(y_norm.std.squeeze()))

    def loss_fn(out, batch):
        out = out[..., 0] * y_std + y_mean
        l2 = rel(out, batch["y"]) / out.shape[0]
        return l2, {}

    trainer = Trainer(
        model=model, loss_fn=loss_fn,
        cfg=TrainConfig(lr=2e-3, epochs=12, batch_size=4,
                        schedule="onecycle"),
        total_steps=4 * 12,
        batch_args=lambda b: (b["pos"], b["fx"]),
    )
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:4] for k, v in train.items()})

    first = float(trainer.eval_step(state, train)["loss"])
    rng = jax.random.PRNGKey(1)
    for epoch in range(12):
        for batch in batch_iter(train, 4, True, epoch)():
            rng, sub = jax.random.split(rng)
            state, _ = trainer.train_step(state, batch, sub)
    last = float(trainer.eval_step(state, train)["loss"])

    assert np.isfinite(last)
    # 12 tiny-model epochs: expect a clear but not dramatic drop (the same
    # recipe reaches rel-L2 ~0.07 in 60 epochs on TPU at n_hidden=64).
    assert last < 0.8 * first, f"no learning: {first} -> {last}"
    # Golden gate pinned to the measured fixed-seed CPU trajectory
    # (first 0.6932 -> last 0.4870, measured round 3): 0.53 gives ~9%
    # headroom for XLA-version drift while catching any real numerics
    # regression the forward oracles might miss (train-mode-only paths).
    assert last < 0.53, f"regressed vs golden 0.487: {last}"
