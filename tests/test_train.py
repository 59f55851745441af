"""Training engine: losses, schedules, early stopping, end-to-end fit,
checkpoint resume."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from haet_tpu.train import (
    Checkpointer,
    EarlyStopping,
    RelLpLoss,
    Trainer,
    UnitGaussianNormalizer,
    UnitTransformer,
    central_diff,
)
from haet_tpu.utils.config import TrainConfig


def test_rel_lp_loss_matches_torch_testloss():
    """Oracle: the reference TestLoss.rel (testloss.py:31-45)."""
    rng = np.random.RandomState(0)
    x = rng.randn(4, 50).astype(np.float32)
    y = rng.randn(4, 50).astype(np.float32)

    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    diff = torch.norm(xt.reshape(4, -1) - yt.reshape(4, -1), 2, 1)
    ynorm = torch.norm(yt.reshape(4, -1), 2, 1)
    ref_mean = torch.mean(diff / ynorm).item()
    ref_sum = torch.sum(diff / ynorm).item()

    assert float(RelLpLoss()(jnp.asarray(x), jnp.asarray(y))) == pytest.approx(
        ref_mean, rel=1e-5)
    assert float(RelLpLoss(size_average=False)(jnp.asarray(x), jnp.asarray(y))
                 ) == pytest.approx(ref_sum, rel=1e-5)


def test_central_diff_matches_torch():
    """Oracle: reference exp_darcy.py:59-68."""
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    s = 8
    x = rng.randn(2, s * s, 1).astype(np.float32)
    h = 1.0 / s

    xt = torch.from_numpy(x).reshape(2, s, s, 1)
    xt = F.pad(xt, (0, 0, 1, 1, 1, 1), mode="constant", value=0.0)
    gx_ref = (xt[:, 1:-1, 2:, :] - xt[:, 1:-1, :-2, :]) / (2 * h)
    gy_ref = (xt[:, 2:, 1:-1, :] - xt[:, :-2, 1:-1, :]) / (2 * h)

    gx, gy = central_diff(jnp.asarray(x), h, s)
    np.testing.assert_allclose(np.asarray(gx), gx_ref.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), gy_ref.numpy(), rtol=1e-5)


def test_unit_transformer_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(10, 20).astype(np.float32) * 5 + 3
    ours = UnitTransformer(x)
    xt = torch.from_numpy(x)
    mean = xt.mean(dim=(0, 1), keepdim=True)
    std = xt.std(dim=(0, 1), keepdim=True) + 1e-8
    np.testing.assert_allclose(
        ours.encode(x), ((xt - mean) / std).numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours.decode(ours.encode(x)), x, rtol=1e-4,
                               atol=1e-4)


def test_unit_gaussian_normalizer_roundtrip():
    x = np.random.RandomState(3).randn(10, 7, 2).astype(np.float32)
    n = UnitGaussianNormalizer(x)
    np.testing.assert_allclose(n.decode(n.encode(x)), x, rtol=1e-4, atol=1e-4)


def test_early_stopping():
    es = EarlyStopping(patience=2)
    assert not es.update(1.0)
    assert not es.update(0.9)   # improvement
    assert not es.update(0.95)  # 1
    assert es.update(0.95)      # 2 -> stop
    assert es.should_stop


class TinyModel:
    """Linear-regression flax stand-in."""

    def __init__(self):
        from flax import linen as nn

        class M(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                return nn.Dense(1)(x)

        self.m = M()


def _make_trainer(total_steps=50, **cfg_kw):
    tm = TinyModel()
    cfg = TrainConfig(lr=1e-1, epochs=20, batch_size=8, schedule="constant",
                      weight_decay=0.0, **cfg_kw)
    return Trainer(
        model=tm.m,
        loss_fn=lambda out, b: (jnp.mean((out - b["y"]) ** 2), {}),
        cfg=cfg,
        total_steps=total_steps,
        batch_args=lambda b: (b["x"],),
    )


def _data(n=64):
    rng = np.random.RandomState(0)
    x = rng.randn(n, 4).astype(np.float32)
    y = (x @ np.array([[1.0], [2], [-1], [0.5]], np.float32)).astype(np.float32)
    return {"x": x, "y": y}


def test_trainer_fits_linear_problem():
    from haet_tpu.data import batch_iter

    trainer = _make_trainer()
    d = _data()
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:8] for k, v in d.items()})
    from haet_tpu.train import MetricsLogger

    state = trainer.fit(
        state, batch_iter(d, 8, True, 0),
        logger=MetricsLogger(echo=False),
    )
    final = float(trainer.eval_step(state, d)["loss"])
    assert final < 0.05


def test_checkpoint_resume(tmp_path):
    trainer = _make_trainer()
    d = _data()
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:8] for k, v in d.items()})
    state, _ = trainer.train_step(state, d, jax.random.PRNGKey(1))
    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save_last(state, 0)
    ck.wait()
    restored = ck.restore(jax.tree_util.tree_map(np.asarray, state))
    assert restored is not None
    np.testing.assert_allclose(
        np.asarray(restored.params["Dense_0"]["kernel"]),
        np.asarray(state.params["Dense_0"]["kernel"]),
    )
    assert int(restored.step) == 1


def test_onecycle_matches_torch():
    """VALUE-level parity of schedule='onecycle' with
    torch.optim.lr_scheduler.OneCycleLR across the whole horizon — both
    the LR cycle AND torch's default cycle_momentum beta1 cycle
    (max_momentum 0.95 -> base_momentum 0.85 -> 0.95). Every reference
    run trains under exactly this scheduler (train.py:211-216 with
    final_div_factor=1000; exp_darcy.py:138-139 with the torch defaults),
    so this is the last schedule the framework had only shape-tested."""
    from haet_tpu.train.trainer import _onecycle_phased, make_schedule

    for total_steps, pct, fdiv in [
        (100, 0.3, 1e4),       # PDE-driver defaults
        (37, 0.3, 1000.0),     # car run's final_div_factor=1000
        (500, 0.1, 1e4),       # long decay tail (f32 floor stress)
        (7, 0.5, 1e4),         # sub-step warmup boundary (warm_end=2.5)
    ]:
        cfg = TrainConfig(lr=1e-3, schedule="onecycle", pct_start=pct,
                          final_div_factor=fdiv)
        sched = make_schedule(cfg, total_steps)
        b1 = _onecycle_phased(total_steps, cfg.max_momentum,
                              cfg.base_momentum, cfg.max_momentum, pct)

        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=1e-3)
        tsched = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=1e-3, total_steps=total_steps, pct_start=pct,
            final_div_factor=fdiv)
        for step in range(total_steps):
            # values used AT optimizer step `step` (scheduler.step() runs
            # after optimizer.step(), so the group holds step's values)
            torch_lr = opt.param_groups[0]["lr"]
            torch_b1 = opt.param_groups[0]["betas"][0]
            np.testing.assert_allclose(
                float(sched(step)), torch_lr, rtol=2e-4, atol=1e-13,
                err_msg=f"lr at step {step}/{total_steps}")
            np.testing.assert_allclose(
                float(b1(step)), torch_b1, rtol=1e-6, atol=1e-7,
                err_msg=f"beta1 at step {step}/{total_steps}")
            opt.step()
            tsched.step()


def test_adamw_weight_decay_skips_sigma_att():
    """torch.optim skips None-grad params entirely (sigma_att is only used
    under @torch.no_grad, reference attention.py:27-33) — so AdamW's
    decoupled weight decay must NOT shrink sigma_att here either, while
    ordinary zero-grad leaves still decay."""
    import optax

    from haet_tpu.train import make_optimizer

    cfg = TrainConfig(lr=1e-2, weight_decay=1e-1, schedule="constant",
                      optimizer="adamw")
    tx = make_optimizer(cfg, total_steps=10)
    params = {"blocks_0": {"Attn": {"sigma_att": jnp.ones((1, 2, 1, 1))}},
              "w": jnp.ones((3,))}
    st = tx.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    for _ in range(5):
        upd, st = tx.update(zeros, st, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_array_equal(
        np.asarray(params["blocks_0"]["Attn"]["sigma_att"]), 1.0)
    assert float(jnp.max(params["w"])) < 1.0  # ordinary leaf does decay


def test_trajectory_parity_vs_torch(monkeypatch):
    """K coupled optimizer steps of a small FULL HAET model vs the torch
    oracle driven by REAL torch.optim.AdamW + OneCycleLR (default
    cycle_momentum): identical weights, identical batch stream, per-step
    losses and final parameters must agree at f32 tolerance.

    This closes the last untested layer between "gradients match"
    (test_full_model_oracle) and "a 200-epoch run matches": the
    optimizer/schedule coupling — eps placement, decoupled weight decay,
    bias correction under a CYCLED beta1, OneCycle geometry — all
    interacting across steps (reference train.py:210-216,
    exp_darcy.py:132-139)."""
    import optax
    import test_full_model_oracle as oracle

    from haet_tpu.train import make_optimizer

    rng = np.random.RandomState(3)
    B, N = 2, 64
    K = 24
    erwin_cfg = dict(heads=(1, 2), dec_heads=(1,), ball_sizes=(8, 4),
                     strides=(2,), depths=(2, 2), dec_depths=(2,))
    from haet_tpu.models import HAETransolverIrregularMesh

    model = HAETransolverIrregularMesh(
        space_dim=3, fun_dim=1, n_layers=2, n_hidden=16, n_head=2,
        slice_num=16, mlp_ratio=1, ball_sizes=(8, 4), enc_num_heads=(1, 2),
        enc_depths=(2, 2), dec_num_heads=(1,), dec_depths=(2,),
        strides=(2,), rotate=45, out_dim=3)

    # positions fixed across steps (so the captured grouping perms stay
    # valid for every torch forward); fx / targets vary per step
    x_np = rng.rand(B, N, 3).astype(np.float32)
    fx_np = rng.randn(K, B, N, 1).astype(np.float32)
    y_np = rng.randn(K, B, N, 3).astype(np.float32)
    x = jnp.asarray(x_np)

    v = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.asarray(fx_np[0]))
    params, batch_stats = v["params"], v["batch_stats"]

    cfg = TrainConfig(lr=3e-3, weight_decay=1e-2, optimizer="adamw",
                      schedule="onecycle", pct_start=0.3)
    tx = make_optimizer(cfg, total_steps=K)
    opt_state = tx.init(params)

    captured = oracle._capture_perms(monkeypatch)
    model.apply({"params": params, "batch_stats": batch_stats},
                x, jnp.asarray(fx_np[0]))  # eager: record the perms
    assert len(captured) == 2

    # FREEZE the grouping on the jax side too: the Erwin perms depend on
    # the slice pseudo-positions, i.e. on the PARAMS — as they drift over
    # K steps a median split can flip two tokens, a discrete jump the
    # frozen-perm torch oracle cannot follow. Replaying the step-0 perms
    # on both sides makes the trajectories comparable; the grouping
    # construction itself is oracle-tested in test_ball_groups.py.
    import haet_tpu.models.erwin as erwin_mod

    calls = [0]

    def replay(pos, **kw):
        p = captured[calls[0] % len(captured)]
        calls[0] += 1
        return p

    monkeypatch.setattr(erwin_mod, "build_erwin_perms", replay)

    @jax.jit
    def step(params, batch_stats, opt_state, fx, y):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, fx,
                train=True, mutable=["batch_stats"])
            return jnp.mean((out - y) ** 2), upd["batch_stats"]

        (l, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, l, grads

    losses_jax = []
    g0 = None
    for k in range(K):
        params, batch_stats, opt_state, l, g = step(
            params, batch_stats, opt_state,
            jnp.asarray(fx_np[k]), jnp.asarray(y_np[k]))
        losses_jax.append(float(l))
        if k == 0:
            g0 = jax.tree_util.tree_map(np.asarray, g)

    # ---- torch: the SAME trajectory under real torch.optim ----
    tp = oracle.to_torch_tree(jax.tree_util.tree_map(np.asarray,
                                                     v["params"]))
    leaves = [leaf for _, leaf in oracle.flat_items(tp)]
    opt = torch.optim.AdamW(leaves, lr=cfg.lr,
                            weight_decay=cfg.weight_decay)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=cfg.lr, total_steps=K, pct_start=cfg.pct_start)
    xt = torch.from_numpy(x_np)
    losses_t = []
    for k in range(K):
        out = oracle.torch_haet_b(
            xt, torch.from_numpy(fx_np[k]), tp, captured,
            variant="linear", n_layers=2, heads=2, g=16, dim=16,
            erwin_cfg=erwin_cfg, hw=None, always_placeholder=True,
            train=True)
        loss = ((out - torch.from_numpy(y_np[k])) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        tsched.step()
        losses_t.append(float(loss.detach()))

    # per-step loss trajectory (divergence compounds; f32 tolerance)
    np.testing.assert_allclose(losses_jax, losses_t, rtol=2e-3, atol=1e-6)

    # Final parameters, whole tree. Adam normalizes updates to O(lr)
    # regardless of gradient size, so a leaf whose gradient is f32
    # roundoff takes O(lr) steps whose SIGN is noise — those leaves
    # random-walk apart on ANY pair of implementations and only admit the
    # loose |diff| <= lr*K bound. Leaves carrying real signal
    # (>= 1e-3 of the max step-0 gradient — 70+ leaves here, every
    # projection/attention kernel among them) must track torch to within
    # a few percent of their own total movement (measured headroom ~3x).
    flat_j = dict(oracle.flat_items(
        jax.tree_util.tree_map(np.asarray, params)))
    flat_t = dict(oracle.flat_items(tp))
    flat_0 = dict(oracle.flat_items(
        jax.tree_util.tree_map(np.asarray, v["params"])))
    flat_g = dict(oracle.flat_items(g0))
    assert set(flat_j) == set(flat_t)
    gmax = max(np.abs(g).max() for g in flat_g.values())
    n_signal = 0
    for path, pj in flat_j.items():
        pt = flat_t[path].detach().numpy()
        diff = np.abs(pj - pt).max()
        assert diff <= cfg.lr * K, (
            f"param diverged beyond the Adam random-walk bound at "
            f"{'/'.join(path)}: {diff}")
        if np.abs(flat_g[path]).max() < 1e-3 * gmax:
            continue
        move = max(np.abs(pj - flat_0[path]).max(),
                   np.abs(pt - flat_0[path]).max(), 1e-8)
        assert diff <= 0.04 * move + 1e-6, (
            f"signal-leaf drift after {K} steps at {'/'.join(path)}: "
            f"diff={diff:.3e} vs movement={move:.3e}")
        n_signal += 1
    assert n_signal > 50  # the tight check covers a real share of the tree
    # sigma_att specifically must be BIT-constant on both sides (torch
    # skips the None-grad param; the optax wd mask + zero grads match it)
    for path, p0 in oracle.flat_items(
            jax.tree_util.tree_map(np.asarray, v["params"])):
        if path[-1] == "sigma_att":
            np.testing.assert_array_equal(flat_j[path], p0)
            np.testing.assert_array_equal(
                flat_t[path].detach().numpy(), p0)


def test_onecycle_schedule_shape():
    """The PRODUCT's make_schedule wiring (reference exp_darcy.py:132-139:
    OneCycle, pct_start, div_factor 25, final_div 1e4) — not a locally
    rebuilt optax schedule."""
    from haet_tpu.train.trainer import make_schedule

    cfg = TrainConfig(lr=1e-3, schedule="onecycle", pct_start=0.3)
    sched = make_schedule(cfg, total_steps=100)
    # warmup then decay: peak cfg.lr at pct_start*total, low at both ends
    assert float(sched(30)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(0)) == pytest.approx(1e-3 / 25.0, rel=1e-2)
    assert float(sched(0)) < float(sched(30))
    assert float(sched(99)) < float(sched(30)) / 100

    # and the optimizer actually applies it: lr=0 schedule -> zero update
    from haet_tpu.train import make_optimizer

    cfg0 = TrainConfig(lr=0.0, schedule="constant")
    tx = make_optimizer(cfg0, total_steps=10)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    upd, _ = tx.update({"w": jnp.ones((3,))}, st, params)
    assert float(jnp.max(jnp.abs(upd["w"]))) == 0.0


def test_onecycle_finite_at_tiny_horizons():
    """optax's cosine_onecycle divides by a zero-length phase when
    pct_start*total_steps rounds to 0 and returns NaN LR for EVERY step
    (observed at total_steps=2) — make_schedule must stretch tiny horizons
    instead of silently NaN-ing the params."""
    from haet_tpu.train import make_schedule

    cfg = TrainConfig(lr=1e-3, schedule="onecycle")
    for total_steps in (1, 2, 3, 4, 100):
        sched = make_schedule(cfg, total_steps)
        for step in range(max(total_steps, 4)):
            lr = float(sched(step))
            assert np.isfinite(lr) and 0.0 <= lr <= cfg.lr * 1.001, (
                total_steps, step, lr)

    # the endpoints are config errors: 0.0 is optax's NaN divide at any
    # horizon, 1.0 silently collapses to decay-only at peak/25 (boundary
    # dict-key collision inside optax)
    for bad in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="pct_start"):
            make_schedule(TrainConfig(lr=1e-3, schedule="onecycle",
                                      pct_start=bad), 100)


def test_cosine_annealing_matches_torch_per_batch_stepping():
    """schedule='cosine_annealing' reproduces the reference exp_elas LR
    trajectory: torch CosineAnnealingLR(T_max=epochs) stepped once per
    BATCH (exp_elas.py:128,226), i.e. an oscillation with period
    2*t_max optimizer steps — including past the first period."""
    import torch

    from haet_tpu.train.trainer import make_schedule

    t_max, lr = 7, 1e-3
    cfg = TrainConfig(lr=lr, schedule="cosine_annealing", t_max=t_max)
    sched = make_schedule(cfg, total_steps=1000)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=t_max)
    for step in range(4 * t_max):  # two full oscillations
        torch_lr = opt.param_groups[0]["lr"]  # lr used AT this step
        np.testing.assert_allclose(float(sched(step)), torch_lr,
                                   rtol=1e-6, atol=1e-12, err_msg=f"step {step}")
        opt.step()
        tsched.step()

    # t_max defaults to the run's total step count when unset
    cfg2 = TrainConfig(lr=lr, schedule="cosine_annealing")
    s2 = make_schedule(cfg2, total_steps=50)
    assert float(s2(0)) == pytest.approx(lr)
    assert float(s2(50)) == pytest.approx(0.0, abs=1e-12)


def test_mu_bf16_moments_dtype_and_numerics():
    """mu_bf16=True stores Adam's first moment in bfloat16 (the optimizer-
    state HBM lever) while keeping nu in f32, and a short train run stays
    close to the f32-moment trajectory."""
    import optax

    from haet_tpu.train import make_optimizer

    def run(mu_bf16):
        cfg = TrainConfig(lr=1e-2, schedule="constant", mu_bf16=mu_bf16,
                          weight_decay=0.0)
        tx = make_optimizer(cfg, total_steps=20)
        params = {"w": jnp.linspace(-1.0, 1.0, 64).reshape(8, 8)}
        st = tx.init(params)
        leaves = jax.tree_util.tree_leaves(
            st, is_leaf=lambda x: hasattr(x, "dtype"))
        dtypes = {l.dtype for l in leaves if hasattr(l, "dtype")
                  and l.shape == (8, 8)}
        for _ in range(20):
            g = {"w": params["w"] * 0.1 + 0.01}
            upd, st = tx.update(g, st, params)
            params = optax.apply_updates(params, upd)
        return params, dtypes

    p32, d32 = run(False)
    pbf, dbf = run(True)
    bf16, f32 = np.dtype(jnp.bfloat16), np.dtype(jnp.float32)
    assert bf16 in dbf and bf16 not in d32
    assert f32 in dbf  # nu stays f32
    np.testing.assert_allclose(np.asarray(pbf["w"]),
                               np.asarray(p32["w"]), rtol=0, atol=5e-3)


def test_train_steps_scan_matches_sequential():
    """K steps in one scanned program == K dispatched train_step calls
    (same rng split sequence)."""
    d = _data(32)
    batches = [{k: v[i * 8:(i + 1) * 8] for k, v in d.items()}
               for i in range(4)]
    rng = jax.random.PRNGKey(7)

    t1 = _make_trainer()
    s1 = t1.init_state(jax.random.PRNGKey(0), batches[0])
    s1, metrics = t1.train_steps(s1, batches, rng)
    assert metrics["loss"].shape == (4,)

    t2 = _make_trainer()
    s2 = t2.init_state(jax.random.PRNGKey(0), batches[0])
    r = rng
    seq_losses = []
    for b in batches:
        r, sub = jax.random.split(r)
        s2, m = t2.train_step(s2, b, sub)
        seq_losses.append(float(m["loss"]))

    assert int(s1.step) == int(s2.step) == 4
    np.testing.assert_allclose(np.asarray(metrics["loss"]),
                               np.asarray(seq_losses), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fit_observability_metrics(tmp_path):
    """Trainer.fit logs the reference's metric names (train.py:109-137):
    per-epoch train/avg_batch_time, train/memory_used_mb,
    train/learning_rate, plus grad_norm (the wandb.watch analogue); and
    per-batch batch/* records when batch_log_every is set."""
    import json as _json

    from haet_tpu.data import batch_iter
    from haet_tpu.train import MetricsLogger

    trainer = _make_trainer()
    trainer.batch_log_every = 1
    d = _data(16)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:8] for k, v in d.items()})
    log_path = str(tmp_path / "metrics.jsonl")
    state = trainer.fit(
        state, batch_iter(d, 8, True, 0), epochs=2,
        logger=MetricsLogger(path=log_path, echo=False),
    )
    recs = [_json.loads(line) for line in open(log_path)]
    epoch_recs = [r for r in recs if "epoch" in r]
    batch_recs = [r for r in recs if "batch/total_loss" in r]
    assert len(epoch_recs) == 2 and batch_recs
    for key in ("train/avg_batch_time", "train/memory_used_mb",
                "train/learning_rate", "train/grad_norm", "train/loss",
                "epoch/time_seconds"):
        assert key in epoch_recs[-1], key
    assert epoch_recs[-1]["train/memory_used_mb"] > 0
    for key in ("batch/total_loss", "batch/learning_rate",
                "batch/memory_used_mb", "batch/batch_time",
                "batch/eta_seconds"):
        assert key in batch_recs[0], key
    # the logged LR is the one the optimizer APPLIED (sched(step-1) after
    # the in-step increment), matching torch get_last_lr() semantics —
    # the very first batch record must carry sched(0), not sched(1)
    assert batch_recs[0]["batch/learning_rate"] == pytest.approx(
        float(trainer.sched(0)))


def test_periodic_checkpoints_and_keep(tmp_path):
    """checkpoint_every saves epoch_{N} snapshots, pruned to `keep`
    (reference exp_darcy.py:259-263); latest_periodic restores and resumes."""
    from haet_tpu.data import batch_iter
    from haet_tpu.train import MetricsLogger

    trainer = _make_trainer(checkpoint_every=1)
    d = _data(16)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:8] for k, v in d.items()})
    ck = Checkpointer(str(tmp_path / "ck"), keep=2)
    state = trainer.fit(
        state, batch_iter(d, 8, True, 0), epochs=5,
        logger=MetricsLogger(echo=False), checkpointer=ck,
    )
    ck.wait()
    assert ck.periodic_epochs() == [3, 4]  # keep=2 pruned 0..2
    template = jax.tree_util.tree_map(np.asarray, state)
    restored = ck.restore(template, "latest_periodic")
    assert restored is not None and int(restored.step) == int(state.step)
    # epoch_3 restorable by name too
    assert ck.restore(template, "epoch_3") is not None
    assert ck.restore(template, "epoch_0") is None


def test_best_val_survives_restart(tmp_path):
    """A restart must not regress the best checkpoint: after resuming, a
    worse eval may not overwrite `best` (reference train.py:250-259 keeps
    best monotone within a run; with true mid-training resume the watermark
    must persist across runs too)."""
    trainer = _make_trainer()
    d = _data()
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:8] for k, v in d.items()})
    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save_best(state, val_loss=0.10, epoch=3)
    ck.wait()
    assert ck.best_val == pytest.approx(0.10)

    # "restart" + resume: re-arm from the sidecar meta (this is what
    # Trainer.maybe_restore does on the --resume path)
    ck2 = Checkpointer(str(tmp_path / "ck"))
    assert ck2.best_val == float("inf")  # construction alone stays fresh
    assert ck2.rearm_best()
    assert ck2.best_val == pytest.approx(0.10)
    assert ck2.best_epoch == 3

    # a worse post-restart eval must NOT overwrite best
    worse_state = state.replace(step=state.step + 100)
    ck2.save_best(worse_state, val_loss=0.50, epoch=4)
    ck2.wait()
    template = jax.tree_util.tree_map(np.asarray, state)
    best = ck2.restore(template, "best")
    assert int(best.step) == int(state.step)  # still the pre-restart state

    # a genuinely better eval still advances the watermark
    ck2.save_best(worse_state, val_loss=0.05, epoch=5)
    ck2.wait()
    best = ck2.restore(template, "best")
    assert int(best.step) == int(worse_state.step)
    ck3 = Checkpointer(str(tmp_path / "ck"))
    assert ck3.rearm_best() and ck3.best_val == pytest.approx(0.05)


def test_fresh_run_into_existing_dir_overwrites_best(tmp_path):
    """A from-scratch rerun (no resume) into an existing run directory must
    NOT inherit the previous run's watermark — its own best must win even
    if numerically worse than the stale one."""
    trainer = _make_trainer()
    d = _data()
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:8] for k, v in d.items()})
    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save_best(state, val_loss=0.07, epoch=9)
    ck.wait()

    # second run, same directory, NOT resuming: starts at inf
    ck2 = Checkpointer(str(tmp_path / "ck"))
    new_state = state.replace(step=state.step + 100)
    ck2.save_best(new_state, val_loss=0.50, epoch=0)  # worse than stale 0.07
    ck2.wait()
    template = jax.tree_util.tree_map(np.asarray, state)
    best = ck2.restore(template, "best")
    assert int(best.step) == int(new_state.step)  # this run's best won


def test_rearm_best_ignores_stale_meta_without_checkpoint(tmp_path):
    """best_meta.json without a finalized `best` checkpoint behind it (crash
    between meta write and orbax finalize cannot happen anymore, but stale
    dirs can) must not arm the watermark."""
    import json as _json

    d = tmp_path / "ck"
    d.mkdir()
    (d / "best_meta.json").write_text(
        _json.dumps({"best_val": 0.01, "best_epoch": 1}))
    ck = Checkpointer(str(d))
    assert not ck.rearm_best()
    assert ck.best_val == float("inf")


def test_watch_every_logs_per_leaf_grad_norms(tmp_path):
    """watch_every=K logs gradients/{leaf path} L2 norms every K epochs —
    the analogue of the reference's wandb.watch (train.py:192-208)."""
    import json as _json

    from haet_tpu.data import batch_iter
    from haet_tpu.train import MetricsLogger

    trainer = _make_trainer()
    trainer.watch_every = 2
    d = _data(16)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:8] for k, v in d.items()})
    log_path = str(tmp_path / "metrics.jsonl")
    state = trainer.fit(state, batch_iter(d, 8, True, 0), epochs=4,
                        logger=MetricsLogger(path=log_path, echo=False))
    recs = [_json.loads(line) for line in open(log_path)]
    epoch_recs = {r["epoch"]: r for r in recs if "epoch" in r}
    grad_keys = [k for k in epoch_recs[1] if k.startswith("gradients/")]
    assert any("kernel" in k for k in grad_keys)
    assert any("bias" in k for k in grad_keys)
    assert all(np.isfinite(epoch_recs[1][k]) and epoch_recs[1][k] >= 0
               for k in grad_keys)
    # only on multiples of watch_every
    assert not any(k.startswith("gradients/") for k in epoch_recs[0])
    assert any(k.startswith("gradients/") for k in epoch_recs[3])

    # the per-leaf norms are consistent with the fused-step global grad_norm
    rng = jax.random.PRNGKey(5)
    batch = {k: v[:8] for k, v in d.items()}
    leaf = trainer.grad_leaf_norms(state, batch, rng)
    _, m = trainer.train_step(state, batch, rng)
    global_from_leaves = float(np.sqrt(sum(v ** 2 for v in leaf.values())))
    assert global_from_leaves == pytest.approx(float(m["grad_norm"]),
                                               rel=1e-4)


def test_prefetcher_matches_plain_iteration():
    """Prefetcher preserves order/content across multiple passes and
    propagates producer exceptions."""
    import pytest

    from haet_tpu.data import Prefetcher, batch_iter

    d = _data(32)
    plain = batch_iter(d, 8, True, 3)
    pre = Prefetcher(batch_iter(d, 8, True, 3), depth=2)
    for _ in range(2):  # multi-epoch reuse
        a = list(plain())
        b = list(pre())
        assert len(a) == len(b) == 4
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["x"], y["x"])
            np.testing.assert_array_equal(x["y"], y["y"])

    def boom():
        yield {"x": 1}
        raise RuntimeError("producer died")

    with pytest.raises(RuntimeError, match="producer died"):
        list(Prefetcher(boom)())


def test_trainer_fit_with_prefetcher():
    from haet_tpu.data import Prefetcher, batch_iter
    from haet_tpu.train import MetricsLogger

    trainer = _make_trainer()
    d = _data(32)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:8] for k, v in d.items()})
    state = trainer.fit(
        state, Prefetcher(batch_iter(d, 8, True, 0)), epochs=3,
        logger=MetricsLogger(echo=False),
    )
    final = float(trainer.eval_step(state, d)["loss"])
    assert np.isfinite(final)


def test_early_stop_still_saves_last_checkpoint(tmp_path):
    """When early stopping breaks the epoch loop, the final epoch's state
    must still reach 'last' — or resume would silently lose it."""
    from haet_tpu.data import batch_iter

    import json as _json

    from haet_tpu.train import MetricsLogger

    # a huge min_delta makes every improvement count as "no improvement",
    # so patience=1 forces the stop on the second eval
    trainer = _make_trainer(early_stop_patience=1, early_stop_min_delta=1e9)
    d = _data()
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:8] for k, v in d.items()})
    ck = Checkpointer(str(tmp_path / "ck"))
    log_path = str(tmp_path / "m.jsonl")
    final = trainer.fit(
        state, batch_iter(d, 8, shuffle=False),
        eval_batches=batch_iter(d, 8, shuffle=False),
        epochs=10, checkpointer=ck,
        logger=MetricsLogger(path=log_path, echo=False),
    )
    recs = [_json.loads(line) for line in open(log_path)]
    assert any(r.get("early_stop") for r in recs)  # the stop DID trigger
    assert int(final.step) < 10 * 8  # and the loop really broke early
    ck.wait()
    template = jax.tree_util.tree_map(np.asarray, final)
    last = ck.restore(template, "last")
    assert last is not None
    assert int(last.step) == int(final.step)  # the epoch that triggered the stop


# -- divergence guard -----------------------------------------------------

def test_fit_aborts_on_nonfinite_loss(tmp_path):
    """A NaN training loss aborts fit() loudly (diverged params never
    recover), saving the NaN state under 'diverged' for forensics —
    NOT under 'last', which must keep pointing at the last GOOD state
    (clobbering it would make the run unsalvageable when no periodic or
    best checkpoints exist)."""
    from haet_tpu.train import Checkpointer

    tm = TinyModel()
    cfg = TrainConfig(lr=1e-3, epochs=5, batch_size=8, schedule="constant",
                      weight_decay=0.0)
    trainer = Trainer(
        model=tm.m,
        # loss is NaN from step one: sqrt of a negative sum
        loss_fn=lambda out, b: (jnp.sqrt(-jnp.sum(out ** 2) - 1.0), {}),
        cfg=cfg, total_steps=10,
        batch_args=lambda b: (b["x"],),
    )
    d = _data(8)
    state = trainer.init_state(jax.random.PRNGKey(0), d)
    ck = Checkpointer(str(tmp_path))
    with pytest.raises(FloatingPointError, match="diverged"):
        trainer.fit(state, lambda: [d], checkpointer=ck)
    # the diverged state exists for inspection...
    template = trainer.init_state(jax.random.PRNGKey(0), d)
    assert ck.restore(template, "diverged") is not None
    # ...and 'last' was NOT overwritten with NaN params (nothing good
    # was ever saved here, so it must simply not exist)
    assert ck.restore_raw("last") is None


def test_fit_nonfinite_guard_can_be_disabled():
    tm = TinyModel()
    cfg = TrainConfig(lr=1e-3, epochs=2, batch_size=8, schedule="constant",
                      weight_decay=0.0, stop_on_nonfinite=False)
    trainer = Trainer(
        model=tm.m,
        loss_fn=lambda out, b: (jnp.sqrt(-jnp.sum(out ** 2) - 1.0), {}),
        cfg=cfg, total_steps=10,
        batch_args=lambda b: (b["x"],),
    )
    d = _data(8)
    state = trainer.init_state(jax.random.PRNGKey(0), d)
    out = trainer.fit(state, lambda: [d])  # must complete without raising
    assert int(out.step) == 2


# -- gradient accumulation ------------------------------------------------

def test_accum_step_equals_full_batch_step():
    """accum_steps=A with a mean-reduced loss produces EXACTLY the
    full-batch gradient (mean of per-microbatch mean-grads), so one
    optimizer step must match the plain path bit-for-bit-ish (f32)."""
    t_full = _make_trainer()
    t_accum = _make_trainer(accum_steps=4)
    d = _data(8)
    batch = {k: v[:8] for k, v in d.items()}
    s1 = t_full.init_state(jax.random.PRNGKey(0), batch)
    s2 = t_accum.init_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(7)

    s1, m1 = t_full.train_step(s1, batch, rng)
    s2, m2 = t_accum.train_step(s2, batch, rng)

    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-6)
    assert float(m2["grad_norm"]) == pytest.approx(
        float(m1["grad_norm"]), rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s1.params, s2.params)
    assert int(s2.step) == 1


def test_accum_step_batchnorm_stats_chain_sequentially():
    """BatchNorm running stats under accumulation must equal applying the
    microbatches one after another (sequential-small-batch semantics)."""
    from flax import linen as nn

    class BNModel(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Dense(3)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            return nn.Dense(1)(x)

    m = BNModel()
    cfg = TrainConfig(lr=0.0, epochs=1, batch_size=8, schedule="constant",
                      weight_decay=0.0, optimizer="adam", accum_steps=2)
    trainer = Trainer(
        model=m,
        loss_fn=lambda out, b: (jnp.mean((out - b["y"]) ** 2), {}),
        cfg=cfg, total_steps=10,
        batch_args=lambda b: (b["x"],),
    )
    d = _data(8)
    state = trainer.init_state(jax.random.PRNGKey(0), d)
    # snapshot before train_step: the jitted step donates (deletes) state
    params0 = jax.tree_util.tree_map(np.asarray, state.params)
    bs = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    new_state, _ = trainer.train_step(state, d, jax.random.PRNGKey(1))

    # oracle: run the two microbatches sequentially through raw apply
    for mb in (jax.tree_util.tree_map(lambda x: x[:4], d),
               jax.tree_util.tree_map(lambda x: x[4:], d)):
        _, upd = m.apply({"params": params0, "batch_stats": bs},
                         mb["x"], train=True, mutable=["batch_stats"])
        bs = upd["batch_stats"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        new_state.batch_stats, bs)


def test_accum_composes_with_train_steps_scan():
    """accum_steps inside the K-step train_steps scan (scan-in-scan): K
    scanned accumulated steps == K dispatched accumulated train_step
    calls == K plain full-batch steps (BN-free model, exact grads)."""
    d = _data(16)
    batches = [{k: v[i * 8:(i + 1) * 8] for k, v in d.items()}
               for i in range(2)]
    rng = jax.random.PRNGKey(3)

    t1 = _make_trainer(accum_steps=2)
    s1 = t1.init_state(jax.random.PRNGKey(0), batches[0])
    s1, metrics = t1.train_steps(s1, batches, rng)
    assert metrics["loss"].shape == (2,)

    t2 = _make_trainer(accum_steps=2)
    s2 = t2.init_state(jax.random.PRNGKey(0), batches[0])
    t3 = _make_trainer()  # plain full-batch oracle
    s3 = t3.init_state(jax.random.PRNGKey(0), batches[0])
    r = rng
    for b in batches:
        r, sub = jax.random.split(r)
        s2, m2 = t2.train_step(s2, b, sub)
        s3, _ = t3.train_step(s3, b, sub)

    assert int(s1.step) == int(s2.step) == 2
    for a, b, c in zip(jax.tree_util.tree_leaves(s1.params),
                       jax.tree_util.tree_leaves(s2.params),
                       jax.tree_util.tree_leaves(s3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)


def test_accum_steps_must_divide_batch():
    trainer = _make_trainer(accum_steps=3)
    d = _data(8)
    state = trainer.init_state(jax.random.PRNGKey(0), d)
    with pytest.raises(ValueError, match="accum_steps"):
        trainer.train_step(state, d, jax.random.PRNGKey(1))


@pytest.mark.parametrize("bad", [0, -2])
def test_accum_steps_must_be_positive(bad):
    """0 / negative accum_steps must error loudly, not silently run the
    plain full-batch path (the exact OOM accumulation exists to avoid)."""
    trainer = _make_trainer(accum_steps=bad)
    d = _data(8)
    state = trainer.init_state(jax.random.PRNGKey(0), d)
    with pytest.raises(ValueError, match="accum_steps"):
        trainer.train_step(state, d, jax.random.PRNGKey(1))


def test_grad_leaf_norms_honors_accum():
    """The watch_every probe must microbatch like the train step (a
    full-batch probe would OOM exactly where accumulation is needed) and,
    on a BN-free model, match the plain full-batch leaf norms exactly."""
    t_plain = _make_trainer()
    t_accum = _make_trainer(accum_steps=4)
    d = _data(8)
    s1 = t_plain.init_state(jax.random.PRNGKey(0), d)
    s2 = t_accum.init_state(jax.random.PRNGKey(0), d)
    rng = jax.random.PRNGKey(11)
    n1 = t_plain.grad_leaf_norms(s1, d, rng)
    n2 = t_accum.grad_leaf_norms(s2, d, rng)
    assert n1.keys() == n2.keys()
    for k in n1:
        assert n2[k] == pytest.approx(n1[k], rel=1e-5, abs=1e-7), k


def test_resume_epoch_stored_not_derived(tmp_path):
    """The epoch number is STORED with each checkpoint (epochs.json
    sidecar, validated against the saved step) and resume continues from
    it exactly — the legacy derivation step//(total_steps//epochs) drifts
    whenever drop_last=False trailing batches make steps-per-epoch uneven
    (here: 10 samples / batch 4 = 3 steps/epoch vs a nominal total_steps
    of 2/epoch), shifting checkpoint_every/eval_every phase after a
    restart. Reference behavior preserved: epoch-numbered saves,
    train.py:250-259."""
    from haet_tpu.data import batch_iter
    from haet_tpu.train.trainer import MetricsLogger

    d = _data(10)

    t1 = _make_trainer(total_steps=8)  # nominal 2 steps/epoch — WRONG
    s1 = t1.init_state(jax.random.PRNGKey(0),
                       {k: v[:4] for k, v in d.items()})
    ckpt = Checkpointer(str(tmp_path))
    s1 = t1.fit(s1, batch_iter(d, 4, True, 0), epochs=2,
                logger=MetricsLogger(echo=False), checkpointer=ckpt)
    assert int(s1.step) == 6  # 3 actual steps/epoch * 2 epochs
    assert ckpt.epoch_of("last", 6) == 1
    # a crash-torn sidecar (step mismatch) reads as unknown
    assert ckpt.epoch_of("last", 5) is None

    t2 = _make_trainer(total_steps=8)
    s2 = t2.init_state(jax.random.PRNGKey(0),
                       {k: v[:4] for k, v in d.items()})
    s2 = t2.maybe_restore(s2, Checkpointer(str(tmp_path)))
    assert int(s2.step) == 6

    logged = []

    class Capture:
        def log(self, rec):
            logged.append(rec)

    t2.fit(s2, batch_iter(d, 4, True, 0), epochs=4, logger=Capture(),
           checkpointer=Checkpointer(str(tmp_path)))
    first_epoch = next(r["epoch"] for r in logged if "epoch" in r)
    # stored epoch resumes at 2; the legacy derivation would say
    # 6 // (8 // 4) = 3 and silently skip an epoch
    assert first_epoch == 2
    assert [r["epoch"] for r in logged if "epoch" in r] == [2, 3]


def test_corrupted_checkpoint_error_names_cause(tmp_path):
    """A corrupt/partial checkpoint must surface as itself — not as the
    pp-layout-mismatch diagnosis and not as a silent topology fallback
    (VERDICT r3 weak #6)."""
    import shutil

    trainer = _make_trainer()
    d = _data(8)
    state = trainer.init_state(jax.random.PRNGKey(0), d)
    ckpt = Checkpointer(str(tmp_path))
    ckpt.save_last(state, epoch=0)
    ckpt.wait()

    # gut the checkpoint: keep the directory (so it "exists") but destroy
    # its contents
    last = tmp_path / "last"
    for child in last.iterdir():
        if child.is_dir():
            shutil.rmtree(child)
        else:
            child.unlink()

    with pytest.raises(Exception) as ei:
        ckpt.restore_raw("last")
    msg = str(ei.value)
    assert "could not be read" in msg or "corrupt" in msg.lower() or \
        "last" in msg  # names the real path/cause, not a layout story

    # maybe_restore: the ORIGINAL restore error must propagate (no
    # pp-layout message for a plain model with a gutted checkpoint)
    t2 = _make_trainer()
    s2 = t2.init_state(jax.random.PRNGKey(0), d)
    with pytest.raises(Exception) as ei2:
        t2.maybe_restore(s2, Checkpointer(str(tmp_path)))
    assert "cannot resume" not in str(ei2.value)


def test_metrics_logger_close(tmp_path):
    """MetricsLogger releases its JSONL handle (context-manager form;
    idempotent close) — long-lived processes creating many loggers must
    not leak file handles (VERDICT r3 weak #7)."""
    from haet_tpu.train.trainer import MetricsLogger

    path = str(tmp_path / "m.jsonl")
    with MetricsLogger(path, echo=False) as logger:
        logger.log({"loss": 1.0})
        assert logger._f is not None
    assert logger._f is None
    logger.close()  # idempotent
    import json as _json

    [rec] = [_json.loads(l) for l in open(path)]
    assert rec["loss"] == 1.0


def test_grad_clip_matches_torch_exactly():
    """clip_by_global_norm_torch == torch.nn.utils.clip_grad_norm_ bit-for-
    semantics: the 1e-6 in torch's denominator (active both above AND
    below the threshold — torch always multiplies by the clamped coef)
    is reproduced, since every reference run trains under this exact
    clip (train.py:94, exp_*.py)."""
    from haet_tpu.train.trainer import clip_by_global_norm_torch

    rng = np.random.RandomState(11)
    for max_norm, scale in [(1.0, 10.0), (1.0, 0.01), (0.5, 0.49)]:
        grads = {"a": rng.randn(7, 3).astype(np.float32) * scale,
                 "b": rng.randn(5).astype(np.float32) * scale}
        tp = [torch.tensor(g, requires_grad=True) for g in grads.values()]
        for p, g in zip(tp, grads.values()):
            p.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_norm_(tp, max_norm=max_norm)

        tx = clip_by_global_norm_torch(max_norm)
        st = tx.init(grads)
        clipped, _ = tx.update(
            jax.tree_util.tree_map(jnp.asarray, grads), st)
        for ours, theirs in zip(
                [clipped["a"], clipped["b"]], [t.grad for t in tp]):
            np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                       rtol=1e-7, atol=1e-12)


def test_restore_across_topologies(tmp_path):
    """A checkpoint whose leaves were PARTITIONED over a mesh must restore
    into a differently-placed (here: single-device) live state — resuming
    a --dp run on fewer chips, or debugging a TPU checkpoint on CPU. The
    restore template carries the LIVE state's shardings; a shardingless
    abstract template makes orbax read the SAVED topology from the file
    and fail when those devices are absent (r4 review finding)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from haet_tpu.train.trainer import TrainState

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))
    w = jax.device_put(jnp.arange(32.0).reshape(8, 4),
                       NamedSharding(mesh, P("dp")))  # genuinely sharded
    saved = TrainState(step=jnp.asarray(3, jnp.int32), params={"w": w},
                       batch_stats={}, opt_state=())
    ck = Checkpointer(str(tmp_path))
    ck.save_last(saved, epoch=0)
    ck.wait()

    live = TrainState(step=jnp.zeros((), jnp.int32),
                      params={"w": jnp.zeros((8, 4), jnp.float32)},
                      batch_stats={}, opt_state=())
    restored = _make_trainer().maybe_restore(live, Checkpointer(str(tmp_path)))
    assert int(restored.step) == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(32.0).reshape(8, 4))
    # placed per the LIVE state (current topology), not the saved mesh
    assert restored.params["w"].sharding == live.params["w"].sharding


def test_consecutive_fits_continue_epoch_numbering(tmp_path):
    """A second fit() on the same Trainer (continue/fine-tune) must pick
    up the numbering after the epochs the FIRST loop completed — not
    restart at a stale restore-time value, re-running epochs and
    corrupting the sidecar (r4 review finding)."""
    from haet_tpu.data import batch_iter

    d = _data(8)
    trainer = _make_trainer(total_steps=8)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:4] for k, v in d.items()})
    ck = Checkpointer(str(tmp_path))

    logged = []

    class Cap:
        def log(self, rec):
            logged.append(rec)

    state = trainer.fit(state, batch_iter(d, 4, True, 0), epochs=2,
                        logger=Cap(), checkpointer=ck)
    assert [r["epoch"] for r in logged if "epoch" in r] == [0, 1]

    logged.clear()
    state = trainer.fit(state, batch_iter(d, 4, True, 1), epochs=4,
                        logger=Cap(), checkpointer=ck)
    assert [r["epoch"] for r in logged if "epoch" in r] == [2, 3]
    assert ck.epoch_of("last", int(state.step)) == 3


def test_stop_event_saves_last_and_resumes(tmp_path):
    """fit(stop_event=...) finishes the in-flight step, saves 'last'
    under the last COMPLETED epoch's number (-1 when none), and a
    resume re-runs the interrupted epoch with the newer mid-epoch
    params — the step count (and so step-indexed schedules) carries
    through exactly."""
    import threading

    trainer = _make_trainer(total_steps=14)
    d = _data(n=8)
    ev = threading.Event()

    def batches():
        for i in range(4):
            if i == 2:  # set while yielding the 3rd batch: 2 steps run
                ev.set()
            yield d

    ck = Checkpointer(str(tmp_path / "ck"))
    state = trainer.init_state(jax.random.PRNGKey(0), d)
    out = trainer.fit(state, batches, checkpointer=ck, epochs=3,
                      stop_event=ev)
    assert int(out.step) == 2  # the in-flight step completed, then stop
    assert ck.epoch_of("last", step=2) == -1  # no epoch completed yet

    t2 = _make_trainer(total_steps=14)
    s2 = t2.init_state(jax.random.PRNGKey(0), d)
    s2 = t2.maybe_restore(s2, ck)
    assert int(s2.step) == 2
    out2 = t2.fit(s2, lambda: iter([d] * 4), checkpointer=ck, epochs=3)
    # the interrupted epoch 0 re-ran in full: 3 epochs x 4 batches
    assert int(out2.step) == 2 + 12
    assert ck.epoch_of("last", int(out2.step)) == 2


def test_sigterm_preempt_saves_then_dies(tmp_path):
    """TrainConfig(preempt_save=True) — the default — makes SIGTERM
    mid-training save a resumable 'last' checkpoint and THEN re-deliver
    the signal, so the process still exits through the normal signal
    path (no progress lost beyond the in-flight batch)."""
    import os
    import signal as _signal
    import subprocess
    import sys
    import time as _time
    from pathlib import Path

    ckdir = str(tmp_path / "ck")
    worker = tmp_path / "worker.py"
    repo_root = str(Path(__file__).resolve().parents[1])
    worker.write_text(
        "import os\n"
        "import sys\n"
        f"sys.path.insert(0, {repo_root!r})\n"
        "os.environ['HAET_PLATFORM'] = 'cpu'\n"
        "from haet_tpu.utils.env import apply_platform_override\n"
        "apply_platform_override()\n"
        "import time\n"
        "import numpy as np, jax, jax.numpy as jnp\n"
        "from flax import linen as nn\n"
        "from haet_tpu.train import Trainer, Checkpointer\n"
        "from haet_tpu.utils.config import TrainConfig\n"
        "class M(nn.Module):\n"
        "    @nn.compact\n"
        "    def __call__(self, x, train=False):\n"
        "        return nn.Dense(1)(x)\n"
        "cfg = TrainConfig(lr=1e-1, epochs=100, batch_size=8,\n"
        "                  schedule='constant', weight_decay=0.0)\n"
        "tr = Trainer(model=M(),\n"
        "             loss_fn=lambda o, b: (jnp.mean((o - b['y'])**2),\n"
        "                                   dict()),\n"
        "             cfg=cfg, total_steps=10000,\n"
        "             batch_args=lambda b: (b['x'],))\n"
        "r = np.random.RandomState(0)\n"
        "b = dict(x=r.randn(8, 4).astype(np.float32),\n"
        "         y=r.randn(8, 1).astype(np.float32))\n"
        "state = tr.init_state(jax.random.PRNGKey(0), b)\n"
        f"ck = Checkpointer({ckdir!r})\n"
        "def batches():\n"
        "    for _ in range(10000):\n"
        "        print('STEPPING', flush=True)\n"
        "        time.sleep(0.05)\n"
        "        yield b\n"
        "tr.fit(state, batches, checkpointer=ck, epochs=100)\n"
        "print('NOT_REACHED', flush=True)\n")
    # unbuffered: the 'preempted=1' log line must reach the pipe before
    # the redelivered SIGTERM kills the interpreter
    env = dict(os.environ, HAET_PLATFORM="cpu", PYTHONUNBUFFERED="1")
    proc = subprocess.Popen(
        [sys.executable, str(worker)],
        cwd=str(Path(__file__).resolve().parents[1]),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    try:
        # wait for real training steps (blocking readline; EOF on death)
        seen = False
        for _ in range(10000):
            line = proc.stdout.readline()
            if not line:
                break
            if "STEPPING" in line:
                seen = True
                break
        assert seen, f"worker never stepped:\n{proc.stderr.read()}"
        _time.sleep(0.2)
        proc.send_signal(_signal.SIGTERM)
        out, err = proc.communicate(timeout=240)
    finally:
        if proc.poll() is None:
            proc.kill()
    # died through the redelivered signal, not a clean return
    assert proc.returncode == -_signal.SIGTERM, (proc.returncode, err)
    assert "NOT_REACHED" not in out
    assert "preempted=1" in out, out
    # the checkpoint behind it is complete and resumable
    ck = Checkpointer(ckdir)
    raw = ck.restore_raw("last")
    assert raw is not None and "params" in raw


def test_stop_event_on_last_batch_counts_epoch_complete(tmp_path):
    """A stop that lands during an epoch's LAST batch must not mislabel
    the fully-completed epoch as interrupted: the epoch runs its normal
    tail ('last' saved under ITS number), and the run stops at the next
    epoch's first batch — resume must not redo a finished epoch (that
    would push step-indexed schedules past total_steps)."""
    import threading

    trainer = _make_trainer(total_steps=8)
    d = _data(n=8)
    ev = threading.Event()

    def batches():
        for i in range(4):
            yield d
        # runs when the loop asks for a 5th batch: the event is set
        # AFTER the last step completed, exactly as a signal landing
        # during the final batch's device step would
        ev.set()

    ck = Checkpointer(str(tmp_path / "ck"))
    state = trainer.init_state(jax.random.PRNGKey(0), d)
    out = trainer.fit(state, batches, checkpointer=ck, epochs=2,
                      stop_event=ev)
    # all 4 batches of epoch 0 ran; epoch 1 stopped before its 1st step
    assert int(out.step) == 4
    assert ck.epoch_of("last", step=4) == 0  # epoch 0 COMPLETED
