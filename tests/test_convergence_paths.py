"""Learning gates for the EXOTIC training paths (VERDICT r4 weak #3).

``test_convergence.py`` gates synthetic-Darcy through the shared Trainer;
these three drive the actual driver ``main()``s whose loops are custom —
the NS autoregressive rollout (``exp_ns.py`` lax.scan loop), the
plasticity Time_Input per-t query scan (``exp_plas.py``), and the
elasticity irregular path (``exp_elas.py``) — on shrunk synthetic data,
and pin each final val metric to a measured fixed-seed golden with ~30%
headroom. A silent learning regression in any of these loops (the paths
most likely to break: custom grad plumbing, per-frame rng folding,
BatchNorm-through-scan) fails here while execution-only tests stay green.

Data is shrunk by monkeypatching the loaders' synthetic fallback — the
loaders themselves are covered by the real-branch fixture tests
(test_drivers_real_branch.py); what is gated HERE is the training loop.

Each gate is paired with a broken-loss mutation check: the same run with
``lr=0`` (gradient path contributes nothing) must FAIL the gate — proving
the gate actually measures learning, not initialization luck.
"""

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
BENCH = os.path.join(REPO, "benchmarks")
for p in (BENCH, REPO):
    if p not in sys.path:
        sys.path.insert(0, p)

if __name__ == "__main__":
    # golden-measurement mode must pick the CPU platform BEFORE first jax
    # use (the shell profile force-prepends the tunneled TPU platform)
    import jax

    jax.config.update("jax_platforms", "cpu")

from haet_tpu.data import synthetic  # noqa: E402


def _args(out_dir, **over):
    base = dict(lr=1e-3, epochs=8, weight_decay=1e-5, batch_size=2,
                n_hidden=32, n_layers=2, n_heads=4, slice_num=16,
                mlp_ratio=1, dropout=0.0, max_grad_norm=None,
                accum_steps=1, unified_pos=0, ref=8, ntrain=8, ntest=4,
                bf16=0, mu_bf16=0, use_checkpoint=0,
                data_path="/nonexistent", out_dir=str(out_dir),
                save_name="t", smoke=False, dp=0, tp=1, pp=1,
                pp_microbatches=0, multihost=False)
    base.update(over)
    return argparse.Namespace(**base)


def _epoch_vals(out_dir, jsonl, metric):
    rows = [json.loads(line)
            for line in open(os.path.join(out_dir, jsonl))]
    return [r[metric] for r in rows if metric in r]


def _run_ns(tmp_path, monkeypatch, **over):
    """exp_ns.main() on a 24x24, T=4->4 synthetic advection set: the
    rollout scan loop at test scale. Returns per-epoch val/l2_full."""
    import exp_ns
    from haet_tpu.data import pde_datasets

    monkeypatch.setattr(exp_ns, "T_IN", 4)
    monkeypatch.setattr(exp_ns, "T_OUT", 4)

    def tiny_load_ns(data_path, ntrain, ntest, t_in, t_out):
        s = 24
        pos_tr, x_tr, y_tr = synthetic.ns_like(8, s, t_in, t_out, seed=0)
        pos_te, x_te, y_te = synthetic.ns_like(4, s, t_in, t_out, seed=1)
        return {"s": s,
                "train": {"pos": pos_tr, "x": x_tr, "y": y_tr},
                "test": {"pos": pos_te, "x": x_te, "y": y_te},
                "synthetic": True}

    monkeypatch.setattr(exp_ns, "load_ns", tiny_load_ns)
    d = tmp_path / "ns"
    os.makedirs(d, exist_ok=True)
    exp_ns.main(_args(d, **over))
    return _epoch_vals(str(d), "ns_metrics.jsonl", "val/l2_full")


def _run_plas(tmp_path, monkeypatch, **over):
    """exp_plas.main() on a 26x11 grid, T=6 synthetic set: the Time_Input
    per-t scan loop at test scale. Returns per-epoch val/rel_l2."""
    import exp_plas

    def tiny_load_plas(data_path, ntrain, ntest):
        h, w, t = 26, 11, 6
        pos_tr, y_tr = synthetic.plasticity_like(8, h, w, t, seed=0)
        pos_te, y_te = synthetic.plasticity_like(4, h, w, t, seed=1)
        # fx = the base field (the LAST frame/channel is base*1*1), so
        # y[..., t, c] = fx * scale(t, c) exactly — a pointwise map the
        # time-conditioned path must learn or the gate fails
        return {"h": h, "w": w, "t": t,
                "train": {"pos": pos_tr, "fx": y_tr[:, :, -1, -1:],
                          "y": y_tr},
                "test": {"pos": pos_te, "fx": y_te[:, :, -1, -1:],
                         "y": y_te},
                "synthetic": True}

    monkeypatch.setattr(exp_plas, "load_plasticity", tiny_load_plas)
    d = tmp_path / "plas"
    os.makedirs(d, exist_ok=True)
    over.setdefault("epochs", 20)
    over.setdefault("lr", 2e-3)
    exp_plas.main(_args(d, **over))
    return _epoch_vals(str(d), "plas_metrics.jsonl", "val/rel_l2")


def _run_elas(tmp_path, monkeypatch, **over):
    """exp_elas.main() on 256-point synthetic unit cells: the irregular
    point-cloud Trainer path. Returns per-epoch val/rel_l2."""
    import exp_elas
    from haet_tpu.data import pde_datasets

    def tiny_load_elas(data_path, ntrain, ntest):
        pos_tr, y_tr = synthetic.elasticity_like(8, npts=256, seed=0)
        pos_te, y_te = synthetic.elasticity_like(4, npts=256, seed=1)
        return {"train": {"pos": pos_tr, "y": y_tr},
                "test": {"pos": pos_te, "y": y_te},
                "synthetic": True}

    monkeypatch.setattr(exp_elas, "load_elasticity", tiny_load_elas)
    d = tmp_path / "elas"
    os.makedirs(d, exist_ok=True)
    over.setdefault("epochs", 30)
    over.setdefault("lr", 2e-3)
    exp_elas.main(_args(d, **over))
    return _epoch_vals(str(d), "elas_metrics.jsonl", "val/rel_l2")


# Goldens: measured fixed-seed CPU trajectories of the runs above (see
# the __main__ block, which reproduces them). Gates sit ~30% above the
# measured final val metric — loose enough for XLA/optax drift, tight
# enough that a broken loop (whose val stays near the first-epoch level,
# NS 0.98 / plas 1.11 / elas 0.84) fails. Measured r5:
#   ns   first 0.9836 -> last 0.3893 (8 epochs, 24x24, T=4->4)
#   plas first 1.1082 -> last 0.2330 (20 epochs, 26x11, T=6)
#   elas first 0.8369 -> last 0.5604 (30 epochs, 256 pts; the synthetic
#        target carries 0.1-sigma label noise, so ~0.55 is its floor)
GOLDEN_NS = 0.3893
GOLDEN_PLAS = 0.2330
GOLDEN_ELAS = 0.5604
GATE_NS = 0.51
GATE_PLAS = 0.31
GATE_ELAS = 0.73


def test_ns_rollout_converges(tmp_path, monkeypatch):
    vals = _run_ns(tmp_path, monkeypatch)
    first, last = vals[0], vals[-1]
    assert np.isfinite(last)
    assert last < 0.8 * first, f"no learning: {first} -> {last}"
    assert last < GATE_NS, (
        f"regressed vs measured golden {GOLDEN_NS}: {vals}")


def test_ns_rollout_gate_catches_broken_loss(tmp_path, monkeypatch):
    """lr=0 (the gradient path contributes nothing — the canonical
    broken-loss mutation) must FAIL the learning gate."""
    vals = _run_ns(tmp_path, monkeypatch, lr=0.0, epochs=2)
    assert vals[-1] > GATE_NS, vals


def test_plasticity_time_input_converges(tmp_path, monkeypatch):
    vals = _run_plas(tmp_path, monkeypatch)
    first, last = vals[0], vals[-1]
    assert np.isfinite(last)
    assert last < 0.8 * first, f"no learning: {first} -> {last}"
    assert last < GATE_PLAS, (
        f"regressed vs measured golden {GOLDEN_PLAS}: {vals}")


def test_plasticity_gate_catches_broken_loss(tmp_path, monkeypatch):
    vals = _run_plas(tmp_path, monkeypatch, lr=0.0, epochs=2)
    assert vals[-1] > GATE_PLAS, vals


def test_elasticity_irregular_converges(tmp_path, monkeypatch):
    vals = _run_elas(tmp_path, monkeypatch)
    first, last = vals[0], vals[-1]
    assert np.isfinite(last)
    assert last < 0.8 * first, f"no learning: {first} -> {last}"
    assert last < GATE_ELAS, (
        f"regressed vs measured golden {GOLDEN_ELAS}: {vals}")


def test_elasticity_gate_catches_broken_loss(tmp_path, monkeypatch):
    vals = _run_elas(tmp_path, monkeypatch, lr=0.0, epochs=2)
    assert vals[-1] > GATE_ELAS, vals


if __name__ == "__main__":
    # golden measurement mode: print the fixed-seed trajectories
    import pathlib
    import tempfile

    class MP:
        def setattr(self, obj, name, val):
            setattr(obj, name, val)

    wanted = sys.argv[1:] or ["elas", "plas", "ns"]
    for name, fn in [("elas", _run_elas), ("plas", _run_plas),
                     ("ns", _run_ns)]:
        if name not in wanted:
            continue
        import time as _t
        t0 = _t.time()
        vals = fn(pathlib.Path(tempfile.mkdtemp()), MP())
        print(f"GOLDEN {name}: first={vals[0]:.4f} last={vals[-1]:.4f} "
              f"({_t.time() - t0:.0f}s) {['%.3f' % v for v in vals]}",
              flush=True)
