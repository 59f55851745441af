"""Checkpoint interchange vs the REAL reference model key schema.

Ground truth: the reference models themselves, instantiated on CPU with
their CUDA-only deps stubbed (flash_attn / torch_cluster / torch_scatter /
balltree are construction-time imports only -- state_dict needs no forward).
This pins the importer to the reference's actual ``state_dict`` names and
shapes (``models/HAETransolver_*.py``), not to our reading of them.
"""

from __future__ import annotations

import sys
import types

import jax
import numpy as np
import pytest

from haet_tpu.utils.config import ModelConfig
from haet_tpu.utils.torch_import import (
    convert_state_dict,
    to_torch_state_dict,
)


@pytest.fixture(scope="module")
def ref_models(request):
    """Import the reference ``models`` package with CUDA deps stubbed.

    Everything installed here (stub modules, the imported reference
    package, the ``torch.Tensor.cuda`` neutralization) is undone at module
    teardown so the rest of the suite sees a pristine torch/sys.modules.
    """
    installed: list[str] = []

    def _stub(name, **attrs):
        if name in sys.modules:  # a real module is present; leave it
            return
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        installed.append(name)

    def _teardown():
        torch.Tensor.cuda = orig_cuda  # type: ignore[method-assign]
        for name in installed:
            sys.modules.pop(name, None)
        for name in [n for n in sys.modules
                     if n == "models" or n.startswith("models.")
                     if n not in modules_before]:
            sys.modules.pop(name, None)

    _stub("flash_attn", flash_attn_qkvpacked_func=lambda *a, **k: None)
    _stub("torch_cluster", radius_graph=lambda *a, **k: None)
    _stub("torch_scatter", scatter_mean=lambda *a, **k: None)
    _stub("balltree",
          build_balltree_with_rotations=lambda *a, **k: None,
          build_balltree=lambda *a, **k: None,
          partition_balltree=lambda *a, **k: None)
    import torch

    try:
        from timm.models.layers import trunc_normal_  # noqa: F401
    except Exception:
        _stub("timm")
        _stub("timm.models")
        _stub("timm.models.layers",
              trunc_normal_=lambda t, std=1.0: t.data.normal_(0, std))

    # get_grid() calls .cuda() at construction (reference
    # HAETransolver_Structured_Mesh_2D.py:346); neutralize on CPU.
    orig_cuda = torch.Tensor.cuda
    modules_before = set(sys.modules)
    request.addfinalizer(_teardown)
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    sys.path.insert(0, "/root/reference")
    try:
        import models as ref
    except Exception as e:  # reference tree absent in some environments
        pytest.skip(f"reference package unavailable: {e}")
    finally:
        sys.path.remove("/root/reference")
    return ref


def _our_template(cfg: ModelConfig, *, with_fx=True, with_time=False):
    model = cfg.build()
    rng = np.random.RandomState(0)
    n = 64 if cfg.variant == "irregular" else cfg.H * cfg.W * (
        cfg.D if cfg.variant == "structured_3d" else 1)
    x = rng.rand(1, n, cfg.space_dim).astype(np.float32)
    fx = rng.rand(1, n, cfg.fun_dim).astype(np.float32) if with_fx else None
    args = [x, fx]
    if with_time:
        args.append(np.ones((1,), np.float32))
    return jax.jit(model.init)(jax.random.PRNGKey(0), *args), model, args


CASES = {
    "irregular": dict(
        variant="irregular", space_dim=3, fun_dim=1, out_dim=1, n_layers=2,
        n_hidden=64, n_head=4, slice_num=16, mlp_ratio=2, dropout=0.0),
    "structured_2d": dict(
        variant="structured_2d", space_dim=2, fun_dim=1, out_dim=1,
        n_layers=1, n_hidden=64, n_head=4, slice_num=16, mlp_ratio=2,
        dropout=0.0, H=16, W=16, unified_pos=True, Time_Input=True),
    # exercises the Conv3d OIDHW<->DHWIO transpose against the real model
    "structured_3d": dict(
        variant="structured_3d", space_dim=3, fun_dim=1, out_dim=1,
        n_layers=1, n_hidden=64, n_head=4, slice_num=16, mlp_ratio=2,
        dropout=0.0, H=8, W=8, D=8, unified_pos=True),
}


def _ref_model(ref_models, name):
    import torch

    torch.manual_seed(0)
    if name == "irregular":
        return ref_models.HAETransolver_Irregular_Mesh(
            space_dim=3, n_layers=2, n_hidden=64, dropout=0.0, n_head=4,
            Time_Input=False, act="gelu", mlp_ratio=2, fun_dim=1, out_dim=1,
            slice_num=16, ref=8, unified_pos=0)
    if name == "structured_3d":
        return ref_models.HAETransolver_Structured_Mesh_3D(
            space_dim=3, n_layers=1, n_hidden=64, dropout=0.0, n_head=4,
            Time_Input=False, act="gelu", mlp_ratio=2, fun_dim=1, out_dim=1,
            slice_num=16, ref=8, unified_pos=1, H=8, W=8, D=8)
    return ref_models.HAETransolver_Structured_Mesh_2D(
        space_dim=2, n_layers=1, n_hidden=64, dropout=0.0, n_head=4,
        Time_Input=True, act="gelu", mlp_ratio=2, fun_dim=1, out_dim=1,
        slice_num=16, ref=8, unified_pos=1, H=16, W=16)


@pytest.mark.parametrize("name", sorted(CASES))
def test_import_consumes_real_reference_state_dict(ref_models, name):
    """Every key of the real reference state_dict maps onto a template leaf
    (and fills every leaf) -- strict mode passes with no missing/unused."""
    sd = {k: v.numpy() for k, v in _ref_model(ref_models, name)
          .state_dict().items()}
    cfg = ModelConfig(**CASES[name])
    template, model, args = _our_template(
        cfg, with_time=CASES[name].get("Time_Input", False))

    variables = convert_state_dict(sd, template, strict=True)

    # Imported values actually landed: a distinctive non-square Linear.
    got = variables["params"]["preprocess"]["linear_pre"]["kernel"]
    np.testing.assert_array_equal(
        got, sd["preprocess.linear_pre.0.weight"].T)
    # Square Linear orientation (transpose matters, shape can't catch it).
    got = variables["params"]["blocks_0"]["Attn"]["in_project_slice_kernel"]
    np.testing.assert_array_equal(
        got, sd["blocks.0.Attn.in_project_slice.weight"].T)
    # BatchNorm running stats land in batch_stats.
    bs = variables["batch_stats"]["blocks_0"]["Attn"]["erwin"]["encoder0"][
        "pool"]["norm"]
    np.testing.assert_array_equal(
        bs["mean"],
        sd["blocks.0.Attn.erwin.encoder.0.pool.norm.running_mean"])

    # The imported variables drive a real forward.
    out = model.apply(variables, *args)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("name", sorted(CASES))
def test_export_matches_real_reference_schema(ref_models, name):
    """to_torch_state_dict emits exactly the reference's key names and
    torch-layout shapes (minus num_batches_tracked counters)."""
    ref_sd = _ref_model(ref_models, name).state_dict()
    cfg = ModelConfig(**CASES[name])
    template, _, _ = _our_template(
        cfg, with_time=CASES[name].get("Time_Input", False))

    ours = to_torch_state_dict(template)

    ref_keys = {k for k in ref_sd if not k.endswith("num_batches_tracked")}
    assert set(ours) == ref_keys
    for k in sorted(ref_keys):
        assert tuple(ours[k].shape) == tuple(ref_sd[k].shape), k


def test_flagship_preset_matches_vendored_car_model_schema(ref_models):
    """The ShapeNet-Car preset (the config real published checkpoints use,
    1,757,190 params) imports the VENDORED reference model's state_dict
    (benchmarks/02-.../models/Transolver.py — the class `main.py`'s
    ErwinTransolverDefault registry entry builds) with zero missing/unused
    keys, incl. the always-on Erwin embedding."""
    import sys

    import torch

    from haet_tpu.utils.config import shapenet_car_config

    base = "/root/reference/benchmarks/02-Car-Design-ShapeNetCar"
    # The vendored tree is its own 'models' package — displace the main
    # reference package (imported by the ref_models fixture) for the
    # duration of the import, then restore.
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "models" or k.startswith("models.")}
    sys.path.insert(0, base)
    try:
        from models.Transolver import Model as CarModel
    except Exception as e:
        pytest.skip(f"vendored reference model unavailable: {e}")
    finally:
        sys.path.remove(base)
        for k in list(sys.modules):
            if k == "models" or k.startswith("models."):
                del sys.modules[k]
        sys.modules.update(saved)

    torch.manual_seed(0)
    ref = CarModel(n_hidden=256, n_layers=2, space_dim=3, fun_dim=4,
                   n_head=8, mlp_ratio=2, out_dim=4, slice_num=32,
                   unified_pos=0)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    n_ref = sum(v.size for k, v in sd.items()
                if "running" not in k and "num_batches" not in k)
    assert n_ref == 1_757_190

    cfg = shapenet_car_config().model
    model = cfg.build()
    rng = np.random.RandomState(0)
    x = rng.rand(1, 128, 7).astype(np.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)

    variables = convert_state_dict(sd, template, strict=True)
    out = model.apply(variables, jax.numpy.asarray(x), None)
    assert np.all(np.isfinite(np.asarray(out)))

    # and the export direction matches the vendored schema exactly
    ours = to_torch_state_dict(template)
    ref_keys = {k for k in sd if not k.endswith("num_batches_tracked")}
    assert set(ours) == ref_keys


def test_erwin_baseline_wrapper_imports_with_rename(ref_models):
    """The 02.1 Erwin-only baseline (ErwinWrapper, 02.1/main.py:51-106 —
    `model.` = bare ErwinTransformer with mp_steps=3, `pred_head.{0,2}` =
    GELU head) imports into benchmarks/erwin_baseline.ErwinCarModel via
    convert_state_dict's `rename` hook, strict, incl. the MPNN keys
    (fused_message_update / update_fns)."""
    import sys

    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    # Same displacement dance as the vendored car test: 02.1 vendors its
    # own 'models' package.
    base = "/root/reference/benchmarks/02.1-Car-Design-ShapeNetCar"
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "models" or k.startswith("models.")}
    sys.path.insert(0, base)
    try:
        from models.components.erwinflash import ErwinTransformer as RefErwin
    except Exception as e:
        pytest.skip(f"vendored 02.1 erwin unavailable: {e}")
    finally:
        sys.path.remove(base)
        for k in list(sys.modules):
            if k == "models" or k.startswith("models."):
                del sys.modules[k]
        sys.modules.update(saved)

    class ErwinWrapper(nn.Module):  # exact naming of 02.1/main.py:52-80
        def __init__(self):
            super().__init__()
            self.model = RefErwin(
                c_in=7, c_hidden=[128, 128], ball_sizes=[64, 32],
                enc_num_heads=[8, 8], enc_depths=[4, 4],
                dec_num_heads=[8], dec_depths=[4], strides=[2], rotate=45,
                decode=True, mlp_ratio=4, dimensionality=3, mp_steps=3)
            self.pred_head = nn.Sequential(
                nn.Linear(128, 128), nn.GELU(), nn.Linear(128, 4))

    sd = {k: v.numpy() for k, v in ErwinWrapper().state_dict().items()}

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]
                           / "benchmarks"))
    try:
        from erwin_baseline import ErwinCarModel
    finally:
        sys.path.pop(0)
    model = ErwinCarModel()
    rng = np.random.RandomState(0)
    x = rng.rand(1, 256, 7).astype(np.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    variables = convert_state_dict(
        sd, template, strict=True,
        rename={"model.": "erwin.", "pred_head.0.": "head1.",
                "pred_head.2.": "head2."})
    # MPNN weights really landed (orientation: torch [out, in] -> kernel)
    got = variables["params"]["erwin"]["embed"]["mpnn"]["message_0"]["kernel"]
    np.testing.assert_array_equal(
        got, sd["model.embed.mpnn.fused_message_update.0.0.weight"].T)
    out = model.apply(variables, jax.numpy.asarray(x))
    assert np.all(np.isfinite(np.asarray(out)))


def test_conv2d_kernel_orientation(ref_models):
    """The 2D variant's Conv2d slice projection round-trips OIHW<->HWIO."""
    sd = {k: v.numpy() for k, v in _ref_model(ref_models, "structured_2d")
          .state_dict().items()}
    cfg = ModelConfig(**CASES["structured_2d"])
    template, _, _ = _our_template(cfg, with_time=True)
    variables = convert_state_dict(sd, template, strict=True)
    w = sd["blocks.0.Attn.in_project_x.weight"]  # OIHW
    got = variables["params"]["blocks_0"]["Attn"]["in_project_x"]["kernel"]
    np.testing.assert_array_equal(got, w.transpose(2, 3, 1, 0))


def test_round_trip_exact():
    """import(export(variables)) is bitwise-identical."""
    cfg = ModelConfig(**CASES["irregular"])
    template, _, _ = _our_template(cfg)
    sd = to_torch_state_dict(template)
    back = convert_state_dict(sd, template, strict=True)
    flat_a = jax.tree_util.tree_leaves_with_path(template)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_container_unwrap_and_compile_prefix():
    """Reference training checkpoints ({'model_state_dict': ...},
    train.py:250-259) and torch.compile '_orig_mod.' prefixes are handled."""
    cfg = ModelConfig(**CASES["irregular"])
    template, _, _ = _our_template(cfg)
    sd = to_torch_state_dict(template)
    wrapped = {"epoch": 3,
               "model_state_dict": {"_orig_mod." + k: v
                                    for k, v in sd.items()}}
    back = convert_state_dict(wrapped, template, strict=True)
    np.testing.assert_array_equal(
        np.asarray(back["params"]["placeholder"]),
        np.asarray(template["params"]["placeholder"]))


def test_strict_reports_missing_and_unused():
    cfg = ModelConfig(**CASES["irregular"])
    template, _, _ = _our_template(cfg)
    sd = to_torch_state_dict(template)
    sd.pop("placeholder")
    sd["not.a.real.key"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="placeholder"):
        convert_state_dict(sd, template, strict=True)
    with pytest.raises(ValueError, match="not.a.real.key"):
        convert_state_dict(sd, template, strict=True)
    # non-strict: fills what it can, keeps template values elsewhere
    out = convert_state_dict(sd, template, strict=False)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["placeholder"]),
        np.asarray(template["params"]["placeholder"]))


def test_shape_mismatch_raises():
    cfg = ModelConfig(**CASES["irregular"])
    template, _, _ = _our_template(cfg)
    sd = to_torch_state_dict(template)
    sd["placeholder"] = np.zeros(7, np.float32)
    with pytest.raises(ValueError, match="shape"):
        convert_state_dict(sd, template, strict=True)


def test_empty_collections_survive():
    """A BN-free model's empty batch_stats must survive the round trip so
    callers can index variables["batch_stats"] unconditionally."""
    template = {"params": {"dense": {"kernel": np.zeros((3, 4), np.float32),
                                     "bias": np.zeros(4, np.float32)}},
                "batch_stats": {}}
    sd = to_torch_state_dict(template)
    out = convert_state_dict(sd, template, strict=True)
    assert out["batch_stats"] == {}


def test_bf16_tensors_import():
    """Half/bf16-saved checkpoints import (torch bf16 has no numpy dtype)."""
    torch = pytest.importorskip("torch")
    template = {"params": {"dense": {"kernel": np.zeros((3, 4), np.float32),
                                     "bias": np.zeros(4, np.float32)}}}
    w = torch.randn(4, 3)
    sd = {"dense.weight": w.bfloat16(), "dense.bias": torch.zeros(4).half()}
    out = convert_state_dict(sd, template, strict=True)
    np.testing.assert_allclose(
        np.asarray(out["params"]["dense"]["kernel"]),
        w.bfloat16().float().numpy().T)
    assert out["params"]["dense"]["kernel"].dtype == np.float32


def test_unsupported_weight_ndim_raises():
    """Conv1d-style OIW weights must fail loudly, not pass untransposed."""
    template = {"params": {"c": {"kernel": np.zeros((5, 2, 3), np.float32)}}}
    sd = {"c.weight": np.zeros((3, 2, 5), np.float32)}
    with pytest.raises(ValueError, match="ndim"):
        convert_state_dict(sd, template, strict=True)


def test_load_checkpoint_with_numpy_scalar_metadata(tmp_path):
    """The reference car train.py saves val_loss/train_loss as np.mean(...)
    numpy float64 scalars (02-.../train.py:244-251); the safe weights-only
    load must still accept such files."""
    torch = pytest.importorskip("torch")
    from haet_tpu.utils.torch_import import load_torch_checkpoint

    template = {"params": {"dense": {"kernel": np.zeros((3, 4), np.float32),
                                     "bias": np.zeros(4, np.float32)}}}
    w, b = torch.randn(4, 3), torch.randn(4)
    path = tmp_path / "ref_style.pt"
    torch.save({"epoch": 7,
                "model_state_dict": {"dense.weight": w, "dense.bias": b},
                "val_loss": np.mean([1.0, 2.0]),      # numpy float64 scalar
                "train_loss": np.float64(0.25)}, path)
    out = load_torch_checkpoint(str(path), template)
    np.testing.assert_allclose(
        np.asarray(out["params"]["dense"]["kernel"]), w.numpy().T)

    # non-allowlisted pickled objects still refuse with a pointed message
    import argparse

    path2 = tmp_path / "evil.pt"
    torch.save({"model_state_dict": {"dense.weight": w, "dense.bias": b},
                "payload": argparse.Namespace(x=1)}, path2)
    with pytest.raises(ValueError, match="weights_only=False"):
        load_torch_checkpoint(str(path2), template)


def test_cosine_annealing_t_max_validation():
    from haet_tpu.train.trainer import make_schedule
    from haet_tpu.utils.config import TrainConfig

    with pytest.raises(ValueError, match="t_max"):
        make_schedule(TrainConfig(lr=1e-3, schedule="cosine_annealing",
                                  t_max=0), total_steps=10)


def test_load_torch_checkpoint_weights_only_and_rename(tmp_path):
    """File-level load uses weights_only=True and forwards rename=."""
    torch = pytest.importorskip("torch")
    from haet_tpu.utils.torch_import import load_torch_checkpoint

    template = {"params": {"inner": {"dense": {
        "kernel": np.zeros((3, 4), np.float32),
        "bias": np.zeros(4, np.float32)}}}}
    w, b = torch.randn(4, 3), torch.randn(4)
    path = tmp_path / "ck.pt"
    torch.save({"model_state_dict": {"wrapped.dense.weight": w,
                                     "wrapped.dense.bias": b}}, path)
    out = load_torch_checkpoint(str(path), template,
                                rename={"wrapped.": "inner."})
    np.testing.assert_allclose(
        np.asarray(out["params"]["inner"]["dense"]["kernel"]), w.numpy().T)
