"""FULL HAET model forward vs a torch oracle — the end-to-end parity test.

Re-states the complete reference forward chain in torch with weights copied
from the flax model: preprocess MLP (+placeholder), then per block
LN -> physics attention (Conv2d slice projection, Ada-Temp, Rep-Slice
softmax over points, eidetic states, center-of-mass positions, full Erwin
UNet with shared permutations, deslice, head merge, output projection)
-> residual -> LN -> MLP -> residual, final LN + Linear
(reference ``HAETransolver_Structured_Mesh_2D.py:374-414`` +
``PhysicsAttention/StructuredMesh2D.py:157-262`` + ``erwin_flash.py``).

Only the grouping permutations are shared between the two implementations
(they are data-dependent; their construction is itself oracle-tested in
``test_ball_groups.py`` / ``test_native_balltree.py``).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from haet_tpu.models import HAETransolverStructuredMesh2D
from haet_tpu.ops.ball_groups import build_erwin_perms

from test_erwin_full_oracle import t, torch_basic_layer

B, HH, WW = 2, 8, 8
N = HH * WW
N_HIDDEN, N_HEAD, G = 16, 2, 16
DH = N_HIDDEN // N_HEAD
BALL_SIZES = (8, 4)
STRIDES = (2,)


def torch_physics_attention(fx, p, perms_np):
    """fx: [B, N, C] torch; p = flax params of the Attn module."""
    Bb = fx.shape[0]
    # Conv2d slice projection (NHWC kernel [kh, kw, cin, cout] in flax)
    k = t(p["in_project_x"]["kernel"]).permute(3, 2, 0, 1)  # -> OIHW
    b = t(p["in_project_x"]["bias"])
    xg = fx.reshape(Bb, HH, WW, N_HIDDEN).permute(0, 3, 1, 2)
    xp = F.conv2d(xg, k, b, padding=1)
    xp = xp.permute(0, 2, 3, 1).reshape(Bb, N, N_HEAD, DH).permute(0, 2, 1, 3)

    # Ada-Temp + Rep-Slice (softmax over points axis, dim=2)
    tau = 0.5 + (xp @ t(p["ada_temp_kernel"]) + t(p["ada_temp_bias"])
                 ).clamp(-0.4, 0.4)
    shift = math.log(-math.log(1e-6))
    logits = xp @ t(p["in_project_slice_kernel"]) + t(p["in_project_slice_bias"])
    w = torch.softmax((logits - shift) / tau, dim=2)
    states = torch.einsum("bhnc,bhng->bhgc", xp, w)
    states = states / (w.sum(2) + 1e-5)[:, :, :, None]

    # center-of-mass positions: global min-max over the flat batch
    flat = states.reshape(Bb * N_HEAD * G, DH)
    feat = flat[:, :2]
    fmin, fmax = feat.min(0, keepdim=True).values, feat.max(0, keepdim=True).values
    pos = ((feat - fmin) / (fmax - fmin + 1e-8)).reshape(Bb * N_HEAD, G, 2)

    # Erwin over [B*H, G, DH] clouds with the shared permutations
    ep = p["erwin"]
    outs = []
    for c in range(Bb * N_HEAD):
        perm = perms_np["perm"][c]
        unperm = perms_np["unperm"][c]
        x_c = states.reshape(Bb * N_HEAD, G, DH)[c]
        xt = x_c[perm]
        pt = pos[c][perm]
        rots = [
            (None, None) if perms_np["rot"][lvl] is None else (
                torch.from_numpy(perms_np["rot"][lvl][c]).long(),
                torch.from_numpy(perms_np["rot_inv"][lvl][c]).long(),
            )
            for lvl in range(2)
        ]
        x0, p0, ch0 = torch_basic_layer(
            xt, pt, ep["encoder0"], 1, BALL_SIZES[0], 2,
            rots[0][0], rots[0][1], stride=STRIDES[0], direction="down")
        x1, p1, _ = torch_basic_layer(
            x0, p0, ep["bottleneck"], 2, BALL_SIZES[1], 2,
            rots[1][0], rots[1][1])
        x2, p2, _ = torch_basic_layer(
            x1, p1, ep["decoder0"], 1, BALL_SIZES[0], 2,
            rots[0][0], rots[0][1], stride=STRIDES[0], direction="up",
            children=ch0)
        outs.append(x2[torch.from_numpy(unperm).long()])
    out_states = torch.stack(outs).reshape(Bb, N_HEAD, G, DH)

    # deslice + head merge + output projection
    out = torch.einsum("bhgc,bhng->bhnc", out_states, w)
    out = out.permute(0, 2, 1, 3).reshape(Bb, N, N_HIDDEN)
    return out @ t(p["to_out"]["kernel"]) + t(p["to_out"]["bias"])


def torch_mlp(x, p, act=F.gelu):
    h = act(x @ t(p["linear_pre"]["kernel"]) + t(p["linear_pre"]["bias"]))
    return h @ t(p["linear_post"]["kernel"]) + t(p["linear_post"]["bias"])


def torch_ln(x, p):
    return F.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]),
                        eps=1e-5)


def test_full_haet_2d_forward_matches_torch_oracle(monkeypatch):
    rng = np.random.RandomState(0)
    x_np = rng.rand(B, N, 2).astype(np.float32)
    fx_np = rng.randn(B, N, 1).astype(np.float32)

    model = HAETransolverStructuredMesh2D(
        space_dim=2, fun_dim=1, out_dim=3, n_layers=2, n_hidden=N_HIDDEN,
        n_head=N_HEAD, slice_num=G, mlp_ratio=1, H=HH, W=WW,
        ball_sizes=BALL_SIZES, enc_num_heads=(1, 2), enc_depths=(2, 2),
        dec_num_heads=(1,), dec_depths=(2,), strides=STRIDES, rotate=45,
    )

    x, fx = jnp.asarray(x_np), jnp.asarray(fx_np)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx)

    # Capture the data-dependent grouping perms each Attn layer builds so
    # the torch oracle can share them exactly. The apply below runs eagerly
    # (outside jit), so the captured perms are concrete arrays.
    captured = []
    orig = build_erwin_perms

    def capture(pos, **kw):
        perms = orig(pos, **kw)
        captured.append(jax.tree_util.tree_map(np.asarray, perms))
        return perms

    import haet_tpu.models.erwin as erwin_mod
    monkeypatch.setattr(erwin_mod, "build_erwin_perms", capture)

    out = np.asarray(model.apply(v, x, fx))
    assert len(captured) == 2  # one perms build per layer

    params = jax.tree_util.tree_map(np.asarray, v["params"])

    # ---- torch oracle ----
    fxt = torch.cat([t(x_np), t(fx_np)], dim=-1)
    h = torch_mlp(fxt, params["preprocess"])
    for i in range(2):
        bp = params[f"blocks_{i}"]
        perms = captured[i]
        perms_np = {
            "perm": perms.perm, "unperm": perms.unperm,
            "rot": perms.rot_perms, "rot_inv": perms.rot_inv_perms,
        }
        attn_out = torch_physics_attention(
            torch_ln(h, bp["ln_1"]), bp["Attn"], perms_np)
        h = attn_out + h
        h = torch_mlp(torch_ln(h, bp["ln_2"]), bp["mlp"]) + h
        if i == 1:  # last layer
            h = torch_ln(h, bp["ln_3"]) @ t(bp["mlp2"]["kernel"]) \
                + t(bp["mlp2"]["bias"])

    np.testing.assert_allclose(out, h.numpy(), rtol=5e-3, atol=5e-4)


def test_shapenet_car_preset_param_parity():
    """The car preset must have EXACTLY the vendored reference model's
    parameter count.

    Reference: ``benchmarks/02-.../models/Transolver.py`` instantiated with
    ``main.py``'s pinned args (n_hidden=256, n_layers=2, space_dim=3,
    fun_dim=4, n_head=8, mlp_ratio=2, out_dim=4, slice_num=32,
    unified_pos=0) — counted with its CUDA deps stubbed — gives 1,757,190.
    The 5,530,948 figure in the committed training log predates the current
    reference CLI (see BASELINE.md).
    """
    from haet_tpu.utils.config import shapenet_car_config

    model = shapenet_car_config().model.build()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 128, 7), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"])
    )
    assert n_params == 1_757_190
