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
    # the torch oracle can share them exactly (the apply below runs eagerly,
    # so the captured perms are concrete) — shared shim with the grad tests.
    captured = _capture_perms(monkeypatch)

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


# ===========================================================================
# Gradient-parity oracle (VERDICT r2 #1): the complete forward chain
# re-stated in torch a second time in BATCHED form (train-mode BatchNorm
# couples the B*H clouds through batch statistics, so the per-cloud loop
# above cannot express it), with every reference gradient boundary made
# explicit:
#
#   1. tree build under no_grad (erwin_flash.py:149) — the permutations are
#      integer gathers, shared verbatim;
#   2. the distance bias under @torch.no_grad (attention.py:29-33) — the
#      bias term (incl. sigma_att) is detached, so sigma_att receives NO
#      gradient in either implementation;
#   3. feature-derived pseudo-positions (StructuredMesh2D.py:228-234,
#      consumed only inside no_grad sites) — feat is detached before the
#      min-max normalization.
#
# The tests compare the WHOLE gradient tree (dL/dparams for every leaf plus
# dL/dx, dL/dfx) between flax and torch at identical weights, in eval mode
# and in train mode (batch-stat BatchNorm; dropout=0), for the 2D (Conv2d
# projection) and irregular (Linear projection) variants.
# ===========================================================================


def tt(a):
    """Like ``t`` but passes torch tensors through — lets the same oracle
    code run on a requires_grad parameter tree."""
    if isinstance(a, torch.Tensor):
        return a
    return torch.from_numpy(np.array(a, dtype=np.float32))


def to_torch_tree(p):
    """flax param tree (nested dict of numpy) -> torch leaves with
    requires_grad, same structure and layouts (the oracle permutes where
    torch wants another layout, so grads map back leaf-for-leaf)."""
    if isinstance(p, dict):
        return {k: to_torch_tree(v) for k, v in p.items()}
    return torch.tensor(np.asarray(p), dtype=torch.float32,
                        requires_grad=True)


def flat_items(tree, path=()):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from flat_items(tree[k], path + (k,))
    else:
        yield path, tree


def gather_b(x, idx):
    """Batched index along axis 1: x [B, N, C], idx [B, N] (numpy or torch)."""
    idx = torch.as_tensor(np.asarray(idx)).long()
    return torch.gather(x, 1, idx[..., None].expand(-1, -1, x.shape[-1]))


def torch_rmsnorm_b(x, scale, eps=1e-6):
    return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + eps) * tt(scale)


def torch_bn_b(x, p, train):
    """flax nn.BatchNorm over a [B, M, C] tensor: stats over (B, M); eval
    uses the init running stats (mean 0, var 1)."""
    if train:
        mean = x.mean(dim=(0, 1), keepdim=True)
        var = (x ** 2).mean(dim=(0, 1), keepdim=True) - mean ** 2
    else:
        mean, var = torch.zeros(()), torch.ones(())
    xn = (x - mean) / torch.sqrt(var + 1e-5)
    return xn * tt(p["scale"]) + tt(p["bias"])


def torch_ball_msa_b(x, pos, p, heads, ball_size):
    Bc, M, C = x.shape
    bs = min(ball_size, M)
    nb = M // bs
    hd = C // heads
    pb = pos.view(Bc, nb, bs, -1)
    rel = (pb - pb.mean(dim=2, keepdim=True)).reshape(Bc, M, -1)
    x = x + rel @ tt(p["pe_proj"]["kernel"]) + tt(p["pe_proj"]["bias"])
    qkv = (x @ tt(p["qkv"]["kernel"]) + tt(p["qkv"]["bias"])).view(
        Bc, nb, bs, 3, heads, hd)
    q, k, v = (qkv[:, :, :, i].permute(0, 1, 3, 2, 4) for i in range(3))
    logits = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
    # boundary 2: the distance bias — incl. sigma_att — is gradient-free
    # (reference attention.py:29 @torch.no_grad)
    dist = torch.cdist(pb, pb, p=2)
    bias = (tt(p["sigma_att"]).view(1, 1, heads, 1, 1)
            * dist.unsqueeze(2)).detach()
    attn = torch.softmax(logits + bias, dim=-1)
    o = (attn @ v).permute(0, 1, 3, 2, 4).reshape(Bc, M, C)
    return o @ tt(p["proj"]["kernel"]) + tt(p["proj"]["bias"])


def torch_swiglu_b(x, p):
    w1 = x @ tt(p["w1"]["kernel"]) + tt(p["w1"]["bias"])
    w2 = x @ tt(p["w2"]["kernel"]) + tt(p["w2"]["bias"])
    return (w2 * F.silu(w1)) @ tt(p["w3"]["kernel"]) + tt(p["w3"]["bias"])


def torch_erwin_block_b(x, pos, p, heads, ball_size):
    x = x + torch_ball_msa_b(
        torch_rmsnorm_b(x, p["norm1"]["scale"]), pos, p["BMSA"], heads,
        ball_size)
    return x + torch_swiglu_b(torch_rmsnorm_b(x, p["norm2"]["scale"]),
                              p["swiglu"])


def torch_basic_layer_b(x, pos, p, heads, ball_size, depth, rot, rot_inv,
                        stride=None, direction=None, children=None,
                        train=False):
    """Batched BasicLayer; returns (x, pos, children)."""
    if direction == "up":
        ch_x, ch_pos = children
        Bc, Np, _ = x.shape
        s = stride
        rel = (ch_pos.view(Bc, Np, s, -1) - pos[:, :, None]).reshape(
            Bc, Np, -1).detach()
        up = (torch.cat([x, rel], dim=-1) @ tt(p["unpool"]["proj"]["kernel"])
              + tt(p["unpool"]["proj"]["bias"])).reshape(Bc, Np * s, -1)
        x = torch_bn_b(ch_x + up, p["unpool"]["norm"], train)
        pos = ch_pos

    n_level = x.shape[1]
    full_ball = min(ball_size, n_level) >= n_level
    for i in range(depth):
        bp = p[f"block{i}"]
        if i % 2 == 1 and rot is not None and not full_ball:
            xr, pr = gather_b(x, rot), gather_b(pos, rot)
            out = torch_erwin_block_b(xr, pr, bp, heads, ball_size)
            x = gather_b(out, rot_inv)
        else:
            x = torch_erwin_block_b(x, pos, bp, heads, ball_size)

    ch = None
    if direction == "down":
        s = stride
        Bc, M, _ = x.shape
        ch = (x, pos)
        pg = pos.view(Bc, M // s, s, -1)
        centers = pg.mean(dim=2).detach()
        rel = (pg - centers[:, :, None]).reshape(Bc, M // s, -1).detach()
        cat = torch.cat([x.reshape(Bc, M // s, -1), rel], dim=-1)
        x = torch_bn_b(
            cat @ tt(p["pool"]["proj"]["kernel"])
            + tt(p["pool"]["proj"]["bias"]), p["pool"]["norm"], train)
        pos = centers
    return x, pos, ch


def torch_erwin_b(x, pos, ep, perms_np, heads, dec_heads, ball_sizes,
                  strides, depths, dec_depths, train):
    """Full 2-level Erwin UNet, batched over the B*H clouds."""
    xt, pt = gather_b(x, perms_np["perm"]), gather_b(pos, perms_np["perm"])
    r0, r0i = perms_np["rot"][0], perms_np["rot_inv"][0]
    r1, r1i = perms_np["rot"][1], perms_np["rot_inv"][1]
    x0, p0, ch0 = torch_basic_layer_b(
        xt, pt, ep["encoder0"], heads[0], ball_sizes[0], depths[0], r0, r0i,
        stride=strides[0], direction="down", train=train)
    x1, p1, _ = torch_basic_layer_b(
        x0, p0, ep["bottleneck"], heads[1], ball_sizes[1], depths[1], r1,
        r1i, train=train)
    x2, _, _ = torch_basic_layer_b(
        x1, p1, ep["decoder0"], dec_heads[0], ball_sizes[0], dec_depths[0],
        r0, r0i, stride=strides[0], direction="up", children=ch0,
        train=train)
    return gather_b(x2, perms_np["unperm"])


def torch_physics_attention_b(fx, p, perms_np, *, variant, heads, g, dim,
                              erwin_cfg, hw=None, train=False):
    """Batched physics attention; variant = "conv2d" | "linear"."""
    Bb, N, _ = fx.shape
    dh = dim // heads
    if variant == "conv2d":
        hh, ww = hw
        k = tt(p["in_project_x"]["kernel"]).permute(3, 2, 0, 1)
        xg = fx.reshape(Bb, hh, ww, dim).permute(0, 3, 1, 2)
        xp = F.conv2d(xg, k, tt(p["in_project_x"]["bias"]), padding=1)
        xp = xp.permute(0, 2, 3, 1).reshape(Bb, N, heads, dh).permute(
            0, 2, 1, 3)
        d = 2
    elif variant == "conv3d":
        hh, ww, dd = hw
        # flax NDHWC kernel [kh, kw, kd, cin, cout] -> torch OIDHW
        k = tt(p["in_project_x"]["kernel"]).permute(4, 3, 0, 1, 2)
        xg = fx.reshape(Bb, hh, ww, dd, dim).permute(0, 4, 1, 2, 3)
        xp = F.conv3d(xg, k, tt(p["in_project_x"]["bias"]), padding=1)
        xp = xp.permute(0, 2, 3, 4, 1).reshape(Bb, N, heads, dh).permute(
            0, 2, 1, 3)
        d = 3
    else:
        xp = (fx @ tt(p["in_project_x"]["kernel"])
              + tt(p["in_project_x"]["bias"]))
        xp = xp.reshape(Bb, N, heads, dh).permute(0, 2, 1, 3)
        d = 3

    tau = 0.5 + (xp @ tt(p["ada_temp_kernel"])
                 + tt(p["ada_temp_bias"])).clamp(-0.4, 0.4)
    shift = math.log(-math.log(1e-6))
    logits = (xp @ tt(p["in_project_slice_kernel"])
              + tt(p["in_project_slice_bias"]))
    w = torch.softmax((logits - shift) / tau, dim=2)
    states = torch.einsum("bhnc,bhng->bhgc", xp, w)
    states = states / (w.sum(2) + 1e-5)[:, :, :, None]

    # boundary 3: feature-derived pseudo-positions are gradient-free
    # (StructuredMesh2D.py:228-234 feed only no_grad sites)
    flat = states.reshape(Bb * heads * g, dh)
    feat = flat[:, :d].detach()
    fmin = feat.min(0, keepdim=True).values
    fmax = feat.max(0, keepdim=True).values
    pos = ((feat - fmin) / (fmax - fmin + 1e-8)).reshape(Bb * heads, g, d)

    out_states = torch_erwin_b(
        states.reshape(Bb * heads, g, dh), pos, p["erwin"], perms_np,
        train=train, **erwin_cfg).reshape(Bb, heads, g, dh)
    out = torch.einsum("bhgc,bhng->bhnc", out_states, w)
    out = out.permute(0, 2, 1, 3).reshape(Bb, N, dim)
    return out @ tt(p["to_out"]["kernel"]) + tt(p["to_out"]["bias"])


def torch_mlp_b(x, p, act=F.gelu):
    h = act(x @ tt(p["linear_pre"]["kernel"]) + tt(p["linear_pre"]["bias"]))
    return h @ tt(p["linear_post"]["kernel"]) + tt(p["linear_post"]["bias"])


def torch_ln_b(x, p):
    return F.layer_norm(x, (x.shape[-1],), tt(p["scale"]), tt(p["bias"]),
                        eps=1e-5)


def torch_haet_b(x, fx, params, captured, *, variant, n_layers, heads, g,
                 dim, erwin_cfg, hw=None, always_placeholder=False,
                 train=False, T=None):
    """Full HAET forward (batched oracle) on a torch parameter tree."""
    h = torch.cat([x, fx], dim=-1) if fx is not None else x
    h = torch_mlp_b(h, params["preprocess"])
    if always_placeholder or fx is None:
        h = h + tt(params["placeholder"])
    if T is not None:
        # time conditioning (reference Irregular_Mesh.py:238-241,369-372):
        # sinusoidal timestep_embedding -> Linear -> SiLU -> Linear, added
        # to fx. T enters outside autograd (integer-like times).
        half = dim // 2
        freqs = torch.exp(-math.log(10000.0)
                          * torch.arange(half, dtype=torch.float32) / half)
        targs = T.reshape(-1)[:, None].float() * freqs[None]
        emb = torch.cat([torch.cos(targs), torch.sin(targs)], dim=-1)
        if dim % 2:
            emb = torch.cat([emb, torch.zeros_like(emb[:, :1])], dim=-1)
        emb = emb[:, None, :]
        emb = emb @ tt(params["time_fc1"]["kernel"]) + tt(
            params["time_fc1"]["bias"])
        emb = F.silu(emb)
        emb = emb @ tt(params["time_fc2"]["kernel"]) + tt(
            params["time_fc2"]["bias"])
        h = h + emb
    for i in range(n_layers):
        bp = params[f"blocks_{i}"]
        perms = captured[i]
        perms_np = {"perm": perms.perm, "unperm": perms.unperm,
                    "rot": perms.rot_perms, "rot_inv": perms.rot_inv_perms}
        h = torch_physics_attention_b(
            torch_ln_b(h, bp["ln_1"]), bp["Attn"], perms_np, variant=variant,
            heads=heads, g=g, dim=dim, erwin_cfg=erwin_cfg, hw=hw,
            train=train) + h
        h = torch_mlp_b(torch_ln_b(h, bp["ln_2"]), bp["mlp"]) + h
        if i == n_layers - 1:
            h = (torch_ln_b(h, bp["ln_3"]) @ tt(bp["mlp2"]["kernel"])
                 + tt(bp["mlp2"]["bias"]))
    return h


def _capture_perms(monkeypatch):
    """Patch build_erwin_perms to record the concrete perms of an eager
    forward (they are data-dependent; construction is oracle-tested in
    test_ball_groups.py)."""
    captured = []
    orig = build_erwin_perms

    def capture(pos, **kw):
        perms = orig(pos, **kw)
        captured.append(jax.tree_util.tree_map(np.asarray, perms))
        return perms

    import haet_tpu.models.erwin as erwin_mod
    monkeypatch.setattr(erwin_mod, "build_erwin_perms", capture)
    return captured


def _grad_parity_case(monkeypatch, variant, train, with_time=False):
    rng = np.random.RandomState(42)
    erwin_cfg = dict(heads=(1, 2), dec_heads=(1,), ball_sizes=BALL_SIZES,
                     strides=STRIDES, depths=(2, 2), dec_depths=(2,))
    model_kw = dict(
        n_layers=2, n_hidden=N_HIDDEN, n_head=N_HEAD, slice_num=G,
        mlp_ratio=1, ball_sizes=BALL_SIZES, enc_num_heads=(1, 2),
        enc_depths=(2, 2), dec_num_heads=(1,), dec_depths=(2,),
        strides=STRIDES, rotate=45, out_dim=3, Time_Input=with_time,
    )
    if variant == "conv2d":
        from haet_tpu.models import HAETransolverStructuredMesh2D as M
        model = M(space_dim=2, fun_dim=1, H=HH, W=WW, **model_kw)
        x_np = rng.rand(B, N, 2).astype(np.float32)
        fx_np = rng.randn(B, N, 1).astype(np.float32)
        hw, always_ph = (HH, WW), False
    elif variant == "conv3d":
        from haet_tpu.models import HAETransolverStructuredMesh3D as M
        model = M(space_dim=3, fun_dim=1, H=4, W=4, D=4, **model_kw)
        x_np = rng.rand(B, N, 3).astype(np.float32)
        fx_np = rng.randn(B, N, 1).astype(np.float32)
        hw, always_ph = (4, 4, 4), False
    else:
        from haet_tpu.models import HAETransolverIrregularMesh as M
        model = M(space_dim=3, fun_dim=1, **model_kw)
        x_np = rng.rand(B, N, 3).astype(np.float32)
        fx_np = rng.randn(B, N, 1).astype(np.float32)
        hw, always_ph = None, True

    T_np = (np.array([[3.0], [7.0]], np.float32)[:B]
            if with_time else None)
    T = jnp.asarray(T_np) if with_time else None
    x, fx = jnp.asarray(x_np), jnp.asarray(fx_np)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x, fx, T)
    r_np = rng.randn(B, N, 3).astype(np.float32)
    r = jnp.asarray(r_np)

    def loss_jax(params, x, fx):
        variables = {"params": params, **{k: v[k] for k in v
                                          if k != "params"}}
        if train:
            out, _ = model.apply(variables, x, fx, T, train=True,
                                 mutable=["batch_stats"])
        else:
            out = model.apply(variables, x, fx, T)
        return jnp.sum(out * r)

    captured = _capture_perms(monkeypatch)
    out_jax = np.asarray(loss_jax(v["params"], x, fx))  # capture + fwd value
    assert len(captured) == 2
    grads = jax.grad(loss_jax, argnums=(0, 1, 2))(v["params"], x, fx)
    g_params, g_x, g_fx = jax.tree_util.tree_map(np.asarray, grads)

    # ---- torch side ----
    params_np = jax.tree_util.tree_map(np.asarray, v["params"])
    tp = to_torch_tree(params_np)
    xt = torch.tensor(x_np, requires_grad=True)
    fxt = torch.tensor(fx_np, requires_grad=True)
    out_t = torch_haet_b(
        xt, fxt, tp, captured, variant=variant, n_layers=2, heads=N_HEAD,
        g=G, dim=N_HIDDEN, erwin_cfg=erwin_cfg, hw=hw,
        always_placeholder=always_ph, train=train,
        T=torch.from_numpy(T_np) if with_time else None)
    loss_t = (out_t * torch.from_numpy(r_np)).sum()
    # forward parity first (sanity for the batched restatement)
    np.testing.assert_allclose(out_jax, loss_t.item(), rtol=2e-4)
    loss_t.backward()

    # ---- whole-tree comparison ----
    flat_j = dict(flat_items(g_params))
    flat_t = dict(flat_items(tp))
    assert set(flat_j) == set(flat_t)
    # f32 noise floor: leaves whose whole gradient sits many orders below
    # the dominant gradient magnitude are accumulated-roundoff, not signal
    # (summation order differs between XLA and torch) — compare them only
    # against the floor.
    global_scale = max(
        max(np.abs(g).max() for g in flat_j.values()), 1e-8)
    floor = 1e-5 * global_scale
    n_nonzero = 0
    for path, gj in flat_j.items():
        leaf = flat_t[path]
        gt = (leaf.grad.numpy() if leaf.grad is not None
              else np.zeros_like(gj))
        if path[-1] == "sigma_att":
            # boundary 2: sigma_att must receive NO gradient on both sides
            assert leaf.grad is None
            np.testing.assert_array_equal(gj, 0.0)
            continue
        scale = max(np.abs(gj).max(), np.abs(gt).max())
        if scale < floor:
            continue  # both numerically zero relative to the tree
        np.testing.assert_allclose(
            gj, gt, rtol=2e-3, atol=max(2e-3 * scale, floor),
            err_msg=f"grad mismatch at {'/'.join(path)}")
        n_nonzero += 1
    assert n_nonzero > 30  # gradients genuinely flow through the tree

    # input gradients
    np.testing.assert_allclose(
        g_x, xt.grad.numpy(), rtol=2e-3,
        atol=2e-3 * max(np.abs(g_x).max(), 1e-8))
    np.testing.assert_allclose(
        g_fx, fxt.grad.numpy(), rtol=2e-3,
        atol=2e-3 * max(np.abs(g_fx).max(), 1e-8))


def test_grad_parity_2d_eval(monkeypatch):
    _grad_parity_case(monkeypatch, "conv2d", train=False)


def test_grad_parity_2d_train(monkeypatch):
    """Train-mode path: batch-stat BatchNorm in pool/unpool (dropout=0)."""
    _grad_parity_case(monkeypatch, "conv2d", train=True)


def test_grad_parity_irregular_eval(monkeypatch):
    _grad_parity_case(monkeypatch, "linear", train=False)


def test_grad_parity_3d_eval(monkeypatch):
    """3D variant (Conv3d NDHWC projection, ref^3 pos path off): same
    whole-tree grad comparison — closes the 3D variant's smoke-only gap."""
    _grad_parity_case(monkeypatch, "conv3d", train=False)


def test_grad_parity_3d_train(monkeypatch):
    _grad_parity_case(monkeypatch, "conv3d", train=True)


def test_grad_parity_irregular_time_conditioned(monkeypatch):
    """The plasticity path: T enters via timestep_embedding + time_fc MLP
    (haet.py:202-215 == reference Irregular_Mesh.py:369-372); time_fc1/2
    gradients must flow and match."""
    _grad_parity_case(monkeypatch, "linear", train=False, with_time=True)


def test_grad_parity_irregular_train(monkeypatch):
    _grad_parity_case(monkeypatch, "linear", train=True)


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
