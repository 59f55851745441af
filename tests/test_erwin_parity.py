"""Erwin component numerics vs torch oracles with identical weights.

Each oracle re-states the reference math (``erwinflash/components/``) in
torch; flax params are injected so outputs must match to fp32 tolerance.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from haet_tpu.models.erwin import BallMSA, BallPooling, BallUnpooling, Node

B, N, C, D, BS, H = 2, 8, 16, 3, 4, 4


def t(a):
    return torch.from_numpy(np.asarray(a))


def test_ball_msa_matches_torch_oracle():
    rng = np.random.RandomState(0)
    x = rng.randn(B, N, C).astype(np.float32)
    pos = rng.randn(B, N, D).astype(np.float32)

    m = BallMSA(dim=C, num_heads=H, ball_size=BS, dimensionality=D,
                use_dist_bias=True)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pos))
    out = np.asarray(m.apply(v, jnp.asarray(x), jnp.asarray(pos)))

    p = v["params"]
    wpe, bpe = t(p["pe_proj"]["kernel"]), t(p["pe_proj"]["bias"])
    wqkv, bqkv = t(p["qkv"]["kernel"]), t(p["qkv"]["bias"])
    wproj, bproj = t(p["proj"]["kernel"]), t(p["proj"]["bias"])
    sigma = t(p["sigma_att"])  # [1, H, 1, 1]

    # torch oracle (reference attention.py:29-91, non-flash semantics with
    # the distance bias applied as in the vendored SDPA variant :49-51)
    xt = t(x).reshape(B * N, C)
    pt = t(pos).reshape(B * N, D)
    nb = (B * N) // BS
    pb = pt.view(nb, BS, D)
    rel = (pb - pb.mean(dim=1, keepdim=True)).view(-1, D)
    xt = xt + rel @ wpe + bpe
    qkv = (xt @ wqkv + bqkv).view(nb, BS, 3, H, C // H)
    q, k, vv = (qkv[:, :, i].permute(0, 2, 1, 3) for i in range(3))
    logits = (q @ k.transpose(-1, -2)) / math.sqrt(C // H)
    dist = torch.cdist(pb, pb, p=2).unsqueeze(1)
    logits = logits + sigma * dist
    attn = torch.softmax(logits, dim=-1)
    o = (attn @ vv).permute(0, 2, 1, 3).reshape(B * N, C)
    o = o @ wproj + bproj
    ref = o.view(B, N, C).numpy()

    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_ball_pooling_matches_torch_oracle():
    rng = np.random.RandomState(1)
    x = rng.randn(B, N, C).astype(np.float32)
    pos = rng.randn(B, N, D).astype(np.float32)
    stride, out_dim = 2, 12

    m = BallPooling(in_dim=C, out_dim=out_dim, stride=stride, dimensionality=D)
    node = Node(x=jnp.asarray(x), pos=jnp.asarray(pos))
    v = m.init(jax.random.PRNGKey(0), node)
    res = m.apply(v, node)  # eval mode (running stats: mean 0, var 1)

    p = v["params"]
    w, b = t(p["proj"]["kernel"]), t(p["proj"]["bias"])

    xt = t(x).reshape(B * N, C)
    pt = t(pos).reshape(B * N, D)
    centers = pt.view(-1, stride, D).mean(dim=1)
    relp = (pt.view(-1, stride, D) - centers[:, None]).reshape(-1, stride * D)
    cat = torch.cat([xt.reshape(-1, stride * C), relp], dim=1)
    lin = cat @ w + b
    bn = torch.nn.BatchNorm1d(out_dim)
    bn.eval()  # running stats mean 0 / var 1 == flax init
    ref = bn(lin).detach().numpy().reshape(B, N // stride, out_dim)

    np.testing.assert_allclose(np.asarray(res.x), ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(res.pos).reshape(-1, D), centers.numpy(), rtol=1e-5,
        atol=1e-6)
    assert res.children is not None


def test_ball_unpooling_matches_torch_oracle():
    rng = np.random.RandomState(2)
    stride = 2
    np_half = N // stride
    child_x = rng.randn(B, N, C).astype(np.float32)
    child_pos = rng.randn(B, N, D).astype(np.float32)
    parent_x = rng.randn(B, np_half, C).astype(np.float32)
    parent_pos = child_pos.reshape(B, np_half, stride, D).mean(axis=2)

    m = BallUnpooling(in_dim=C, out_dim=C, stride=stride, dimensionality=D)
    children = Node(x=jnp.asarray(child_x), pos=jnp.asarray(child_pos))
    parent = Node(x=jnp.asarray(parent_x), pos=jnp.asarray(parent_pos),
                  children=children)
    v = m.init(jax.random.PRNGKey(0), parent)
    res = m.apply(v, parent)

    p = v["params"]
    w, b = t(p["proj"]["kernel"]), t(p["proj"]["bias"])
    px = t(parent_x).reshape(-1, C)
    rel = (t(child_pos).reshape(-1, stride, D)
           - t(parent_pos).reshape(-1, D)[:, None]).reshape(-1, stride * D)
    up = (torch.cat([px, rel], dim=-1) @ w + b).reshape(-1, C)
    bn = torch.nn.BatchNorm1d(C)
    bn.eval()
    ref = bn(t(child_x).reshape(-1, C) + up).detach().numpy().reshape(B, N, C)

    np.testing.assert_allclose(np.asarray(res.x), ref, rtol=2e-4, atol=2e-5)


def test_erwin_rotation_inverse_consistency():
    """Rotating, attending, and un-rotating must preserve shape and be a
    bijection on block outputs (layers.py:85-91 semantics)."""
    from haet_tpu.models.erwin import ErwinTransformer
    from haet_tpu.ops.ball_groups import build_erwin_perms

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))
    pos = jnp.asarray(rng.rand(2, 32, 3).astype(np.float32))
    model = ErwinTransformer(
        c_in=8, c_hidden=(8, 16), ball_sizes=(8, 4), enc_num_heads=(2, 2),
        enc_depths=(2, 2), dec_num_heads=(2,), dec_depths=(2,), strides=(2,),
        rotate=45, mp_steps=0, embed=False,
    )
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x, pos)
    out = model.apply(v, x, pos)
    assert out.shape == (2, 32, 8)
    assert bool(jnp.isfinite(out).all())

    # supplying precomputed perms gives identical results
    perms = build_erwin_perms(pos, ball_sizes=(8, 4), strides=(2,),
                              rotate_angle=45.0)
    out2 = model.apply(v, x, pos, perms=perms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_erwin_decode_false_returns_coarse():
    from haet_tpu.models.erwin import ErwinTransformer

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 32, 8).astype(np.float32))
    pos = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
    model = ErwinTransformer(
        c_in=8, c_hidden=(8, 16), ball_sizes=(8, 4), enc_num_heads=(2, 2),
        enc_depths=(1, 1), dec_num_heads=(2,), dec_depths=(1,), strides=(2,),
        rotate=0, mp_steps=0, embed=False, decode=False,
    )
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x, pos)
    out, pos_coarse = model.apply(v, x, pos)
    assert out.shape == (1, 16, 16)
    assert pos_coarse.shape == (1, 16, 3)


def test_mpnn_matches_torch_oracle():
    """Value-level MPNN oracle (reference mpnn.py:20-75): message
    Linear([h_i,h_j,pos_i-pos_j]) -> GELU -> non-affine LayerNorm(eps 1e-5),
    scatter_mean aggregation at the receiver, update
    Linear([h, m]) -> non-affine LayerNorm, in-place residual. The repo's
    capped-degree dense-slab redesign must reproduce it exactly when given
    the identical edge set (VERDICT r2 #4)."""
    import torch.nn.functional as F

    from haet_tpu.models.erwin import MPNN
    from haet_tpu.ops.neighbors import knn_edges_brute

    Bb, Nn, K, Cc = 2, 24, 6, 8
    rng = np.random.RandomState(7)
    h0 = rng.randn(Bb, Nn, Cc).astype(np.float32)
    pos = rng.rand(Bb, Nn, D).astype(np.float32)
    idx, valid = knn_edges_brute(jnp.asarray(pos), K)
    # knock out some edges so the masked-mean denominator is exercised
    valid = np.array(valid)
    valid[:, ::5, -2:] = False
    idx_np, valid_np = np.asarray(idx), valid

    m = MPNN(dim=Cc, mp_steps=2, dimensionality=D)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(h0), jnp.asarray(pos),
               jnp.asarray(idx_np), jnp.asarray(valid_np))
    out = np.asarray(m.apply(v, jnp.asarray(h0), jnp.asarray(pos),
                             jnp.asarray(idx_np), jnp.asarray(valid_np)))
    p = v["params"]

    def ln(x):  # non-affine, torch-default eps (reference mpnn.py:29)
        return F.layer_norm(x, (x.shape[-1],), eps=1e-5)

    for b in range(Bb):
        # edge list (row=sender j, col=receiver i) from the slab
        rows, cols = [], []
        for i in range(Nn):
            for kk in range(K):
                if valid_np[b, i, kk]:
                    rows.append(int(idx_np[b, i, kk]))
                    cols.append(i)
        row = torch.tensor(rows)
        col = torch.tensor(cols)
        ht = t(h0[b])
        pt = t(pos[b])
        edge_attr = (pt[row] - pt[col]).detach()
        for step in range(2):
            wm = t(np.asarray(p[f"message_{step}"]["kernel"]))
            bm = t(np.asarray(p[f"message_{step}"]["bias"]))
            wu = t(np.asarray(p[f"update_{step}"]["kernel"]))
            bu = t(np.asarray(p[f"update_{step}"]["bias"]))
            msgs = torch.cat([ht[row], ht[col], edge_attr], dim=-1)
            msgs = ln(F.gelu(msgs @ wm + bm))
            agg = torch.zeros(Nn, Cc)
            agg.index_add_(0, col, msgs)
            cnt = torch.zeros(Nn).index_add_(
                0, col, torch.ones(len(cols))).clamp(min=1.0)
            agg = agg / cnt[:, None]
            upd = ln(torch.cat([ht, agg], dim=-1) @ wu + bu)
            ht = ht + upd
        np.testing.assert_allclose(out[b], ht.numpy(), rtol=2e-4, atol=2e-5)


def test_mpnn_message_order_matches_reference():
    """The reference concatenates [h_i(receiver-row? no: h[row]=sender),
    h[col]=receiver, pos_row - pos_col] (mpnn.py:57-58,69-70); the slab
    layout maps row=neighbor j, col=self i, edge_attr=pos_j - pos_i. A
    swapped concat would still converge but break weight-level parity —
    pin it by checking sensitivity: zeroing the first Cc input columns of
    the message kernel must remove the dependence on NEIGHBOR features."""
    from haet_tpu.models.erwin import MPNN
    from haet_tpu.ops.neighbors import knn_edges_brute

    Bb, Nn, K, Cc = 1, 12, 4, 6
    rng = np.random.RandomState(8)
    h0 = rng.randn(Bb, Nn, Cc).astype(np.float32)
    pos = rng.rand(Bb, Nn, D).astype(np.float32)
    idx, valid = knn_edges_brute(jnp.asarray(pos), K, include_self=False)

    m = MPNN(dim=Cc, mp_steps=1, dimensionality=D)
    v = m.init(jax.random.PRNGKey(1), jnp.asarray(h0), jnp.asarray(pos),
               idx, valid)
    params = jax.tree_util.tree_map(np.array, v["params"])
    params["message_0"]["kernel"][:Cc] = 0.0  # kill the h_j (sender) block

    h_pert = h0.copy()
    h_pert[0, 0] += 10.0  # perturb ONE point's features
    out_a = np.asarray(m.apply({"params": params}, jnp.asarray(h0),
                               jnp.asarray(pos), idx, valid))
    out_b = np.asarray(m.apply({"params": params}, jnp.asarray(h_pert),
                               jnp.asarray(pos), idx, valid))
    # with the sender block zeroed, point 0's features must not leak into
    # OTHER points' updates (no self edge)
    np.testing.assert_allclose(out_a[0, 1:], out_b[0, 1:], atol=1e-5)


def test_mpnn_grad_matches_torch_oracle():
    """Gradient-level MPNN oracle: dL/dh0 and dL/dparams of the capped-
    degree dense-slab redesign must match the torch restatement of the
    reference math (mpnn.py:48-75) on the identical edge set, including
    the detached edge_attr (reference computes pos differences outside the
    autograd tape; here lax.stop_gradient, erwin.py:380)."""
    import torch.nn.functional as F

    from haet_tpu.models.erwin import MPNN
    from haet_tpu.ops.neighbors import knn_edges_brute

    Bb, Nn, K, Cc = 2, 24, 6, 8
    rng = np.random.RandomState(9)
    h0 = rng.randn(Bb, Nn, Cc).astype(np.float32)
    pos = rng.rand(Bb, Nn, D).astype(np.float32)
    idx, valid = knn_edges_brute(jnp.asarray(pos), K)
    valid = np.array(valid)
    valid[:, ::4, -1] = False
    idx_np, valid_np = np.asarray(idx), valid

    m = MPNN(dim=Cc, mp_steps=2, dimensionality=D)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(h0), jnp.asarray(pos),
               jnp.asarray(idx_np), jnp.asarray(valid_np))

    def loss_jax(params, h):
        out = m.apply({"params": params}, h, jnp.asarray(pos),
                      jnp.asarray(idx_np), jnp.asarray(valid_np))
        return jnp.sum(out ** 2)

    gp_jax, gh_jax = jax.jit(jax.grad(loss_jax, argnums=(0, 1)))(
        v["params"], jnp.asarray(h0))

    # torch restatement with autograd
    p = v["params"]
    tp = {}
    for step in range(2):
        for kind in ("message", "update"):
            for leaf in ("kernel", "bias"):
                key = f"{kind}_{step}"
                tp[(key, leaf)] = t(np.asarray(p[key][leaf])).clone(
                    ).requires_grad_(True)

    def ln(x):
        return F.layer_norm(x, (x.shape[-1],), eps=1e-5)

    total = None
    ht_leaves = []
    for b in range(Bb):
        rows, cols = [], []
        for i in range(Nn):
            for kk in range(K):
                if valid_np[b, i, kk]:
                    rows.append(int(idx_np[b, i, kk]))
                    cols.append(i)
        row, col = torch.tensor(rows), torch.tensor(cols)
        ht0 = t(h0[b]).clone().requires_grad_(True)
        ht_leaves.append(ht0)
        pt = t(pos[b])
        edge_attr = (pt[row] - pt[col]).detach()
        ht = ht0
        for step in range(2):
            wm, bm = tp[(f"message_{step}", "kernel")], tp[(f"message_{step}", "bias")]
            wu, bu = tp[(f"update_{step}", "kernel")], tp[(f"update_{step}", "bias")]
            msgs = ln(F.gelu(torch.cat([ht[row], ht[col], edge_attr], -1) @ wm + bm))
            agg = torch.zeros(Nn, Cc).index_add(0, col, msgs)
            cnt = torch.zeros(Nn).index_add(
                0, col, torch.ones(len(cols))).clamp(min=1.0)
            ht = ht + ln(torch.cat([ht, agg / cnt[:, None]], -1) @ wu + bu)
        lb = torch.sum(ht ** 2)
        total = lb if total is None else total + lb
    total.backward()

    for b in range(Bb):
        np.testing.assert_allclose(np.asarray(gh_jax[b]),
                                   ht_leaves[b].grad.numpy(),
                                   rtol=2e-4, atol=2e-5)
    for (key, leaf), tensor in tp.items():
        np.testing.assert_allclose(np.asarray(gp_jax[key][leaf]),
                                   tensor.grad.numpy(),
                                   rtol=2e-4, atol=2e-5, err_msg=f"{key}/{leaf}")
