"""Full ErwinTransformer forward vs a torch oracle.

The oracle re-states the reference's whole forward chain
(``erwin_flash.py:138-195`` + ``layers.py`` + ``pooling.py``) in torch:
permute into tree order, encoder blocks with rotation on odd blocks, ball
pooling, bottleneck, unpooling + decoder blocks, mask-aware unpermute —
with the *same* grouping permutations (passed explicitly) and the *same*
weights (copied from the flax params). This validates the complete
permutation / rotation / pool / unpool plumbing, not just the individual
components.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from haet_tpu.models.erwin import ErwinTransformer
from haet_tpu.ops.ball_groups import build_erwin_perms

B, N, C_IN, D = 2, 32, 8, 3
C_HIDDEN = (8, 16)
BALL_SIZES = (8, 4)
STRIDES = (2,)
HEADS = (2, 2)
DEPTHS = (2, 2)
DEC_HEADS = (2,)
DEC_DEPTHS = (2,)


def t(a):
    return torch.from_numpy(np.array(a, dtype=np.float32))


def torch_rmsnorm(x, scale, eps=1e-6):
    var = (x ** 2).mean(-1, keepdim=True)
    return x * torch.rsqrt(var + eps) * scale


def torch_ball_msa(x, pos, p, heads, ball_size, use_bias=True):
    """x: [M, C] in tree order; reference attention.py semantics."""
    M, C = x.shape
    bs = min(ball_size, M)
    nb = M // bs
    pb = pos.view(nb, bs, -1)
    rel = (pb - pb.mean(dim=1, keepdim=True)).reshape(M, -1)
    x = x + rel @ t(p["pe_proj"]["kernel"]) + t(p["pe_proj"]["bias"])
    qkv = x @ t(p["qkv"]["kernel"]) + t(p["qkv"]["bias"])
    hd = C // heads
    qkv = qkv.view(nb, bs, 3, heads, hd)
    q, k, v = (qkv[:, :, i].permute(0, 2, 1, 3) for i in range(3))
    logits = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
    if use_bias:
        sigma = t(p["sigma_att"])
        dist = torch.cdist(pb, pb, p=2).unsqueeze(1)
        logits = logits + sigma * dist
    attn = torch.softmax(logits, dim=-1)
    o = (attn @ v).permute(0, 2, 1, 3).reshape(M, C)
    return o @ t(p["proj"]["kernel"]) + t(p["proj"]["bias"])


def torch_swiglu(x, p):
    w1 = x @ t(p["w1"]["kernel"]) + t(p["w1"]["bias"])
    w2 = x @ t(p["w2"]["kernel"]) + t(p["w2"]["bias"])
    return (w2 * F.silu(w1)) @ t(p["w3"]["kernel"]) + t(p["w3"]["bias"])


def torch_block(x, pos, p, heads, ball_size):
    x = x + torch_ball_msa(
        torch_rmsnorm(x, t(p["norm1"]["scale"])), pos, p["BMSA"], heads,
        ball_size)
    return x + torch_swiglu(torch_rmsnorm(x, t(p["norm2"]["scale"])),
                            p["swiglu"])


def torch_bn_eval(x, p):
    # eval-mode BatchNorm with flax-init running stats (mean 0, var 1)
    return (x - 0.0) / math.sqrt(1.0 + 1e-5) * t(p["scale"]) + t(p["bias"])


def torch_basic_layer(x, pos, p, heads, ball_size, depth, rot, rot_inv,
                      stride=None, direction=None, children=None):
    """Returns (x, pos, children_state)."""
    if direction == "up":
        # unpool first (pooling.py:58-72)
        ch_x, ch_pos = children
        npar = x.shape[0]
        s = stride
        rel = (ch_pos.view(npar, s, -1) - pos[:, None]).reshape(npar, s * ch_pos.shape[1])
        cat = torch.cat([x, rel], dim=-1)
        up = (cat @ t(p["unpool"]["proj"]["kernel"])
              + t(p["unpool"]["proj"]["bias"])).reshape(npar * s, -1)
        x = torch_bn_eval(ch_x + up, p["unpool"]["norm"])
        pos = ch_pos

    for i in range(depth):
        bp = p[f"block{i}"]
        if i % 2 == 1 and rot is not None:  # rotation on odd blocks
            xr = x[rot]
            pr = pos[rot]
            out = torch_block(xr, pr, bp, heads, ball_size)
            x = out[rot_inv]
        else:
            x = torch_block(x, pos, bp, heads, ball_size)

    ch = None
    if direction == "down":
        s = stride
        M = x.shape[0]
        ch = (x.clone(), pos.clone())
        centers = pos.view(M // s, s, -1).mean(dim=1)
        rel = (pos.view(M // s, s, -1) - centers[:, None]).reshape(M // s, -1)
        cat = torch.cat([x.reshape(M // s, -1), rel], dim=1)
        x = torch_bn_eval(
            cat @ t(p["pool"]["proj"]["kernel"]) + t(p["pool"]["proj"]["bias"]),
            p["pool"]["norm"])
        pos = centers
    return x, pos, ch


def test_full_erwin_forward_matches_torch_oracle():
    rng = np.random.RandomState(0)
    x = rng.randn(B, N, C_IN).astype(np.float32)
    pos = rng.rand(B, N, D).astype(np.float32)

    model = ErwinTransformer(
        c_in=C_IN, c_hidden=C_HIDDEN, ball_sizes=BALL_SIZES,
        enc_num_heads=HEADS, enc_depths=DEPTHS, dec_num_heads=DEC_HEADS,
        dec_depths=DEC_DEPTHS, strides=STRIDES, rotate=45, mp_steps=0,
        embed=False, decode=True,
    )
    perms = build_erwin_perms(
        jnp.asarray(pos), ball_sizes=BALL_SIZES, strides=STRIDES,
        rotate_angle=45.0,
    )
    v = jax.jit(lambda x, p: model.init(jax.random.PRNGKey(0), x, p,
                                        perms=perms))(
        jnp.asarray(x), jnp.asarray(pos))
    out = np.asarray(model.apply(v, jnp.asarray(x), jnp.asarray(pos),
                                 perms=perms))

    params = jax.tree_util.tree_map(np.asarray, v["params"])

    for b in range(B):
        perm = np.asarray(perms.perm[b])
        unperm = np.asarray(perms.unperm[b])
        rot0 = torch.from_numpy(np.asarray(perms.rot_perms[0][b])).long()
        rot0i = torch.from_numpy(np.asarray(perms.rot_inv_perms[0][b])).long()
        rot1 = torch.from_numpy(np.asarray(perms.rot_perms[1][b])).long()
        rot1i = torch.from_numpy(np.asarray(perms.rot_inv_perms[1][b])).long()

        xt = t(x[b][perm])
        pt = t(pos[b][perm])

        # encoder level 0 (down) with pooling
        x0, p0, ch0 = torch_basic_layer(
            xt, pt, params["encoder0"], HEADS[0], BALL_SIZES[0], DEPTHS[0],
            rot0, rot0i, stride=STRIDES[0], direction="down")
        # bottleneck
        x1, p1, _ = torch_basic_layer(
            x0, p0, params["bottleneck"], HEADS[1], BALL_SIZES[1], DEPTHS[1],
            rot1, rot1i)
        # decoder (up): unpool to children, then blocks with level-0 rotation
        x2, p2, _ = torch_basic_layer(
            x1, p1, params["decoder0"], DEC_HEADS[0], BALL_SIZES[0],
            DEC_DEPTHS[0], rot0, rot0i, stride=STRIDES[0], direction="up",
            children=ch0)
        ref = x2[torch.from_numpy(unperm).long()].numpy()

        np.testing.assert_allclose(out[b], ref, rtol=5e-4, atol=5e-5)
