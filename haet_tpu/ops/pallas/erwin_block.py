"""Fused Pallas TPU kernel for a whole Erwin transformer block.

The Erwin stage of HAET runs on tiny per-(batch, head) clouds — ``G``
slice tokens (32-128) with channel widths 32-128 — so each
``ErwinTransformerBlock`` (reference ``erwinflash/components/layers.py:14-32``:
``x += BallMSA(RMSNorm(x), pos); x += SwiGLU(RMSNorm(x))``) is ~20 XLA ops
over KB-sized tensors: the step time is dominated by per-op overhead and
HBM round-trips, not FLOPs (profiled at 0.4-0.9 ms per block on v5e).

This kernel executes the **entire block in one Pallas program**: both
RMSNorms, the relative-position encoding, QKV, ball attention (with the
``sigma * cdist`` distance bias of reference ``attention.py:29-33``), the
output projection, SwiGLU, and both residuals — everything stays in VMEM.

Design notes (TPU/Mosaic-friendly):

* Several independent clouds are folded into one program: rows =
  ``TB * N`` points. Because balls never span clouds (both are powers of
  two), ball structure is expressed as a **block-diagonal mask** on a full
  ``[rows, rows]`` logit matrix — at these sizes a dense masked softmax is
  cheaper than gather/reshape bookkeeping, and every op is a plain 2D
  matmul / row reduction.
* Per-ball centroids (for the rel-pos encoding, reference
  ``attention.py:36-40``) and per-ball mean-subtraction in the backward are
  computed with the same mask as a matmul: ``ctr = (mask @ pos) / ball``.
* Heads are a static unrolled loop over pre-split ``[h, C, hd]`` weight
  slabs (sliced on the leading dim — no lane slicing).
* The backward is a second Pallas kernel that **recomputes** the forward
  from the saved ``(x, pos)`` (flash-style rematerialisation: no ``[N, N]``
  attention tensor is ever materialised in HBM) and accumulates parameter
  gradients across the sequential TPU grid.
* Everything computes in f32 regardless of the model's compute dtype; the
  tensors are tiny so bf16 buys nothing here.

The distance bias and the grouping are gradient-free in the reference
(``attention.py:29`` ``@torch.no_grad``); the backward therefore emits no
``sigma``/bias-path gradients, matching the XLA path's ``stop_gradient``.

Wrapped in ``jax.custom_vjp``; layout conversion (flax param layout <->
per-head slabs, cloud folding, padding) happens outside the vjp in plain
differentiable jnp ops, so flax-layout gradients fall out automatically.

Use via ``ErwinTransformerBlock(use_pallas=True)`` /
``use_pallas_erwin=True`` on the models.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: set True to run kernels in interpreter mode (CPU tests)
INTERPRET = False

#: target rows (clouds * points) per program; bounds the [rows, rows]
#: masked-attention working set (256^2 f32 = 256 KB per live buffer).
MAX_ROWS = 256

_EPS = 1e-6  # RMSNorm epsilon (models/erwin.py, flax default semantics)


def _mm(a, b):
    """a @ b (2D), f32 accumulate."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_nt(a, b):
    """a @ b.T without materializing the transpose (Mosaic-native)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_tn(a, b):
    """a.T @ b without materializing the transpose (Mosaic-native)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _same_ball(rows: int, bs: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // bs
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // bs
    return r == c


def _rmsnorm_fwd(x, g):
    r = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + _EPS)
    return x * r * g, r


def _rmsnorm_bwd(dz_times_g, x, r):
    """VJP of ``z = x * r`` given ``dz = d(out)/d(x*r)`` (scale already
    applied by the caller): ``dx = dz*r - x * r^3/C * sum(dz*x)``."""
    c = x.shape[-1]
    dot = jnp.sum(dz_times_g * x, axis=-1, keepdims=True)
    return dz_times_g * r - x * (dot * (r * r * r) / c)


def _silu(u):
    return u * jax.nn.sigmoid(u)


def _dsilu(u):
    s = jax.nn.sigmoid(u)
    return s * (1.0 + u * (1.0 - s))


def _attn_head(hm, pos, dist, mask, wq, bq, wk, bk, wv, bv, sig, scale,
               use_dist_bias):
    """Recompute one head's (q, k, v, a) — shared by fwd and bwd."""
    q = _mm(hm, wq) + bq
    k = _mm(hm, wk) + bk
    v = _mm(hm, wv) + bv
    logits = _mm_nt(q, k) * scale
    if use_dist_bias:
        logits = logits + sig * dist
    logits = jnp.where(mask, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    a = e / jnp.sum(e, axis=-1, keepdims=True)
    return q, k, v, a


def _dist_matrix(pos):
    pp = jnp.sum(pos * pos, axis=-1, keepdims=True)
    d2 = pp + pp.T - 2.0 * _mm_nt(pos, pos)
    return jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)


def _common_fwd(x, pos, refs, bs, h, use_dist_bias):
    """Shared fwd recomputation up to x1 (pre-MLP residual).

    Returns (xn, rel, hm, dist, mask, y)."""
    (g1, wpe, bpe, wq, bq, wk, bk, wv, bv, sig, wo, bo) = refs
    rows, c = x.shape
    hd = c // h
    scale = 1.0 / math.sqrt(hd)
    mask = _same_ball(rows, bs)
    maskf = mask.astype(jnp.float32)

    xn, _ = _rmsnorm_fwd(x, g1)
    ctr = _mm(maskf, pos) / bs
    rel = pos - ctr
    hm = xn + _mm(rel, wpe) + bpe
    dist = _dist_matrix(pos) if use_dist_bias else None

    y = jnp.zeros((rows, c), jnp.float32) + bo
    for i in range(h):
        _, _, v, a = _attn_head(
            hm, pos, dist, mask, wq[i], bq[i], wk[i], bk[i], wv[i], bv[i],
            sig[i, 0] if use_dist_bias else 0.0, scale, use_dist_bias,
        )
        o = _mm(a, v)
        y = y + _mm(o, wo[i])
    return xn, rel, hm, dist, mask, y


def _fwd_kernel(x_ref, pos_ref, g1_ref, wpe_ref, bpe_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, sig_ref,
                wo_ref, bo_ref, g2_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w3_ref, b3_ref, out_ref, *, bs, h, use_dist_bias):
    x = x_ref[0].astype(jnp.float32)
    pos = pos_ref[0].astype(jnp.float32)
    refs = (g1_ref[...].astype(jnp.float32),
            wpe_ref[...].astype(jnp.float32),
            bpe_ref[...].astype(jnp.float32),
            wq_ref[...].astype(jnp.float32), bq_ref[...].astype(jnp.float32),
            wk_ref[...].astype(jnp.float32), bk_ref[...].astype(jnp.float32),
            wv_ref[...].astype(jnp.float32), bv_ref[...].astype(jnp.float32),
            sig_ref, wo_ref[...].astype(jnp.float32),
            bo_ref[...].astype(jnp.float32))
    *_, y = _common_fwd(x, pos, refs, bs, h, use_dist_bias)

    x1 = x + y
    zn, _ = _rmsnorm_fwd(x1, g2_ref[...].astype(jnp.float32))
    u = _mm(zn, w1_ref[...].astype(jnp.float32)) + b1_ref[...]
    t = _mm(zn, w2_ref[...].astype(jnp.float32)) + b2_ref[...]
    sw = _mm(t * _silu(u), w3_ref[...].astype(jnp.float32)) + b3_ref[...]
    out_ref[0] = (x1 + sw).astype(out_ref.dtype)


def _bwd_kernel(x_ref, pos_ref, dout_ref, g1_ref, wpe_ref, bpe_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, sig_ref,
                wo_ref, bo_ref, g2_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w3_ref, b3_ref,
                dx_ref, dpos_ref, dg1_ref, dwpe_ref, dbpe_ref,
                dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                dwo_ref, dbo_ref, dg2_ref, dw1_ref, db1_ref, dw2_ref,
                db2_ref, dw3_ref, db3_ref, *, bs, h, use_dist_bias):
    grad_refs = (dg1_ref, dwpe_ref, dbpe_ref, dwq_ref, dbq_ref, dwk_ref,
                 dbk_ref, dwv_ref, dbv_ref, dwo_ref, dbo_ref, dg2_ref,
                 dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grad_refs:
            r[...] = jnp.zeros_like(r)

    x = x_ref[0].astype(jnp.float32)
    pos = pos_ref[0].astype(jnp.float32)
    dout = dout_ref[0].astype(jnp.float32)
    rows, c = x.shape
    hd = c // h
    scale = 1.0 / math.sqrt(hd)

    g1 = g1_ref[...].astype(jnp.float32)
    wpe = wpe_ref[...].astype(jnp.float32)
    bpe = bpe_ref[...].astype(jnp.float32)
    wq = wq_ref[...].astype(jnp.float32)
    bq = bq_ref[...].astype(jnp.float32)
    wk = wk_ref[...].astype(jnp.float32)
    bk = bk_ref[...].astype(jnp.float32)
    wv = wv_ref[...].astype(jnp.float32)
    bv = bv_ref[...].astype(jnp.float32)
    wo = wo_ref[...].astype(jnp.float32)
    bo = bo_ref[...].astype(jnp.float32)
    g2 = g2_ref[...].astype(jnp.float32)
    w1 = w1_ref[...].astype(jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)
    w2 = w2_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)
    w3 = w3_ref[...].astype(jnp.float32)

    refs = (g1, wpe, bpe, wq, bq, wk, bk, wv, bv, sig_ref, wo, bo)
    xn, rel, hm, dist, mask, y = _common_fwd(x, pos, refs, bs, h,
                                             use_dist_bias)
    maskf = mask.astype(jnp.float32)

    # ---- MLP half: out = x1 + w3(w2(zn) * silu(w1(zn))) -----------------
    x1 = x + y
    r2 = jax.lax.rsqrt(jnp.mean(x1 * x1, axis=-1, keepdims=True) + _EPS)
    zn = x1 * r2 * g2
    u = _mm(zn, w1) + b1
    t = _mm(zn, w2) + b2
    gate = _silu(u)
    gv = t * gate

    dsw = dout
    dw3_ref[...] += _mm_tn(gv, dsw)
    db3_ref[...] += jnp.sum(dsw, axis=0, keepdims=True)
    dgv = _mm_nt(dsw, w3)
    du = dgv * t * _dsilu(u)
    dt = dgv * gate
    dw1_ref[...] += _mm_tn(zn, du)
    db1_ref[...] += jnp.sum(du, axis=0, keepdims=True)
    dw2_ref[...] += _mm_tn(zn, dt)
    db2_ref[...] += jnp.sum(dt, axis=0, keepdims=True)
    dzn = (_mm_nt(du, w1)
           + _mm_nt(dt, w2))
    dg2_ref[...] += jnp.sum(dzn * x1 * r2, axis=0, keepdims=True)
    dx1 = dout + _rmsnorm_bwd(dzn * g2, x1, r2)

    # ---- attention half -------------------------------------------------
    dy = dx1
    dbo_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dhm = jnp.zeros((rows, c), jnp.float32)
    for i in range(h):
        sig_i = sig_ref[i, 0] if use_dist_bias else 0.0
        q, k, v, a = _attn_head(hm, pos, dist, mask, wq[i], bq[i], wk[i],
                                bk[i], wv[i], bv[i], sig_i, scale,
                                use_dist_bias)
        o = _mm(a, v)
        do = _mm_nt(dy, wo[i])
        dwo_ref[i] += _mm_tn(o, dy)
        da = _mm_nt(do, v)
        dv = _mm_tn(a, do)
        # softmax vjp; off-ball entries have a == 0, so ds vanishes there.
        ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
        dq = _mm(ds, k) * scale
        dk = _mm_tn(ds, q) * scale
        dwq_ref[i] += _mm_tn(hm, dq)
        dbq_ref[i] += jnp.sum(dq, axis=0, keepdims=True)
        dwk_ref[i] += _mm_tn(hm, dk)
        dbk_ref[i] += jnp.sum(dk, axis=0, keepdims=True)
        dwv_ref[i] += _mm_tn(hm, dv)
        dbv_ref[i] += jnp.sum(dv, axis=0, keepdims=True)
        dhm = (dhm + _mm_nt(dq, wq[i])
               + _mm_nt(dk, wk[i])
               + _mm_nt(dv, wv[i]))

    # hm = xn + rel @ wpe + bpe
    dwpe_ref[...] += _mm_tn(rel, dhm)
    dbpe_ref[...] += jnp.sum(dhm, axis=0, keepdims=True)
    drel = _mm_nt(dhm, wpe)
    # rel = pos - (mask @ pos)/bs  (centroid is mean over the ball)
    dpos = drel - _mm_tn(maskf, drel) / bs
    # norm1 backward
    r1 = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + _EPS)
    dg1_ref[...] += jnp.sum(dhm * x * r1, axis=0, keepdims=True)
    dx = dx1 + _rmsnorm_bwd(dhm * g1, x, r1)

    dx_ref[0] = dx.astype(dx_ref.dtype)
    dpos_ref[0] = dpos.astype(dpos_ref.dtype)


def _whole(shape):
    """BlockSpec for a grid-invariant (broadcast) operand."""
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, _nd=nd: (0,) * _nd,
                        memory_space=pltpu.VMEM)


def _sigma_spec(h):
    return pl.BlockSpec((h, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)


def _batched(shape):
    nd = len(shape)
    return pl.BlockSpec((1,) + shape[1:],
                        lambda b, _nd=nd: (b,) + (0,) * (_nd - 1),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(21, 22, 23))
def _fused_block(x, pos, g1, wpe, bpe, wq, bq, wk, bk, wv, bv, sigma,
                 wo, bo, g2, w1, b1, w2, b2, w3, b3, bs, h, use_dist_bias):
    return _fused_block_impl(x, pos, g1, wpe, bpe, wq, bq, wk, bk, wv, bv,
                             sigma, wo, bo, g2, w1, b1, w2, b2, w3, b3,
                             bs, h, use_dist_bias)


def _weight_args(g1, wpe, bpe, wq, bq, wk, bk, wv, bv, sigma, wo, bo, g2,
                 w1, b1, w2, b2, w3, b3, h):
    specs = [_whole(g1.shape), _whole(wpe.shape), _whole(bpe.shape),
             _whole(wq.shape), _whole(bq.shape), _whole(wk.shape),
             _whole(bk.shape), _whole(wv.shape), _whole(bv.shape),
             _sigma_spec(h), _whole(wo.shape), _whole(bo.shape),
             _whole(g2.shape), _whole(w1.shape), _whole(b1.shape),
             _whole(w2.shape), _whole(b2.shape), _whole(w3.shape),
             _whole(b3.shape)]
    args = (g1, wpe, bpe, wq, bq, wk, bk, wv, bv, sigma, wo, bo, g2,
            w1, b1, w2, b2, w3, b3)
    return specs, args


def _fused_block_impl(x, pos, g1, wpe, bpe, wq, bq, wk, bk, wv, bv, sigma,
                      wo, bo, g2, w1, b1, w2, b2, w3, b3,
                      bs, h, use_dist_bias):
    nb, rows, c = x.shape
    d = pos.shape[-1]
    wspecs, wargs = _weight_args(g1, wpe, bpe, wq, bq, wk, bk, wv, bv,
                                 sigma, wo, bo, g2, w1, b1, w2, b2, w3, b3,
                                 h)
    kernel = functools.partial(_fwd_kernel, bs=bs, h=h,
                               use_dist_bias=use_dist_bias)
    return pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(nb,),
        in_specs=[_batched((1, rows, c)), _batched((1, rows, d))] + wspecs,
        out_specs=_batched((1, rows, c)),
        out_shape=jax.ShapeDtypeStruct((nb, rows, c), x.dtype),
    )(x, pos, *wargs)


def _fused_block_fwd(x, pos, g1, wpe, bpe, wq, bq, wk, bk, wv, bv, sigma,
                     wo, bo, g2, w1, b1, w2, b2, w3, b3,
                     bs, h, use_dist_bias):
    out = _fused_block_impl(x, pos, g1, wpe, bpe, wq, bq, wk, bk, wv, bv,
                            sigma, wo, bo, g2, w1, b1, w2, b2, w3, b3,
                            bs, h, use_dist_bias)
    res = (x, pos, g1, wpe, bpe, wq, bq, wk, bk, wv, bv, sigma, wo, bo,
           g2, w1, b1, w2, b2, w3, b3)
    return out, res


def _fused_block_bwd(bs, h, use_dist_bias, res, dout):
    (x, pos, g1, wpe, bpe, wq, bq, wk, bk, wv, bv, sigma, wo, bo, g2,
     w1, b1, w2, b2, w3, b3) = res
    nb, rows, c = x.shape
    d = pos.shape[-1]
    wspecs, wargs = _weight_args(g1, wpe, bpe, wq, bq, wk, bk, wv, bv,
                                 sigma, wo, bo, g2, w1, b1, w2, b2, w3, b3,
                                 h)

    grad_shapes = [g1.shape, wpe.shape, bpe.shape, wq.shape, bq.shape,
                   wk.shape, bk.shape, wv.shape, bv.shape, wo.shape,
                   bo.shape, g2.shape, w1.shape, b1.shape, w2.shape,
                   b2.shape, w3.shape, b3.shape]
    kernel = functools.partial(_bwd_kernel, bs=bs, h=h,
                               use_dist_bias=use_dist_bias)
    outs = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(nb,),
        in_specs=[_batched((1, rows, c)), _batched((1, rows, d)),
                  _batched((1, rows, c))] + wspecs,
        out_specs=[_batched((1, rows, c)), _batched((1, rows, d))]
        + [_whole(s) for s in grad_shapes],
        out_shape=[jax.ShapeDtypeStruct((nb, rows, c), x.dtype),
                   jax.ShapeDtypeStruct((nb, rows, d), pos.dtype)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes],
    )(x, pos, dout, *wargs)
    (dx, dpos, dg1, dwpe, dbpe, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo,
     dg2, dw1, db1, dw2, db2, dw3, db3) = outs
    return (dx, dpos, dg1, dwpe, dbpe, dwq, dbq, dwk, dbk, dwv, dbv,
            jnp.zeros_like(sigma), dwo, dbo, dg2, dw1, db1, dw2, db2,
            dw3, db3)


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


def eligible(n: int, c: int, num_heads: int, dim: int) -> bool:
    """Shape gate for the fused path (VMEM working set, head divisibility).

    The kernel materializes several ``[rows, rows]`` f32 buffers (ball
    mask, distance matrix, per-head logits/softmax) with ``rows = tb*n``.
    Cloud folding caps rows at MAX_ROWS only when ``n <= MAX_ROWS``; a
    single larger cloud cannot be split (tb=1), so ``n`` itself must stay
    within the VMEM budget: at n=512 the ~6 live row-square buffers are
    ~6 MB, at n=1024 they exceed the ~16 MB VMEM and Mosaic fails to
    compile instead of this gate routing to the XLA path.
    """
    return (c == dim and c % num_heads == 0 and n <= 512 and c <= 512
            and (n & (n - 1)) == 0)


def fused_erwin_block(x, pos, params: dict, *, ball_size: int,
                      num_heads: int, use_dist_bias: bool = True):
    """Run one Erwin transformer block via the fused kernel.

    Args:
        x: ``[B, N, C]`` features (any float dtype; computed in f32).
        pos: ``[B, N, D]`` positions.
        params: the block's flax param subtree —
            ``norm1/scale, BMSA/{pe_proj,qkv,proj}/{kernel,bias},
            BMSA/sigma_att (if use_dist_bias), norm2/scale,
            swiglu/{w1,w2,w3}/{kernel,bias}``.
        ball_size: requested ball size (clamped to the cloud like BallMSA).
        num_heads: attention heads (C divisible by it).

    Returns ``[B, N, C]`` in ``x.dtype``.
    """
    b, n, c = x.shape
    d = pos.shape[-1]
    h = num_heads
    hd = c // h
    bs = 1 << (min(ball_size, n).bit_length() - 1)

    bmsa = params["BMSA"]
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    g1 = f32(params["norm1"]["scale"]).reshape(1, c)
    g2 = f32(params["norm2"]["scale"]).reshape(1, c)
    wpe = f32(bmsa["pe_proj"]["kernel"])
    bpe = f32(bmsa["pe_proj"]["bias"]).reshape(1, c)
    wqkv = f32(bmsa["qkv"]["kernel"])        # [C, 3C], cols = (3, h, hd)
    bqkv = f32(bmsa["qkv"]["bias"])
    wq, wk, wv = (wqkv[:, i * c:(i + 1) * c].reshape(c, h, hd)
                  .transpose(1, 0, 2) for i in range(3))
    bq, bk, bv = (bqkv[i * c:(i + 1) * c].reshape(h, 1, hd)
                  for i in range(3))
    sigma = (f32(bmsa["sigma_att"]).reshape(h, 1) if use_dist_bias
             else jnp.zeros((h, 1), jnp.float32))
    wo = f32(bmsa["proj"]["kernel"]).reshape(h, hd, c)
    bo = f32(bmsa["proj"]["bias"]).reshape(1, c)
    sw = params["swiglu"]
    w1 = f32(sw["w1"]["kernel"])
    b1 = f32(sw["w1"]["bias"]).reshape(1, -1)
    w2 = f32(sw["w2"]["kernel"])
    b2 = f32(sw["w2"]["bias"]).reshape(1, -1)
    w3 = f32(sw["w3"]["kernel"])
    b3 = f32(sw["w3"]["bias"]).reshape(1, c)

    # Fold several clouds into one program (balls never span clouds).
    tb = max(1, min(b, MAX_ROWS // n))
    bp = -(-b // tb) * tb
    if bp != b:
        padb = bp - b
        x = jnp.concatenate([x, jnp.zeros((padb, n, c), x.dtype)], axis=0)
        pos = jnp.concatenate([pos, jnp.zeros((padb, n, d), pos.dtype)],
                              axis=0)
    xg = x.reshape(bp // tb, tb * n, c)
    posg = pos.reshape(bp // tb, tb * n, d)

    out = _fused_block(xg, posg, g1, wpe, bpe, wq, bq, wk, bk, wv, bv,
                       sigma, wo, bo, g2, w1, b1, w2, b2, w3, b3,
                       bs, h, use_dist_bias)
    return out.reshape(bp, n, c)[:b]
