"""Fused Pallas TPU kernels for the Transolver++ rep-slice tokenizer.

The two N-scaling hot ops of HAET (SURVEY.md §2.2, BASELINE.json north star)
are the slice-softmax -> eidetic-reduce and the deslice broadcast. The plain
XLA path materializes the ``[B, H, N, G]`` slice-weight tensor in HBM twice
(write after softmax, read in each einsum) — at 1M points, 8 heads, G=32
that's ~1 GB of traffic per layer. These kernels never materialize it:

* :func:`slice_states` — one pass over N tiles per (b, h): computes the
  Ada-Temp logits tile on the MXU, maintains an **online column softmax**
  (running max ``m[G]``, denominator ``s[G]``, rescaled accumulator
  ``acc[G, C]`` — the same trick as flash attention, but the reduction runs
  over the *points* axis, matching the reference's ``softmax(dim=2)``,
  ``StructuredMesh2D.py:199``), and emits the eidetic states
  ``acc / s / (1 + 1e-5)`` plus the residuals ``(m, s)``.
* :func:`deslice` — with ``(m, s)`` as residuals, each N tile recomputes its
  weight tile ``e = exp(logits - m) / s`` and contracts it with the
  transformed states: ``out = e @ states``; again no ``[N, G]`` round trip
  to HBM.

Both are wrapped in ``jax.custom_vjp`` whose backward is a hand-derived
**chunked** pass over N using the ``(m, s)`` softmax residuals: each chunk
recomputes its weight tile and applies the softmax-over-N jacobian
analytically (for :func:`slice_states` the coupling term
``t[g] = sum_n w*dL/dw`` even has a closed form in the eidetic states, so
one pass suffices; :func:`deslice` needs two). The ``[B, H, N, G]`` weight
tensor is therefore never materialized in EITHER direction — this is what
makes the fused path the max-N memory option for training (the previous
backward recomputed through the XLA composition, which allocated the full
weight tensor and negated the claim; measured in
``benchmarks/pallas_mem_sweep.py``).

Use :func:`fused_physics_tokenizer` / the ``use_pallas`` flag on
``PhysicsAttention*``; falls back to XLA off-TPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import slice_ops

DEFAULT_TILE_N = 512

#: set True to run kernels in interpreter mode (CPU tests)
INTERPRET = False


_HI = jax.lax.Precision.HIGHEST


def _tau(x_tile, w_ada, b_ada, base_temp):
    # HIGHEST precision: the softmax is exp-sensitive to logit error, and
    # these matmuls are tiny relative to the kernel's bandwidth cost.
    raw = jnp.dot(x_tile, w_ada, precision=_HI,
                  preferred_element_type=jnp.float32) + b_ada
    return base_temp + jnp.clip(raw, -0.4, 0.4)


def _logits_tile(x_tile, w_slice, b_slice, w_ada, b_ada, base_temp, shift):
    logits = jnp.dot(x_tile, w_slice, precision=_HI,
                     preferred_element_type=jnp.float32)
    logits = logits + b_slice - shift
    return logits / _tau(x_tile, w_ada, b_ada, base_temp)


def _slice_states_kernel(x_ref, ws_ref, bs_ref, wa_ref, ba_ref,
                         states_ref, m_ref, s_ref,
                         m_acc, s_acc, acc,
                         *, base_temp, shift, n_valid, tile_n):
    i = pl.program_id(1)
    x_tile = x_ref[0].astype(jnp.float32)          # [TN, C]
    logits = _logits_tile(
        x_tile, ws_ref[...].astype(jnp.float32), bs_ref[...].astype(jnp.float32),
        wa_ref[...].astype(jnp.float32), ba_ref[...].astype(jnp.float32),
        base_temp, shift,
    )                                               # [TN, G]
    row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + i * tile_n
    valid = row < n_valid
    logits = jnp.where(valid, logits, -jnp.inf)
    # zero padded rows: 0-weight x NaN/garbage would poison the contraction
    x_tile = jnp.where(valid[:, :1], x_tile, 0.0)

    @pl.when(i == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, -jnp.inf)
        s_acc[...] = jnp.zeros_like(s_acc)
        acc[...] = jnp.zeros_like(acc)

    m_old = m_acc[...]                              # [1, G]
    tile_max = jnp.max(logits, axis=0, keepdims=True)
    m_new = jnp.maximum(m_old, tile_max)
    # guard: all -inf column (empty tile) -> keep m finite for exp
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    e = jnp.where(valid, jnp.exp(logits - m_safe), 0.0)   # [TN, G]
    rescale = jnp.where(
        jnp.isfinite(m_old), jnp.exp(m_old - m_safe), 0.0
    )                                               # [1, G]
    s_acc[...] = s_acc[...] * rescale + jnp.sum(e, axis=0, keepdims=True)
    acc[...] = acc[...] * rescale.T + jax.lax.dot_general(
        e, x_tile, (((0,), (0,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )                                               # [G, C]
    m_acc[...] = m_new

    @pl.when(i == pl.num_programs(1) - 1)
    def _finalize():
        s = s_acc[...]
        denom = jnp.where(s > 0, s, 1.0)
        # states = (e^T x / s) / (sum_n w + 1e-5); sum_n w == 1 exactly
        # (softmax over N), so the slice-norm factor is (1 + 1e-5).
        states_ref[0] = (acc[...] / denom.T / (1.0 + 1e-5)).astype(
            states_ref.dtype
        )
        m_ref[0] = m_acc[...]
        s_ref[0] = s_acc[...]


def _deslice_kernel(x_ref, ws_ref, bs_ref, wa_ref, ba_ref, st_ref,
                    m_ref, s_ref, out_ref, *, base_temp, shift, n_valid,
                    tile_n):
    i = pl.program_id(1)
    x_tile = x_ref[0].astype(jnp.float32)
    logits = _logits_tile(
        x_tile, ws_ref[...].astype(jnp.float32), bs_ref[...].astype(jnp.float32),
        wa_ref[...].astype(jnp.float32), ba_ref[...].astype(jnp.float32),
        base_temp, shift,
    )
    row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + i * tile_n
    valid = row < n_valid
    m = m_ref[0, 0]                                 # [G]
    s = s_ref[0, 0]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    denom = jnp.where(s > 0, s, 1.0)
    w = jnp.where(valid, jnp.exp(logits - m_safe[None, :]), 0.0) / denom[None, :]
    out_ref[0] = jnp.dot(
        w, st_ref[0].astype(jnp.float32), precision=_HI,
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _pad_tiles(n, tile):
    return pl.cdiv(n, tile)


def _clamp_tile(tile_n: int, c: int) -> int:
    """Keep the tile's VMEM working set (~20 live [TN, C] f32 buffers)
    inside the ~16 MB scoped limit."""
    cap = max(256, 1 << (65536 // max(c, 1)).bit_length() - 1)
    return min(tile_n, cap)


def _flatten_heads(x):
    b, h, n, c = x.shape
    return x.reshape(b * h, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def slice_states(x_proj, w_slice, b_slice, w_ada, b_ada,
                 base_temp=0.5, epsilon=1e-6, tile_n=DEFAULT_TILE_N):
    """Fused eidetic-state computation.

    Args:
        x_proj: ``[B, H, N, C]``.
        w_slice/b_slice: slice head params (``[C, G]``, ``[G]``).
        w_ada/b_ada: Ada-Temp params (``[C, 1]``, ``[1]``).

    Returns:
        ``(states [B,H,G,C], m [B,H,G], s [B,H,G])``.

    Gradient contract: only the ``states`` output is differentiable. The
    ``m``/``s`` softmax residuals exist to feed :func:`deslice`'s backward;
    the custom VJP DISCARDS any cotangent arriving on them (a loss that
    directly consumes m or s gets a silent zero gradient for that term) —
    same for the w_out/tau_out auxiliaries of ``deslice``.
    """
    return _slice_states_impl(x_proj, w_slice, b_slice, w_ada, b_ada,
                              base_temp, epsilon, tile_n)


def _slice_states_impl(x_proj, w_slice, b_slice, w_ada, b_ada,
                       base_temp, epsilon, tile_n):
    states, m, s = _slice_states_impl_f32(
        x_proj, w_slice, b_slice, w_ada, b_ada, base_temp, epsilon, tile_n)
    return states.astype(x_proj.dtype), m, s


def _slice_states_impl_f32(x_proj, w_slice, b_slice, w_ada, b_ada,
                           base_temp, epsilon, tile_n):
    """Like :func:`_slice_states_impl` but keeps the states in the f32 the
    kernel accumulated them in — the backward reconstructs A and the
    coupling term t from them, and a bf16 round-trip there would inject
    bf16-level error into every point's dL/dw (ADVICE r2). G*C is tiny."""
    b, h, n, c = x_proj.shape
    g = w_slice.shape[1]
    xf = _flatten_heads(x_proj)
    bh = b * h
    shift = math.log(-math.log(epsilon))
    tile_n = _clamp_tile(tile_n, c)
    tiles = _pad_tiles(n, tile_n)

    kernel = functools.partial(
        _slice_states_kernel, base_temp=base_temp, shift=shift,
        n_valid=n, tile_n=tile_n,
    )
    states, m, s = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(bh, tiles),
        in_specs=[
            pl.BlockSpec((1, tile_n, c), lambda bi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, g), lambda bi, ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g,), lambda bi, ni: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda bi, ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda bi, ni: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, g, c), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, g, c), jnp.float32),
            jax.ShapeDtypeStruct((bh, 1, g), jnp.float32),
            jax.ShapeDtypeStruct((bh, 1, g), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, g), jnp.float32),
            pltpu.VMEM((1, g), jnp.float32),
            pltpu.VMEM((g, c), jnp.float32),
        ],
    )(xf, w_slice, b_slice, w_ada, b_ada)
    m = m[:, 0]
    s = s[:, 0]
    return (states.reshape(b, h, g, c), m.reshape(b, h, g),
            s.reshape(b, h, g))  # m/s emitted as [bh,1,g]


# ---------------------------------------------------------------------------
# Chunked hand-derived backward
#
# Forward math (per (b,h), softmax over the points axis n):
#   raw[n]    = x[n,:] @ Wa + ba
#   tau[n]    = base + clip(raw[n], ±0.4)
#   pre[n,g]  = x[n,:] @ Ws + bs − log(−log ε)
#   logit     = pre / tau
#   w[n,g]    = exp(logit − m[g]) / s[g]            (m, s: fwd residuals)
#   A[g,c]    = Σ_n w[n,g] x[n,c];  states = A / (1 + 1e-5)   (Σ_n w == 1)
#
# Given dL/dw[n,g], the softmax-over-n jacobian gives
#   dL/dlogit[n,g] = w[n,g] (dL/dw[n,g] − t[g]),  t[g] = Σ_n w dL/dw,
# then the Ada-Temp chain:
#   dL/dpre = dL/dlogit / tau
#   dL/dtau[n] = −Σ_g dL/dlogit[n,g] · logit[n,g] / tau[n]
#   dL/draw = dL/dtau · 1{|raw| < 0.4}
#   dL/dx  += dL/dpre @ Wsᵀ + dL/draw @ Waᵀ
# All of it decomposes over n-chunks once (m, s) are known — no [N, G]
# tensor is ever alive beyond one chunk.
# ---------------------------------------------------------------------------

_BWD_CHUNK = 64 * 1024


def _w_chunk(xc, w_slice, b_slice, w_ada, b_ada, base_temp, shift, m, s,
             valid):
    """Recompute (w, logit, tau, raw) for one [BH, T, C] chunk (f32)."""
    raw = jnp.einsum("btc,co->bto", xc, w_ada, precision=_HI) + b_ada
    tau = base_temp + jnp.clip(raw, -0.4, 0.4)
    pre = jnp.einsum("btc,cg->btg", xc, w_slice, precision=_HI) \
        + b_slice - shift
    logit = pre / tau
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    denom = jnp.where(s > 0, s, 1.0)
    w = jnp.exp(logit - m_safe[:, None, :]) / denom[:, None, :]
    w = jnp.where(valid, w, 0.0)
    return w, logit, tau, raw


def _chain_to_inputs(xc, w, dw, t, logit, tau, raw, w_slice, w_ada, valid):
    """dL/dw -> (dx_extra, dWs, dbs, dWa, dba) for one chunk."""
    dlogit = jnp.where(valid, w * (dw - t[:, None, :]), 0.0)
    dpre = dlogit / tau
    dtau = -jnp.sum(dlogit * logit, axis=-1, keepdims=True) / tau
    draw = jnp.where((raw > -0.4) & (raw < 0.4), dtau, 0.0)
    dx = jnp.einsum("btg,cg->btc", dpre, w_slice, precision=_HI) \
        + jnp.einsum("bto,co->btc", draw, w_ada, precision=_HI)
    dWs = jnp.einsum("btc,btg->cg", xc, dpre, precision=_HI)
    dbs = jnp.sum(dpre, axis=(0, 1))
    dWa = jnp.einsum("btc,bto->co", xc, draw, precision=_HI)
    dba = jnp.sum(draw, axis=(0, 1))
    return dx, dWs, dbs, dWa, dba


def _pad_chunks(xf, n):
    chunk = min(_BWD_CHUNK, max(256, n))
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        xf = jnp.pad(xf, ((0, 0), (0, n_pad - n), (0, 0)))
    return xf, chunk, n_pad // chunk


def _slice_states_fwd(x_proj, w_slice, b_slice, w_ada, b_ada,
                      base_temp, epsilon, tile_n):
    # Save the f32 states as the residual (the public output is rounded to
    # the compute dtype) so the backward's A/t reconstruction matches the
    # kernel's f32 accumulation exactly.
    states_f32, m, s = _slice_states_impl_f32(
        x_proj, w_slice, b_slice, w_ada, b_ada, base_temp, epsilon, tile_n)
    out = (states_f32.astype(x_proj.dtype), m, s)
    return out, (x_proj, w_slice, b_slice, w_ada, b_ada, states_f32, m, s)


def _slice_states_bwd(base_temp, epsilon, tile_n, res, grads):
    x_proj, w_slice, b_slice, w_ada, b_ada, states, m, s = res
    g_states = grads[0].astype(jnp.float32)  # m, s carry no cotangent
    b, h, n, c = x_proj.shape
    g = w_slice.shape[1]
    bh = b * h
    shift = math.log(-math.log(epsilon))

    acc_dt = jnp.result_type(jnp.float32, x_proj.dtype)
    xf = _flatten_heads(x_proj)
    st = _flatten_heads(states).astype(acc_dt)          # [BH, G, C]
    Gs = _flatten_heads(g_states).astype(acc_dt)
    mf = m.reshape(bh, g).astype(acc_dt)
    sf = s.reshape(bh, g).astype(acc_dt)
    ws = w_slice.astype(acc_dt)
    bs = b_slice.astype(acc_dt)
    wa = w_ada.astype(acc_dt)
    ba = b_ada.astype(acc_dt)

    # states = A / (1 + 1e-5) with Σ_n w == 1 (exact softmax), and the
    # norm's own gradient: dL/dw gains dnorm[g] = −Σ_c Ĝ·states.
    Ghat = Gs / (1.0 + 1e-5)                            # [BH, G, C]
    A = st * (1.0 + 1e-5)
    dnorm = -jnp.einsum("bgc,bgc->bg", Ghat, st, precision=_HI)
    # closed form for the softmax coupling: t[g] = Σ_n w (x@Ĝᵀ + dnorm)
    #   = Σ_c Ĝ[g,c] A[g,c] + dnorm[g]   (since Σ_n w x = A, Σ_n w = 1)
    t = jnp.einsum("bgc,bgc->bg", Ghat, A, precision=_HI) + dnorm

    xp, chunk, n_chunks = _pad_chunks(xf, n)

    def body(carry, ci):
        dWs, dbs, dWa, dba = carry
        start = ci * chunk
        xc = jax.lax.dynamic_slice(
            xp, (0, start, 0), (bh, chunk, c)).astype(acc_dt)
        row = start + jnp.arange(chunk)
        valid = (row < n)[None, :, None]
        w, logit, tau, raw = _w_chunk(
            xc, ws, bs, wa, ba, base_temp, shift, mf, sf, valid)
        dw = jnp.einsum("btc,bgc->btg", xc, Ghat, precision=_HI) \
            + dnorm[:, None, :]
        dx = jnp.einsum("btg,bgc->btc", w, Ghat, precision=_HI)  # A-path
        dx2, dWs_c, dbs_c, dWa_c, dba_c = _chain_to_inputs(
            xc, w, dw, t, logit, tau, raw, ws, wa, valid)
        return (dWs + dWs_c, dbs + dbs_c, dWa + dWa_c, dba + dba_c), dx + dx2

    zeros = (jnp.zeros((c, g), acc_dt), jnp.zeros((g,), acc_dt),
             jnp.zeros((c, 1), acc_dt), jnp.zeros((1,), acc_dt))
    (dWs, dbs, dWa, dba), dx_chunks = jax.lax.scan(
        body, zeros, jnp.arange(n_chunks))
    dx = jnp.moveaxis(dx_chunks, 0, 1).reshape(bh, n_chunks * chunk, c)
    dx = dx[:, :n].reshape(b, h, n, c).astype(x_proj.dtype)
    return (dx, dWs.astype(w_slice.dtype), dbs.astype(b_slice.dtype),
            dWa.astype(w_ada.dtype), dba.astype(b_ada.dtype))


slice_states.defvjp(_slice_states_fwd, _slice_states_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def deslice(x_proj, w_slice, b_slice, w_ada, b_ada, states, m, s,
            base_temp=0.5, epsilon=1e-6, tile_n=DEFAULT_TILE_N):
    """Fused deslice: ``out[b,h,n,c] = sum_g w[b,h,n,g] * states[b,h,g,c]``
    with the weight tile recomputed from ``(m, s)`` residuals."""
    return _deslice_impl(x_proj, w_slice, b_slice, w_ada, b_ada, states, m, s,
                         base_temp, epsilon, tile_n)


def _deslice_impl(x_proj, w_slice, b_slice, w_ada, b_ada, states, m, s,
                  base_temp, epsilon, tile_n):
    b, h, n, c = x_proj.shape
    g = w_slice.shape[1]
    xf = _flatten_heads(x_proj)
    stf = _flatten_heads(states)
    mf = m.reshape(b * h, 1, g)
    sf = s.reshape(b * h, 1, g)
    bh = b * h
    shift = math.log(-math.log(epsilon))
    tile_n = _clamp_tile(tile_n, c)
    tiles = _pad_tiles(n, tile_n)

    kernel = functools.partial(
        _deslice_kernel, base_temp=base_temp, shift=shift, n_valid=n,
        tile_n=tile_n,
    )
    out = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(bh, tiles),
        in_specs=[
            pl.BlockSpec((1, tile_n, c), lambda bi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, g), lambda bi, ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g,), lambda bi, ni: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda bi, ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda bi, ni: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, c), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, c), lambda bi, ni: (bi, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tiles * tile_n, c), x_proj.dtype),
    )(xf, w_slice, b_slice, w_ada, b_ada, stf, mf, sf)
    return out[:, :n].reshape(b, h, n, c)


def _deslice_fwd(x_proj, w_slice, b_slice, w_ada, b_ada, states, m, s,
                 base_temp, epsilon, tile_n):
    out = _deslice_impl(x_proj, w_slice, b_slice, w_ada, b_ada, states, m, s,
                        base_temp, epsilon, tile_n)
    return out, (x_proj, w_slice, b_slice, w_ada, b_ada, states, m, s)


def _deslice_bwd(base_temp, epsilon, tile_n, res, g_out):
    """Chunked backward of ``out[n,c] = Σ_g w[n,g] st[g,c]``.

    Unlike :func:`_slice_states_bwd`, the softmax coupling
    ``t[g] = Σ_n w[n,g] (g_out @ stᵀ)[n,g]`` has no closed form, so two
    chunked passes run over N: pass 1 accumulates ``t`` and ``dL/dst``,
    pass 2 applies the jacobian chain. Still no [N, G] residency.
    """
    x_proj, w_slice, b_slice, w_ada, b_ada, states, m, s = res
    acc_dt = jnp.result_type(jnp.float32, x_proj.dtype)
    go = g_out.astype(acc_dt)
    b, h, n, c = x_proj.shape
    g = w_slice.shape[1]
    bh = b * h
    shift = math.log(-math.log(epsilon))

    xf = _flatten_heads(x_proj)
    st = _flatten_heads(states).astype(acc_dt)          # [BH, G, C]
    gof = _flatten_heads(go)
    mf = m.reshape(bh, g).astype(acc_dt)
    sf = s.reshape(bh, g).astype(acc_dt)
    ws = w_slice.astype(acc_dt)
    bs = b_slice.astype(acc_dt)
    wa = w_ada.astype(acc_dt)
    ba = b_ada.astype(acc_dt)

    xp, chunk, n_chunks = _pad_chunks(xf, n)
    gop, _, _ = _pad_chunks(gof, n)

    def slice_chunk(arr, ci):
        return jax.lax.dynamic_slice(
            arr, (0, ci * chunk, 0), (bh, chunk, arr.shape[2])
        ).astype(acc_dt)

    def valid_mask(ci):
        row = ci * chunk + jnp.arange(chunk)
        return (row < n)[None, :, None]

    def pass1(carry, ci):
        t, dst = carry
        xc = slice_chunk(xp, ci)
        goc = slice_chunk(gop, ci)
        valid = valid_mask(ci)
        w, *_ = _w_chunk(xc, ws, bs, wa, ba, base_temp, shift, mf, sf, valid)
        dw = jnp.einsum("btc,bgc->btg", goc, st, precision=_HI)
        t = t + jnp.einsum("btg,btg->bg", w, dw, precision=_HI)
        dst = dst + jnp.einsum("btg,btc->bgc", w, goc, precision=_HI)
        return (t, dst), None

    (t, dst), _ = jax.lax.scan(
        pass1,
        (jnp.zeros((bh, g), acc_dt), jnp.zeros((bh, g, c), acc_dt)),
        jnp.arange(n_chunks),
    )

    def pass2(carry, ci):
        dWs, dbs, dWa, dba = carry
        xc = slice_chunk(xp, ci)
        goc = slice_chunk(gop, ci)
        valid = valid_mask(ci)
        w, logit, tau, raw = _w_chunk(
            xc, ws, bs, wa, ba, base_temp, shift, mf, sf, valid)
        dw = jnp.einsum("btc,bgc->btg", goc, st, precision=_HI)
        dx, dWs_c, dbs_c, dWa_c, dba_c = _chain_to_inputs(
            xc, w, dw, t, logit, tau, raw, ws, wa, valid)
        return (dWs + dWs_c, dbs + dbs_c, dWa + dWa_c, dba + dba_c), dx

    zeros = (jnp.zeros((c, g), acc_dt), jnp.zeros((g,), acc_dt),
             jnp.zeros((c, 1), acc_dt), jnp.zeros((1,), acc_dt))
    (dWs, dbs, dWa, dba), dx_chunks = jax.lax.scan(
        pass2, zeros, jnp.arange(n_chunks))
    dx = jnp.moveaxis(dx_chunks, 0, 1).reshape(bh, n_chunks * chunk, c)
    dx = dx[:, :n].reshape(b, h, n, c).astype(x_proj.dtype)
    return (dx, dWs.astype(w_slice.dtype), dbs.astype(b_slice.dtype),
            dWa.astype(w_ada.dtype), dba.astype(b_ada.dtype),
            dst.reshape(b, h, g, c).astype(states.dtype), None, None)


deslice.defvjp(_deslice_fwd, _deslice_bwd)
