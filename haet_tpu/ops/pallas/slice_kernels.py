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

Both are wrapped in ``jax.custom_vjp`` whose backward recomputes through the
reference XLA composition (:mod:`haet_tpu.ops.slice_ops`), so gradients are
exactly the XLA gradients and the memory saving also applies to the forward
of the backward pass.

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
    """
    return _slice_states_impl(x_proj, w_slice, b_slice, w_ada, b_ada,
                              base_temp, epsilon, tile_n)


def _slice_states_impl(x_proj, w_slice, b_slice, w_ada, b_ada,
                       base_temp, epsilon, tile_n):
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
            jax.ShapeDtypeStruct((bh, g, c), x_proj.dtype),
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


def _xla_weights(x_proj, w_slice, b_slice, w_ada, b_ada, base_temp, epsilon):
    temp_raw = x_proj @ w_ada + b_ada
    tau = slice_ops.ada_temp(temp_raw, base_temp)
    logits = x_proj @ w_slice + b_slice
    return slice_ops.rep_slice_weights(logits, tau, epsilon)


def _slice_states_fwd(x_proj, w_slice, b_slice, w_ada, b_ada,
                      base_temp, epsilon, tile_n):
    out = _slice_states_impl(x_proj, w_slice, b_slice, w_ada, b_ada,
                             base_temp, epsilon, tile_n)
    return out, (x_proj, w_slice, b_slice, w_ada, b_ada)


def _slice_states_bwd(base_temp, epsilon, tile_n, res, grads):
    x_proj, w_slice, b_slice, w_ada, b_ada = res
    g_states, _, _ = grads  # m, s residuals carry no cotangent

    def ref(x_proj, w_slice, b_slice, w_ada, b_ada):
        w = _xla_weights(x_proj, w_slice, b_slice, w_ada, b_ada,
                         base_temp, epsilon)
        return slice_ops.eidetic_states(x_proj, w)

    _, vjp = jax.vjp(ref, x_proj, w_slice, b_slice, w_ada, b_ada)
    return vjp(g_states.astype(jnp.float32))


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
    return out, (x_proj, w_slice, b_slice, w_ada, b_ada, states)


def _deslice_bwd(base_temp, epsilon, tile_n, res, g_out):
    x_proj, w_slice, b_slice, w_ada, b_ada, states = res

    def ref(x_proj, w_slice, b_slice, w_ada, b_ada, states):
        w = _xla_weights(x_proj, w_slice, b_slice, w_ada, b_ada,
                         base_temp, epsilon)
        return slice_ops.deslice(states, w)

    _, vjp = jax.vjp(ref, x_proj, w_slice, b_slice, w_ada, b_ada, states)
    grads = vjp(g_out.astype(jnp.float32))
    return (*grads, None, None)


deslice.defvjp(_deslice_fwd, _deslice_bwd)
