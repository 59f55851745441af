"""HAET model variants — the user-facing model API.

TPU-native rebuilds of the reference's three ``Model`` classes with the exact
constructor surface (``models/__init__.py:15-23``):

* :class:`HAETransolverStructuredMesh2D`
  (reference ``HAETransolver_Structured_Mesh_2D.py:146``)
* :class:`HAETransolverStructuredMesh3D`
  (reference ``HAETransolver_Structured_Mesh_3D.py:152``)
* :class:`HAETransolverIrregularMesh`
  (reference ``HAETransolver_Irregular_Mesh.py:137``)

Each is a stack of pre-LN residual blocks
``fx = Attn(LN(fx)) + fx; fx = MLP(LN(fx)) + fx`` with a final
``LN + Linear(out_dim)`` on the last block
(reference ``HAETransolver_Structured_Mesh_2D.py:123-143``), over the
physics-attention tokenizer of :mod:`haet_tpu.models.physics_attention`.

Call convention mirrors the reference: ``model.apply(vars, x, fx, T=None)``
with ``x: [B, N, space_dim]`` coordinates, ``fx: [B, N, fun_dim]`` function
values (or None), optional ``T: [B, 1]`` times. Returns ``[B, N, out_dim]``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .components.embedding import timestep_embedding
from .components.mlp import MLP, trunc_normal_init
from .physics_attention import (
    PhysicsAttentionIrregularMesh,
    PhysicsAttentionStructuredMesh2D,
    PhysicsAttentionStructuredMesh3D,
)

_ERWIN_KEYS = (
    "c_hidden", "ball_sizes", "enc_num_heads", "enc_depths", "dec_num_heads",
    "dec_depths", "strides", "rotate", "decode", "mp_steps", "embed",
    "use_dist_bias", "grouping", "orthogonal_slice_init", "use_pallas",
    "pallas_auto_threshold", "use_pallas_erwin",
)


def _placeholder_init(n_hidden: int):
    """``(1/n_hidden) * U[0,1)`` (reference ``..._2D.py:292-294``)."""
    def init(key, shape, dtype=jnp.float32):
        import jax
        return jax.random.uniform(key, shape, dtype) / n_hidden
    return init


class TransolverErwinBlock(nn.Module):
    """Pre-LN residual block (reference ``..._2D.py:17-143``)."""

    num_heads: int
    hidden_dim: int
    dropout: float
    act: str = "gelu"
    mlp_ratio: int = 4
    last_layer: bool = False
    out_dim: int = 1
    attn_cls: type = PhysicsAttentionIrregularMesh
    attn_kwargs: dict | None = None
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fx, train: bool = False):
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name,
        )
        # attn_kwargs may override dim_head (reference ErwinTransolver
        # exposes it, vendored ``Transolver.py:22``) and mlp_ratio (the
        # vendored car model pins the *Erwin* mlp_ratio to 4 while the block
        # uses 2, ``Transolver.py:62`` vs ``:208``); the defaults reproduce
        # the main library's shared values (``..._2D.py:90,105``).
        akw = dict(self.attn_kwargs or {})
        akw.setdefault("dim_head", self.hidden_dim // self.num_heads)
        akw.setdefault("mlp_ratio", self.mlp_ratio)
        attn = self.attn_cls(
            dim=self.hidden_dim,
            heads=self.num_heads,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="Attn",
            **akw,
        )
        fx = attn(ln("ln_1")(fx), train=train) + fx
        fx = MLP(
            self.hidden_dim * self.mlp_ratio, self.hidden_dim, n_layers=0,
            res=False, act=self.act, dtype=self.dtype,
            param_dtype=self.param_dtype, name="mlp",
        )(ln("ln_2")(fx)) + fx
        if self.last_layer:
            return nn.Dense(
                self.out_dim, kernel_init=trunc_normal_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mlp2",
            )(ln("ln_3")(fx))
        return fx


class _HAETBase(nn.Module):
    """Shared model scaffolding (preprocess, time embedding, block stack)."""

    space_dim: int = 1
    n_layers: int = 5
    n_hidden: int = 256
    dropout: float = 0.0
    n_head: int = 8
    Time_Input: bool = False
    act: str = "gelu"
    mlp_ratio: int = 1
    fun_dim: int = 1
    out_dim: int = 1
    slice_num: int = 32
    ref: int = 8
    unified_pos: bool = False
    # ErwinTransformer parameters (reference rotate default 45, ``..._2D.py:193``)
    c_hidden: Optional[Sequence[int]] = None
    ball_sizes: Optional[Sequence[int]] = None
    enc_num_heads: Optional[Sequence[int]] = None
    enc_depths: Optional[Sequence[int]] = None
    dec_num_heads: Optional[Sequence[int]] = None
    dec_depths: Optional[Sequence[int]] = None
    strides: Optional[Sequence[int]] = None
    rotate: int = 45
    decode: bool = True
    mp_steps: int = 0
    embed: bool = False
    # None -> hidden // heads (reference ``..._2D.py:90``); the vendored car
    # model exposes dim_head on its attention (``Transolver.py:22``).
    dim_head: Optional[int] = None
    # None -> share the block's mlp_ratio (main library behavior,
    # ``..._2D.py:105``); the vendored car model pins Erwin's to 4
    # independently of the block's 2 (``Transolver.py:62``).
    erwin_mlp_ratio: Optional[int] = None
    # TPU-build knobs
    use_checkpoint: bool = False
    use_dist_bias: bool = True
    grouping: str = "median"
    orthogonal_slice_init: bool = True
    use_pallas: bool | str = False  # False | True | "auto" (N-threshold)
    pallas_auto_threshold: int = 1_700_000
    use_pallas_erwin: bool = False
    # Head tensor parallelism: (batch_axis, head_axis) mesh axis names,
    # e.g. ("dp", "tp"). See PhysicsAttention.shard_axes.
    shard_axes: Optional[tuple] = None
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    # ---- variant hooks -------------------------------------------------
    def _attn(self):
        """Return (attn_cls, attn_kwargs) for this variant."""
        raise NotImplementedError

    def _pos_features(self, x):
        """unified_pos encoding; returns the position features to use."""
        raise NotImplementedError

    def _always_placeholder(self) -> bool:
        return False

    # --------------------------------------------------------------------
    def _erwin_kwargs(self):
        return {k: getattr(self, k) for k in _ERWIN_KEYS}

    def block_kwargs(self) -> dict:
        """Constructor kwargs shared by every :class:`TransolverErwinBlock`
        in the stack (``last_layer``/``name`` excepted). Also consumed by
        :mod:`haet_tpu.parallel.pipeline` to build stage blocks that are
        parameter-compatible with this model's ``blocks_i`` subtrees."""
        attn_cls, attn_kwargs = self._attn()
        if self.dim_head is not None:
            attn_kwargs["dim_head"] = self.dim_head
        if self.erwin_mlp_ratio is not None:
            attn_kwargs["mlp_ratio"] = self.erwin_mlp_ratio
        if self.shard_axes is not None:
            attn_kwargs["shard_axes"] = tuple(self.shard_axes)
        return dict(
            num_heads=self.n_head,
            hidden_dim=self.n_hidden,
            dropout=self.dropout,
            act=self.act,
            mlp_ratio=self.mlp_ratio,
            out_dim=self.out_dim,
            attn_cls=attn_cls,
            attn_kwargs=attn_kwargs,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    @nn.compact
    def __call__(self, x, fx=None, T=None, *, train: bool = False):
        if self.unified_pos:
            x = self._pos_features(x)

        fx_was_none = fx is None
        if fx is not None:
            fx = jnp.concatenate([x, fx], axis=-1)
        else:
            fx = x
        fx = MLP(
            self.n_hidden * 2, self.n_hidden, n_layers=0, res=False,
            act=self.act, dtype=self.dtype, param_dtype=self.param_dtype,
            name="preprocess",
        )(fx)

        # 2D/3D: placeholder only when the fx input was None
        # (reference ..._2D.py:399-402); irregular: always (:364).
        placeholder = self.param(
            "placeholder", _placeholder_init(self.n_hidden),
            (self.n_hidden,), self.param_dtype,
        )
        if self._always_placeholder() or fx_was_none:
            fx = fx + placeholder[None, None, :]

        # time_fc params exist iff Time_Input (reference creates them at
        # CONSTRUCTION, ..._2D.py:257-263) and are applied iff T is passed
        # (:405-408) — the param tree must follow config, not trace-time
        # arguments, or init without T would build a tree that later
        # apply(x, fx, T) cannot find (and reference checkpoints with
        # time_fc weights could not import).
        if self.Time_Input:
            time_fc1 = nn.Dense(
                self.n_hidden, kernel_init=trunc_normal_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                param_dtype=self.param_dtype, name="time_fc1",
            )
            time_fc2 = nn.Dense(
                self.n_hidden, kernel_init=trunc_normal_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                param_dtype=self.param_dtype, name="time_fc2",
            )
            if T is not None:
                emb = timestep_embedding(T, self.n_hidden)[:, None, :]
                fx = fx + time_fc2(nn.silu(time_fc1(emb)))
            elif self.is_initializing():
                # register the params without affecting the output
                time_fc2(nn.silu(time_fc1(
                    jnp.zeros((1, 1, self.n_hidden), self.dtype))))
        elif T is not None:
            raise ValueError(
                "T was passed but Time_Input=False — the reference model "
                "has no time_fc in this configuration (..._2D.py:257)")

        block_cls = TransolverErwinBlock
        if self.use_checkpoint:
            # Rematerialize each block's activations in the backward pass
            # (the reference's torch.utils.checkpoint path, ``..._3D.py``).
            block_cls = nn.remat(TransolverErwinBlock, static_argnums=(2,))
        bkw = self.block_kwargs()
        for i in range(self.n_layers):
            block = block_cls(
                last_layer=(i == self.n_layers - 1),
                name=f"blocks_{i}",
                **bkw,
            )
            fx = block(fx, train)
        return fx


    # --- raw-param application (consumed by parallel.pipeline) -----------
    @nn.nowrap
    def apply_pre(self, pre_params, x, fx=None, T=None):
        """The pre-block section of ``__call__`` (unified_pos features,
        preprocess MLP, placeholder, time embedding) applied from a raw
        param subtree ``{preprocess, placeholder, time_fc1/2}``.

        ``parallel.pipeline.PipelinedModel`` cannot run the compact
        ``__call__`` (its block stack executes inside a shard_map), so this
        re-states the same math against explicit params. KEEP IN LOCKSTEP
        with ``__call__`` above — ``tests/test_pipeline.py`` pins exact
        parity for the unified_pos / placeholder / Time_Input paths.
        """
        if self.unified_pos:
            x = self._pos_features(x)
        fx_was_none = fx is None
        h = jnp.concatenate([x, fx], axis=-1) if fx is not None else x
        h = MLP(self.n_hidden * 2, self.n_hidden, n_layers=0, res=False,
                act=self.act, dtype=self.dtype,
                param_dtype=self.param_dtype).apply(
            {"params": pre_params["preprocess"]}, h)
        if self._always_placeholder() or fx_was_none:
            h = h + pre_params["placeholder"][None, None, :]
        if self.Time_Input:
            if T is not None:
                emb = timestep_embedding(T, self.n_hidden)[:, None, :]
                dense = lambda: nn.Dense(  # noqa: E731
                    self.n_hidden, dtype=self.dtype,
                    param_dtype=self.param_dtype)
                t1 = dense().apply({"params": pre_params["time_fc1"]}, emb)
                h = h + dense().apply(
                    {"params": pre_params["time_fc2"]}, nn.silu(t1))
        elif T is not None:
            raise ValueError(
                "T was passed but Time_Input=False — the reference model "
                "has no time_fc in this configuration (..._2D.py:257)")
        return h

    @nn.nowrap
    def apply_head(self, head_params, h):
        """The last block's ``last_layer`` extras (LN + Linear(out_dim),
        :class:`TransolverErwinBlock` lines above) applied from a raw param
        subtree ``{ln_3, mlp2}`` — the pipeline's output head. KEEP IN
        LOCKSTEP with ``TransolverErwinBlock.__call__``."""
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype).apply(
            {"params": head_params["ln_3"]}, h)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype).apply(
            {"params": head_params["mlp2"]}, y)


class HAETransolverStructuredMesh2D(_HAETBase):
    """2D structured-mesh HAET (reference ``HAETransolver_Structured_Mesh_2D.py:146``)."""

    H: int = 85
    W: int = 85

    def _attn(self):
        kw = self._erwin_kwargs()
        kw.update(H=self.H, W=self.W, slice_num=self.slice_num)
        return PhysicsAttentionStructuredMesh2D, kw

    def _pos_features(self, x):
        """Distances from the H x W unit grid to a ref x ref grid
        (reference ``..._2D.py:318-372``); a static constant."""
        pos = _grid_distances_nd((self.H, self.W), self.ref)
        return jnp.broadcast_to(
            pos[None], (x.shape[0],) + pos.shape
        ).astype(x.dtype)


class HAETransolverStructuredMesh3D(_HAETBase):
    """3D structured-mesh HAET (reference ``HAETransolver_Structured_Mesh_3D.py:152``)."""

    H: int = 32
    W: int = 32
    D: int = 32

    def _attn(self):
        kw = self._erwin_kwargs()
        kw.update(H=self.H, W=self.W, D=self.D, slice_num=self.slice_num)
        return PhysicsAttentionStructuredMesh3D, kw

    def _pos_features(self, x):
        pos = _grid_distances_nd((self.H, self.W, self.D), self.ref)
        return jnp.broadcast_to(
            pos[None], (x.shape[0],) + pos.shape
        ).astype(x.dtype)


class HAETransolverIrregularMesh(_HAETBase):
    """Irregular point-cloud HAET (reference ``HAETransolver_Irregular_Mesh.py:137``)."""

    def _attn(self):
        kw = self._erwin_kwargs()
        kw.update(slice_num=self.slice_num)
        return PhysicsAttentionIrregularMesh, kw

    def _always_placeholder(self) -> bool:
        # The irregular model always adds the placeholder
        # (reference HAETransolver_Irregular_Mesh.py:364).
        return True

    def _pos_features(self, x):
        """Per-sample distances to a ref x ref unit grid computed from the
        actual coordinates (reference ``HAETransolver_Irregular_Mesh.py:297-336``)."""
        g = np.linspace(0, 1, self.ref, dtype=np.float32)
        gx, gy = np.meshgrid(g, g, indexing="ij")
        grid_ref = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel()], axis=-1)
        )  # [ref*ref, 2]
        diff = x[:, :, None, :2] - grid_ref[None, None, :, :]
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


def _grid_distances_nd(shape, ref: int):
    """Distances from a unit grid of ``shape`` to a ``ref^d`` reference grid.

    Mirrors ``get_grid`` (2D: ``..._2D.py:318-372``, 3D: ``..._3D.py:334-411``).
    Computed with numpy at trace time — a compile-time constant.
    """
    axes = [np.linspace(0, 1, s, dtype=np.float32) for s in shape]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)  # shape + [d]
    r_axes = [np.linspace(0, 1, ref, dtype=np.float32)] * len(shape)
    grid_ref = np.stack(np.meshgrid(*r_axes, indexing="ij"), axis=-1)
    grid_flat = grid.reshape(-1, len(shape))
    ref_flat = grid_ref.reshape(-1, len(shape))
    d = np.sqrt(
        ((grid_flat[:, None, :] - ref_flat[None, :, :]) ** 2).sum(-1)
    ).astype(np.float32)
    return jnp.asarray(d)  # [prod(shape), ref^d]
