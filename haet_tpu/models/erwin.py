"""Erwin hierarchical ball-attention transformer, TPU-native.

Re-design of the reference's ``models/components/erwinflash/`` for TPU:

* Point clouds are **dense batched** ``[B, N, C]`` (every cloud the same,
  power-of-two N — the physics-attention caller always has exactly
  ``B*heads`` clouds of ``slice_num`` states; ragged inputs are padded with
  :func:`haet_tpu.ops.ball_groups.pad_pow2`). The reference instead flattens
  to ``[M, C]`` + ``batch_idx`` and gathers through a host-built tree
  (``erwin_flash.py:138-195``).
* Ball grouping is a static-shape on-device permutation
  (:mod:`haet_tpu.ops.ball_groups`); balls, pooling and rotation are then pure
  reshapes/gathers that XLA compiles to dense batched matmuls on the MXU.
* Ball attention is plain batched SDPA over tiny balls (16-64 points) — at
  these sizes a dedicated flash kernel buys nothing; XLA fuses the softmax.
  The distance bias ``sigma * cdist(pos, pos)`` (eq. 10 of the Erwin paper,
  reference ``attention.py:29-33``) is **restored** here behind
  ``use_dist_bias`` — the reference's flash path defines it but silently
  drops it (``attention.py:82-84`` never passes it); the vendored non-flash
  variant applies it (benchmark 02 ``erwin/components/attention.py:49-51``).
  Default True (the mathematically intended model); set False for strict
  flash-path parity.

Structure parity (constructor surface, UNet encoder/bottleneck/decoder,
rotation on odd blocks, stride pooling with BatchNorm) follows
``erwin_flash.py:14-195`` and ``components/layers.py / pooling.py``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.ball_groups import (ErwinPerms, build_erwin_perms,
                               effective_ball_size)
from ..ops.neighbors import knn_edges
from .components.mlp import SwiGLU, trunc_normal_init


@dataclass
class Node:
    """Coarse-to-fine state linked list (reference ``components/node.py:8-16``)."""

    x: jnp.ndarray            # [B, N_level, C]
    pos: jnp.ndarray          # [B, N_level, D]
    rot_perm: Optional[jnp.ndarray] = None      # [B, N_level]
    rot_inv_perm: Optional[jnp.ndarray] = None  # [B, N_level]
    children: Optional["Node"] = None


def _sigma_att_init(key, shape, dtype=jnp.float32):
    """sigma_att ~ -1 + 0.01*N(0,1) (reference ``attention.py:27``)."""
    return -1.0 + 0.01 * jax.random.normal(key, shape, dtype)


class BallMSA(nn.Module):
    """Ball multi-head self-attention (reference ``attention.py:12-91``)."""

    dim: int
    num_heads: int
    ball_size: int
    dimensionality: int = 3
    use_dist_bias: bool = True
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        """x: [B, N, C]; pos: [B, N, D]; N divisible by ball_size."""
        B, N, C = x.shape
        D = pos.shape[-1]
        # Clamp to the cloud and floor to a power of two so balls always
        # tile N exactly (N is a power of two by the padding contract).
        # The reference requires divisibility implicitly
        # (``attention.py:67-76`` reshapes by contiguity) and its configs
        # only ever use power-of-two ball sizes.
        bs = effective_ball_size(self.ball_size, N)
        nb = N // bs
        h, hd = self.num_heads, self.dim // self.num_heads

        dense = lambda feat, name: nn.Dense(  # noqa: E731
            feat,
            kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

        pos_b = pos.reshape(B, nb, bs, D)
        # Relative position wrt ball center (eq. 9, attention.py:36-40).
        rel_pos = pos_b - pos_b.mean(axis=2, keepdims=True)
        pe = dense(self.dim, "pe_proj")(rel_pos.reshape(B, N, D))
        x = x + pe

        qkv = dense(3 * self.dim, "qkv")(x)
        qkv = qkv.reshape(B, nb, bs, 3, h, hd)
        q, k, v = (
            jnp.moveaxis(qkv[:, :, :, i], 3, 2) for i in range(3)
        )  # each [B, nb, h, bs, hd]

        scale = 1.0 / math.sqrt(hd)
        logits = jnp.einsum(
            "bnhqd,bnhkd->bnhqk", q, k, preferred_element_type=jnp.float32
        ) * scale

        if self.use_dist_bias:
            sigma = self.param(
                "sigma_att", _sigma_att_init, (1, self.num_heads, 1, 1),
                self.param_dtype,
            )
            diff = pos_b[:, :, :, None, :] - pos_b[:, :, None, :, :]
            dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
            # Bias is gradient-free in the reference (attention.py:29 @no_grad).
            bias = jax.lax.stop_gradient(
                sigma[:, None, :, 0, 0][..., None, None] * dist[:, :, None]
            )
            logits = logits + bias

        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bnhqk,bnhkd->bnhqd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        out = jnp.moveaxis(out, 2, 3).reshape(B, N, self.dim).astype(x.dtype)
        return dense(self.dim, "proj")(out)


class ErwinTransformerBlock(nn.Module):
    """``x += BMSA(RMSNorm(x)); x += SwiGLU(RMSNorm(x))`` (``layers.py:14-32``).

    With ``use_pallas=True`` the whole block (both norms, rel-pos encoding,
    ball attention, projection, SwiGLU, residuals) runs as ONE fused Pallas
    TPU kernel (:mod:`haet_tpu.ops.pallas.erwin_block`) — the XLA path is
    ~20 ops over KB-sized tensors, so per-op overhead dominates. Parameters
    are created by the regular submodules (identical param tree either way);
    the fused path reads them from the scope.
    """

    dim: int
    num_heads: int
    ball_size: int
    mlp_ratio: int
    dimensionality: int = 3
    use_dist_bias: bool = True
    use_pallas: bool = False
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        if (self.use_pallas and not self.is_initializing()
                and self._fused_ok(x.shape)):
            from ..ops.pallas.erwin_block import fused_erwin_block

            return fused_erwin_block(
                x, pos, self.variables["params"],
                ball_size=self.ball_size, num_heads=self.num_heads,
                use_dist_bias=self.use_dist_bias,
            )

        norm = lambda name: nn.RMSNorm(  # noqa: E731
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name,
        )
        x = x + BallMSA(
            self.dim, self.num_heads, self.ball_size, self.dimensionality,
            self.use_dist_bias, self.dtype, self.param_dtype, name="BMSA",
        )(norm("norm1")(x), pos)
        return x + SwiGLU(
            self.dim, self.dim * self.mlp_ratio, self.dtype, self.param_dtype,
            name="swiglu",
        )(norm("norm2")(x))

    def _fused_ok(self, shape) -> bool:
        from ..ops.pallas.erwin_block import eligible

        return eligible(shape[1], shape[2], self.num_heads, self.dim)


class BallPooling(nn.Module):
    """Coarsen by ``stride`` (eq. 12; reference ``pooling.py:10-40``)."""

    in_dim: int
    out_dim: int
    stride: int
    dimensionality: int = 3
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, node: Node, *, train: bool = False) -> Node:
        if self.stride == 1:
            return Node(x=node.x, pos=node.pos, children=node)
        B, N, C = node.x.shape
        D = node.pos.shape[-1]
        s = self.stride
        pos_g = node.pos.reshape(B, N // s, s, D)
        centers = jax.lax.stop_gradient(pos_g.mean(axis=2))
        rel_pos = jax.lax.stop_gradient(
            (pos_g - centers[:, :, None]).reshape(B, N // s, s * D)
        )
        x = jnp.concatenate(
            [node.x.reshape(B, N // s, s * C), rel_pos.astype(node.x.dtype)],
            axis=-1,
        )
        x = nn.Dense(
            self.out_dim, kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            param_dtype=self.param_dtype, name="proj",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name="norm",
        )(x)
        return Node(x=x, pos=centers, children=node)


class BallUnpooling(nn.Module):
    """Refine back to children resolution (eq. 13; ``pooling.py:43-72``)."""

    in_dim: int
    out_dim: int
    stride: int
    dimensionality: int = 3
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, node: Node, *, train: bool = False) -> Node:
        children = node.children
        B, Np, C = node.x.shape
        D = node.pos.shape[-1]
        s = self.stride
        rel_pos = jax.lax.stop_gradient(
            children.pos.reshape(B, Np, s, D) - node.pos[:, :, None]
        ).reshape(B, Np, s * D)
        x = jnp.concatenate([node.x, rel_pos.astype(node.x.dtype)], axis=-1)
        up = nn.Dense(
            s * self.out_dim, kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            param_dtype=self.param_dtype, name="proj",
        )(x).reshape(B, Np * s, self.out_dim)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name="norm",
        )(children.x + up)
        return Node(
            x=x, pos=children.pos, rot_perm=children.rot_perm,
            rot_inv_perm=children.rot_inv_perm, children=children.children,
        )


class BasicLayer(nn.Module):
    """depth x blocks with rotation on odd blocks, then pool/unpool
    (reference ``layers.py:35-92``)."""

    direction: Optional[str]  # "down" | "up" | None
    depth: int
    stride: Optional[int]
    in_dim: int
    out_dim: int
    num_heads: int
    ball_size: int
    mlp_ratio: int
    rotate: bool
    dimensionality: int = 3
    use_dist_bias: bool = True
    use_pallas: bool = False
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, node: Node, *, train: bool = False) -> Node:
        hidden_dim = self.in_dim if self.direction == "down" else self.out_dim

        if self.direction == "up" and self.stride is not None:
            node = BallUnpooling(
                self.in_dim, hidden_dim, self.stride, self.dimensionality,
                self.dtype, self.param_dtype, name="unpool",
            )(node, train=train)

        n_level = node.x.shape[1]
        bs_eff = effective_ball_size(self.ball_size, n_level)
        full_ball = bs_eff >= n_level
        rotate_flags = (
            [i % 2 == 1 for i in range(self.depth)]
            if self.rotate else [False] * self.depth
        )
        for i, rot in enumerate(rotate_flags):
            if rot and full_ball:
                # single-ball level: rotation is a permutation inside the
                # ball and full-ball attention is permutation-equivariant —
                # identical output without the gathers.
                rot = False
            blk = ErwinTransformerBlock(
                hidden_dim, self.num_heads, self.ball_size, self.mlp_ratio,
                self.dimensionality, self.use_dist_bias, self.use_pallas,
                self.dtype, self.param_dtype, name=f"block{i}",
            )
            if rot:
                if node.rot_perm is None:
                    raise ValueError(
                        "rot_perm must be provided for rotation "
                        "(reference layers.py:78-80)"
                    )
                xr = jnp.take_along_axis(node.x, node.rot_perm[..., None], axis=1)
                pr = jnp.take_along_axis(node.pos, node.rot_perm[..., None], axis=1)
                out = blk(xr, pr)
                node.x = jnp.take_along_axis(
                    out, node.rot_inv_perm[..., None], axis=1
                )
            else:
                node.x = blk(node.x, node.pos)

        if self.direction == "down" and self.stride is not None:
            node = BallPooling(
                hidden_dim, self.out_dim, self.stride, self.dimensionality,
                self.dtype, self.param_dtype, name="pool",
            )(node, train=train)
        return node


class ErwinEmbedding(nn.Module):
    """Linear + optional MPNN (reference ``components/embedding.py:12-20``)."""

    c_in: int
    c_hidden: int
    mp_steps: int
    dimensionality: int = 3
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, nbr_idx=None, nbr_valid=None):
        x = nn.Dense(
            self.c_hidden, kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            param_dtype=self.param_dtype, name="embed_fn",
        )(x)
        if self.mp_steps > 0:
            x = MPNN(
                self.c_hidden, self.mp_steps, self.dimensionality,
                self.dtype, self.param_dtype, name="mpnn",
            )(x, pos, nbr_idx, nbr_valid)
        return x


class MPNN(nn.Module):
    """Message passing (reference ``components/mpnn.py:10-75``), re-designed
    for TPU as a capped-degree dense-neighbor aggregation: instead of a ragged
    edge list + ``scatter_mean`` (torch_scatter CUDA), each point carries a
    fixed ``[K]`` neighbor slab so the whole step is static-shape gathers and
    a masked mean."""

    dim: int
    mp_steps: int
    dimensionality: int = 3
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, pos, nbr_idx, nbr_valid):
        """h: [B, N, C]; pos: [B, N, D]; nbr_idx: [B, N, K]; nbr_valid: [B, N, K]."""
        if nbr_idx is None:
            raise ValueError("MPNN requires neighbor indices (mp_steps > 0)")
        B, N, K = nbr_idx.shape

        # Neighbor gather: [B, N, C] -> [B, N, K, C]
        def nbr_gather(a):
            flat = jnp.take_along_axis(
                a, nbr_idx.reshape(B, N * K)[..., None], axis=1
            )
            return flat.reshape(B, N, K, a.shape[-1])

        edge_attr = jax.lax.stop_gradient(nbr_gather(pos) - pos[:, :, None])
        w = nbr_valid[..., None].astype(h.dtype)
        denom = jnp.maximum(w.sum(axis=2), 1.0)
        for step in range(self.mp_steps):
            h_j = nbr_gather(h)
            h_i = jnp.broadcast_to(h[:, :, None], h_j.shape)
            msg = jnp.concatenate(
                [h_j, h_i, edge_attr.astype(h.dtype)], axis=-1
            )
            msg = nn.Dense(
                self.dim, kernel_init=trunc_normal_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"message_{step}",
            )(msg)
            msg = nn.gelu(msg, approximate=False)
            # non-affine LayerNorm, torch-default eps (reference mpnn.py:29
            # nn.LayerNorm(dim, elementwise_affine=False), eps=1e-5)
            msg = nn.LayerNorm(
                epsilon=1e-5, use_scale=False, use_bias=False,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"message_norm_{step}",
            )(msg)
            agg = (msg * w).sum(axis=2) / denom
            upd = nn.Dense(
                self.dim, kernel_init=trunc_normal_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"update_{step}",
            )(jnp.concatenate([h, agg], axis=-1))
            upd = nn.LayerNorm(
                epsilon=1e-5, use_scale=False, use_bias=False,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"update_norm_{step}",
            )(upd)
            h = h + upd
        return h


class ErwinTransformer(nn.Module):
    """UNet-shaped hierarchical ball-attention transformer.

    Constructor surface mirrors the reference (``erwin_flash.py:40-56``):
    ``c_hidden[i]`` / ``ball_sizes[i]`` / ``enc_num_heads[i]`` /
    ``enc_depths[i]`` per encoder level (last = bottleneck), ``strides`` /
    ``dec_num_heads`` / ``dec_depths`` one shorter.

    Call: ``erwin(x, pos)`` with dense ``x: [B, N, c_in]``,
    ``pos: [B, N, dimensionality]``, N a power of two divisible by
    ``prod(strides)``. Returns ``[B, N, c_hidden[0]]`` if ``decode`` else the
    coarse ``[B, N_coarse, c_hidden[-1]]``.
    """

    c_in: int
    c_hidden: Sequence[int]
    ball_sizes: Sequence[int]
    enc_num_heads: Sequence[int]
    enc_depths: Sequence[int]
    dec_num_heads: Sequence[int]
    dec_depths: Sequence[int]
    strides: Sequence[int]
    rotate: int = 45
    decode: bool = True
    mlp_ratio: int = 4
    dimensionality: int = 3
    mp_steps: int = 3
    embed: bool = True
    use_dist_bias: bool = True
    use_pallas_blocks: bool = False
    grouping: str = "median"
    mp_neighbors: int = 16
    # When set, MPNN edges are the radius graph (neighbor-capped at
    # mp_neighbors) like the reference's torch_cluster.radius_graph call
    # (erwin_flash.py:156-166, default cap 32); None keeps plain kNN.
    # Exact brute-force for clouds <= ops.neighbors.BRUTE_FORCE_MAX_N,
    # ball-grouped approximate search above (documented deviation,
    # docs/architecture.md).
    mp_radius: Optional[float] = None
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def _validate(self):
        assert len(self.enc_num_heads) == len(self.enc_depths) == len(self.ball_sizes)
        assert len(self.dec_num_heads) == len(self.dec_depths) == len(self.strides)
        assert len(self.strides) == len(self.ball_sizes) - 1

    @nn.compact
    def __call__(self, x, pos, *, perms: ErwinPerms | None = None,
                 mask=None, train: bool = False):
        self._validate()
        B, N, _ = x.shape

        if perms is None:
            perms = build_erwin_perms(
                jax.lax.stop_gradient(pos),
                ball_sizes=tuple(self.ball_sizes),
                strides=tuple(self.strides),
                rotate_angle=float(self.rotate),
                grouping=self.grouping,
                mask=mask,
            )

        if self.embed:
            nbr_idx = nbr_valid = None
            if self.mp_steps > 0:
                if self.mp_radius is not None:
                    from ..ops.neighbors import radius_edges
                    nbr_idx, nbr_valid = radius_edges(
                        jax.lax.stop_gradient(pos), self.mp_radius,
                        self.mp_neighbors, mask=mask,
                    )
                else:
                    nbr_idx, nbr_valid = knn_edges(
                        jax.lax.stop_gradient(pos), self.mp_neighbors,
                        mask=mask,
                    )
            x = ErwinEmbedding(
                self.c_in, self.c_hidden[0], self.mp_steps,
                self.dimensionality, self.dtype, self.param_dtype,
                name="embed",
            )(x, pos, nbr_idx, nbr_valid)

        # Permute into tree order (reference erwin_flash.py:176-181).
        xt = jnp.take_along_axis(x, perms.perm[..., None], axis=1)
        post = jnp.take_along_axis(pos, perms.perm[..., None], axis=1)

        node = Node(x=xt, pos=post)
        num_layers = len(self.enc_depths) - 1

        for i in range(num_layers):
            node.rot_perm = perms.rot_perms[i]
            node.rot_inv_perm = perms.rot_inv_perms[i]
            node = BasicLayer(
                direction="down",
                depth=self.enc_depths[i],
                stride=self.strides[i],
                in_dim=self.c_hidden[i],
                out_dim=self.c_hidden[i + 1],
                num_heads=self.enc_num_heads[i],
                ball_size=self.ball_sizes[i],
                mlp_ratio=self.mlp_ratio,
                rotate=self.rotate > 0,
                dimensionality=self.dimensionality,
                use_dist_bias=self.use_dist_bias,
                use_pallas=self.use_pallas_blocks,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"encoder{i}",
            )(node, train=train)

        node.rot_perm = perms.rot_perms[num_layers]
        node.rot_inv_perm = perms.rot_inv_perms[num_layers]
        node = BasicLayer(
            direction=None,
            depth=self.enc_depths[-1],
            stride=None,
            in_dim=self.c_hidden[-1],
            out_dim=self.c_hidden[-1],
            num_heads=self.enc_num_heads[-1],
            ball_size=self.ball_sizes[-1],
            mlp_ratio=self.mlp_ratio,
            rotate=self.rotate > 0,
            dimensionality=self.dimensionality,
            use_dist_bias=self.use_dist_bias,
            use_pallas=self.use_pallas_blocks,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="bottleneck",
        )(node, train=train)

        if self.decode:
            for j, i in enumerate(range(num_layers - 1, -1, -1)):
                node = BasicLayer(
                    direction="up",
                    depth=self.dec_depths[i],
                    stride=self.strides[i],
                    in_dim=self.c_hidden[i + 1],
                    out_dim=self.c_hidden[i],
                    num_heads=self.dec_num_heads[i],
                    ball_size=self.ball_sizes[i],
                    mlp_ratio=self.mlp_ratio,
                    rotate=self.rotate > 0,
                    dimensionality=self.dimensionality,
                    use_dist_bias=self.use_dist_bias,
                    use_pallas=self.use_pallas_blocks,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"decoder{j}",
                )(node, train=train)
            # Un-permute back to input order (reference erwin_flash.py:193).
            return jnp.take_along_axis(node.x, perms.unperm[..., None], axis=1)

        return node.x, node.pos
