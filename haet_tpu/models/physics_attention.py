"""Physics attention — the Transolver++ rep-slice tokenizer.

Three variants sharing one 3-phase core (slice -> Erwin transform ->
deslice), differing only in the input projection, exactly as the reference
(``models/PhysicsAttention/__init__.py:2-4``):

* :class:`PhysicsAttentionStructuredMesh2D` — Conv2d projection
  (``StructuredMesh2D.py:109``)
* :class:`PhysicsAttentionStructuredMesh3D` — Conv3d projection
  (``StructuredMesh3D.py:113``)
* :class:`PhysicsAttentionIrregularMesh` — Linear projection
  (``IrregularMesh.py:95``)

TPU-first design notes:

* Convs run in NHWC (feature-last) layout — native for XLA:TPU; the reference
  permutes to NCHW for torch.
* The slice/eidetic/deslice einsums (``haet_tpu.ops.slice_ops``) are the only
  N-scaling ops; they compile to MXU matmuls and are exact under point-axis
  sharding (each is a reduction over N).
* The Erwin stage sees ``B*heads`` independent clouds of exactly
  ``slice_num`` states (the reference encodes this via ``batch_idx``
  ``arange(B*H).repeat_interleave(G)``, ``StructuredMesh2D.py:238``); here it
  is simply a dense ``[B*H, G, C]`` batch — no ragged indexing at all.

Aliases with the reference's exact class names are exported from
``haet_tpu.models``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec

from ..ops import slice_ops
from ..ops.ball_groups import pad_pow2
from .components.mlp import trunc_normal_init
from .erwin import ErwinTransformer


def torch_conv_kernel_init():
    """torch Conv default (kaiming_uniform(a=sqrt(5))) equivalent: the
    reference's ``_init_weights`` only overrides Linear/norm layers, so convs
    keep the torch default (uniform with variance ``1/(3*fan_in)``)."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_conv_bias_init(fan_in: int):
    """torch Conv default BIAS: U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — the
    reference's ``_init_weights`` zeroes only Linear biases, so conv biases
    keep the torch default (nonzero). flax calls bias_init with the bias
    shape only, so fan_in (= in_channels * prod(kernel)) is closed over at
    the call site."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _PhysicsAttentionBase(nn.Module):
    """Shared slice/transform/deslice core (``StructuredMesh2D.py:157-262``)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    slice_num: int = 64
    base_temp: float = 0.5
    epsilon: float = 1e-6
    # ErwinTransformer parameters (None -> reference defaults, :121-134)
    c_hidden: Optional[Sequence[int]] = None
    ball_sizes: Optional[Sequence[int]] = None
    enc_num_heads: Optional[Sequence[int]] = None
    enc_depths: Optional[Sequence[int]] = None
    dec_num_heads: Optional[Sequence[int]] = None
    dec_depths: Optional[Sequence[int]] = None
    strides: Optional[Sequence[int]] = None
    rotate: int = 1
    decode: bool = True
    mlp_ratio: int = 4
    mp_steps: int = 0
    embed: bool = False
    # TPU-build knobs
    use_dist_bias: bool = True
    grouping: str = "median"
    orthogonal_slice_init: bool = True
    # Fused slice/deslice kernels (TPU only). False | True | "auto":
    # "auto" switches to the fused path when N >= the effective threshold
    # on a TPU backend — the kernels are a *memory* feature (they avoid
    # materializing the [B, H, N, G] weights in HBM) and are slower at
    # small N (docs/benchmarks.md). `pallas_auto_threshold` is the G=32
    # base (0.75x the measured XLA fwd+bwd OOM boundary, 2.25M points on
    # one v5e); the effective threshold interpolates the measured
    # G-dependence (XLA boundary 1.5M at G=128) — see _pallas_enabled.
    # Measurements: benchmarks/pallas_mem_sweep.py --grad.
    use_pallas: bool | str = False
    pallas_auto_threshold: int = 1_700_000
    use_pallas_erwin: bool = False  # fused Erwin-block kernel (TPU only)
    # Tensor parallelism over attention heads: mesh axis names
    # ``(batch_axis, head_axis)``. When set, the ``[B, H, N, *]``
    # intermediates are constrained to ``P(batch, head)`` and the Erwin
    # ``[B*H, G, C]`` token batch to ``P((batch, head))`` — heads are
    # embarrassingly parallel through the whole slice->Erwin->deslice core
    # (the reference encodes this via ``batch_idx = arange(B*H)``,
    # ``StructuredMesh2D.py:238``); the only cross-head op is the final
    # head-concat projection, where XLA inserts the all-gather.
    # Requires tracing under an active ``jax.sharding.Mesh`` context.
    shard_axes: Optional[Tuple[Optional[str], Optional[str]]] = None
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @property
    def dimensionality(self) -> int:
        raise NotImplementedError

    def _project(self, x):
        """Return ``[B, heads, N, dim_head]`` projected features."""
        raise NotImplementedError

    def _erwin_defaults(self):
        g, h, dh = self.slice_num, self.heads, self.dim_head
        return dict(
            c_hidden=tuple(self.c_hidden) if self.c_hidden else (dh, dh * 2),
            ball_sizes=tuple(self.ball_sizes) if self.ball_sizes
            else (min(32, g), min(16, g // 2)),
            enc_num_heads=tuple(self.enc_num_heads) if self.enc_num_heads
            else (h // 2, h),
            enc_depths=tuple(self.enc_depths) if self.enc_depths else (2, 2),
            dec_num_heads=tuple(self.dec_num_heads) if self.dec_num_heads
            else (h // 2,),
            dec_depths=tuple(self.dec_depths) if self.dec_depths else (2,),
            strides=tuple(self.strides) if self.strides else (2,),
        )

    def _constrain(self, t, *spec):
        """Apply a head-TP sharding constraint if ``shard_axes`` is set.

        ``spec`` entries index into ``shard_axes``: "b" -> batch axis,
        "h" -> head axis, "bh" -> both (a flattened B*H dim), None -> leave
        the dimension replicated/unconstrained.
        """
        if self.shard_axes is None:
            return t
        b_ax, h_ax = self.shard_axes
        lut = {
            "b": b_ax,
            "h": h_ax,
            "bh": tuple(a for a in (b_ax, h_ax) if a) or None,
            None: None,
        }
        return jax.lax.with_sharding_constraint(
            t, PartitionSpec(*(lut[s] for s in spec))
        )

    def _shard_axes_active(self) -> bool:
        return self.shard_axes is not None and any(
            a is not None for a in self.shard_axes
        )

    @staticmethod
    def _context_mesh():
        """The mesh this trace runs under (``with mesh:`` or ``use_mesh``),
        or None."""
        try:
            from jax._src.mesh import thread_resources
            phys = thread_resources.env.physical_mesh
            if not phys.empty:
                return phys
        except Exception:
            pass
        try:
            mesh = jax.sharding.get_abstract_mesh()
            if mesh is not None and not mesh.empty:
                return mesh
        except Exception:
            pass
        return None

    def _pallas_shard_map(self, mesh, batch: int):
        """shard_map-wrap the fused kernels over (batch, head) mesh axes.

        pallas_call carries no GSPMD partitioning spec, so under a mesh the
        partitioner would replicate the [B, H, N, *] operands per chip —
        blowing memory in exactly the large-N regime the fused path exists
        to save (ADVICE r2). Per-(b, h) the slice softmax reduces only over
        the local N axis, so sharding B over the batch axis and H over the
        head axis keeps every kernel invocation fully local; shard_map's AD
        transpose inserts the psums for the replicated parameter grads.

        Returns ``(slice_fn, deslice_fn)`` or None if the mesh/shape
        combination cannot be sharded (caller decides fallback/raise).
        """
        from jax.sharding import PartitionSpec as P

        b_ax, h_ax = self.shard_axes
        sizes = dict(mesh.shape)
        for ax, dim in ((b_ax, batch), (h_ax, self.heads)):
            if ax is None:
                continue
            if ax not in sizes or dim % sizes[ax] != 0:
                return None
        bhn = P(b_ax, h_ax, None)
        bhnc = P(b_ax, h_ax, None, None)
        rep = P()
        base = self.base_temp
        eps = self.epsilon

        def slice_fn(x, ws, bs, wa, ba):
            from ..ops.pallas import slice_kernels as sk
            return jax.shard_map(
                lambda x, ws, bs, wa, ba: sk.slice_states(
                    x, ws, bs, wa, ba, base, eps),
                mesh=mesh,
                in_specs=(bhnc, rep, rep, rep, rep),
                out_specs=(bhnc, bhn, bhn),
                # pallas_call out_shapes carry no vma annotation
                check_vma=False,
            )(x, ws, bs, wa, ba)

        def deslice_fn(x, ws, bs, wa, ba, st, m, s):
            from ..ops.pallas import slice_kernels as sk
            return jax.shard_map(
                lambda x, ws, bs, wa, ba, st, m, s: sk.deslice(
                    x, ws, bs, wa, ba, st, m, s, base, eps),
                mesh=mesh,
                in_specs=(bhnc, rep, rep, rep, rep, bhnc, bhn, bhn),
                out_specs=bhnc,
                check_vma=False,
            )(x, ws, bs, wa, ba, st, m, s)

        return slice_fn, deslice_fn

    def _pallas_enabled(self, n_points: int) -> bool:
        """Resolve the use_pallas tri-state at trace time (N is static).

        With head-TP ``shard_axes`` the fused path is allowed only when the
        kernels can be shard_map-wrapped over the mesh (see
        ``_pallas_shard_map``); the final decision happens in ``__call__``
        where the batch size is known — this method only applies the
        N-threshold / backend rule.
        """
        if self.use_pallas == "auto":
            # The XLA path's training OOM boundary shrinks with G (the
            # saved weight tensor is [B,H,N,G]): measured 2.25M @ G=32 and
            # 1.5M @ G=128 on one v5e (pallas_mem_sweep.py --grad), i.e. a
            # factor (1 - (G-32)/288) linearly. Scale the base threshold
            # by the same factor, floored at 1/4.
            scale = max(0.25, 1.0 - (self.slice_num - 32) / 288.0)
            eff = int(self.pallas_auto_threshold * scale)
            return n_points >= eff and jax.default_backend() == "tpu"
        return bool(self.use_pallas)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: [B, N, dim] -> [B, N, dim]."""
        B, N, _ = x.shape
        G, H, Dh = self.slice_num, self.heads, self.dim_head
        use_pallas = self._pallas_enabled(N)
        pallas_fns = None
        if use_pallas and self._shard_axes_active():
            mesh = self._context_mesh()
            pallas_fns = (
                self._pallas_shard_map(mesh, B) if mesh is not None else None
            )
            if pallas_fns is None:
                if self.use_pallas == "auto":
                    use_pallas = False  # quietly take the XLA path
                else:
                    raise ValueError(
                        "use_pallas=True with shard_axes requires tracing "
                        "under a mesh whose axes divide (batch, heads) — "
                        f"got B={B}, heads={self.heads}, "
                        f"shard_axes={self.shard_axes}, mesh="
                        f"{mesh and dict(mesh.shape)}. Trace inside "
                        "`with mesh:` or drop shard_axes/use_pallas."
                    )

        ### (1) Slice (StructuredMesh2D.py:180-213)
        x_proj = self._project(x)  # [B, H, N, Dh]
        x_proj = self._constrain(x_proj, "b", "h")

        slice_init = (
            nn.initializers.orthogonal()
            if self.orthogonal_slice_init else trunc_normal_init()
        )
        # Raw params (shared by the XLA and fused-Pallas paths).
        w_slice = self.param("in_project_slice_kernel", slice_init,
                             (Dh, G), self.param_dtype)
        b_slice = self.param("in_project_slice_bias", nn.initializers.zeros,
                             (G,), self.param_dtype)
        w_ada = self.param("ada_temp_kernel", trunc_normal_init(),
                           (Dh, 1), self.param_dtype)
        b_ada = self.param("ada_temp_bias", nn.initializers.zeros,
                           (1,), self.param_dtype)

        w = None
        if use_pallas:
            from ..ops.pallas import slice_kernels as sk
            # x_proj passes in its native (e.g. bf16) dtype — the kernels
            # upcast per-tile in VMEM; a whole-array f32 copy of the
            # largest activation would defeat the memory purpose.
            if pallas_fns is not None:
                states, m_res, s_res = pallas_fns[0](
                    x_proj, w_slice, b_slice, w_ada, b_ada)
            else:
                states, m_res, s_res = sk.slice_states(
                    x_proj, w_slice, b_slice, w_ada, b_ada,
                    self.base_temp, self.epsilon,
                )
            if (not self.is_initializing()
                    and self.is_mutable_collection("intermediates")):
                # Visualization pass (capture_intermediates / mutable):
                # the fused kernels never materialize the [B,H,N,G]
                # weights, so recompute them via the XLA formula just for
                # the sow. Only the viz forward pays the memory; normal
                # training/eval traces skip this branch entirely.
                tau = slice_ops.ada_temp(x_proj @ w_ada + b_ada,
                                         self.base_temp)
                logits = x_proj @ w_slice + b_slice
                w_viz = slice_ops.rep_slice_weights(logits, tau, self.epsilon)
                self.sow("intermediates", "slice_weights",
                         w_viz.astype(x_proj.dtype))
        else:
            tau = slice_ops.ada_temp(x_proj @ w_ada + b_ada, self.base_temp)
            logits = x_proj @ w_slice + b_slice
            w = slice_ops.rep_slice_weights(logits, tau, self.epsilon)
            # softmax runs in f32 (param promotion); store the [B,H,N,G]
            # weights in the compute dtype — the largest activation
            w = self._constrain(w.astype(x_proj.dtype), "b", "h")
            states = slice_ops.eidetic_states(x_proj, w)  # [B, H, G, Dh]
            # Expose slice weights for visualization (the reference stores
            # them on the module, Transolver.py:104,154-156; here they're
            # sown and retrieved with capture_intermediates / mutable).
            self.sow("intermediates", "slice_weights", w)

        ### (2) Transform with Erwin (StructuredMesh2D.py:215-246)
        d = self.dimensionality
        flat = states.reshape(B * H * G, Dh)
        # Center-of-mass pseudo-positions: first `d` feature channels,
        # min-max normalized over the GLOBAL flat batch (:228-234).
        feat = jax.lax.stop_gradient(flat[:, :d])
        fmin = feat.min(axis=0, keepdims=True)
        fmax = feat.max(axis=0, keepdims=True)
        pos = (feat - fmin) / (fmax - fmin + 1e-8)
        pos = pos.reshape(B * H, G, d)

        if not self.decode:
            # decode=False makes ErwinTransformer return coarse (x, pos) —
            # valid for the standalone Erwin baseline, but the deslice
            # below needs per-token states; fail with a clear message
            # instead of a trace-time TypeError on the tuple.
            raise ValueError(
                "decode=False is not valid inside physics attention: the "
                "slice->erwin->deslice core needs per-slice-token states "
                "(decode=False returns coarse (x, pos) for the standalone "
                "Erwin baseline only)."
            )
        s_in = self._constrain(states.reshape(B * H, G, Dh), "bh")
        mask = None
        if G & (G - 1):  # pad non-power-of-two slice counts
            s_in, pos, mask = pad_pow2(s_in, pos)

        erwin = ErwinTransformer(
            c_in=Dh,
            rotate=self.rotate,
            decode=self.decode,
            mlp_ratio=self.mlp_ratio,
            dimensionality=d,
            mp_steps=self.mp_steps,
            embed=self.embed,
            use_dist_bias=self.use_dist_bias,
            use_pallas_blocks=self.use_pallas_erwin,
            grouping=self.grouping,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="erwin",
            **self._erwin_defaults(),
        )
        out_states = erwin(s_in, pos, mask=mask, train=train)
        if mask is not None:
            # Mask-aware unpermute sorts valid slots (originals 0..G-1)
            # first, so dropping the pad tail restores the G slice states.
            out_states = out_states[:, :G]
        out_states = self._constrain(
            out_states.reshape(B, H, G, Dh), "b", "h"
        )

        ### (3) Deslice (StructuredMesh2D.py:248-262)
        if use_pallas:
            from ..ops.pallas import slice_kernels as sk
            if pallas_fns is not None:
                out = pallas_fns[1](
                    x_proj, w_slice, b_slice, w_ada, b_ada,
                    out_states, m_res, s_res)
            else:
                out = sk.deslice(
                    x_proj, w_slice, b_slice, w_ada, b_ada,
                    out_states, m_res, s_res,
                    self.base_temp, self.epsilon,
                )
        else:
            out = slice_ops.deslice(out_states, w)
        out = slice_ops.merge_heads(out)
        out = nn.Dense(
            self.dim, kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            param_dtype=self.param_dtype, name="to_out",
        )(out)
        return nn.Dropout(self.dropout)(out, deterministic=not train)


class PhysicsAttentionIrregularMesh(_PhysicsAttentionBase):
    """Linear slice projection (reference ``IrregularMesh.py:95``;
    dimensionality=3 hardcoded at :91)."""

    @property
    def dimensionality(self) -> int:
        return 3

    def _project(self, x):
        inner = self.dim_head * self.heads
        xp = nn.Dense(
            inner, kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            param_dtype=self.param_dtype, name="in_project_x",
        )(x)
        return slice_ops.split_heads(xp, self.heads)


class PhysicsAttentionStructuredMesh2D(_PhysicsAttentionBase):
    """Conv2d slice projection over the H x W grid
    (reference ``StructuredMesh2D.py:109``)."""

    H: int = 101
    W: int = 31
    kernel: int = 3

    @property
    def dimensionality(self) -> int:
        return 2

    def _project(self, x):
        B, N, C = x.shape
        inner = self.dim_head * self.heads
        xg = x.reshape(B, self.H, self.W, C)  # NHWC — TPU-native layout
        xp = nn.Conv(
            inner, (self.kernel, self.kernel), padding="SAME",
            kernel_init=torch_conv_kernel_init(),
            bias_init=torch_conv_bias_init(C * self.kernel ** 2),
            dtype=self.dtype,
            param_dtype=self.param_dtype, name="in_project_x",
        )(xg)
        return slice_ops.split_heads(xp.reshape(B, N, inner), self.heads)


class PhysicsAttentionStructuredMesh3D(_PhysicsAttentionBase):
    """Conv3d slice projection over the H x W x D volume
    (reference ``StructuredMesh3D.py:113``)."""

    H: int = 32
    W: int = 32
    D: int = 32
    kernel: int = 3

    @property
    def dimensionality(self) -> int:
        return 3

    def _project(self, x):
        B, N, C = x.shape
        inner = self.dim_head * self.heads
        xg = x.reshape(B, self.H, self.W, self.D, C)
        xp = nn.Conv(
            inner, (self.kernel, self.kernel, self.kernel), padding="SAME",
            kernel_init=torch_conv_kernel_init(),
            bias_init=torch_conv_bias_init(C * self.kernel ** 3),
            dtype=self.dtype,
            param_dtype=self.param_dtype, name="in_project_x",
        )(xg)
        return slice_ops.split_heads(xp.reshape(B, N, inner), self.heads)
