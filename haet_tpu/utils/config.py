"""Dataclass config system with per-benchmark presets.

The reference configures everything via per-script argparse + SLURM shell
pins (SURVEY.md §5 "Config / flag system"); here a single dataclass carries
the canonical hyperparameters, with presets mirroring the reference's
committed run configs (``scripts/HAETransolver_*.sh``, ``main.py:41-67``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence


@dataclass
class ModelConfig:
    variant: str = "irregular"  # irregular | structured_2d | structured_3d
    space_dim: int = 2
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
    H: int = 85
    W: int = 85
    D: int = 32
    # Erwin params (None -> reference defaults)
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
    dim_head: Optional[int] = None  # None -> n_hidden // n_head
    erwin_mlp_ratio: Optional[int] = None  # None -> share mlp_ratio
    # TPU knobs
    use_checkpoint: bool = False
    use_dist_bias: bool = True
    grouping: str = "median"
    use_pallas: bool | str = False  # False | True | "auto"
    pallas_auto_threshold: int = 1_700_000
    bf16: bool = False
    # Head tensor parallelism: (batch_axis, head_axis) mesh axis names,
    # e.g. ("dp", "tp"); requires tracing under an active Mesh context.
    shard_axes: Optional[tuple] = None

    def build(self):
        """Instantiate the flax model for this config."""
        import jax.numpy as jnp

        from ..models import (
            HAETransolverIrregularMesh,
            HAETransolverStructuredMesh2D,
            HAETransolverStructuredMesh3D,
        )

        common = dict(
            space_dim=self.space_dim, n_layers=self.n_layers,
            n_hidden=self.n_hidden, dropout=self.dropout, n_head=self.n_head,
            Time_Input=self.Time_Input, act=self.act,
            mlp_ratio=self.mlp_ratio, fun_dim=self.fun_dim,
            out_dim=self.out_dim, slice_num=self.slice_num, ref=self.ref,
            unified_pos=self.unified_pos,
            c_hidden=self.c_hidden, ball_sizes=self.ball_sizes,
            enc_num_heads=self.enc_num_heads, enc_depths=self.enc_depths,
            dec_num_heads=self.dec_num_heads, dec_depths=self.dec_depths,
            strides=self.strides, rotate=self.rotate, decode=self.decode,
            mp_steps=self.mp_steps, embed=self.embed,
            dim_head=self.dim_head, erwin_mlp_ratio=self.erwin_mlp_ratio,
            use_checkpoint=self.use_checkpoint,
            use_dist_bias=self.use_dist_bias, grouping=self.grouping,
            use_pallas=self.use_pallas, shard_axes=self.shard_axes,
            pallas_auto_threshold=self.pallas_auto_threshold,
            dtype=jnp.bfloat16 if self.bf16 else None,
        )
        if self.variant == "structured_2d":
            return HAETransolverStructuredMesh2D(H=self.H, W=self.W, **common)
        if self.variant == "structured_3d":
            return HAETransolverStructuredMesh3D(
                H=self.H, W=self.W, D=self.D, **common
            )
        if self.variant == "irregular":
            return HAETransolverIrregularMesh(**common)
        raise ValueError(f"unknown variant {self.variant!r}")


@dataclass
class TrainConfig:
    lr: float = 1e-3
    weight_decay: float = 1e-5
    epochs: int = 500
    batch_size: int = 8
    max_grad_norm: Optional[float] = None
    schedule: str = "onecycle"  # onecycle | cosine_annealing | constant
    pct_start: float = 0.3
    # torch OneCycleLR div factors: initial_lr = lr/div_factor,
    # min_lr = initial_lr/final_div_factor. Defaults are torch's (the PDE
    # drivers use them, exp_darcy.py:138); the car run passes
    # final_div_factor=1000 (train.py:211-216).
    div_factor: float = 25.0
    final_div_factor: float = 1e4
    # torch OneCycleLR default cycle_momentum=True: Adam's beta1 is cycled
    # max_momentum -> base_momentum -> max_momentum along the LR phases.
    # The reference trains with this ON (it never passes
    # cycle_momentum=False), so it is the parity default here too.
    cycle_momentum: bool = True
    base_momentum: float = 0.85
    max_momentum: float = 0.95
    # cosine_annealing only: half-period in optimizer steps (torch
    # CosineAnnealingLR T_max). None -> the run's total step count.
    # The reference's exp_elas steps a T_max=epochs scheduler per batch
    # (exp_elas.py:128,226) — set t_max=epochs to reproduce that.
    t_max: Optional[int] = None
    optimizer: str = "adamw"  # adamw | adam
    # store Adam's first moment in bfloat16 (optax mu_dtype): saves
    # 2 bytes/param of optimizer-state HBM; second moment stays f32
    mu_bf16: bool = False
    seed: int = 0
    # early stopping (reference train.py:21-46)
    early_stop_patience: Optional[int] = None
    early_stop_min_delta: float = 0.0
    # periodic checkpoint every K epochs (reference PDE drivers use 100,
    # exp_darcy.py:259-263); None disables
    checkpoint_every: Optional[int] = None
    # gradient accumulation: each optimizer step consumes accum_steps
    # microbatches via a lax.scan inside the one jitted step, so peak
    # activation memory follows batch_size/accum_steps while the update
    # sees the full batch. 1 = off. batch_size must be divisible by it.
    accum_steps: int = 1
    # abort fit() with FloatingPointError (after saving 'last') when the
    # per-epoch mean training loss goes NaN/Inf — a diverged run cannot
    # recover and would otherwise burn the remaining epochs silently
    stop_on_nonfinite: bool = True
    # preemption-safe training: fit() installs a SIGTERM handler (what
    # `kill`, SLURM, kubernetes and TPU-VM maintenance events send) that
    # finishes the in-flight step, saves 'last', THEN re-delivers the
    # signal — the process still dies, but never loses more than one
    # batch of progress. Ignored when fit() is given an explicit
    # stop_event or runs off the main thread.
    preempt_save: bool = True


@dataclass
class ExperimentConfig:
    name: str = "experiment"
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data_path: str = "./data"
    checkpoint_dir: str = "./checkpoints"
    ntrain: int = 1000
    ntest: int = 200

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Presets mirroring the reference's committed configs (SURVEY.md §5).
# ---------------------------------------------------------------------------

def darcy_config(downsample: int = 5) -> ExperimentConfig:
    """reference exp_darcy.py defaults + scripts/HAET_Darcy.sh."""
    s = int((421 - 1) / downsample) + 1
    return ExperimentConfig(
        name="darcy",
        model=ModelConfig(
            variant="structured_2d", space_dim=2, fun_dim=1, out_dim=1,
            n_layers=8, n_hidden=128, n_head=8, slice_num=64,
            mlp_ratio=1, ref=8, unified_pos=True, H=s, W=s,
        ),
        train=TrainConfig(lr=1e-3, weight_decay=1e-5, epochs=500, batch_size=4,
                          checkpoint_every=100),
    )


def airfoil_config() -> ExperimentConfig:
    """reference exp_airfoil.py: 221x51 mesh coords, fun_dim=0."""
    return ExperimentConfig(
        name="airfoil",
        model=ModelConfig(
            variant="structured_2d", space_dim=2, fun_dim=0, out_dim=1,
            n_layers=8, n_hidden=128, n_head=8, slice_num=64,
            mlp_ratio=1, unified_pos=False, H=221, W=51,
        ),
        train=TrainConfig(lr=1e-3, weight_decay=1e-5, epochs=500, batch_size=4,
                          checkpoint_every=100),
    )


def pipe_config() -> ExperimentConfig:
    """reference exp_pipe.py: 129x129 mesh coords, fun_dim=0."""
    return ExperimentConfig(
        name="pipe",
        model=ModelConfig(
            variant="structured_2d", space_dim=2, fun_dim=0, out_dim=1,
            n_layers=8, n_hidden=128, n_head=8, slice_num=64,
            mlp_ratio=1, unified_pos=False, H=129, W=129,
        ),
        train=TrainConfig(lr=1e-3, weight_decay=1e-5, epochs=500, batch_size=4,
                          checkpoint_every=100),
    )


def ns_config() -> ExperimentConfig:
    """reference exp_ns.py: 64x64, T_in=10 channels, autoregressive rollout."""
    return ExperimentConfig(
        name="ns",
        model=ModelConfig(
            variant="structured_2d", space_dim=2, fun_dim=10, out_dim=1,
            n_layers=8, n_hidden=256, n_head=8, slice_num=64,
            mlp_ratio=1, unified_pos=True, ref=8, H=64, W=64,
        ),
        train=TrainConfig(lr=1e-3, weight_decay=1e-5, epochs=500, batch_size=2,
                          checkpoint_every=100),
    )


def elasticity_config() -> ExperimentConfig:
    """reference exp_elas.py: 972-point clouds, fun_dim=0, irregular model."""
    return ExperimentConfig(
        name="elasticity",
        model=ModelConfig(
            variant="irregular", space_dim=2, fun_dim=0, out_dim=1,
            n_layers=8, n_hidden=128, n_head=8, slice_num=64,
            mlp_ratio=1, unified_pos=False,
        ),
        # reference exp_elas.py:128 uses CosineAnnealingLR(T_max=epochs)
        # stepped per batch (not OneCycle like the other five drivers)
        train=TrainConfig(lr=1e-3, weight_decay=1e-5, epochs=500, batch_size=1,
                          checkpoint_every=100,
                          schedule="cosine_annealing", t_max=500),
    )


def plasticity_config() -> ExperimentConfig:
    """reference exp_plas.py: 101x31 grid, Time_Input=True, out_dim=4."""
    return ExperimentConfig(
        name="plasticity",
        model=ModelConfig(
            variant="structured_2d", space_dim=2, fun_dim=0, out_dim=4,
            n_layers=8, n_hidden=128, n_head=8, slice_num=64,
            mlp_ratio=1, unified_pos=False, H=101, W=31, Time_Input=True,
        ),
        train=TrainConfig(lr=1e-3, weight_decay=1e-5, epochs=500, batch_size=8,
                          checkpoint_every=100),
    )


def shapenet_car_config() -> ExperimentConfig:
    """reference benchmarks/02 main.py:41-67 + scripts/Training.sh:20-25.

    The Erwin stage pins the *vendored* car model's exact configuration
    (``benchmarks/02-.../models/Transolver.py:50-64``): ``enc_num_heads=[8,8]``,
    ``enc_depths=[4,4]``, ``dec_num_heads=[8]``, ``dec_depths=[4]``, Erwin
    ``mlp_ratio=4`` decoupled from the block's 2, and the vendored erwinflash's
    always-on embedding (``erwin_flash.py:69``). With these the model has
    exactly the reference's 1,757,190 parameters (asserted in
    ``tests/test_full_model_oracle.py``); the 5,530,948-param figure in the
    committed training log predates the reference's current CLI (BASELINE.md).
    """
    return ExperimentConfig(
        name="shapenet_car",
        model=ModelConfig(
            variant="irregular", space_dim=7, fun_dim=0, out_dim=4,
            n_layers=2, n_hidden=256, n_head=8, slice_num=32,
            mlp_ratio=2, unified_pos=False,
            enc_num_heads=(8, 8), enc_depths=(4, 4),
            dec_num_heads=(8,), dec_depths=(4,),
            erwin_mlp_ratio=4, embed=True, rotate=45,
        ),
        train=TrainConfig(
            # train.py:210-216: plain Adam (not AdamW) + OneCycleLR with
            # final_div_factor=1000 and the other torch defaults.
            lr=1e-3, optimizer="adam", final_div_factor=1000.0,
            epochs=200, batch_size=1,
            max_grad_norm=1.0, early_stop_patience=7,
        ),
    )


PRESETS = {
    "darcy": darcy_config,
    "airfoil": airfoil_config,
    "pipe": pipe_config,
    "ns": ns_config,
    "elasticity": elasticity_config,
    "plasticity": plasticity_config,
    "shapenet_car": shapenet_car_config,
}
