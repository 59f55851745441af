"""Golden numerics tests: rep-slice / eidetic / deslice vs a PyTorch oracle.

The oracle re-states the reference math (Transolver++ Algorithm 1,
reference ``models/PhysicsAttention/StructuredMesh2D.py:180-262``) in torch
so the JAX ops can be checked bit-for-bit (to fp32 tolerance) on random
inputs with identical weights.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from haet_tpu.ops import slice_ops

B, H, N, C, G = 2, 3, 40, 8, 16


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    return {
        "x": rng.randn(B, H, N, C).astype(np.float32),
        "w_slice": rng.randn(C, G).astype(np.float32),
        "b_slice": rng.randn(G).astype(np.float32),
        "w_ada": rng.randn(C, 1).astype(np.float32),
        "b_ada": rng.randn(1).astype(np.float32),
        "s": rng.randn(B, H, G, C).astype(np.float32),
    }


def torch_oracle_weights(d, base_temp=0.5, epsilon=1e-6):
    """Ada-Temp + Rep-Slice exactly as the reference forward (:193-199)."""
    x = torch.from_numpy(d["x"])
    ada = base_temp + (x @ torch.from_numpy(d["w_ada"])
                       + torch.from_numpy(d["b_ada"])).clamp(-0.4, 0.4)
    shift = torch.log(-torch.log(torch.tensor(epsilon)))
    logits = x @ torch.from_numpy(d["w_slice"]) + torch.from_numpy(d["b_slice"])
    return torch.softmax((logits - shift) / ada, dim=2)


def jax_weights(d, base_temp=0.5, epsilon=1e-6):
    x = jnp.asarray(d["x"])
    temp_raw = x @ jnp.asarray(d["w_ada"]) + jnp.asarray(d["b_ada"])
    tau = slice_ops.ada_temp(temp_raw, base_temp)
    logits = x @ jnp.asarray(d["w_slice"]) + jnp.asarray(d["b_slice"])
    return slice_ops.rep_slice_weights(logits, tau, epsilon)


def test_rep_slice_weights_match_torch(data):
    ours = np.asarray(jax_weights(data))
    ref = torch_oracle_weights(data).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    # weights sum to one over the points axis (softmax dim=2)
    np.testing.assert_allclose(ours.sum(axis=2), 1.0, rtol=1e-5)


def test_eidetic_states_match_torch(data):
    w_t = torch_oracle_weights(data)
    x_t = torch.from_numpy(data["x"])
    s_ref = torch.einsum("bhnc,bhng->bhgc", x_t, w_t)
    norm = w_t.sum(2)
    s_ref = s_ref / (norm + 1e-5)[:, :, :, None].repeat(1, 1, 1, C)

    w_j = jax_weights(data)
    s_j = slice_ops.eidetic_states(jnp.asarray(data["x"]), w_j)
    np.testing.assert_allclose(
        np.asarray(s_j), s_ref.numpy(), rtol=1e-4, atol=1e-5
    )


def test_deslice_match_torch(data):
    w_t = torch_oracle_weights(data)
    s_t = torch.from_numpy(data["s"])
    out_ref = torch.einsum("bhgc,bhng->bhnc", s_t, w_t)

    out_j = slice_ops.deslice(jnp.asarray(data["s"]), jax_weights(data))
    np.testing.assert_allclose(
        np.asarray(out_j), out_ref.numpy(), rtol=1e-4, atol=1e-5
    )


def test_merge_split_heads_roundtrip(data):
    x = jnp.asarray(data["x"])
    merged = slice_ops.merge_heads(x)
    assert merged.shape == (B, N, H * C)
    back = slice_ops.split_heads(merged, H)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # merge order matches torch rearrange 'b h n d -> b n (h d)'
    t = torch.from_numpy(data["x"]).permute(0, 2, 1, 3).reshape(B, N, H * C)
    np.testing.assert_array_equal(np.asarray(merged), t.numpy())


def test_timestep_embedding_matches_torch():
    from haet_tpu.models.components.embedding import timestep_embedding

    T = np.array([[0.5], [3.0]], dtype=np.float32)
    dim = 33
    ours = np.asarray(timestep_embedding(jnp.asarray(T), dim))

    # torch oracle (reference models/components/embedding.py:69-99)
    timesteps = torch.from_numpy(T[:, 0])
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
    )
    args = timesteps[:, None].float() * freqs[None]
    emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    emb = torch.cat([emb, torch.zeros_like(emb[:, :1])], dim=-1)
    np.testing.assert_allclose(ours, emb.numpy(), rtol=1e-4, atol=1e-5)


def test_swiglu_matches_torch():
    import jax

    from haet_tpu.models.components.mlp import SwiGLU

    x = np.random.RandomState(1).randn(4, 8).astype(np.float32)
    m = SwiGLU(dim=8, hidden_dim=16)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(v, jnp.asarray(x))

    w1 = torch.from_numpy(np.asarray(v["params"]["w1"]["kernel"]))
    b1 = torch.from_numpy(np.asarray(v["params"]["w1"]["bias"]))
    w2 = torch.from_numpy(np.asarray(v["params"]["w2"]["kernel"]))
    b2 = torch.from_numpy(np.asarray(v["params"]["w2"]["bias"]))
    w3 = torch.from_numpy(np.asarray(v["params"]["w3"]["kernel"]))
    b3 = torch.from_numpy(np.asarray(v["params"]["w3"]["bias"]))
    xt = torch.from_numpy(x)
    ref = ((xt @ w2 + b2) * torch.nn.functional.silu(xt @ w1 + b1)) @ w3 + b3
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)
