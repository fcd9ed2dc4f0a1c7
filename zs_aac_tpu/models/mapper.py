"""Mapper networks: CLAP embedding -> GPT prefix token embeddings.

Capability parity with ``/root/reference/models/mapper.py``: an ``MLP``
(Linear/Tanh stack; e.g. 512 -> (768*10)/2 -> 768*10) and a
``TransformerMapper`` (linear to ``clip_length`` tokens, concat learned
prefix constants, 8-layer pre-norm self-attention transformer with
mlp_ratio=2 and ReLU, keep the trailing ``prefix_length`` tokens).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["MLP", "TransformerMapper", "make_mapper"]


class MLP(nn.Module):
    sizes: Sequence[int]
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, size in enumerate(self.sizes[1:]):
            x = nn.Dense(size, use_bias=self.use_bias, dtype=self.dtype, name=f"fc{i}")(x)
            if i < len(self.sizes) - 2:
                x = jnp.tanh(x)
        return x


class _MapperAttention(nn.Module):
    """Self-attention with a fused KV projection (reference mapper.py:37-66)."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        d = C // h
        q = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_queries")(x)
        kv = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="to_keys_values")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(B, N, h, d)
        k = k.reshape(B, N, h, d)
        v = v.reshape(B, N, h, d)
        att = jnp.einsum("bnhd,bmhd->bnmh", q, k) / np.sqrt(d).astype(x.dtype)
        att = nn.softmax(att, axis=2)
        out = jnp.einsum("bnmh,bmhd->bnhd", att, v).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="project")(out)


class _MapperLayer(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + _MapperAttention(self.dim, self.num_heads, self.dtype, name="attn")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        )
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class TransformerMapper(nn.Module):
    dim_clip: int
    dim_embedding: int
    prefix_length: int
    clip_length: int
    num_layers: int = 8
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, dim_clip]
        B = x.shape[0]
        tokens = nn.Dense(
            self.clip_length * self.dim_embedding, dtype=self.dtype, name="linear"
        )(x).reshape(B, self.clip_length, self.dim_embedding)
        prefix_const = self.param(
            "prefix_const",
            nn.initializers.normal(1.0),
            (self.prefix_length, self.dim_embedding),
        )
        h = jnp.concatenate(
            [tokens, jnp.broadcast_to(prefix_const, (B, *prefix_const.shape))], axis=1
        )
        for i in range(self.num_layers):
            h = _MapperLayer(
                self.dim_embedding, self.num_heads, dtype=self.dtype, name=f"layer{i}"
            )(h)
        return h[:, self.clip_length :]


def make_mapper(
    mapping_type: str,
    prefix_size: int,
    gpt_embedding_size: int,
    prefix_length: int,
    clip_length: int | None = None,
    num_layers: int = 8,
):
    """Factory mirroring the reference's mapping_type switch
    (``caption_model.py:55-60``)."""
    if mapping_type == "mlp":
        return MLP(
            (
                prefix_size,
                (gpt_embedding_size * prefix_length) // 2,
                gpt_embedding_size * prefix_length,
            )
        )
    if mapping_type == "transformer":
        return TransformerMapper(
            prefix_size, gpt_embedding_size, prefix_length,
            clip_length or prefix_length, num_layers,
        )
    raise ValueError(f"unknown mapping_type {mapping_type!r}")
