"""BERT-family text encoder (layer L1 text tower), TPU-native flax.linen.

Capability parity with the reference text tower
(``/root/reference/retrieval/models/text_encoder.py:38-68``), which wraps HF
``BertModel``-style encoders and returns token-level last hidden states; the
ASE model consumes the [CLS] position (``ase_model.py:57-60``).

This is a from-scratch post-LN transformer encoder with HF-compatible
weight layout (see ``convert_bert``), so published BERT/CLAP checkpoints can
be ported. Attention is a single batched einsum-free ``dot_general`` path —
XLA maps it straight onto the MXU; masking is additive-bias style.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from zs_aac_tpu.models.convert import linear_kernel, to_numpy_state_dict

__all__ = ["BertConfig", "BertEncoder", "convert_bert"]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


class _SelfAttention(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        h, d = c.num_attention_heads, c.hidden_size // c.num_attention_heads
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="query")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="key")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="value")(x)
        B, L, _ = x.shape
        q = q.reshape(B, L, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, h, d).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * float(1.0 / np.sqrt(d))
        att = nn.softmax(att + bias, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        return out.transpose(0, 2, 1, 3).reshape(B, L, c.hidden_size)


class _Layer(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        a = _SelfAttention(c, self.dtype, name="self")(x, bias)
        a = nn.Dense(c.hidden_size, dtype=self.dtype, name="attn_out")(a)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="attn_ln")(x + a)
        f = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        f = nn.gelu(f, approximate=False)
        f = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(f)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="out_ln")(x + f)


class BertEncoder(nn.Module):
    """Returns last hidden states ``[B, L, hidden]``."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,            # [B, L] int32
        attention_mask: Optional[jnp.ndarray] = None,  # [B, L] 1=keep
        token_type_ids: Optional[jnp.ndarray] = None,
    ):
        c = self.cfg
        B, L = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        we = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="word_embeddings")
        pe = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=self.dtype,
                      name="position_embeddings")
        te = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=self.dtype,
                      name="token_type_embeddings")
        x = we(input_ids) + pe(jnp.arange(L)[None, :]) + te(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="emb_ln")(x)

        if attention_mask is None:
            bias = jnp.zeros((B, 1, 1, L), self.dtype)
        else:
            bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(self.dtype)

        for i in range(c.num_hidden_layers):
            x = _Layer(c, self.dtype, name=f"layer{i}")(x, bias)
        return x


def convert_bert(state_dict, cfg: BertConfig) -> dict:
    """HF ``BertModel`` state_dict -> ``BertEncoder`` variables.

    Accepts keys with or without the ``bert.`` prefix; ignores the pooler and
    any task heads (the reference never uses them).
    """
    sd = to_numpy_state_dict(state_dict)
    sd = {k.removeprefix("bert."): v for k, v in sd.items()}

    p: dict = {}

    def dense(dst, src):
        p[dst] = {"kernel": linear_kernel(sd[src + ".weight"]), "bias": sd[src + ".bias"]}

    def ln(dst, src):
        p[dst] = {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}

    p["word_embeddings"] = {"embedding": sd["embeddings.word_embeddings.weight"]}
    p["position_embeddings"] = {"embedding": sd["embeddings.position_embeddings.weight"]}
    p["token_type_embeddings"] = {"embedding": sd["embeddings.token_type_embeddings.weight"]}
    ln("emb_ln", "embeddings.LayerNorm")

    for i in range(cfg.num_hidden_layers):
        src = f"encoder.layer.{i}"
        layer: dict = {}
        p[f"layer{i}"] = layer
        sub = {}
        for name in ("query", "key", "value"):
            sub[name] = {
                "kernel": linear_kernel(sd[f"{src}.attention.self.{name}.weight"]),
                "bias": sd[f"{src}.attention.self.{name}.bias"],
            }
        layer["self"] = sub
        layer["attn_out"] = {
            "kernel": linear_kernel(sd[f"{src}.attention.output.dense.weight"]),
            "bias": sd[f"{src}.attention.output.dense.bias"],
        }
        layer["attn_ln"] = {
            "scale": sd[f"{src}.attention.output.LayerNorm.weight"],
            "bias": sd[f"{src}.attention.output.LayerNorm.bias"],
        }
        layer["intermediate"] = {
            "kernel": linear_kernel(sd[f"{src}.intermediate.dense.weight"]),
            "bias": sd[f"{src}.intermediate.dense.bias"],
        }
        layer["output"] = {
            "kernel": linear_kernel(sd[f"{src}.output.dense.weight"]),
            "bias": sd[f"{src}.output.dense.bias"],
        }
        layer["out_ln"] = {
            "scale": sd[f"{src}.output.LayerNorm.weight"],
            "bias": sd[f"{src}.output.LayerNorm.bias"],
        }
    return {"params": p}
