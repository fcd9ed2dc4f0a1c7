"""Text-tower registry beyond BERT: GPT-2 encoders.

The reference's text-encoder registry (``text_encoder.py:22-35``) includes
``gpt2``/``distilgpt2`` towers used as ordinary (non-causal-LM) sentence
encoders — tokenized text in, last hidden states out, the ASE head takes
position 0. This linen GPT-2 encoder mirrors HF ``GPT2Model`` numerics
(pre-LN blocks, gelu_new, causal mask) and converts from its state_dict.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from zs_aac_tpu.models.convert import to_numpy_state_dict

__all__ = ["GPT2EncoderConfig", "GPT2TextEncoder", "convert_gpt2_encoder"]


@dataclasses.dataclass(frozen=True)
class GPT2EncoderConfig:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5


def _gelu_new(x):
    return 0.5 * x * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


class _Block(nn.Module):
    cfg: GPT2EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_epsilon, dtype=self.dtype, name="ln_1")(x)
        B, L, D = x.shape
        nh, d = c.n_head, c.n_embd // c.n_head
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, nh, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, nh, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, nh, d).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
        att = nn.softmax(att + bias, axis=-1)
        a = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3).reshape(B, L, D)
        x = x + nn.Dense(D, dtype=self.dtype, name="c_proj")(a)
        h = nn.LayerNorm(epsilon=c.layer_norm_epsilon, dtype=self.dtype, name="ln_2")(x)
        h = _gelu_new(nn.Dense(4 * D, dtype=self.dtype, name="c_fc")(h))
        return x + nn.Dense(D, dtype=self.dtype, name="mlp_proj")(h)


class GPT2TextEncoder(nn.Module):
    """Returns last hidden states [B, L, n_embd] (HF GPT2Model semantics:
    causal mask + padding mask combined)."""

    cfg: GPT2EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask: Optional[jnp.ndarray] = None,
                 token_type_ids=None):
        c = self.cfg
        B, L = input_ids.shape
        wte = nn.Embed(c.vocab_size, c.n_embd, dtype=self.dtype, name="wte")
        wpe = nn.Embed(c.n_positions, c.n_embd, dtype=self.dtype, name="wpe")
        x = wte(input_ids) + wpe(jnp.arange(L)[None, :])
        causal = jnp.tril(jnp.ones((L, L), bool))
        bias = jnp.where(causal, 0.0, -1e9)[None, None]
        if attention_mask is not None:
            bias = bias + jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
        bias = bias.astype(self.dtype)
        for i in range(c.n_layer):
            x = _Block(c, self.dtype, name=f"h{i}")(x, bias)
        return nn.LayerNorm(epsilon=c.layer_norm_epsilon, dtype=self.dtype,
                            name="ln_f")(x)


def convert_gpt2_encoder(state_dict, cfg: GPT2EncoderConfig) -> dict:
    """HF ``GPT2Model``/``GPT2LMHeadModel`` state_dict -> variables."""
    sd = to_numpy_state_dict(state_dict)
    sd = {k.removeprefix("transformer."): v for k, v in sd.items()}

    def cv(prefix):  # HF Conv1D: [in, out] already
        return {"kernel": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    p = {
        "wte": {"embedding": sd["wte.weight"]},
        "wpe": {"embedding": sd["wpe.weight"]},
        "ln_f": ln("ln_f"),
    }
    for i in range(cfg.n_layer):
        p[f"h{i}"] = {
            "ln_1": ln(f"h.{i}.ln_1"),
            "ln_2": ln(f"h.{i}.ln_2"),
            "c_attn": cv(f"h.{i}.attn.c_attn"),
            "c_proj": cv(f"h.{i}.attn.c_proj"),
            "c_fc": cv(f"h.{i}.mlp.c_fc"),
            "mlp_proj": cv(f"h.{i}.mlp.c_proj"),
        }
    return {"params": p}
