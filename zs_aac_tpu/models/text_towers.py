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

__all__ = ["GPT2EncoderConfig", "GPT2TextEncoder", "convert_gpt2_encoder",
           "CLIPTextConfig", "CLIPTextEncoder", "convert_clip_text"]


@dataclasses.dataclass(frozen=True)
class GPT2EncoderConfig:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5


def _gelu_new(x):
    # weakly-typed constant: a numpy scalar would upcast bf16 to f32
    c = float(np.sqrt(2.0 / np.pi))
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x**3)))


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
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * float(1.0 / np.sqrt(d))
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


# ---------------------------------------------------------------------------
# CLIP text tower ('openai/clip-vit-base-patch32', text_encoder.py:23)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    n_layer: int = 12
    n_head: int = 8
    intermediate_size: int = 2048
    max_positions: int = 77
    layer_norm_eps: float = 1e-5


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _CLIPBlock(nn.Module):
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        B, L, D = x.shape
        nh, d = c.n_head, c.hidden_size // c.n_head
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(D, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(B, L, nh, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, nh, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, nh, d).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * float(1.0 / np.sqrt(d))
        att = nn.softmax(att + bias, axis=-1)
        a = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3).reshape(B, L, D)
        x = x + nn.Dense(D, dtype=self.dtype, name="out_proj")(a)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = _quick_gelu(nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(h))
        return x + nn.Dense(D, dtype=self.dtype, name="fc2")(h)


class CLIPTextEncoder(nn.Module):
    """HF ``CLIPTextModel`` semantics: causal + padding mask, final LN,
    returns last hidden states."""

    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        c = self.cfg
        B, L = input_ids.shape
        x = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        x = x + nn.Embed(c.max_positions, c.hidden_size, dtype=self.dtype,
                         name="position_embedding")(jnp.arange(L)[None, :])
        causal = jnp.tril(jnp.ones((L, L), bool))
        bias = jnp.where(causal, 0.0, -1e9)[None, None]
        if attention_mask is not None:
            bias = bias + jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
        bias = bias.astype(self.dtype)
        for i in range(c.n_layer):
            x = _CLIPBlock(c, self.dtype, name=f"layer{i}")(x, bias)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="final_layer_norm")(x)


def convert_clip_text(state_dict, cfg: CLIPTextConfig) -> dict:
    """HF ``CLIPTextModel`` state_dict -> variables."""
    from zs_aac_tpu.models.convert import linear_kernel

    sd = to_numpy_state_dict(state_dict)
    sd = {k.removeprefix("text_model."): v for k, v in sd.items()}

    def dense(prefix):
        return {"kernel": linear_kernel(sd[prefix + ".weight"]),
                "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    p = {
        "token_embedding": {"embedding": sd["embeddings.token_embedding.weight"]},
        "position_embedding": {
            "embedding": sd["embeddings.position_embedding.weight"]},
        "final_layer_norm": ln("final_layer_norm"),
    }
    for i in range(cfg.n_layer):
        src = f"encoder.layers.{i}"
        p[f"layer{i}"] = {
            "layer_norm1": ln(f"{src}.layer_norm1"),
            "layer_norm2": ln(f"{src}.layer_norm2"),
            "q_proj": dense(f"{src}.self_attn.q_proj"),
            "k_proj": dense(f"{src}.self_attn.k_proj"),
            "v_proj": dense(f"{src}.self_attn.v_proj"),
            "out_proj": dense(f"{src}.self_attn.out_proj"),
            "fc1": dense(f"{src}.mlp.fc1"),
            "fc2": dense(f"{src}.mlp.fc2"),
        }
    return {"params": p}
