"""Opt-in int8 (w8a8) serving path for the ASE BERT text tower.

No reference analog (the reference's CLAP text tower serves fp32 on GPU,
``/root/reference/retrieval/models/text_encoder.py``); this is a TPU
serving extension for MAGIC decoding, where the per-step re-encoding of
every candidate caption through the text tower is the dominant device
cost of the early/mid decode steps (BASELINE.md MAGIC notes). Same
design as the GPT-2/Mistral w8a8 paths: per-output-channel symmetric
int8 weights, per-row dynamic int8 activations, TRUE int8 MXU dots
(``models.gpt2._int8_dot``), fp32 epilogue. Embeddings and LayerNorms
stay float (tiny reads).

APPROXIMATE: unlike the GPT-2 w8a8 decode (exact-caption-validated),
8-bit text-tower activations perturb the CLAP scores; agreement is
bounded by tests (embedding cosine, score deltas) and the mode is
opt-in (``predict_prompt --magic --q8_tower``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zs_aac_tpu.models.bert import BertConfig
from zs_aac_tpu.models.gpt2 import _int8_dot

__all__ = ["quantize_text_tower_int8", "encode_text_q8"]


def _q(dense: dict) -> dict:
    """{"kernel" [in, out], "bias"} -> per-output-column int8."""
    w = jnp.asarray(dense["kernel"], jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"w": wq, "scale_a8": scale.astype(jnp.float32),
            "b": jnp.asarray(dense["bias"], jnp.float32)}


def quantize_text_tower_int8(variables: dict, cfg: BertConfig) -> dict:
    """ASE variables (text tower + projection) -> int8 serving tree.

    Reads ``params/text_enc`` (a ``BertEncoder`` tree — the layout
    ``convert_bert`` emits) and ``params/text_proj``; the audio tower is
    dropped (the MAGIC scorer only encodes text)."""
    p = variables["params"]
    te = p["text_enc"]
    layers = []
    for i in range(cfg.num_hidden_layers):
        l = te[f"layer{i}"]
        layers.append({
            "q": _q(l["self"]["query"]), "k": _q(l["self"]["key"]),
            "v": _q(l["self"]["value"]), "o": _q(l["attn_out"]),
            "attn_ln": l["attn_ln"],
            "mid": _q(l["intermediate"]), "out": _q(l["output"]),
            "out_ln": l["out_ln"],
        })
    proj = p["text_proj"]
    return {
        "word": jnp.asarray(te["word_embeddings"]["embedding"]),
        "pos": jnp.asarray(te["position_embeddings"]["embedding"]),
        "type": jnp.asarray(te["token_type_embeddings"]["embedding"]),
        "emb_ln": te["emb_ln"],
        "layers": layers,
        "fc1": _q(proj["fc1"]), "fc2": _q(proj["fc2"]),
    }


def _ln(x, p, eps):
    x = x.astype(jnp.float32)
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return ((x - m) / jnp.sqrt(v + eps) * p["scale"] + p["bias"])


def _dense(x, q):
    return _int8_dot(x, q["w"], q["scale_a8"], x.dtype) + q["b"].astype(x.dtype)


def encode_text_q8(qt: dict, cfg: BertConfig, ids,
                   compute_dtype=jnp.bfloat16):
    """[n, L] ids (0 = pad) -> [n, E] L2-normalized CLAP text embeddings —
    the functional w8a8 twin of ``ASE.encode_text`` over a ``BertEncoder``
    tower (post-LN, additive mask bias, CLS pooling, 2-layer projection).
    Signature matches the MAGIC scorer's ``apply_fn(vars, ids)``."""
    c = cfg
    ids = ids.astype(jnp.int32)
    n, L = ids.shape
    h, d = c.num_attention_heads, c.hidden_size // c.num_attention_heads
    mask = ids != 0
    bias = jnp.where(mask[:, None, None, :], 0.0, -1e9).astype(jnp.float32)

    x = (qt["word"][ids] + qt["pos"][None, :L] + qt["type"][0][None, None])
    x = _ln(x, qt["emb_ln"], c.layer_norm_eps).astype(compute_dtype)

    inv_sqrt_d = float(1.0 / np.sqrt(d))
    for l in qt["layers"]:
        q = _dense(x, l["q"]).reshape(n, L, h, d).transpose(0, 2, 1, 3)
        k = _dense(x, l["k"]).reshape(n, L, h, d).transpose(0, 2, 1, 3)
        v = _dense(x, l["v"]).reshape(n, L, h, d).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        att = jax.nn.softmax(att * inv_sqrt_d + bias, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        a = a.transpose(0, 2, 1, 3).reshape(n, L, c.hidden_size)
        x = _ln(x + _dense(a, l["o"]), l["attn_ln"],
                c.layer_norm_eps).astype(compute_dtype)
        f = jax.nn.gelu(_dense(x, l["mid"]).astype(jnp.float32),
                        approximate=False).astype(compute_dtype)
        x = _ln(x + _dense(f, l["out"]), l["out_ln"],
                c.layer_norm_eps).astype(compute_dtype)

    cls = x[:, 0]
    y = jax.nn.relu(_dense(cls, qt["fc1"]))
    y = _dense(y, qt["fc2"]).astype(jnp.float32)
    return y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
