"""Mistral-7B decoder with LoRA, TPU-native.

Capability parity with the reference's Mistral captioner
(``/root/reference/models/caption_model.py:208-279,340-426``): HF
``MistralForCausalLM`` quantized to NF4 via bitsandbytes + PEFT LoRA (r=8,
alpha=16 on q/k/v/o/gate/up/down/lm_head). bitsandbytes is CUDA-only; on
TPU the base weights run in **bfloat16** (the documented deviation,
SURVEY.md §9.8 — bf16 is the TPU-native low-precision path and strictly
more accurate than NF4), with LoRA applied at the matmul sites (never
materializing merged weights, so the 7B base stays frozen and single-copy).

Architecture: RMSNorm, rotary embeddings, grouped-query attention
(32 q / 8 kv heads), SwiGLU MLP, optional sliding-window causal mask
(irrelevant at this task's <=80-token sequences but implemented).
KV-cached prefill/step mirror ``models.gpt2``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zs_aac_tpu.models.convert import to_numpy_state_dict

__all__ = [
    "MistralConfig",
    "init_mistral",
    "convert_mistral",
    "init_lora",
    "lora_trainable_mask",
    "mistral_embed",
    "mistral_forward",
    "init_mistral_cache",
    "init_mistral_cache_q8",
    "mistral_prefill",
    "mistral_step",
    "quantize_mistral_int8",
]

LORA_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down", "lm_head")


@dataclasses.dataclass(frozen=True)
class MistralConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    intermediate_size: int = 14336
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    sliding_window: int = 4096
    max_positions: int = 4096

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.n_heads


def _rms_norm(x, w, eps):
    var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _rope(x, positions, theta):
    """x: [B, H, L, d]; rotate-half RoPE (HF Llama/Mistral convention)."""
    d = x.shape[-1]
    inv = 1.0 / (theta ** (np.arange(0, d, 2, np.float32) / d))
    ang = positions[:, None].astype(jnp.float32) * inv[None, :]  # [L, d/2]
    cos = jnp.cos(ang)[None, None]
    sin = jnp.sin(ang)[None, None]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    cos = jnp.concatenate([cos, cos], axis=-1).astype(x.dtype)
    sin = jnp.concatenate([sin, sin], axis=-1).astype(x.dtype)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rot * sin


def _base_matmul(x, w):
    """x @ w for a float weight or an int8-quantized one (dict leaf, same
    static-key dispatch as ``models.gpt2._mm``): {"w" int8 [in,out],
    "scale" fp32 [out]} dequantizes in the matmul; "scale_a8" additionally
    quantizes activations per-row and runs a true int8 MXU matmul — the
    TPU-native replacement for the reference's NF4 base
    (``caption_model.py:223-232``), which exists to fit/stream the 7B
    weights cheaply."""
    if isinstance(w, dict):
        if "scale_a8" in w:
            from zs_aac_tpu.models.gpt2 import _int8_dot

            return _int8_dot(x, w["w"], w["scale_a8"], x.dtype)
        return (x @ w["w"].astype(x.dtype)) * w["scale"].astype(x.dtype)
    return x @ w


def _lora_matmul(x, w, lora: Optional[Dict], scale):
    """x @ w plus the low-rank LoRA path ((x@a)@b, PEFT layout a:[in,r],
    b:[r,out]). LoRA params are stored fp32 for training precision and cast
    to the activation dtype at use (keeps bf16 decode bf16). The base
    weight may be int8-quantized (``quantize_mistral_int8``) — the LoRA
    delta stays unmerged and full precision, matching the reference's
    NF4-base + float-LoRA serving."""
    out = _base_matmul(x, w)
    if lora is not None:
        out = out + _lora_delta(x, lora, scale)
    return out


def _lora_delta(x, lora: Dict, scale):
    delta = (x @ lora["a"].astype(x.dtype)) @ lora["b"].astype(x.dtype)
    return delta * jnp.asarray(scale, x.dtype)


def _qkv_matmul(a, cfg: "MistralConfig", x, lora: Optional[Dict], scale):
    """q/k/v projections -> (q, k, v), each [..., D] / [..., kvd].

    Reads the fused ``wqkv`` leaf when present (serving layout,
    ``quantize_mistral_int8(fuse=True)``): ONE int8 MXU dot + ONE
    activation-quantize pass instead of three, sliced afterwards at
    128-aligned column offsets (lane-aligned bitcast slices, no relayout).
    LoRA deltas stay per-site on top of the slices — identical math to the
    unfused path."""
    if "wqkv" in a:
        D = cfg.hidden_size
        kvd = cfg.n_kv_heads * cfg.head_dim
        qkv = _base_matmul(x, a["wqkv"])
        q = qkv[..., :D]
        k = qkv[..., D:D + kvd]
        v = qkv[..., D + kvd:]
        if lora is not None:
            if "wq" in lora:
                q = q + _lora_delta(x, lora["wq"], scale)
            if "wk" in lora:
                k = k + _lora_delta(x, lora["wk"], scale)
            if "wv" in lora:
                v = v + _lora_delta(x, lora["wv"], scale)
        return q, k, v
    q = _lora_matmul(x, a["wq"], lora.get("wq") if lora else None, scale)
    k = _lora_matmul(x, a["wk"], lora.get("wk") if lora else None, scale)
    v = _lora_matmul(x, a["wv"], lora.get("wv") if lora else None, scale)
    return q, k, v


def quantize_mistral_int8(params: dict, mode: str = "w8",
                          fuse: bool = False) -> dict:
    """Per-output-channel symmetric int8 quantization of every projection
    (q/k/v/o/gate/up/down/lm_head). ``embed`` and the RMSNorm scales stay
    float (tiny reads). ``mode`` as in ``models.gpt2.quantize_gpt2_int8``.

    ``fuse=True`` emits the SERVING layout: q/k/v concatenated into one
    ``wqkv`` [D, D+2*kvd] leaf and gate/up into one ``gateup`` [D, 2I] —
    per-output-channel scales concatenate with the columns, so the int8
    products, int32 accumulations and fp32 epilogue are element-for-element
    identical to the unfused path (exactness asserted in
    tests/test_mistral.py). The point is step-level glue: 7 projection
    dots per layer become 4, which drops 3 dot dispatches + fp32-rescale
    epilogues and lets one activation-quantize pass feed q, k AND v.
    Measured (round-5 A/B, BASELINE.md): the act-quant ``abs_reduce``
    term drops 5.54 -> 2.01 ms/step at 7B/B=256 but the wider fused dots
    give most of it back — net +3.1% tok/s at B=256, NEGATIVE at B=128
    (-3.3%) and B=512 (-2.7%). Serve fused only near the B=256 knee
    (``predict_multilingual --fuse_qkv auto`` does exactly that)."""
    assert mode in ("w8", "w8a8"), mode
    skey = "scale" if mode == "w8" else "scale_a8"

    def q(w):
        w = jnp.asarray(w, jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
        wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return {"w": wq, skey: scale.astype(jnp.float32)}

    def qcat(*ws):
        qs = [q(w) for w in ws]
        return {"w": jnp.concatenate([e["w"] for e in qs], axis=1),
                skey: jnp.concatenate([e[skey] for e in qs])}

    if fuse:
        layers = [
            {
                "attn": {"wqkv": qcat(*(l["attn"][k] for k in ("wq", "wk", "wv"))),
                         "wo": q(l["attn"]["wo"])},
                "mlp": {"gateup": qcat(l["mlp"]["gate"], l["mlp"]["up"]),
                        "down": q(l["mlp"]["down"])},
                "ln1": l["ln1"],
                "ln2": l["ln2"],
            }
            for l in params["layers"]
        ]
    else:
        layers = [
            {
                "attn": {k: q(l["attn"][k]) for k in ("wq", "wk", "wv", "wo")},
                "mlp": {k: q(l["mlp"][k]) for k in ("gate", "up", "down")},
                "ln1": l["ln1"],
                "ln2": l["ln2"],
            }
            for l in params["layers"]
        ]
    return {
        "embed": params["embed"],
        "layers": layers,
        "norm": params["norm"],
        "lm_head": q(params["lm_head"]),
    }


def _attention(p, cfg: MistralConfig, x, *, bias, positions, lora, scale):
    """Full-sequence (forward/prefill) attention; the decode step uses the
    grouped in-place-cache formulation inlined in ``mistral_step``."""
    B, L, D = x.shape
    H, KV, d = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    q, k, v = _qkv_matmul(p, cfg, x, lora, scale)
    q = q.reshape(B, L, H, d).transpose(0, 2, 1, 3)
    k = k.reshape(B, L, KV, d).transpose(0, 2, 1, 3)
    v = v.reshape(B, L, KV, d).transpose(0, 2, 1, 3)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)
    new_cache = (k, v)

    rep = H // KV
    k = jnp.repeat(k, rep, axis=1)
    v = jnp.repeat(v, rep, axis=1)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d).astype(x.dtype)
    att = jax.nn.softmax((att + bias).astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, L, H * d)
    return _lora_matmul(o, p["wo"], lora.get("wo") if lora else None, scale), new_cache


def _mlp(p, x, lora, scale):
    if "gateup" in p:   # fused serving layout (quantize_mistral_int8)
        I = p["gateup"]["w"].shape[1] // 2
        gu = _base_matmul(x, p["gateup"])
        g, u = gu[..., :I], gu[..., I:]
        if lora is not None:
            if "gate" in lora:
                g = g + _lora_delta(x, lora["gate"], scale)
            if "up" in lora:
                u = u + _lora_delta(x, lora["up"], scale)
    else:
        g = _lora_matmul(x, p["gate"], lora.get("gate") if lora else None, scale)
        u = _lora_matmul(x, p["up"], lora.get("up") if lora else None, scale)
    h = jax.nn.silu(g) * u
    return _lora_matmul(h, p["down"], lora.get("down") if lora else None, scale)


def _causal_bias(L, offset, window, dtype):
    q = jnp.arange(L)[:, None] + offset
    kpos = jnp.arange(L)[None, :]
    ok = (kpos <= q) & (kpos > q - window)
    return jnp.where(ok, 0.0, -1e9).astype(dtype)[None, None]


def mistral_embed(params, tokens):
    return params["embed"][tokens]


def _lora_layer(lora, i):
    return None if lora is None else lora["layers"][i]


def _lora_scale(lora):
    return 0.0 if lora is None else lora["alpha"] / lora["r"]


def mistral_forward(params, cfg: MistralConfig, inputs_embeds,
                    attention_mask=None, lora=None):
    """Full-sequence forward -> logits [B, L, vocab]."""
    B, L, D = inputs_embeds.shape
    x = inputs_embeds
    positions = jnp.arange(L)
    bias = _causal_bias(L, 0, cfg.sliding_window, x.dtype)
    if attention_mask is not None:
        bias = bias + jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
    scale = _lora_scale(lora)
    for i, p in enumerate(params["layers"]):
        ll = _lora_layer(lora, i)
        h = _rms_norm(x, p["ln1"], cfg.rms_norm_eps)
        a, _ = _attention(p["attn"], cfg, h, bias=bias, positions=positions,
                          lora=ll, scale=scale)
        x = x + a
        h = _rms_norm(x, p["ln2"], cfg.rms_norm_eps)
        x = x + _mlp(p["mlp"], h, ll, scale)
    x = _rms_norm(x, params["norm"], cfg.rms_norm_eps)
    head_lora = lora.get("lm_head") if lora else None
    return _lora_matmul(x, params["lm_head"], head_lora, scale)


def init_mistral_cache(cfg: MistralConfig, batch: int, max_len: int,
                       dtype=jnp.bfloat16):
    """Preallocated cache: k/v stacked over layers, [L, B, KV, T, d],
    updated in place per layer inside ``mistral_step``.

    Measured A/B at 7B/B=64 on v5e (w8a8, 60-step greedy): stacked
    in-place 12.80 ms/step vs per-layer whole-buffer leaves 13.19-13.20 —
    the OPPOSITE of the GPT-2 beam-cache lesson; with one query row per
    step XLA aliases the stacked scatters fine and the per-layer pytree
    only adds carry-tuple overhead. Keep ablating empirically per model."""
    d = cfg.head_dim
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, max_len, d)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def init_mistral_cache_q8(cfg: MistralConfig, batch: int, max_len: int):
    """int8 KV cache with per-(layer, batch, kv-head, pos) symmetric scales
    — the ``models.gpt2.init_kv_cache_q8`` quantization scheme. Halves the
    decode step's dominant HBM stream (cache reads; the d=128 head dim
    fills int8 lane tiles exactly). ``mistral_prefill`` / ``mistral_step``
    dispatch on the cache being a tuple and fold the dequant scales into
    the attention contractions, so no dequantized cache tensor is ever
    materialized.

    Layout (round 4): PER-LAYER leaves ``(k, v, k_scale, v_scale)`` with
    batch and kv-head FOLDED into one leading dim — k/v
    [B*KV, T, d] int8, scales [B*KV, T] f32 — so the attention
    contractions carry ONE batch dim. The round-3 stacked
    [L, B, KV, T, d] layout made XLA pick a scatter-friendly carry layout
    ({0,3,1,2}, B minor) and pay a full 19 MB relayout copy per k AND v
    per layer per step before the grouped dot (profiled 6.9 ms of the
    24.8 ms step at 7B/B=256). Measured A/B at 7B/B=256, 60-step greedy:
    stacked 24.77 ms/step (10,333 tok/s), per-layer unfolded [B, KV, T, d]
    22.29 (11,483), FOLDED 20.58 (12,437); a T-major stacked variant
    measured worse (27.38)."""
    d = cfg.head_dim
    bg = batch * cfg.n_kv_heads
    return tuple(
        (
            jnp.zeros((bg, max_len, d), jnp.int8),
            jnp.zeros((bg, max_len, d), jnp.int8),
            jnp.zeros((bg, max_len), jnp.float32),
            jnp.zeros((bg, max_len), jnp.float32),
        )
        for _ in range(cfg.n_layers)
    )


def mistral_prefill(params, cfg: MistralConfig, inputs_embeds, cache, lora=None):
    B, L, D = inputs_embeds.shape
    x = inputs_embeds
    positions = jnp.arange(L)
    bias = _causal_bias(L, 0, cfg.sliding_window, x.dtype)
    scale = _lora_scale(lora)
    q8 = isinstance(cache, tuple)
    T = cache[0][0].shape[1] if q8 else cache["k"].shape[3]
    ks, vs = [], []
    for i, p in enumerate(params["layers"]):
        ll = _lora_layer(lora, i)
        h = _rms_norm(x, p["ln1"], cfg.rms_norm_eps)
        a, (k, v) = _attention(p["attn"], cfg, h, bias=bias, positions=positions,
                               lora=ll, scale=scale)
        ks.append(jnp.pad(k, [(0, 0), (0, 0), (0, T - L), (0, 0)]))
        vs.append(jnp.pad(v, [(0, 0), (0, 0), (0, T - L), (0, 0)]))
        x = x + a
        h = _rms_norm(x, p["ln2"], cfg.rms_norm_eps)
        x = x + _mlp(p["mlp"], h, ll, scale)
    x = _rms_norm(x, params["norm"], cfg.rms_norm_eps)
    head_lora = lora.get("lm_head") if lora else None
    logits = _lora_matmul(x, params["lm_head"], head_lora, scale)
    if q8:  # int8 cache: quantize the prompt's K/V into per-layer leaves
        from zs_aac_tpu.models.gpt2 import _quantize_vec

        bg = B * cfg.n_kv_heads
        d = cfg.head_dim
        # Quantize the STACKED [L, B, KV, T, d] tensor once, then slice +
        # reshape per layer. Semantically identical to per-layer quantize
        # calls, but the stacked producer hands the decode while_loop a
        # dot-friendly initial-carry layout — per-layer _quantize_vec
        # producers made XLA pick a T-major carry ({2,0,1}) whose strided
        # attention reads cost +5.5 ms/step at 7B/B=256 (26.04 vs 20.58
        # ms/step, measured both ways on the chip).
        qk, sk = _quantize_vec(jnp.stack(ks).astype(jnp.float32))
        qv, sv = _quantize_vec(jnp.stack(vs).astype(jnp.float32))
        return logits, tuple(
            (qk[i].reshape(bg, T, d), qv[i].reshape(bg, T, d),
             sk[i].reshape(bg, T), sv[i].reshape(bg, T))
            for i in range(cfg.n_layers)
        )
    cache = {
        "k": jnp.stack(ks).astype(cache["k"].dtype),
        "v": jnp.stack(vs).astype(cache["v"].dtype),
    }
    return logits, cache


def mistral_step(params, cfg: MistralConfig, x_embed, cache, index, lora=None):
    """One cached decode step. x_embed: [B, D].

    Decode-bandwidth notes (the 7B-serving roofline items, BASELINE.md):

    - The stacked [L, B, KV, T, d] cache buffers are updated IN PLACE with
      ``.at[i, :, :, index].set`` and read back as ``cache[i]`` — inside
      the decode while_loop XLA aliases these scatters, so the O(GB)
      cache is never copied per step. Measured A/B at 7B/B=64: the old
      per-layer slice + ``jnp.stack`` rebuild 21.7 ms/step (full-cache
      copies; trap documented at ``models.gpt2.gpt2_step``), per-layer
      whole-buffer leaves 13.2, stacked in-place 12.8 (see
      ``init_mistral_cache``).
    - GQA attention is GROUPED, not repeated: the query's H=32 heads are
      viewed as [KV=8 groups, rep=4] and contracted directly against the
      [B, KV, T, d] cache (``bgrd,bgtd->bgrt``). ``jnp.repeat`` on the
      cache read materialized rep× the cache bytes per step (~2.5 GB/step
      at B=64/7B) — the grouped dot reads each cache byte exactly once,
      which is the point of the reference model's GQA
      (``mistralai/Mistral-7B`` n_kv_heads=8).
    - An int8 cache (``init_mistral_cache_q8``, detected by the cache
      being a tuple of per-layer leaves) halves those reads again:
      per-vector scales are folded into the score logits (k-scales) and
      the probabilities (v-scales), exactly as
      ``models.gpt2.gpt2_step_q8`` — and (round 4) its leaves are
      per-layer with batch and kv-head folded into one dim, which keeps
      XLA's carry layout dot-friendly: the stacked layout paid a 19 MB
      relayout copy per k/v per layer per step (profiled 6.9 ms of the
      24.8 ms step at 7B/B=256; folded measures 20.6 ms/step).
    """
    B, D = x_embed.shape
    H, KV, d = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rep = H // KV
    bg = B * KV
    x = x_embed[:, None]
    positions = jnp.full((1,), index)
    q8 = isinstance(cache, tuple)
    T = cache[0][0].shape[1] if q8 else cache["k"].shape[3]
    kpos = jnp.arange(T)
    ok = (kpos <= index) & (kpos > index - cfg.sliding_window)
    bias = jnp.where(ok, 0.0, -1e9)  # [T] f32
    scale = _lora_scale(lora)
    sqrt_d = np.float32(np.sqrt(d))

    if q8:
        from zs_aac_tpu.models.gpt2 import _quantize_vec

        new_cache = []
    else:
        ck_all, cv_all = cache["k"], cache["v"]
        cdtype = ck_all.dtype
    for i, p in enumerate(params["layers"]):
        ll = _lora_layer(lora, i)
        a = p["attn"]
        h = _rms_norm(x, p["ln1"], cfg.rms_norm_eps)
        q, k, v = _qkv_matmul(a, cfg, h, ll, scale)
        q = _rope(q.reshape(B, 1, H, d).transpose(0, 2, 1, 3), positions,
                  cfg.rope_theta)
        k = _rope(k.reshape(B, 1, KV, d).transpose(0, 2, 1, 3), positions,
                  cfg.rope_theta)
        if q8:
            # folded per-layer leaves [B*KV, T, d] / [B*KV, T]: ONE batch
            # dim in the contractions, f32-accumulated dots (see
            # init_mistral_cache_q8 for the measured layout story)
            qk_, sk_ = _quantize_vec(k[:, :, 0].astype(jnp.float32))
            qv_, sv_ = _quantize_vec(v.reshape(B, KV, d).astype(jnp.float32))
            ck, cv, sk, sv = cache[i]
            ck = ck.at[:, index].set(qk_.reshape(bg, d))
            cv = cv.at[:, index].set(qv_.reshape(bg, d))
            sk = sk.at[:, index].set(sk_.reshape(bg))
            sv = sv.at[:, index].set(sv_.reshape(bg))
            new_cache.append((ck, cv, sk, sv))
            qg = q[:, :, 0].reshape(bg, rep, d)
            att = jax.lax.dot_general(
                qg, ck.astype(x.dtype), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)     # [BG, rep, T]
            att = att * (sk[:, None, :] / sqrt_d)
            att = jax.nn.softmax(att + bias[None, None], axis=-1)
            att = (att * sv[:, None, :]).astype(x.dtype)
            o = jax.lax.dot_general(
                att, cv.astype(x.dtype), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)     # [BG, rep, d]
            o = o.astype(x.dtype).reshape(B, 1, H * d)
        else:
            ck_all = ck_all.at[i, :, :, index].set(k[:, :, 0].astype(cdtype))
            cv_all = cv_all.at[i, :, :, index].set(
                v.reshape(B, KV, d).astype(cdtype))
            # head h -> (g=h//rep, r=h%rep)
            qg = q[:, :, 0].reshape(B, KV, rep, d)
            att = jnp.einsum("bgrd,bgtd->bgrt", qg, ck_all[i].astype(x.dtype))
            att = att.astype(jnp.float32) / sqrt_d + bias[None, None, None]
            att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
            o = jnp.einsum("bgrt,bgtd->bgrd", att, cv_all[i].astype(x.dtype))
            o = o.reshape(B, 1, H * d)
        x = x + _lora_matmul(o, a["wo"], ll.get("wo") if ll else None, scale)
        h = _rms_norm(x, p["ln2"], cfg.rms_norm_eps)
        x = x + _mlp(p["mlp"], h, ll, scale)
    x = _rms_norm(x, params["norm"], cfg.rms_norm_eps)
    head_lora = lora.get("lm_head") if lora else None
    logits = _lora_matmul(x, params["lm_head"], head_lora, scale)[:, 0]
    if q8:
        return logits, tuple(new_cache)
    return logits, {"k": ck_all, "v": cv_all}


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------


def init_mistral(rng: jax.Array, cfg: MistralConfig, dtype=jnp.bfloat16) -> dict:
    keys = jax.random.split(rng, 2 + cfg.n_layers)

    def nrm(key, shape, std=0.02):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    D, I = cfg.hidden_size, cfg.intermediate_size
    kvd = cfg.n_kv_heads * cfg.head_dim
    layers = []
    for i in range(cfg.n_layers):
        sub = jax.random.split(keys[2 + i], 7)
        layers.append(
            {
                "attn": {
                    "wq": nrm(sub[0], (D, D)),
                    "wk": nrm(sub[1], (D, kvd)),
                    "wv": nrm(sub[2], (D, kvd)),
                    "wo": nrm(sub[3], (D, D)),
                },
                "mlp": {
                    "gate": nrm(sub[4], (D, I)),
                    "up": nrm(sub[5], (D, I)),
                    "down": nrm(sub[6], (I, D)),
                },
                "ln1": jnp.ones((D,), dtype),
                "ln2": jnp.ones((D,), dtype),
            }
        )
    return {
        "embed": nrm(keys[0], (cfg.vocab_size, D)),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        "lm_head": nrm(keys[1], (D, cfg.vocab_size)),
    }


def convert_mistral(state_dict, cfg: MistralConfig, dtype=np.float32) -> dict:
    """HF ``MistralForCausalLM`` state_dict -> param pytree (weights
    transposed to [in, out])."""
    sd = to_numpy_state_dict(state_dict)
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    def t(name):
        return np.ascontiguousarray(sd[name].T.astype(dtype))

    layers = []
    for i in range(cfg.n_layers):
        p = f"layers.{i}"
        layers.append(
            {
                "attn": {
                    "wq": t(f"{p}.self_attn.q_proj.weight"),
                    "wk": t(f"{p}.self_attn.k_proj.weight"),
                    "wv": t(f"{p}.self_attn.v_proj.weight"),
                    "wo": t(f"{p}.self_attn.o_proj.weight"),
                },
                "mlp": {
                    "gate": t(f"{p}.mlp.gate_proj.weight"),
                    "up": t(f"{p}.mlp.up_proj.weight"),
                    "down": t(f"{p}.mlp.down_proj.weight"),
                },
                "ln1": sd[f"{p}.input_layernorm.weight"].astype(dtype),
                "ln2": sd[f"{p}.post_attention_layernorm.weight"].astype(dtype),
            }
        )
    return {
        "embed": sd["embed_tokens.weight"].astype(dtype),
        "layers": layers,
        "norm": sd["norm.weight"].astype(dtype),
        "lm_head": t("lm_head.weight"),
    }


def init_lora(rng: jax.Array, cfg: MistralConfig, r: int = 8, alpha: int = 16,
              dtype=jnp.float32) -> dict:
    """PEFT-style LoRA params for q/k/v/o/gate/up/down/lm_head
    (caption_model.py:230-232). a ~ N(0, 0.02), b = 0."""
    D, I = cfg.hidden_size, cfg.intermediate_size
    kvd = cfg.n_kv_heads * cfg.head_dim
    dims = {
        "wq": (D, D), "wk": (D, kvd), "wv": (D, kvd), "wo": (D, D),
        "gate": (D, I), "up": (D, I), "down": (I, D),
    }

    def pair(key, din, dout):
        return {
            "a": (jax.random.normal(key, (din, r)) * 0.02).astype(dtype),
            "b": jnp.zeros((r, dout), dtype),
        }

    keys = jax.random.split(rng, cfg.n_layers * len(dims) + 1)
    ki = iter(range(len(keys)))
    layers = []
    for _ in range(cfg.n_layers):
        layers.append({n: pair(keys[next(ki)], din, dout)
                       for n, (din, dout) in dims.items()})
    return {
        "layers": layers,
        "lm_head": pair(keys[next(ki)], D, cfg.vocab_size),
        # float leaves so the pytree stays grad-compatible; frozen by the
        # optimizer label fn.
        "r": jnp.asarray(float(r)),
        "alpha": jnp.asarray(float(alpha)),
    }


def lora_trainable_mask(lora: dict) -> dict:
    """True for tensors that receive gradients (a/b pairs), False for the
    scalar hyperparams."""
    return jax.tree.map(lambda _: True, lora) | {"r": False, "alpha": False}
