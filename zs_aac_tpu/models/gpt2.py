"""GPT-2 language model (layer L5 decoder), TPU-native and KV-cached.

Capability parity with the reference's HF ``GPT2LMHeadModel`` usage
(``/root/reference/models/caption_model.py:52``): prefix embeddings are fed
via ``inputs_embeds``, logits come back tied to the token embedding.

Design departures that are the point of the rebuild (SURVEY.md §8.5): the
reference's beam/greedy decode re-runs the full sequence every step with no
KV cache (``gpt2_prefix_eval.py:99-226``); here the model is a set of pure
functions over a parameter pytree with a **preallocated, fixed-shape KV
cache** so the whole decode loop lives inside one ``lax.while_loop`` on
device. Matching the reference's inference semantics, cached decode applies
only the causal mask (the reference passes no attention mask at decode
time); training forward supports an explicit padding mask.

Weight layout matches HF GPT-2 (``Conv1D`` stores ``[in, out]``), so
published checkpoints convert without transposes; see ``convert_gpt2``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from zs_aac_tpu.models.convert import to_numpy_state_dict

__all__ = [
    "GPT2Config",
    "convert_gpt2",
    "init_gpt2",
    "gpt2_embed",
    "gpt2_forward",
    "init_kv_cache",
    "gpt2_prefill",
    "gpt2_step",
    "gpt2_step_beam",
    "quantize_gpt2_int8",
    "init_kv_cache_q8p",
    "gpt2_prefill_q8p",
    "gpt2_step_q8p",
]


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5


def _gelu_new(x):
    # NOTE: the constant must be a weakly-typed Python float — a numpy
    # scalar is dtype-strong and silently upcasts bf16 activations to f32
    # for the rest of the block (caught by dtype audit, round 2).
    c = float(np.sqrt(2.0 / np.pi))
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x**3)))


def _ln(x, p, eps):
    # LN statistics in fp32 for bf16 stability; output in the input dtype.
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _quant_act(x):
    """Dynamic per-row symmetric int8 activation quantization.

    The abs-max reduces in ``x``'s own dtype and converts the [.., 1]
    result — bitwise-identical to reducing in f32 (abs, max and the
    bf16->f32 convert are all exact) — leaving ``x.astype(f32)`` a single
    consumer (the round/clip) so the convert always fuses into the int8
    quantize. (Note: the f32[B,1,C] copies in the greedy decode profile
    are the cache-append relayout of fresh K/V into the stacked cache's
    layout, NOT this convert — verified by HLO census before/after.)"""
    sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    sx = jnp.maximum(sx, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _int8_dot(x, w, w_scale, out_dtype, w_contract_dim=0):
    """W8A8: quantize the (tiny) activations, run a TRUE int8 x int8 MXU
    matmul accumulating in int32, rescale in the epilogue. The weight's HBM
    stream stays int8 end-to-end — a plain ``w.astype(bf16)`` dequant is NOT
    reliably fused by XLA and re-materializes bf16 weights each decode step
    (measured: zero speedup), whereas the int8 dot halves the stream and
    doubles the MXU rate. ``w_contract_dim`` picks the weight's contraction
    dim so transposed layouts (wte) need no relayout copy."""
    xq, sx = _quant_act(x)
    y = jax.lax.dot_general(
        xq, w, (((x.ndim - 1,), (w_contract_dim,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * sx * w_scale).astype(out_dtype)


def _mm(x, p):
    """x @ w + b for three linear layouts (selected by static key names):

    - float: {"w" [in,out], "b"}
    - w8   : {"w" int8, "scale" fp32 [out], "b"} — int8 weights dequantized
      into the activation dtype inside the matmul
    - w8a8 : {"w" int8, "scale_a8" fp32 [out], "b"} — activations quantized
      per-row to int8 and a true int8 MXU matmul (see ``_int8_dot``)
    """
    w = p["w"]
    if "scale_a8" in p:
        y = _int8_dot(x, w, p["scale_a8"], x.dtype)
    elif w.dtype == jnp.int8:
        y = (x @ w.astype(x.dtype)) * p["scale"].astype(x.dtype)
    else:
        y = x @ w
    return y + p["b"]


def _logits(x, params):
    """Final logits ``x @ wte.T`` — reads the int8 copy when present."""
    if "wte_q" in params:
        q = params["wte_q"]
        if "scale_a8" in q:
            return _int8_dot(x, q["w"], q["scale_a8"], x.dtype, w_contract_dim=1)
        return (x @ q["w"].T.astype(x.dtype)) * q["scale"].astype(x.dtype)
    return x @ params["wte"].T


def prepare_grouped_lm_head(params, G: int, S: int) -> dict:
    """Pad + reshape the lm_head weight (and its scale) to ``[G, S, C]`` /
    ``[G, S]`` ONCE, before the decode loop. XLA does NOT hoist the 39 MB
    weight pad out of a while body on its own — left inline it re-padded
    the int8 weight every decode step (116 us/step plus ~150 us of copies,
    round-3 profile). Returns {"w", "scale"|"scale_a8"} (quantized trees)
    or {"w"} (float), consumed by ``_logits_grouped``."""
    V = (params["wte_q"]["w"] if "wte_q" in params else params["wte"]).shape[0]
    n_pad = G * S - V
    assert n_pad >= 0, (G, S, V)
    pad_rows = ((0, n_pad), (0, 0))
    if "wte_q" in params:
        q = params["wte_q"]
        out = {"w": jnp.pad(q["w"], pad_rows).reshape(G, S, -1)}
        skey = "scale_a8" if "scale_a8" in q else "scale"
        out[skey] = jnp.pad(q[skey], (0, n_pad),
                            constant_values=1.0).reshape(G, S)
        return out
    return {"w": jnp.pad(params["wte"], pad_rows).reshape(G, S, -1)}


def _logits_grouped(x, params, G: int, S: int):
    """lm_head emitting GROUP-SHAPED logits ``[N, G, S]`` (``G*S >= V``;
    pad lanes emit logit 0 — consumers mask them) in ONE dot against the
    vocab weight reshaped ``[G, S, C]``.

    Why the shape matters: the beam's two-stage top-k
    (``decoding/beam.py::_beam_select``) reads the per-step logits twice —
    once as ``[B, K, G, S]`` lane groups and once row-flat. When the
    lm_head emits flat ``[N, V]`` logits, XLA materializes a separate
    RETILED copy of the 39 MB fp32 buffer for each view (121 + 51 us per
    decode step at B*K=192, round-3 profile — pure relayout traffic).
    Emitting the grouped shape natively makes every consumer view a free
    reshape of the SAME tiled buffer, and the bf16 output halves the
    buffer the select's reduction passes stream (the w8a8 path already
    rounded logits through bf16 — ``_int8_dot``'s out_dtype — so values
    are bit-identical to the flat path). Callers inside a decode loop
    must pass a pre-built ``params["wte_g"] = prepare_grouped_lm_head(...)``
    (see that docstring for why)."""
    g = params.get("wte_g") or prepare_grouped_lm_head(params, G, S)
    w = g["w"]
    if "scale_a8" in g:
        xq, sx = _quant_act(x)
        y = jax.lax.dot_general(
            xq, w, (((x.ndim - 1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * sx[..., None] * g["scale_a8"]
                ).astype(x.dtype)
    y = jax.lax.dot_general(x, w.astype(x.dtype),
                            (((x.ndim - 1,), (2,)), ((), ())))
    if "scale" in g:
        y = y * g["scale"].astype(x.dtype)
    return y


def _split_heads(x, n_head):
    B, L, D = x.shape
    return x.reshape(B, L, n_head, D // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, L, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * d)


def _attn_block(p, cfg, x, *, bias, kv=None):
    """Self-attention. ``kv``: optional override (k, v) each [B,H,T,d]."""
    qkv = _mm(x, p["c_attn"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _split_heads(q, cfg.n_head)
    if kv is None:
        k = _split_heads(k, cfg.n_head)
        v = _split_heads(v, cfg.n_head)
        new_kv = (k, v)
    else:
        new_kv = (_split_heads(k, cfg.n_head), _split_heads(v, cfg.n_head))
        k, v = kv
    d = cfg.n_embd // cfg.n_head
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d).astype(x.dtype)
    att = jax.nn.softmax((att + bias).astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    out = _mm(_merge_heads(out), p["c_proj"])
    return out, new_kv


def _block(p, cfg, x, *, bias, kv=None):
    a, new_kv = _attn_block(p["attn"], cfg, _ln(x, p["ln_1"], cfg.layer_norm_epsilon),
                            bias=bias, kv=kv)
    x = x + a
    h = _ln(x, p["ln_2"], cfg.layer_norm_epsilon)
    h = _gelu_new(_mm(h, p["mlp"]["c_fc"]))
    h = _mm(h, p["mlp"]["c_proj"])
    return x + h, new_kv


def gpt2_embed(params, tokens):
    """Token ids -> wte embeddings."""
    return params["wte"][tokens]


def gpt2_forward(
    params,
    cfg: GPT2Config,
    inputs_embeds: jax.Array,                 # [B, L, D]
    attention_mask: Optional[jax.Array] = None,  # [B, L] 1=keep
    position_offset: int = 0,
):
    """Full-sequence forward -> logits [B, L, vocab]."""
    B, L, D = inputs_embeds.shape
    pos = jnp.arange(L) + position_offset
    x = inputs_embeds + params["wpe"][pos][None]

    causal = jnp.tril(jnp.ones((L, L), bool))
    bias = jnp.where(causal, 0.0, -1e9)[None, None]
    if attention_mask is not None:
        bias = bias + jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
    bias = bias.astype(x.dtype)

    for i in range(cfg.n_layer):
        x, _ = _block(params["h"][i], cfg, x, bias=bias)
    x = _ln(x, params["ln_f"], cfg.layer_norm_epsilon)
    return _logits(x, params)


# ---------------------------------------------------------------------------
# KV-cached decoding
# ---------------------------------------------------------------------------


def init_kv_cache(cfg: GPT2Config, batch: int, max_len: int, dtype=jnp.float32):
    """Preallocated cache: k/v stacked over layers, [n_layer, B, H, T, d]."""
    d = cfg.n_embd // cfg.n_head
    shape = (cfg.n_layer, batch, cfg.n_head, max_len, d)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def gpt2_prefill(params, cfg: GPT2Config, inputs_embeds, cache, return_hidden=False):
    """Run the prompt through the model, filling cache[:, :, :, :L].

    Returns (logits [B, L, vocab], cache) — plus the post-ln_f hidden states
    [B, L, D] when ``return_hidden`` (MAGIC's degeneration penalty needs
    them). Decode-time semantics: causal mask only (reference passes no
    attention mask at inference).
    """
    B, L, D = inputs_embeds.shape
    x = inputs_embeds + params["wpe"][jnp.arange(L)][None]
    causal = jnp.tril(jnp.ones((L, L), bool))
    bias = jnp.where(causal, 0.0, -1e9)[None, None].astype(x.dtype)

    ks, vs = [], []
    for i in range(cfg.n_layer):
        x, (k, v) = _block(params["h"][i], cfg, x, bias=bias)
        ks.append(k)
        vs.append(v)
    x = _ln(x, params["ln_f"], cfg.layer_norm_epsilon)
    logits = _logits(x, params)

    T = cache["k"].shape[3]
    pad = [(0, 0), (0, 0), (0, T - L), (0, 0)]
    cache = {
        "k": jnp.stack([jnp.pad(k, pad) for k in ks]).astype(cache["k"].dtype),
        "v": jnp.stack([jnp.pad(v, pad) for v in vs]).astype(cache["v"].dtype),
    }
    if return_hidden:
        return logits, cache, x
    return logits, cache


def gpt2_step(params, cfg: GPT2Config, x_embed, cache, index, return_hidden=False):
    """One cached decode step.

    ``x_embed``: [B, D] embedding of the token at position ``index`` (traced
    scalar). Returns (logits [B, vocab], updated cache), plus the post-ln_f
    hidden state [B, D] when ``return_hidden``.
    """
    B, D = x_embed.shape
    x = (x_embed + params["wpe"][index])[:, None]  # [B, 1, D]

    T = cache["k"].shape[3]
    valid = (jnp.arange(T) <= index)[None, None, None]  # [1,1,1,T]
    bias = jnp.where(valid, 0.0, -1e9).astype(x.dtype)

    # Single stacked cache buffers updated in place per layer — inside the
    # decode while_loop XLA aliases these scatters, so the O(n_layer*B*H*T*d)
    # cache is never copied per step (the old list+stack version was).
    ck_all, cv_all = cache["k"], cache["v"]
    cdtype = ck_all.dtype
    for i in range(cfg.n_layer):
        blk = params["h"][i]
        h = _ln(x, blk["ln_1"], cfg.layer_norm_epsilon)
        qkv = _mm(h, blk["attn"]["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, cfg.n_head)  # [B, H, 1, d]
        k = _split_heads(k, cfg.n_head)
        v = _split_heads(v, cfg.n_head)
        ck_all = ck_all.at[i, :, :, index].set(k[:, :, 0].astype(cdtype))
        cv_all = cv_all.at[i, :, :, index].set(v[:, :, 0].astype(cdtype))
        d = cfg.n_embd // cfg.n_head
        att = jnp.einsum("bhqd,bhkd->bhqk", q, ck_all[i].astype(x.dtype))
        att = att / np.sqrt(d).astype(x.dtype)
        att = jax.nn.softmax((att + bias).astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, cv_all[i].astype(x.dtype))
        o = _mm(_merge_heads(o), blk["attn"]["c_proj"])
        x = x + o
        h = _ln(x, blk["ln_2"], cfg.layer_norm_epsilon)
        h = _gelu_new(_mm(h, blk["mlp"]["c_fc"]))
        x = x + _mm(h, blk["mlp"]["c_proj"])

    x = _ln(x, params["ln_f"], cfg.layer_norm_epsilon)
    logits = _logits(x, params)[:, 0].astype(jnp.float32)
    cache = {"k": ck_all, "v": cv_all}
    if return_hidden:
        return logits, cache, x[:, 0]
    return logits, cache


def init_beam_cache_q8(cfg: GPT2Config, prefill_cache_q8, beam_size: int):
    """Expand an int8 prefill cache into per-layer beam leaves:
    tuple of (k int8 [B,K,T,C], v int8, k_scale fp32 [B,H,K,T], v_scale).

    K/V use the head-folded channel layout (see ``init_beam_cache``); the
    dequant scales keep their per-(b,h,r,t) granularity — quantized values
    are bit-identical to the round-2 head-split layout."""
    ks, vs = prefill_cache_q8["k"], prefill_cache_q8["v"]
    sk, sv = prefill_cache_q8["k_scale"], prefill_cache_q8["v_scale"]
    B, H, T, d = ks[0].shape
    K = beam_size

    def fold(x):  # [B, H, T, d] -> [B, K, T, H*d]
        flat = x.transpose(0, 2, 1, 3).reshape(B, T, H * d)
        return jnp.broadcast_to(flat[:, None], (B, K, T, H * d))

    def expand(x):  # [B, H, T] -> [B, H, K, T]
        return jnp.broadcast_to(x[:, :, None], (B, H, K, T))

    return tuple(
        (fold(ks[i]), fold(vs[i]), expand(sk[i]), expand(sv[i]))
        for i in range(ks.shape[0])
    )


def _beam_sel_bias(anc, K: int, T: int, index, dtype=jnp.float32):
    """Ancestry as an additive attention bias over the (row, time) axes:
    0 where physical row ``r`` holds logical beam ``j``'s K/V at time ``t``
    (``anc[b, j, t] == r`` and ``t <= index``), else -1e9. Built once per
    decode step and shared by every layer, COMPACT: [B, 1, K, K, T] fp32,
    broadcast over heads inside each layer's softmax fusion. (A per-step
    pre-tile over heads reads H x the bytes from every layer's fusion —
    ~190 MB/step at B=256, measured regression.) Consumers split the
    score's M=H*K axis with a free major-dim reshape; only minor-dim
    (K, T) merges like the old [B,H,K,K*T] flatten re-tile and forced a
    materialized copy of score/prob tensors per layer (profiled)."""
    sel = anc[:, :, None, :] == jnp.arange(K, dtype=anc.dtype)[None, None, :, None]
    valid = (jnp.arange(T) <= index)[None, None, None]
    bias = jnp.where(sel & valid, 0.0, -1e9).astype(dtype)  # [B,Kj,Kr,T]
    return bias[:, None]


def _beam_head_masks(H: int, K: int, C: int, dtype):
    """Masked-head helpers (see ``gpt2_step_beam``): ``mask_mc [H*K, C]`` is
    1 where channel ``c`` belongs to the head owning query row ``m = h*K+j``,
    and ``mask_hc [H, C]`` selects head ``h``'s channel block."""
    d = C // H
    mask_hc = (jnp.arange(C)[None, :] // d
               == jnp.arange(H)[:, None]).astype(dtype)        # [H, C]
    mask_mc = jnp.repeat(mask_hc, K, axis=0)                    # [H*K, C]
    return mask_mc, mask_hc


def gpt2_step_beam_q8(params, cfg: GPT2Config, x_embed, cache, anc, index,
                      vocab_group=None, softmax_dtype=jnp.float32):
    """``gpt2_step_beam`` over the int8 KV cache (+ per-vector scales):
    halves the dominant HBM stream of batched beam decode. Dequantization is
    folded into the attention contractions; cache layout/ancestry semantics
    are identical to the bf16 beam step (head-folded [B,K,T,C] K/V with
    per-(b,h,r,t) scales [B,H,K,T] applied to scores/probs post-dot)."""
    BK, D = x_embed.shape
    B, K = anc.shape[0], anc.shape[1]
    T = cache[0][0].shape[2]
    C = cfg.n_embd
    H = cfg.n_head
    d = C // H
    M = H * K
    x = (x_embed + params["wpe"][index])[:, None]

    anc = anc.at[:, :, index].set(jnp.arange(K, dtype=anc.dtype)[None])
    # [B, 1, K, K, T], per step; dtype follows the (static) softmax mode
    bias = _beam_sel_bias(anc, K, T, index, dtype=softmax_dtype)
    mask_mc, mask_hc = _beam_head_masks(H, K, C, x.dtype)

    new_cache = []
    for i in range(cfg.n_layer):
        blk = params["h"][i]
        ck, cv, sk, sv = cache[i]
        h = _ln(x, blk["ln_1"], cfg.layer_norm_epsilon)
        qkv = _mm(h, blk["attn"]["c_attn"])
        q, k, v = jnp.split(qkv[:, 0], 3, axis=-1)    # [B*K, C], (h, d) order
        kq_, ks_ = _quantize_vec(k.astype(jnp.float32).reshape(B, K, H, d))
        vq_, vs_ = _quantize_vec(v.astype(jnp.float32).reshape(B, K, H, d))
        ck = ck.at[:, :, index].set(kq_.reshape(B, K, C))
        cv = cv.at[:, :, index].set(vq_.reshape(B, K, C))
        sk = sk.at[:, :, :, index].set(ks_.transpose(0, 2, 1))
        sv = sv.at[:, :, :, index].set(vs_.transpose(0, 2, 1))
        new_cache.append((ck, cv, sk, sv))

        # masked-head folded attention (see gpt2_step_beam); the int8
        # dequant converts fuse into the two full-C dots and the per-head
        # scales fold into scores/probs exactly as in the head-split layout.
        # The cache is read in its STORED [B, K, T, C] shape — (r, t) are
        # free/contracting dims of the dot_generals, never reshaped (a
        # [B, K*T, C] reshape of the DUS-updated buffer defeats XLA's
        # in-place aliasing: full cache copy per layer, measured).
        q_all = jnp.tile(q.reshape(B, K, C), (1, H, 1)) * mask_mc[None]
        s = jax.lax.dot_general(
            q_all, ck.astype(x.dtype),
            (((2,), (3,)), ((0,), (0,))),
        )                                              # [B, M, K, T]
        # Attention glue between the two dots: the M=H*K axis splits to
        # (H, K) with a FREE major-dim reshape (scales/bias broadcast over
        # it compactly) and the softmax reduces the two trailing (row,
        # time) axes directly — the old [B,H,K,K*T] flatten merged the
        # tile-padded minor dims and materialized a retile copy of the
        # score AND prob tensors every layer (profiled ~16 MB/step, B=64).
        s = s.reshape(B, H, K, K, T) * sk[:, :, None].astype(x.dtype) \
            * float(1.0 / np.sqrt(d))
        if softmax_dtype == jnp.float32:
            sf = s.astype(jnp.float32) + bias
            att = jnp.exp(sf - jnp.max(sf, axis=(3, 4), keepdims=True))
            att = (att / jnp.sum(att, axis=(3, 4), keepdims=True)
                   ).astype(x.dtype)
        else:
            # opt-in bf16 softmax (see gpt2_step_beam) — f32-accumulated
            # denominator, everything else in the compute dtype
            sf = s.astype(softmax_dtype) + bias
            e = jnp.exp(sf - jnp.max(sf, axis=(3, 4), keepdims=True))
            denom = jnp.sum(e.astype(jnp.float32), axis=(3, 4),
                            keepdims=True)
            att = e.astype(x.dtype) * (1.0 / denom).astype(x.dtype)
        att = att * sv[:, :, None].astype(x.dtype)
        o_all = jax.lax.dot_general(
            att.reshape(B, M, K, T), cv.astype(x.dtype),
            (((2, 3), (1, 2)), ((0,), (0,))),
        )                                              # [B, M, C]
        o = jnp.sum(o_all.reshape(B, H, K, C) * mask_hc[None, :, None], axis=1)
        o = o.reshape(BK, 1, C)
        o = _mm(o, blk["attn"]["c_proj"])
        x = x + o
        h = _ln(x, blk["ln_2"], cfg.layer_norm_epsilon)
        h = _gelu_new(_mm(h, blk["mlp"]["c_fc"]))
        x = x + _mm(h, blk["mlp"]["c_proj"])

    x = _ln(x, params["ln_f"], cfg.layer_norm_epsilon)
    if vocab_group is not None:
        logits = _logits_grouped(x[:, 0], params, *vocab_group)
    else:
        logits = _logits(x, params)[:, 0].astype(jnp.float32)
    return logits, tuple(new_cache), anc


def gpt2_probe_step(params, cfg: GPT2Config, x_embed, cache, index):
    """Probe ``W`` candidate tokens per cache row WITHOUT copying the cache.

    MAGIC expands the top-k candidates one step each
    (``/root/reference/gpt2_prefix_eval.py:396-534``); a naive cached port
    broadcasts the whole KV cache W times per step and then selects one row
    back out — two O(W x cache) copies per emitted token. Here all W
    candidates of a row share that row's cache read-only: attention runs the
    W queries against the row's K/V at positions < ``index`` plus each
    candidate's OWN freshly computed K/V at ``index`` (the causal
    self-attention term), and the per-candidate K/V is returned so the
    caller can scatter just the selected candidate into the cache
    (``gpt2_commit_probe``).

    ``x_embed``: [B, W, D] candidate embeddings. ``cache`` leaves:
    [n_layer, B, H, T, d]. Returns (logits [B, W, V] fp32,
    (k_new, v_new) each [n_layer, B, W, H, d], hidden [B, W, D]).
    """
    B, W, D = x_embed.shape
    H = cfg.n_head
    d = cfg.n_embd // H
    T = cache["k"].shape[3]
    x = (x_embed + params["wpe"][index]).reshape(B * W, 1, D)

    # cache positions strictly before the probe position
    valid = (jnp.arange(T) < index)[None, None, None, :]  # [1,1,1,T]
    bias = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)

    ck_all, cv_all = cache["k"], cache["v"]
    ks_new, vs_new = [], []
    for i in range(cfg.n_layer):
        blk = params["h"][i]
        h = _ln(x, blk["ln_1"], cfg.layer_norm_epsilon)
        qkv = _mm(h, blk["attn"]["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, W, H, d).transpose(0, 2, 1, 3)   # [B, H, W, d]
        k = k.reshape(B, W, H, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, W, H, d).transpose(0, 2, 1, 3)
        ks_new.append(k)
        vs_new.append(v)
        kc = ck_all[i].astype(x.dtype)                    # [B, H, T, d]
        vc = cv_all[i].astype(x.dtype)
        s_hist = jnp.einsum("bhwd,bhtd->bhwt", q, kc)     # shared history
        s_own = jnp.einsum("bhwd,bhwd->bhw", q, k)        # own token at index
        s = jnp.concatenate([s_hist + bias, s_own[..., None]], axis=-1)
        att = jax.nn.softmax((s / np.sqrt(d)).astype(jnp.float32), axis=-1)
        att = att.astype(x.dtype)
        o = jnp.einsum("bhwt,bhtd->bhwd", att[..., :T], vc)
        o = o + att[..., T:] * v
        o = o.transpose(0, 2, 1, 3).reshape(B * W, 1, cfg.n_embd)
        o = _mm(o, blk["attn"]["c_proj"])
        x = x + o
        h = _ln(x, blk["ln_2"], cfg.layer_norm_epsilon)
        h = _gelu_new(_mm(h, blk["mlp"]["c_fc"]))
        x = x + _mm(h, blk["mlp"]["c_proj"])

    x = _ln(x, params["ln_f"], cfg.layer_norm_epsilon)
    logits = _logits(x, params)[:, 0].astype(jnp.float32).reshape(B, W, -1)
    k_new = jnp.stack(ks_new).transpose(0, 1, 3, 2, 4)    # [L, B, W, H, d]
    v_new = jnp.stack(vs_new).transpose(0, 1, 3, 2, 4)
    return logits, (k_new, v_new), x.reshape(B, W, D)


def gpt2_probe_step_q8(params, cfg: GPT2Config, x_embed, cache, index):
    """``gpt2_probe_step`` over the int8 KV cache (+ per-vector scales).
    The probe's own-token K/V stays full precision (it is fresh in VMEM);
    only the shared history streams from HBM as int8."""
    B, W, D = x_embed.shape
    H = cfg.n_head
    d = cfg.n_embd // H
    T = cache["k"].shape[3]
    x = (x_embed + params["wpe"][index]).reshape(B * W, 1, D)

    valid = (jnp.arange(T) < index)[None, None, None, :]
    bias = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)

    ck_all, cv_all = cache["k"], cache["v"]
    sk_all, sv_all = cache["k_scale"], cache["v_scale"]
    ks_new, vs_new = [], []
    for i in range(cfg.n_layer):
        blk = params["h"][i]
        h = _ln(x, blk["ln_1"], cfg.layer_norm_epsilon)
        qkv = _mm(h, blk["attn"]["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, W, H, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, W, H, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, W, H, d).transpose(0, 2, 1, 3)
        ks_new.append(k)
        vs_new.append(v)
        kc = ck_all[i].astype(x.dtype)                # [B, H, T, d] int8->bf16
        vc = cv_all[i].astype(x.dtype)
        s_hist = jnp.einsum("bhwd,bhtd->bhwt", q, kc)
        s_hist = s_hist * sk_all[i][:, :, None].astype(x.dtype)
        s_own = jnp.einsum("bhwd,bhwd->bhw", q, k)
        s = jnp.concatenate([s_hist + bias, s_own[..., None]], axis=-1)
        att = jax.nn.softmax((s / np.sqrt(d)).astype(jnp.float32), axis=-1)
        att = att.astype(x.dtype)
        p_hist = att[..., :T] * sv_all[i][:, :, None].astype(x.dtype)
        o = jnp.einsum("bhwt,bhtd->bhwd", p_hist, vc)
        o = o + att[..., T:] * v
        o = o.transpose(0, 2, 1, 3).reshape(B * W, 1, cfg.n_embd)
        o = _mm(o, blk["attn"]["c_proj"])
        x = x + o
        h = _ln(x, blk["ln_2"], cfg.layer_norm_epsilon)
        h = _gelu_new(_mm(h, blk["mlp"]["c_fc"]))
        x = x + _mm(h, blk["mlp"]["c_proj"])

    x = _ln(x, params["ln_f"], cfg.layer_norm_epsilon)
    logits = _logits(x, params)[:, 0].astype(jnp.float32).reshape(B, W, -1)
    k_new = jnp.stack(ks_new).transpose(0, 1, 3, 2, 4)
    v_new = jnp.stack(vs_new).transpose(0, 1, 3, 2, 4)
    return logits, (k_new, v_new), x.reshape(B, W, D)


def gpt2_commit_probe_q8(cache, new_kv, sel, index):
    """Quantize each row's selected candidate K/V and scatter values +
    scales into the int8 cache at ``index``."""
    k_new, v_new = new_kv
    B = sel.shape[0]
    rows = jnp.arange(B)
    ksel = k_new[:, rows, sel].astype(jnp.float32)  # [L, B, H, d]
    vsel = v_new[:, rows, sel].astype(jnp.float32)
    kq, ks = _quantize_vec(ksel)
    vq, vs = _quantize_vec(vsel)
    return {
        "k": cache["k"].at[:, :, :, index].set(kq),
        "v": cache["v"].at[:, :, :, index].set(vq),
        "k_scale": cache["k_scale"].at[:, :, :, index].set(ks),
        "v_scale": cache["v_scale"].at[:, :, :, index].set(vs),
    }


def gpt2_commit_probe(cache, new_kv, sel, index):
    """Scatter each row's SELECTED candidate K/V into the cache at
    ``index``. ``sel``: [B] candidate index per row; ``new_kv``:
    (k_new, v_new) from ``gpt2_probe_step``. Returns the updated cache."""
    k_new, v_new = new_kv
    B = sel.shape[0]
    rows = jnp.arange(B)
    ksel = k_new[:, rows, sel]  # [L, B, H, d]
    vsel = v_new[:, rows, sel]
    cdtype = cache["k"].dtype
    return {
        "k": cache["k"].at[:, :, :, index].set(ksel.astype(cdtype)),
        "v": cache["v"].at[:, :, :, index].set(vsel.astype(cdtype)),
    }


def init_beam_cache(cfg: GPT2Config, prefill_cache, beam_size: int):
    """Expand a prefill cache [n_layer, B, H, T, d] into the beam layout:
    a TUPLE of per-layer (k, v) pairs, each **[B, K, T, C]** with the head
    axis folded into the channel dim (C = H*d, (h, d)-ordered — the raw
    qkv-slice channel order, so appends need no head split at all).

    Three deliberate layout choices, all measured on the chip:
    - Each layer is its own carry leaf. A layer-stacked
      ``[n_layer, ...]`` buffer made XLA lower every per-layer
      ``.at[i, ..., index].set`` as a slice + full-slice-rewrite fusion
      (24 x 11 MB per decode step — ~0.5 GB/step of pure copy, the round-1
      beam bottleneck); per-layer leaves update in place.
    - The minor dim is the FULL channel width (768 = 6 x 128 lanes), not the
      per-head d=64: the round-2 [B,H,K,T,d] layout made every attention
      dot read the cache through half-empty 128-lane tiles (~2x HBM
      amplification; the score/value fusions profiled at ~150 GB/s
      effective). ``gpt2_step_beam`` reads this layout with masked-head
      full-C contractions instead of per-head d-contractions.
    - The (K, T) axes sit directly under B so ``[B, K*T, C]`` — the shape
      both attention dots consume — is a free reshape, and the per-step
      append writes B*K contiguous 768-wide rows.
    """
    ks, vs = prefill_cache["k"], prefill_cache["v"]
    B, H, T, d = ks[0].shape
    K = beam_size

    def fold(x):  # [B, H, T, d] -> [B, K, T, H*d]
        flat = x.transpose(0, 2, 1, 3).reshape(B, T, H * d)
        return jnp.broadcast_to(flat[:, None], (B, K, T, H * d))

    return tuple((fold(ks[i]), fold(vs[i])) for i in range(ks.shape[0]))


def gpt2_step_beam(params, cfg: GPT2Config, x_embed, cache, anc, index,
                   return_hidden=False, vocab_group=None,
                   softmax_dtype=jnp.float32):
    """One cached decode step for ``B`` clips x ``K`` beams with an
    **ancestry-indirected** cache read (no per-step cache reorder).

    The reference's beam search re-runs the full sequence per step
    (``/root/reference/gpt2_prefix_eval.py:99-158``); a naive cached port
    reorders the whole KV cache every step (``cache[:, rows]``), which costs
    a full cache copy per token. Here each physical row only ever *appends*
    its own K/V at ``index`` (in-place, XLA-aliased inside the decode loop),
    and beam reordering is tracked in a tiny ``anc [B, K, T]`` int32 table:
    logical beam ``j``'s key at position ``t`` lives in physical row
    ``anc[b, j, t]``. Attention computes scores against *all* K physical
    rows ((K x) extra FLOPs on a K<=5 axis — noise next to the matmuls) and
    resolves the indirection with a one-hot contraction, instead of O(cache)
    HBM traffic per step.

    ``x_embed``: [B*K, D] (beam-major rows). ``cache``: per-layer tuple of
    (k, v), each [B, K, T, C] head-folded (see ``init_beam_cache``). Returns
    (logits [B*K, V] fp32, cache, anc) with ``anc[:, :, index]`` set to the
    own-row identity, plus post-ln_f hidden [B*K, D] when ``return_hidden``.

    Formulation (round 3): the indirection is an **additive bias over the
    flattened (row, time) axis** — attention runs as a standard batched
    (q=K) x (kv=K*T) softmax-attention where position (r, t) is masked to
    -1e9 unless ``anc[b, j, t] == r``. The round-2 one-hot contraction
    (``bhjrt``-shaped score/probability intermediates re-materialized per
    layer) was layout-bound and held batched beam at ~1/3 of its roofline;
    here the ancestry bias is built ONCE per step ([B, K, K*T] fp32,
    shared by all layers and broadcast over heads) and each layer runs two
    clean batched matmuls with a masked softmax between — the exact shape
    XLA's attention fusions are built for. Exactness: adding -1e9 before
    the max-subtracted softmax zeroes non-selected lanes exactly, so the
    selected-lane probabilities equal the round-2 formulation's.

    Round-3 refinement: the per-head d=64 contractions read the cache
    through half-empty 128-lane int8/bf16 tiles (~2x HBM amplification,
    profiled ~150 GB/s effective). The cache therefore stores K/V with the
    head axis folded into the channel dim ([B, K, T, C], ``init_beam_cache``)
    and attention uses the **masked-head big-matmul** trick proven in
    ``ops/window_attn.py``: query row ``m = h*K + j`` is beam j's q with all
    but head h's channels zeroed, so scores for ALL heads come from ONE
    full-C-contraction batched dot against the [B, K*T, C] cache view (and
    values from one probs x V dot, head blocks re-masked and summed after).
    H x the dot FLOPs — noise for a decode step — in exchange for
    full-lane cache streaming; per-channel sums are unchanged (masked
    channels contribute exact zeros), so emitted tokens are identical.
    """
    BK, D = x_embed.shape
    B, K = anc.shape[0], anc.shape[1]
    T = cache[0][0].shape[2]
    C = cfg.n_embd
    H = cfg.n_head
    d = C // H
    M = H * K
    x = (x_embed + params["wpe"][index])[:, None]  # [B*K, 1, D]

    anc = anc.at[:, :, index].set(jnp.arange(K, dtype=anc.dtype)[None])
    # [B, 1, K, K, T], per step; built directly in the softmax dtype (the
    # opt-in bf16 mode keeps the whole per-layer softmax fusion half-width)
    bias = _beam_sel_bias(anc, K, T, index, dtype=softmax_dtype)
    mask_mc, mask_hc = _beam_head_masks(H, K, C, x.dtype)

    new_cache = []
    for i in range(cfg.n_layer):
        blk = params["h"][i]
        ck, cv = cache[i]
        h = _ln(x, blk["ln_1"], cfg.layer_norm_epsilon)
        qkv = _mm(h, blk["attn"]["c_attn"])
        q, k, v = jnp.split(qkv[:, 0], 3, axis=-1)    # [B*K, C], (h, d) order
        ck = ck.at[:, :, index].set(k.reshape(B, K, C).astype(ck.dtype))
        cv = cv.at[:, :, index].set(v.reshape(B, K, C).astype(cv.dtype))
        new_cache.append((ck, cv))
        # weak Python float scale: a numpy scalar is dtype-strong and would
        # upcast bf16 (round-2 gelu lesson). The cache is read in its
        # STORED [B, K, T, C] shape — (r, t) are free/contracting dims of
        # the dot_generals, never reshaped (a [B, K*T, C] reshape of the
        # DUS-updated buffer defeats XLA's in-place aliasing: full cache
        # copy per layer, measured).
        q_all = (jnp.tile(q.reshape(B, K, C), (1, H, 1))
                 * float(1.0 / np.sqrt(d))) * mask_mc[None]
        s = jax.lax.dot_general(
            q_all, ck.astype(x.dtype),
            (((2,), (3,)), ((0,), (0,))),
        )                                              # [B, M, K, T]
        # two-axis softmax over (row, time) with a free major-dim head
        # split — see gpt2_step_beam_q8: a [B,H,K,K*T] flatten merges
        # tile-padded minor dims and forces a retile copy of the score and
        # prob tensors every layer
        if softmax_dtype == jnp.float32:
            sf = s.reshape(B, H, K, K, T).astype(jnp.float32) + bias
            att = jnp.exp(sf - jnp.max(sf, axis=(3, 4), keepdims=True))
            att = (att / jnp.sum(att, axis=(3, 4), keepdims=True)
                   ).astype(x.dtype)
        else:
            # opt-in approx mode (round-4 VERDICT #7): score + exp stay in
            # the compute dtype (the per-layer f32 sf/exp materializations
            # were the last ~1.8x residue in the B=64 beam profile); only
            # the denominator accumulates in f32 (the convert is single-
            # consumer, so it folds into the reduce fusion). max is exact
            # in any dtype; exp(-1e9 + m) underflows to exact 0 in bf16
            # just as in f32. Agreement slack vs the exact path is
            # quantified on learned weights in tests/test_quantized_decode
            # and BASELINE.md; NOT the default anywhere.
            sf = s.reshape(B, H, K, K, T).astype(softmax_dtype) + bias
            e = jnp.exp(sf - jnp.max(sf, axis=(3, 4), keepdims=True))
            denom = jnp.sum(e.astype(jnp.float32), axis=(3, 4),
                            keepdims=True)
            att = (e.astype(x.dtype)
                   * (1.0 / denom).astype(x.dtype))
        o_all = jax.lax.dot_general(
            att.reshape(B, M, K, T), cv.astype(x.dtype),
            (((2, 3), (1, 2)), ((0,), (0,))),
        )                                              # [B, M, C]
        o = jnp.sum(o_all.reshape(B, H, K, C) * mask_hc[None, :, None], axis=1)
        o = o.reshape(BK, 1, C)
        o = _mm(o, blk["attn"]["c_proj"])
        x = x + o
        h = _ln(x, blk["ln_2"], cfg.layer_norm_epsilon)
        h = _gelu_new(_mm(h, blk["mlp"]["c_fc"]))
        x = x + _mm(h, blk["mlp"]["c_proj"])

    x = _ln(x, params["ln_f"], cfg.layer_norm_epsilon)
    if vocab_group is not None:
        logits = _logits_grouped(x[:, 0], params, *vocab_group)
    else:
        logits = _logits(x, params)[:, 0].astype(jnp.float32)
    if return_hidden:
        return logits, tuple(new_cache), anc, x[:, 0]
    return logits, tuple(new_cache), anc


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------


def quantize_gpt2_int8(params: dict, mode: str = "w8") -> dict:
    """Per-output-channel symmetric int8 weight quantization for serving.

    The TPU-native answer to the reference's NF4 capability
    (``/root/reference/models/caption_model.py:223-232``, bitsandbytes
    CUDA-only): weights stream from HBM as int8 (half of bf16, quarter of
    fp32). All decode entry points (``greedy_decode``, ``beam_search*``, the
    q8-cache variants, MAGIC) accept the quantized tree directly —
    ``_mm``/``_logits`` dispatch on static key names.

    ``mode``:
    - ``"w8"``  — int8 weights dequantized into the activation dtype inside
      each matmul.
    - ``"w8a8"`` — additionally quantize activations per-row at runtime and
      run true int8 MXU matmuls (int32 accumulation); halves the weight HBM
      stream end-to-end and doubles MXU rate. Slightly lossier; agreement is
      validated on learned weights in tests/test_quantized_decode.py.

    ``wte`` is kept in float for embedding lookups (tiny HBM reads); an int8
    per-row copy ``wte_q`` serves the big per-step logits matmul.
    """
    assert mode in ("w8", "w8a8"), mode
    skey = "scale" if mode == "w8" else "scale_a8"

    def qlin(p):
        w = jnp.asarray(p["w"], jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return {"w": q, skey: scale.astype(jnp.float32), "b": p["b"]}

    h = [
        {
            "ln_1": blk["ln_1"],
            "ln_2": blk["ln_2"],
            "attn": {"c_attn": qlin(blk["attn"]["c_attn"]),
                     "c_proj": qlin(blk["attn"]["c_proj"])},
            "mlp": {"c_fc": qlin(blk["mlp"]["c_fc"]),
                    "c_proj": qlin(blk["mlp"]["c_proj"])},
        }
        for blk in params["h"]
    ]
    wte = jnp.asarray(params["wte"], jnp.float32)
    wscale = jnp.maximum(jnp.max(jnp.abs(wte), axis=1), 1e-8) / 127.0
    wte_q = jnp.clip(jnp.round(wte / wscale[:, None]), -127, 127).astype(jnp.int8)
    return {
        "wte": params["wte"],
        "wte_q": {"w": wte_q, skey: wscale.astype(jnp.float32)},
        "wpe": params["wpe"],
        "h": h,
        "ln_f": params["ln_f"],
    }


def convert_gpt2(state_dict, cfg: GPT2Config) -> dict:
    """HF ``GPT2LMHeadModel``/``GPT2Model`` state_dict -> param pytree."""
    sd = to_numpy_state_dict(state_dict)
    sd = {k.removeprefix("transformer."): v for k, v in sd.items()}

    def cv(prefix):  # HF Conv1D: weight already [in, out]
        return {"w": sd[prefix + ".weight"], "b": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    h = []
    for i in range(cfg.n_layer):
        h.append(
            {
                "ln_1": ln(f"h.{i}.ln_1"),
                "ln_2": ln(f"h.{i}.ln_2"),
                "attn": {"c_attn": cv(f"h.{i}.attn.c_attn"), "c_proj": cv(f"h.{i}.attn.c_proj")},
                "mlp": {"c_fc": cv(f"h.{i}.mlp.c_fc"), "c_proj": cv(f"h.{i}.mlp.c_proj")},
            }
        )
    return {
        "wte": sd["wte.weight"],
        "wpe": sd["wpe.weight"],
        "h": h,
        "ln_f": ln("ln_f"),
    }


def init_gpt2(rng: jax.Array, cfg: GPT2Config, dtype=jnp.float32) -> dict:
    """Random init with GPT-2's scheme (normal 0.02, zeros bias)."""
    keys = jax.random.split(rng, 2 + cfg.n_layer)

    def nrm(key, shape, std=0.02):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    def lin(key, i, o):
        return {"w": nrm(key, (i, o)), "b": jnp.zeros((o,), dtype)}

    def lnp(dim):
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    D = cfg.n_embd
    h = []
    for i in range(cfg.n_layer):
        sub = jax.random.split(keys[2 + i], 4)
        h.append(
            {
                "ln_1": lnp(D),
                "ln_2": lnp(D),
                "attn": {"c_attn": lin(sub[0], D, 3 * D), "c_proj": lin(sub[1], D, D)},
                "mlp": {"c_fc": lin(sub[2], D, 4 * D), "c_proj": lin(sub[3], 4 * D, D)},
            }
        )
    return {
        "wte": nrm(keys[0], (cfg.vocab_size, D)),
        "wpe": nrm(keys[1], (cfg.n_positions, D), std=0.01),
        "h": h,
        "ln_f": lnp(D),
    }


# ---------------------------------------------------------------------------
# int8-quantized KV cache (serving fast path)
# ---------------------------------------------------------------------------


def init_kv_cache_q8(cfg: GPT2Config, batch: int, max_len: int):
    """Per-vector-symmetric int8 KV cache: halves decode's dominant HBM
    stream (cache reads) vs bf16. Scales are per (layer, batch, head, pos)."""
    d = cfg.n_embd // cfg.n_head
    shape = (cfg.n_layer, batch, cfg.n_head, max_len, d)
    sshape = (cfg.n_layer, batch, cfg.n_head, max_len)
    return {
        "k": jnp.zeros(shape, jnp.int8),
        "v": jnp.zeros(shape, jnp.int8),
        "k_scale": jnp.zeros(sshape, jnp.float32),
        "v_scale": jnp.zeros(sshape, jnp.float32),
    }


def _quantize_vec(x):
    """x [..., d] -> (int8 values, fp32 scale[...])."""
    scale = jnp.max(jnp.abs(x), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_kv_cache(full_cache) -> dict:
    """Quantize a float KV cache {"k","v"} into the int8 + scales layout."""
    qk, sk = _quantize_vec(full_cache["k"].astype(jnp.float32))
    qv, sv = _quantize_vec(full_cache["v"].astype(jnp.float32))
    return {"k": qk, "v": qv, "k_scale": sk, "v_scale": sv}


def gpt2_prefill_q8(params, cfg: GPT2Config, inputs_embeds, cache):
    """Prefill then quantize the prompt's K/V into the int8 cache."""
    tmp = init_kv_cache(cfg, inputs_embeds.shape[0], cache["k"].shape[3],
                        inputs_embeds.dtype)
    logits, full = gpt2_prefill(params, cfg, inputs_embeds, tmp)
    return logits, quantize_kv_cache(full)


def gpt2_step_q8(params, cfg: GPT2Config, x_embed, cache, index):
    """One cached decode step over the int8 cache. The dequantization is
    folded into the attention contractions (scale the logits by k-scales,
    scale the probabilities by v-scales) so no dequantized cache tensor is
    ever materialized."""
    B, D = x_embed.shape
    x = (x_embed + params["wpe"][index])[:, None]

    T = cache["k"].shape[3]
    valid = (jnp.arange(T) <= index)[None, None, None]
    bias = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)

    ck_all, cv_all = cache["k"], cache["v"]
    sk_all, sv_all = cache["k_scale"], cache["v_scale"]
    for i in range(cfg.n_layer):
        blk = params["h"][i]
        h = _ln(x, blk["ln_1"], cfg.layer_norm_epsilon)
        qkv = _mm(h, blk["attn"]["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, cfg.n_head)
        k = _split_heads(k, cfg.n_head)[:, :, 0]  # [B, H, d]
        v = _split_heads(v, cfg.n_head)[:, :, 0]
        qk_, sk_ = _quantize_vec(k.astype(jnp.float32))
        qv_, sv_ = _quantize_vec(v.astype(jnp.float32))
        ck_all = ck_all.at[i, :, :, index].set(qk_)
        cv_all = cv_all.at[i, :, :, index].set(qv_)
        sk_all = sk_all.at[i, :, :, index].set(sk_)
        sv_all = sv_all.at[i, :, :, index].set(sv_)

        d = cfg.n_embd // cfg.n_head
        att = jnp.einsum(
            "bhqd,bhkd->bhqk", q, ck_all[i].astype(x.dtype)
        ) * (sk_all[i][:, :, None, :] / np.sqrt(d)).astype(x.dtype)
        att = jax.nn.softmax((att.astype(jnp.float32) + bias), axis=-1)
        p = (att * sv_all[i][:, :, None, :]).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, cv_all[i].astype(x.dtype))
        o = _mm(_merge_heads(o), blk["attn"]["c_proj"])
        x = x + o
        h = _ln(x, blk["ln_2"], cfg.layer_norm_epsilon)
        h = _gelu_new(_mm(h, blk["mlp"]["c_fc"]))
        x = x + _mm(h, blk["mlp"]["c_proj"])

    x = _ln(x, params["ln_f"], cfg.layer_norm_epsilon)
    logits = _logits(x, params)[:, 0].astype(jnp.float32)
    return logits, {"k": ck_all, "v": cv_all, "k_scale": sk_all, "v_scale": sv_all}


# ---------------------------------------------------------------------------
# channel-packed int8 KV cache (lane-dense serving layout)
# ---------------------------------------------------------------------------


def init_kv_cache_q8p(cfg: GPT2Config, batch: int, max_len: int):
    """Channel-packed per-(head,pos)-symmetric int8 KV cache.

    Layout k/v [B, T, C=H*d] per layer: the minor dim (768) is a multiple
    of the 128-lane tile and T sits on 32-granule int8 sublanes, so the
    stored tiles are dense. The head-structured q8 layout
    [..., H, T=77, d=64] pads int8 (32, 128) tiles to ~2.5x the logical
    bytes — measured on v5e, that step already streams at HBM peak
    (~850 GB/s physical) while moving only ~40% useful bytes, and
    batch-scaling shows it is purely stream-bound. Scales stay [B, H, T]
    (minor T) because a [., T, H=12] layout would pad 12 -> 128 lanes.

    Per-LAYER leaves (a tuple of (k, v, k_scale, v_scale) per layer, like
    the beam q8 cache): a layer-stacked carry's in-loop scatter can lower
    as a full-cache-slice rewrite fusion (measured 2.6x slower end to
    end). ``max_len`` is rounded up to a multiple of 8 so the decode
    kernel's 8-row-aligned in-place row commit always stays in bounds
    (extra rows are never marked valid)."""
    max_len = -(-max_len // 8) * 8
    shape = (batch, max_len, cfg.n_embd)
    sshape = (batch, cfg.n_head, max_len)
    return tuple(
        (
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(sshape, jnp.float32),
            jnp.zeros(sshape, jnp.float32),
        )
        for _ in range(cfg.n_layer)
    )


def _quantize_heads(x, n_head):
    """x [B, C] -> (int8 [B, C], f32 scale [B, H]), per-head symmetric —
    the same granularity as ``_quantize_vec`` on a [B, H, d] vector."""
    B, C = x.shape
    d = C // n_head
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf.reshape(B, n_head, d)), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(xf / jnp.repeat(s, d, axis=1)), -127, 127)
    return q.astype(jnp.int8), s


def gpt2_prefill_q8p(params, cfg: GPT2Config, inputs_embeds, cache):
    """Prefill, then quantize the prompt's K/V into the packed int8 cache."""
    T = cache[0][0].shape[1]
    tmp = init_kv_cache(cfg, inputs_embeds.shape[0], T, inputs_embeds.dtype)
    logits, full = gpt2_prefill(params, cfg, inputs_embeds, tmp)

    def pack(x):  # [B, H, T, d] -> (int8 [B, T, H*d], f32 scale [B, H, T])
        xf = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-8)
        q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
        B, H, Tc, d = q.shape
        return q.transpose(0, 2, 1, 3).reshape(B, Tc, H * d), s

    packed = []
    for i in range(cfg.n_layer):
        qk, sk = pack(full["k"][i])
        qv, sv = pack(full["v"][i])
        packed.append((qk, qv, sk, sv))
    return logits, tuple(packed)


def gpt2_step_q8p(params, cfg: GPT2Config, x_embed, cache, index):
    """One cached decode step over the packed int8 cache.

    Attention runs in the fused Pallas kernel ``ops/decode_attn.py``:
    the packed [B, T, C] int8 cache blocks are DMA'd lane-dense and
    dequantized in VMEM, with masked-head bf16 MXU contractions in the
    [B, H, T] orientation (XLA lowers *batched* int8 dots over this
    layout to slow dilated convolutions — measured 2.5x worse end to
    end). Numerics match ``gpt2_step_q8`` exactly (k-scales folded into
    scores, v-scales into probabilities, fp32 softmax — no extra
    quantization), so the exact-caption agreement validated on learned
    weights in tests/test_quantized_decode.py carries over."""
    from zs_aac_tpu.ops.decode_attn import q8_decode_attention

    B, D = x_embed.shape
    H = cfg.n_head
    d = D // H
    x = (x_embed + params["wpe"][index])[:, None]

    T = cache[0][0].shape[1]
    # cache rows at/after ``index`` are stale this step (the write lands
    # after the kernel read); the current token rides as appended column T
    bias = jnp.where(jnp.arange(T) < index, 0.0, -1e9).astype(jnp.float32)
    bias = jnp.concatenate([bias, jnp.zeros((1,), jnp.float32)]).reshape(1, 1, T + 1)
    mh = (jnp.arange(D)[:, None] // d
          == jnp.arange(H)[None, :]).astype(jnp.float32)  # [C, H]

    inv_sqrt_d = float(1.0 / np.sqrt(d))
    new_cache = []
    for i in range(cfg.n_layer):
        blk = params["h"][i]
        ck, cv, sk, sv = cache[i]
        h_ = _ln(x, blk["ln_1"], cfg.layer_norm_epsilon)
        qkv = _mm(h_, blk["attn"]["c_attn"])
        q, k, v = jnp.split(qkv[:, 0], 3, axis=-1)  # [B, C] each
        k8, sk_new = _quantize_heads(k, H)
        v8, sv_new = _quantize_heads(v, H)

        qm = (q[:, None, :] * mh.T[None]).astype(jnp.bfloat16)  # [B, H, C]
        sqk = jnp.concatenate(
            [sk * inv_sqrt_d, (sk_new * inv_sqrt_d)[:, :, None]], axis=-1)
        svc = jnp.concatenate([sv, sv_new[:, :, None]], axis=-1)
        o, ck, cv = q8_decode_attention(
            jnp.asarray(index, jnp.int32).reshape(1), qm, ck, cv,
            k8[:, None, :], v8[:, None, :], sqk, svc, bias,
        )
        sk = sk.at[:, :, index].set(sk_new)
        sv = sv.at[:, :, index].set(sv_new)
        new_cache.append((ck, cv, sk, sv))

        o = _mm(o.astype(x.dtype)[:, None], blk["attn"]["c_proj"])
        x = x + o
        h_ = _ln(x, blk["ln_2"], cfg.layer_norm_epsilon)
        h_ = _gelu_new(_mm(h_, blk["mlp"]["c_fc"]))
        x = x + _mm(h_, blk["mlp"]["c_proj"])

    x = _ln(x, params["ln_f"], cfg.layer_norm_epsilon)
    logits = _logits(x, params)[:, 0].astype(jnp.float32)
    return logits, tuple(new_cache)
