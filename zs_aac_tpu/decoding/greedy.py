"""Greedy (nucleus-truncated) decoding as a device-resident loop.

Capability parity with the reference ``generate2``
(``/root/reference/gpt2_prefix_eval.py:161-226``). Note the reference
computes a top-p mask and then takes **argmax** — since nucleus filtering
always keeps the most-probable token, the emitted token is exactly the
global argmax; the filter is a no-op. This implementation is therefore pure
greedy argmax, which is output-identical. The extra hardcoded stop id 764
(``:214``) is kept.

Unlike the reference (full-sequence recompute per step, batch size 1), this
is a batched ``lax.while_loop`` over a preallocated KV cache: one prefill +
``entry_length`` single-token steps, all on device.

Staged cache (round 3): a fixed-capacity cache makes EVERY step read the
full ``Lp + entry_length`` lanes even though step ``i`` only has ``Lp + i``
valid positions — cache reads are the dominant HBM stream of the decode
step, so ~30% of those bytes are masked-lane waste. The decode therefore
runs as a few consecutive ``while_loop`` segments over progressively
larger cache buffers (grown by ``jnp.pad`` between segments, two O(cache)
copies total). Masked lanes are exact zeros under the -1e9 softmax bias,
so emitted tokens are bit-identical to the single-loop formulation (the
oracle tests in tests/test_decoding.py cover the segmented defaults), and
early-stopped batches exit before ever touching the large buffers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from zs_aac_tpu.models.gpt2 import GPT2Config, gpt2_embed, gpt2_prefill, gpt2_step, init_kv_cache

__all__ = ["greedy_decode", "greedy_decode_q8", "mistral_greedy_decode"]


def _segment_bounds(entry_length: int, segments) -> tuple:
    """Static segment end-points for the staged decode. ``"auto"`` splits
    the decode in three (measured sweet spot: fewer segments waste masked
    lanes, more pay extra cache-grow copies and compile time); ``None``/
    ``()`` disables staging; an explicit tuple gives interior boundaries."""
    if segments == "auto":
        b = (entry_length // 3, (2 * entry_length) // 3) if entry_length >= 24 else ()
    elif not segments:
        b = ()
    else:
        b = tuple(s for s in segments if 0 < s < entry_length)
    return tuple(sorted(set(b))) + (entry_length,)


def _grow_cache(cache, new_len: int, pos_axis: int = 3):
    """Pad every cache leaf's position axis out to ``new_len`` with zeros —
    exact, because positions beyond the write index are masked to -1e9
    before the softmax and zero lanes contribute exactly 0. ``pos_axis`` is
    3 for the GPT-2/Mistral stacked layouts ([L, B, H, T, d] k/v,
    [L, B, H, T] scales) and 1 for the Mistral q8 folded per-layer leaves
    ([B*KV, T, d] k/v, [B*KV, T] scales)."""

    def pad(x):
        p = [(0, 0)] * x.ndim
        p[pos_axis] = (0, new_len - x.shape[pos_axis])
        return jnp.pad(x, p)

    return jax.tree.map(pad, cache)


def _staged_decode(body, init_state, entry_length: int, prompt_len: int, segments,
                   pos_axis: int = 3):
    """Run ``body`` as consecutive while_loops over a growing KV cache.

    ``init_state`` is ``(i, tokens, cache, finished, cur, lengths)`` with the
    cache sized for the FIRST segment; between segments the cache is grown
    with one pad copy. Emitted tokens are bit-identical to a single loop
    over the full-size cache."""

    state = init_state
    for end in _segment_bounds(entry_length, segments):
        i, tokens, cache, finished, cur, lengths = state
        need = prompt_len + end
        if cache and jax.tree.leaves(cache)[0].shape[pos_axis] < need:
            cache = _grow_cache(cache, need, pos_axis)
        state = (i, tokens, cache, finished, cur, lengths)

        def cond(state, _end=end):
            i, _, _, finished, _, _ = state
            return (i < _end) & ~jnp.all(finished)

        state = jax.lax.while_loop(cond, body, state)
    return state


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5, 6))
def greedy_decode(
    params: dict,
    cfg: GPT2Config,
    prefix_embeds: jax.Array,     # [B, Lp, D]
    entry_length: int = 67,
    stop_token_id: int = 13,      # GPT-2 '.'
    extra_stop_id: int = 764,     # reference's hardcoded ' .'-ish id
    segments="auto",
) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens [B, entry_length] int32, lengths [B] int32).

    ``lengths`` counts emitted tokens including the stop token; padding
    after the stop token is 0.
    """
    B, Lp, _ = prefix_embeds.shape
    bounds = _segment_bounds(entry_length, segments)
    cache = init_kv_cache(cfg, B, Lp + bounds[0], prefix_embeds.dtype)
    logits, cache = gpt2_prefill(params, cfg, prefix_embeds, cache)
    cur = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    tokens0 = jnp.zeros((B, entry_length), jnp.int32)
    finished0 = jnp.zeros((B,), bool)

    lengths0 = jnp.zeros((B,), jnp.int32)

    def body(state):
        i, tokens, cache, finished, cur, lengths = state
        tokens = tokens.at[:, i].set(jnp.where(finished, 0, cur))
        lengths = lengths + (~finished).astype(jnp.int32)
        now_stopped = finished | (cur == stop_token_id) | (cur == extra_stop_id)
        logits, cache = gpt2_step(params, cfg, gpt2_embed(params, cur), cache, Lp + i)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return i + 1, tokens, cache, now_stopped, nxt, lengths

    _, tokens, _, _, _, lengths = _staged_decode(
        body, (jnp.int32(0), tokens0, cache, finished0, cur, lengths0),
        entry_length, Lp, segments,
    )
    return tokens, lengths


@functools.partial(jax.jit, static_argnums=(1, 4, 5, 6),
                   static_argnames=("q8_cache",))
def mistral_greedy_decode(
    params: dict,
    cfg,                           # MistralConfig
    prefix_embeds: jax.Array,      # [B, Lp, D]
    lora: dict | None = None,
    max_new_tokens: int = 60,
    eos_token_id: int = 2,
    segments="auto",
    *,
    q8_cache: bool = False,
):
    """Batched greedy decode for the Mistral captioner — the reference's
    ``model.LMmodel.generate(do_sample=False, max_length=60, eos_token_id=2)``
    path (``/root/reference/train_prompt_multilingual.py:100-105``).

    Returns (tokens [B, max_new_tokens], lengths [B]); the EOS token itself
    is not emitted into ``tokens`` (HF skip_special_tokens semantics).

    ``q8_cache`` serves over the int8 KV cache
    (``models.mistral.init_mistral_cache_q8``): per-vector dequant scales
    fold into the attention contractions. An approximate serving mode in
    the same slack class as the w8a8 base quantization (quantified in
    BASELINE.md: 7/8 identical captions on trained weights, 0.71 token
    agreement worst-case on random weights); measured +2.5%/+4.5% at
    7B B=64/128.
    """
    from zs_aac_tpu.models.mistral import (
        init_mistral_cache,
        init_mistral_cache_q8,
        mistral_embed,
        mistral_prefill,
        mistral_step,
    )

    B, Lp, _ = prefix_embeds.shape
    bounds = _segment_bounds(max_new_tokens, segments)
    if q8_cache:
        cache = init_mistral_cache_q8(cfg, B, Lp + bounds[0])
    else:
        cache = init_mistral_cache(cfg, B, Lp + bounds[0], prefix_embeds.dtype)
    logits, cache = mistral_prefill(params, cfg, prefix_embeds, cache, lora=lora)
    cur = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    tokens0 = jnp.zeros((B, max_new_tokens), jnp.int32)
    finished0 = cur == eos_token_id
    lengths0 = jnp.zeros((B,), jnp.int32)

    def body(state):
        i, tokens, cache, finished, cur, lengths = state
        tokens = tokens.at[:, i].set(jnp.where(finished, 0, cur))
        lengths = lengths + (~finished).astype(jnp.int32)
        logits, cache = mistral_step(
            params, cfg, mistral_embed(params, cur), cache, Lp + i, lora=lora
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        finished = finished | (nxt == eos_token_id)
        return i + 1, tokens, cache, finished, nxt, lengths

    _, tokens, _, _, _, lengths = _staged_decode(
        body, (jnp.int32(0), tokens0, cache, finished0, cur, lengths0),
        max_new_tokens, Lp, segments, pos_axis=1 if q8_cache else 3,
    )
    return tokens, lengths


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5, 6))
def greedy_decode_q8(
    params: dict,
    cfg: GPT2Config,
    prefix_embeds: jax.Array,
    entry_length: int = 67,
    stop_token_id: int = 13,
    extra_stop_id: int = 764,
    segments="auto",
):
    """Greedy decode over the int8-quantized KV cache (serving fast path;
    token agreement vs the bf16 path is validated in tests).

    Uses the head-structured [L, B, H, T, d] cache + XLA attention
    (``gpt2_step_q8``): profiling shows XLA fuses the int8 dequant into
    the attention contractions at ~585 GB/s effective and folds the
    per-step scale scatters into the same fusions. A channel-packed
    lane-dense layout + Pallas decode kernel (``gpt2_step_q8p``) was
    built and measured SLOWER end to end (2.43 vs 1.06 ms/step at batch
    256) — per-pallas-call overhead (~90 us x 12 layer calls/step) and
    unfusable scale scatters next to an opaque custom call outweigh the
    layout win; it is kept as a documented experiment."""
    from zs_aac_tpu.models.gpt2 import gpt2_prefill_q8, gpt2_step_q8, init_kv_cache_q8

    B, Lp, _ = prefix_embeds.shape
    bounds = _segment_bounds(entry_length, segments)
    cache = init_kv_cache_q8(cfg, B, Lp + bounds[0])
    logits, cache = gpt2_prefill_q8(params, cfg, prefix_embeds, cache)
    cur = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    tokens0 = jnp.zeros((B, entry_length), jnp.int32)
    finished0 = jnp.zeros((B,), bool)
    lengths0 = jnp.zeros((B,), jnp.int32)

    def body(state):
        i, tokens, cache, finished, cur, lengths = state
        tokens = tokens.at[:, i].set(jnp.where(finished, 0, cur))
        lengths = lengths + (~finished).astype(jnp.int32)
        now_stopped = finished | (cur == stop_token_id) | (cur == extra_stop_id)
        logits, cache = gpt2_step_q8(params, cfg, gpt2_embed(params, cur), cache, Lp + i)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return i + 1, tokens, cache, now_stopped, nxt, lengths

    _, tokens, _, _, _, lengths = _staged_decode(
        body, (jnp.int32(0), tokens0, cache, finished0, cur, lengths0),
        entry_length, Lp, segments,
    )
    return tokens, lengths
