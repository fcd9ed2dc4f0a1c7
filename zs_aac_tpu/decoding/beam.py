"""Beam search as a device-resident loop with a beam-expanded KV cache.

Capability parity with the reference ``generate_beam``
(``/root/reference/gpt2_prefix_eval.py:99-158``), including its exact
scoring semantics: per-step ``log(softmax(logits / temperature))``, stopped
beams contribute a forced 0-logprob token 0, running scores are
length-normalized for candidate selection (``scores_sum / seq_lengths``)
then de-normalized after selection, stop on the '.' token, final ordering
by ``scores / seq_lengths`` descending.

Unlike the reference (full recompute of the whole sequence each step), the
prefix is prefilled once, the cache is broadcast across the beam dim, and
each step is a single-token forward plus a gather to reorder beams.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from zs_aac_tpu.models.gpt2 import GPT2Config, gpt2_embed, gpt2_prefill, gpt2_step, init_kv_cache

__all__ = ["beam_search", "beam_search_batched"]

_NEG_INF = -1e9


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5, 6))
def beam_search(
    params: dict,
    cfg: GPT2Config,
    prefix_embeds: jax.Array,   # [1, Lp, D] — one clip per call, beam as batch
    beam_size: int = 5,
    entry_length: int = 67,
    stop_token_id: int = 13,
    temperature: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (tokens [beam, entry_length], seq_lengths [beam], scores [beam]).

    ``scores`` are the length-normalized final scores; callers sort
    descending (the reference returns texts in that order and uses [0]).
    """
    _, Lp, D = prefix_embeds.shape
    T = Lp + entry_length

    # Prefill once on the single prompt, then broadcast cache across beams.
    cache1 = init_kv_cache(cfg, 1, T, prefix_embeds.dtype)
    logits1, cache1 = gpt2_prefill(params, cfg, prefix_embeds, cache1)
    cache = jax.tree.map(lambda x: jnp.broadcast_to(x, (x.shape[0], beam_size, *x.shape[2:])), cache1)

    logp0 = jax.nn.log_softmax(logits1[0, -1] / temperature)
    scores, first_tokens = jax.lax.top_k(logp0, beam_size)  # [beam]

    tokens = jnp.zeros((beam_size, entry_length), jnp.int32)
    tokens = tokens.at[:, 0].set(first_tokens)
    seq_lengths = jnp.ones((beam_size,), jnp.float32)
    is_stopped = first_tokens == stop_token_id
    cur = first_tokens.astype(jnp.int32)

    def cond(state):
        i, _, _, _, _, is_stopped, _ = state
        return (i < entry_length) & ~jnp.all(is_stopped)

    def body(state):
        i, tokens, cache, scores, seq_lengths, is_stopped, cur = state
        logits, cache = gpt2_step(params, cfg, gpt2_embed(params, cur), cache, Lp + i - 1)
        logp = jax.nn.log_softmax(logits / temperature)  # [beam, V]
        # Stopped beams: only token 0 with logprob 0 (reference :133-135).
        stopped_row = jnp.full_like(logp[0], _NEG_INF).at[0].set(0.0)
        logp = jnp.where(is_stopped[:, None], stopped_row[None], logp)
        seq_lengths = jnp.where(is_stopped, seq_lengths, seq_lengths + 1)

        scores_sum = scores[:, None] + logp
        avg = scores_sum / seq_lengths[:, None]
        V = logp.shape[1]
        top_avg, flat_idx = jax.lax.top_k(avg.reshape(-1), beam_size)
        src = flat_idx // V
        nxt = (flat_idx % V).astype(jnp.int32)

        tokens = tokens[src].at[:, i].set(nxt)
        seq_lengths = seq_lengths[src]
        is_stopped = is_stopped[src]
        cache = jax.tree.map(lambda x: x[:, src], cache)
        scores = top_avg * seq_lengths
        is_stopped = is_stopped | (nxt == stop_token_id)
        return i + 1, tokens, cache, scores, seq_lengths, is_stopped, nxt

    state = (jnp.int32(1), tokens, cache, scores, seq_lengths, is_stopped, cur)
    _, tokens, _, scores, seq_lengths, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens, seq_lengths.astype(jnp.int32), scores / seq_lengths


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5, 6))
def beam_search_batched(
    params: dict,
    cfg: GPT2Config,
    prefix_embeds: jax.Array,   # [B, Lp, D] — many clips at once
    beam_size: int = 5,
    entry_length: int = 67,
    stop_token_id: int = 13,
    temperature: float = 1.0,
):
    """Beam search over a clip batch — same per-clip semantics as
    ``beam_search`` (verified equivalent in tests), with the beam dim folded
    into the batch so the whole eval set decodes in a few device programs
    instead of one per clip. Returns (tokens [B, beam, entry_length],
    seq_lengths [B, beam], scores [B, beam] length-normalized).
    """
    B, Lp, D = prefix_embeds.shape
    K = beam_size
    T = Lp + entry_length

    cache1 = init_kv_cache(cfg, B, T, prefix_embeds.dtype)
    logits1, cache1 = gpt2_prefill(params, cfg, prefix_embeds, cache1)
    # expand to [n_layer, B*K, H, T, d], beam-major within each clip
    cache = jax.tree.map(lambda x: jnp.repeat(x, K, axis=1), cache1)

    logp0 = jax.nn.log_softmax(logits1[:, -1] / temperature, axis=-1)  # [B, V]
    scores, first = jax.lax.top_k(logp0, K)              # [B, K]
    tokens = jnp.zeros((B, K, entry_length), jnp.int32)
    tokens = tokens.at[:, :, 0].set(first)
    seq_lengths = jnp.ones((B, K), jnp.float32)
    is_stopped = first == stop_token_id
    cur = first.astype(jnp.int32)                        # [B, K]

    clip_offsets = (jnp.arange(B) * K)[:, None]          # [B, 1]

    def cond(state):
        i, _, _, _, _, stopped, _ = state
        return (i < entry_length) & ~jnp.all(stopped)

    def body(state):
        i, tokens, cache, scores, seq_lengths, is_stopped, cur = state
        emb = gpt2_embed(params, cur.reshape(-1))        # [B*K, D]
        logits, cache = gpt2_step(params, cfg, emb, cache, Lp + i - 1)
        logp = jax.nn.log_softmax(logits / temperature).reshape(B, K, -1)
        V = logp.shape[-1]
        stopped_row = jnp.full((V,), _NEG_INF, logp.dtype).at[0].set(0.0)
        logp = jnp.where(is_stopped[..., None], stopped_row, logp)
        seq_lengths = jnp.where(is_stopped, seq_lengths, seq_lengths + 1)

        scores_sum = scores[..., None] + logp            # [B, K, V]
        avg = scores_sum / seq_lengths[..., None]
        top_avg, flat = jax.lax.top_k(avg.reshape(B, -1), K)
        src = flat // V                                  # [B, K] beam source
        nxt = (flat % V).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, src[..., None], axis=1)
        tokens = tokens.at[:, :, i].set(nxt)
        seq_lengths = jnp.take_along_axis(seq_lengths, src, axis=1)
        is_stopped = jnp.take_along_axis(is_stopped, src, axis=1)
        rows = (clip_offsets + src).reshape(-1)          # [B*K] global rows
        cache = jax.tree.map(lambda x: x[:, rows], cache)
        scores = top_avg * seq_lengths
        is_stopped = is_stopped | (nxt == stop_token_id)
        return i + 1, tokens, cache, scores, seq_lengths, is_stopped, nxt

    state = (jnp.int32(1), tokens, cache, scores, seq_lengths, is_stopped, cur)
    _, tokens, _, scores, seq_lengths, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens, seq_lengths.astype(jnp.int32), scores / seq_lengths
