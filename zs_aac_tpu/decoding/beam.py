"""Beam search as a device-resident loop with an ancestry-indirected KV cache.

Capability parity with the reference ``generate_beam``
(``/root/reference/gpt2_prefix_eval.py:99-158``), including its exact
scoring semantics: per-step ``log(softmax(logits / temperature))``, stopped
beams contribute a forced 0-logprob token 0, running scores are
length-normalized for candidate selection (``scores_sum / seq_lengths``)
then de-normalized after selection, stop on the '.' token, final ordering
by ``scores / seq_lengths`` descending.

Unlike the reference (full recompute of the whole sequence each step), the
prefix is prefilled once and each step is a single-token forward. Beam
reordering does NOT copy the cache: physical cache rows are append-only and
a tiny per-beam ancestry table is gathered instead (``gpt2_step_beam``) —
the per-step cost is O(K) extra FLOPs rather than O(cache) HBM traffic,
which is what held the round-1 implementation to ~1/10th of its roofline.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from zs_aac_tpu.models.gpt2 import (
    GPT2Config,
    gpt2_embed,
    gpt2_prefill,
    gpt2_step_beam,
    init_beam_cache,
    init_kv_cache,
)

__all__ = ["beam_search", "beam_search_batched", "beam_search_batched_q8"]

_NEG_INF = -1e9


def _topk_argmax(x: jax.Array, k: int):
    """Exact top-k over the last axis as k argmax passes.

    ``lax.top_k`` over the beam's [B, K*V] score matrix lowers to a partial
    sort that costs ~0.9 ms/step on v5e — k max-reductions are cheaper for
    the k<=5 this decoder needs. Tie order matches ``top_k`` (first index
    wins)."""
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        v = jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i)
        x = jnp.where(
            jax.nn.one_hot(i, x.shape[-1], dtype=bool), -jnp.inf, x
        )
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5, 6))
def beam_search(
    params: dict,
    cfg: GPT2Config,
    prefix_embeds: jax.Array,   # [1, Lp, D] — one clip per call
    beam_size: int = 5,
    entry_length: int = 67,
    stop_token_id: int = 13,
    temperature: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (tokens [beam, entry_length], seq_lengths [beam], scores [beam]).

    ``scores`` are the length-normalized final scores; callers sort
    descending (the reference returns texts in that order and uses [0]).
    Single-clip wrapper over ``beam_search_batched``.
    """
    tokens, seq_lengths, scores = beam_search_batched(
        params, cfg, prefix_embeds, beam_size, entry_length, stop_token_id,
        temperature,
    )
    return tokens[0], seq_lengths[0], scores[0]


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
    """Beam search over a clip batch — the reference's per-clip semantics
    with the beam dim folded into the batch so the whole eval set decodes in
    a few device programs instead of one per clip. Returns
    (tokens [B, beam, entry_length], seq_lengths [B, beam],
    scores [B, beam] length-normalized).
    """
    return _beam_batched_body(params, cfg, prefix_embeds, beam_size,
                              entry_length, stop_token_id, temperature,
                              quant=False)


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5, 6))
def beam_search_batched_q8(
    params: dict,
    cfg: GPT2Config,
    prefix_embeds: jax.Array,
    beam_size: int = 5,
    entry_length: int = 67,
    stop_token_id: int = 13,
    temperature: float = 1.0,
):
    """``beam_search_batched`` over the int8 KV cache (serving fast path;
    exact-caption agreement on learned weights is validated in
    tests/test_quantized_decode.py). Accepts int8-quantized weights too."""
    return _beam_batched_body(params, cfg, prefix_embeds, beam_size,
                              entry_length, stop_token_id, temperature,
                              quant=True)


def _beam_batched_body(params, cfg, prefix_embeds, beam_size, entry_length,
                       stop_token_id, temperature, quant, segments="auto"):
    from zs_aac_tpu.models.gpt2 import (
        gpt2_prefill_q8,
        gpt2_step_beam_q8,
        init_beam_cache_q8,
        init_kv_cache_q8,
    )

    from zs_aac_tpu.decoding.greedy import _grow_cache, _segment_bounds

    B, Lp, D = prefix_embeds.shape
    K = beam_size
    # staged cache (see decoding/greedy.py module docstring): start with
    # capacity for the first segment only and grow between segments —
    # beam's attention reads ALL K*T lanes per step, so masked-lane waste
    # costs K x what it does in greedy
    bounds = _segment_bounds(entry_length, segments)
    T = Lp + bounds[0]

    if quant:
        cache1 = init_kv_cache_q8(cfg, B, T)
        logits1, cache1 = gpt2_prefill_q8(params, cfg, prefix_embeds, cache1)
        cache = init_beam_cache_q8(cfg, cache1, K)
        step = gpt2_step_beam_q8
    else:
        cache1 = init_kv_cache(cfg, B, T, prefix_embeds.dtype)
        logits1, cache1 = gpt2_prefill(params, cfg, prefix_embeds, cache1)
        cache = init_beam_cache(cfg, cache1, K)
        step = gpt2_step_beam
    # ancestry: logical beam j's key at position t lives in row anc[b,j,t];
    # the prefill is replicated into every row, so own-row identity is valid
    anc = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, T)
    )

    # score accumulation is fp32 regardless of the model compute dtype
    logp0 = jax.nn.log_softmax(
        logits1[:, -1].astype(jnp.float32) / temperature, axis=-1
    )  # [B, V]
    scores, first = jax.lax.top_k(logp0, K)              # [B, K]
    tokens = jnp.zeros((B, K, entry_length), jnp.int32)
    tokens = tokens.at[:, :, 0].set(first)
    seq_lengths = jnp.ones((B, K), jnp.float32)
    is_stopped = first == stop_token_id
    cur = first.astype(jnp.int32)                        # [B, K]

    def body(state):
        i, tokens, cache, anc, scores, seq_lengths, is_stopped, cur = state
        emb = gpt2_embed(params, cur.reshape(-1))        # [B*K, D]
        logits, cache, anc = step(params, cfg, emb, cache, anc, Lp + i - 1)
        logp = jax.nn.log_softmax(logits / temperature).reshape(B, K, -1)
        V = logp.shape[-1]
        # arithmetic blend, not jnp.where: XLA materializes the where's
        # [B, K*V] pred broadcast as a separate 53us/step op in the decode
        # loop (profiled); the mul-add fuses into the scores_sum pass. All
        # operands are finite (_NEG_INF = -1e9, logp from log_softmax).
        stopped_row = jnp.full((V,), _NEG_INF, logp.dtype).at[0].set(0.0)
        m = is_stopped[..., None].astype(logp.dtype)     # [B, K, 1]
        logp = logp * (1.0 - m) + stopped_row * m
        seq_lengths = jnp.where(is_stopped, seq_lengths, seq_lengths + 1)

        scores_sum = scores[..., None] + logp            # [B, K, V]
        avg = scores_sum / seq_lengths[..., None]
        top_avg, flat = _topk_argmax(avg.reshape(B, -1), K)
        src = flat // V                                  # [B, K] beam source
        nxt = (flat % V).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, src[..., None], axis=1)
        tokens = tokens.at[:, :, i].set(nxt)
        seq_lengths = jnp.take_along_axis(seq_lengths, src, axis=1)
        is_stopped = jnp.take_along_axis(is_stopped, src, axis=1)
        # reorder the ancestry table (tiny) instead of the cache (huge)
        anc = jnp.take_along_axis(anc, src[..., None].astype(anc.dtype), axis=1)
        scores = top_avg * seq_lengths
        is_stopped = is_stopped | (nxt == stop_token_id)
        return i + 1, tokens, cache, anc, scores, seq_lengths, is_stopped, nxt

    state = (jnp.int32(1), tokens, cache, anc, scores, seq_lengths, is_stopped, cur)
    for end in bounds:
        i, tokens, cache, anc, scores, seq_lengths, is_stopped, cur = state
        need = Lp + end
        if anc.shape[2] < need:
            cache = _grow_cache(cache, need)
            anc = jnp.pad(anc, ((0, 0), (0, 0), (0, need - anc.shape[2])))
        state = (i, tokens, cache, anc, scores, seq_lengths, is_stopped, cur)

        def cond(state, _end=end):
            i, _, _, _, _, _, stopped, _ = state
            return (i < _end) & ~jnp.all(stopped)

        state = jax.lax.while_loop(cond, body, state)
    _, tokens, _, _, scores, seq_lengths, _, _ = state
    return tokens, seq_lengths.astype(jnp.int32), scores / seq_lengths
