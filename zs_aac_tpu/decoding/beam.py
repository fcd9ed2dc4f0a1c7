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
Candidate selection over the ``[B, K*V]`` score matrix runs as a two-stage
exact top-k (``_beam_select``) touching the vocab-sized logits in two fused
reduction passes instead of six materialized ones.
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


def _group_size(V: int):
    """Group width for the two-stage top-k: the largest divisor of V in
    [64, 512] when one exists (uniform groups), else 512 with a ragged
    final group (GPT-2's 50257 = 29 x 1733 has no divisor in range)."""
    for S in range(512, 63, -1):
        if V % S == 0:
            return S
    return 512


def _beam_select(logits, scores, seq_lengths, is_stopped, temperature, B, K,
                 real_vocab=None):
    """Pick the K best (source beam, token) continuations per clip.

    Reference semantics (``gpt2_prefix_eval.py:117-150``): candidates are
    ranked by ``(scores + log_softmax(logits / temp)) / new_len`` where
    stopped beams contribute a forced 0-logprob token 0 and ``new_len`` is
    the per-beam length after appending (unchanged for stopped beams).

    ``logits`` is either flat ``[B*K, V]`` or the GROUPED lm_head output
    ``[B*K, G, S]`` (``models/gpt2.py::_logits_grouped`` — the in-loop
    fast path; any float dtype, upcasts fuse into the reductions).

    Returns (top_avg [B, K] fp32 length-normalized winning scores,
    src [B, K] source-beam index, nxt [B, K] token id, new_len [B, K]
    pre-gather sequence lengths).

    For real vocabularies this runs as a TWO-STAGE exact top-k so the
    [B*K, V] logits are touched by only two fused reduction passes
    (group-max and logsumexp) instead of materializing log_softmax /
    score-sum / average tensors (six vocab-sized passes, ~530 us/step at
    B=64 on v5e, round-2 profile). The ranking transform is affine per row
    (``avg = A*logit + B`` with ``A >= 0`` plus a token-0 bonus ``C`` for
    stopped rows), so per-group maxima of the raw logits order candidate
    groups exactly; the top-K elements of a [rows x groups] matrix always
    lie within the K distinct groups with the largest maxima (any group
    holding a top-K element has max >= that element). Gathering those K
    groups (K*S lanes) and re-ranking exactly reproduces the brute-force
    selection, up to fp tie-order on bitwise-equal scores.

    Grouped-input consumption is retile-free by construction (round-3
    profile: a flat fp32 logits buffer re-tiled TWICE per step, 121 + 51
    us at B*K=192, because the two passes read different reshapes): the
    group-max and logsumexp passes read ``[B, K, G, S]`` and the gather
    contraction ``[B, K*G, S]`` — all free views of the lm_head's output
    buffer. Pad lanes (``G*S > V``) emit logit 0 from the grouped head and
    are handled without touching the big buffer: a [G, S] iota mask fused
    into both reduction fusions, and an explicit post-gather mask on the
    tiny [B, K, S] candidate matrix (a pad lane's raw 0 logit would
    otherwise rank above real negative-logit candidates).
    """
    new_len = jnp.where(is_stopped, seq_lengths, seq_lengths + 1)
    inv_t = 1.0 / temperature

    if logits.ndim == 3:
        G, S = logits.shape[1], logits.shape[2]
        assert real_vocab is not None, "grouped logits need real_vocab"
        V = real_vocab
        groups = logits.reshape(B, K, G, S)
    else:
        Vp = logits.shape[-1]
        V = Vp if real_vocab is None else real_vocab
        lg = logits.reshape(B, K, Vp)
        if V <= 4096:
            # direct path (tiny/test vocabs): materialize the average-score
            # tensor as the reference does
            logp = jax.nn.log_softmax(lg.astype(jnp.float32) / temperature,
                                      axis=-1)
            # arithmetic blend, not jnp.where: XLA materializes the where's
            # [B, K*V] pred broadcast as a separate op in the decode loop
            stopped_row = jnp.full((V,), _NEG_INF, jnp.float32).at[0].set(0.0)
            m = is_stopped[..., None].astype(jnp.float32)
            logp = logp * (1.0 - m) + stopped_row * m
            avg = (scores[..., None] + logp) / new_len[..., None]
            top_avg, flat = _topk_argmax(avg.reshape(B, -1), K)
            src = flat // V
            nxt = (flat % V).astype(jnp.int32)
            return top_avg, src, nxt, new_len
        S = _group_size(V)
        G = -(-V // S)                                        # ragged last group
        if Vp == G * S:
            groups = lg.reshape(B, K, G, S)
        else:
            assert Vp == V, "pre-padded logits must pad V to G*S exactly"
            groups = jnp.pad(lg, ((0, 0), (0, 0), (0, G * S - V))
                             ).reshape(B, K, G, S)

    # The two vocab-sized reduction passes each fold their OWN convert (and
    # pad-lane mask) into the reduce fusion. A shared pre-masked f32 ``gf``
    # read by both passes (and tok0) made XLA materialize a full-vocab f32
    # copy of the logits every step — 156 MB / ~300 us at B=256, the
    # single hottest op in the beam profile (round 3).
    #
    # pass 1: per-group maxima, reduced in the logits' own dtype — max
    # commutes with the exact bf16->f32 convert, so converting the [B,K,G]
    # result is bit-identical to converting first. Pad lanes (logit 0 from
    # the grouped head) live only in the ragged LAST group; fix that one
    # group's max on its small [B, K, S] slice. The mask value is FINITE
    # -1e30, not -inf: padded lanes flow through the stage-2 affine rescale
    # below, where a stopped row's A == 0 would turn 0 * -inf into NaN and
    # poison the top-k; exp((-1e30 - rowmax) * inv_t) is exactly 0 in the
    # logsumexp pass.
    gmax = jnp.max(groups, axis=-1).astype(jnp.float32)       # [B, K, G]
    if G * S > V:
        last_lane = (G - 1) * S + jnp.arange(S)               # [S]
        last = jnp.where(last_lane >= V, -1e30,
                         groups[..., G - 1, :].astype(jnp.float32))
        gmax = gmax.at[..., G - 1].set(jnp.max(last, axis=-1))
    rowmax = jnp.max(gmax, axis=-1)                           # [B, K]
    # pass 2: stabilized logsumexp of logits / temp (single-consumer
    # convert+mask -> fuses into the reduction, no f32 materialization)
    if G * S > V:
        pad_lane = (jnp.arange(G)[:, None] * S + jnp.arange(S)) >= V  # [G, S]
        gf = jnp.where(pad_lane, -1e30, groups.astype(jnp.float32))
    else:
        gf = groups.astype(jnp.float32)
    se = jnp.sum(jnp.exp((gf - rowmax[..., None, None]) * inv_t),
                 axis=(-2, -1))
    lse = rowmax * inv_t + jnp.log(se)
    # per-row affine ranking scalars: avg = A*logit + Bc, except that a
    # stopped row's token 0 is the EXACT value scores/new_len (an override,
    # NOT an additive bonus over Bc — (scores - 1e9)/len + 1e9/len loses
    # the score entirely to fp32 cancellation, ulp(1e9) ~ 64)
    A = jnp.where(is_stopped, 0.0, inv_t / new_len)
    Bc = jnp.where(is_stopped, (scores + _NEG_INF) / new_len,
                   (scores - lse) / new_len)
    # read token 0's logit off the RAW buffer (never a pad lane) — a read
    # of ``gf`` here would give the masked f32 tensor a second consumer
    # and re-materialize it
    tok0 = jnp.where(is_stopped, scores / new_len,
                     A * groups[..., 0, 0].astype(jnp.float32) + Bc)  # [B, K]
    gavg = A[..., None] * gmax + Bc[..., None]                # [B, K, G]
    gavg = gavg.at[..., 0].max(tok0)
    _, gflat = _topk_argmax(gavg.reshape(B, K * G), K)        # distinct groups
    ksrc = gflat // G
    gsel = gflat % G
    # gather the K winning groups as whole S-wide lanes with ONE one-hot
    # contraction over the [B, K*G, S] view — a batched matmul XLA streams
    # in the logits' native layout and dtype (exact: each output lane sums
    # one 1.0 x value product plus true zeros; fp32 accumulation upcasts
    # the gathered values losslessly). Three rejected alternatives, all
    # measured on v5e: take_along_axis (two 39 MB layout copies around
    # the gather, profiled round 3), a scalar element gather over [B, K*V]
    # (~1 ms/step), and a vmapped dynamic_slice over (row, start) pairs —
    # lowered to a B*K-iteration while loop whose per-op transport
    # bookkeeping on the axon tunnel cost ~100x the device time.
    # 4-D one-hot, contracting (source row, group) as two separate dims of
    # the dot_general — the [B, K*G, S] merged view needed a retile copy of
    # the whole logits buffer every step (the 4-D view is a free bitcast,
    # round-3 profile; same trick as the beam cache's (r, t) dims). Exact:
    # one 1.0 x value product per output lane plus true zeros.
    sel_k = jnp.arange(K, dtype=ksrc.dtype) == ksrc[..., None]   # [B, K, K']
    sel_g = jnp.arange(G, dtype=gsel.dtype) == gsel[..., None]   # [B, K, G]
    sel1h = (sel_k[..., :, None] & sel_g[..., None, :]
             ).astype(groups.dtype)                           # [B, K, K', G]
    vals_raw = jax.lax.dot_general(
        sel1h, groups,
        (((2, 3), (1, 2)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                         # [B, K, S] f32
    off = gsel[..., None] * S + jnp.arange(S)                 # within-row pos
    Ag = jnp.take_along_axis(A, ksrc, axis=1)
    Bg = jnp.take_along_axis(Bc, ksrc, axis=1)
    t0g = jnp.take_along_axis(tok0, ksrc, axis=1)
    vals = Ag[..., None] * vals_raw + Bg[..., None]
    vals = jnp.where(off == 0, t0g[..., None], vals)
    # pad lanes came through the gather as raw 0 logits — mask them here,
    # on the tiny candidate matrix, instead of materializing a masked copy
    # of the vocab-sized buffer for the dot operand
    vals = jnp.where(off >= V, -1e30, vals)
    top_avg, pos = _topk_argmax(vals.reshape(B, K * S), K)
    flat = jnp.take_along_axis(
        (ksrc[..., None] * V + off).reshape(B, K * S), pos, axis=1)
    src = flat // V
    nxt = (flat % V).astype(jnp.int32)
    return top_avg, src.astype(jnp.int32), nxt, new_len


def _grow_beam_cache(cache, new_len: int):
    """Pad every beam-cache leaf's position axis out to ``new_len`` with
    zeros (staged decode, see ``decoding/greedy.py``). Beam leaves are
    per-layer tuples ``(k, v[, k_scale, v_scale])`` with K/V in the
    head-folded [B, K, T, C] layout (T at axis 2) and scales [B, H, K, T]
    (T at axis 3). Zero lanes are exact no-ops under the -1e9 ancestry
    bias."""

    def pad(x, axis):
        p = [(0, 0)] * x.ndim
        p[axis] = (0, new_len - x.shape[axis])
        return jnp.pad(x, p)

    return tuple(
        (pad(leaf[0], 2), pad(leaf[1], 2))
        + tuple(pad(s, 3) for s in leaf[2:])
        for leaf in cache
    )


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5, 6, 7))
def beam_search(
    params: dict,
    cfg: GPT2Config,
    prefix_embeds: jax.Array,   # [1, Lp, D] — one clip per call
    beam_size: int = 5,
    entry_length: int = 67,
    stop_token_id: int = 13,
    temperature: float = 1.0,
    fast_softmax: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (tokens [beam, entry_length], seq_lengths [beam], scores [beam]).

    ``scores`` are the length-normalized final scores; callers sort
    descending (the reference returns texts in that order and uses [0]).
    Single-clip wrapper over ``beam_search_batched``.
    """
    tokens, seq_lengths, scores = beam_search_batched(
        params, cfg, prefix_embeds, beam_size, entry_length, stop_token_id,
        temperature, fast_softmax,
    )
    return tokens[0], seq_lengths[0], scores[0]


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5, 6, 7))
def beam_search_batched(
    params: dict,
    cfg: GPT2Config,
    prefix_embeds: jax.Array,   # [B, Lp, D] — many clips at once
    beam_size: int = 5,
    entry_length: int = 67,
    stop_token_id: int = 13,
    temperature: float = 1.0,
    fast_softmax: bool = False,
):
    """Beam search over a clip batch — the reference's per-clip semantics
    with the beam dim folded into the batch so the whole eval set decodes in
    a few device programs instead of one per clip. Returns
    (tokens [B, beam, entry_length], seq_lengths [B, beam],
    scores [B, beam] length-normalized).

    ``fast_softmax=True`` (opt-in, never a default) runs each layer's
    attention softmax in bf16 instead of f32 — the last residue in the
    B=64 beam profile. Candidate *selection* (``_beam_select``) stays fp32
    exact; agreement slack vs the exact path is quantified on learned
    weights (tests/test_quantized_decode.py, BASELINE.md).
    """
    return _beam_batched_body(params, cfg, prefix_embeds, beam_size,
                              entry_length, stop_token_id, temperature,
                              quant=False, fast_softmax=fast_softmax)


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5, 6, 7))
def beam_search_batched_q8(
    params: dict,
    cfg: GPT2Config,
    prefix_embeds: jax.Array,
    beam_size: int = 5,
    entry_length: int = 67,
    stop_token_id: int = 13,
    temperature: float = 1.0,
    fast_softmax: bool = False,
):
    """``beam_search_batched`` over the int8 KV cache (serving fast path;
    exact-caption agreement on learned weights is validated in
    tests/test_quantized_decode.py). Accepts int8-quantized weights too."""
    return _beam_batched_body(params, cfg, prefix_embeds, beam_size,
                              entry_length, stop_token_id, temperature,
                              quant=True, fast_softmax=fast_softmax)


def _beam_batched_body(params, cfg, prefix_embeds, beam_size, entry_length,
                       stop_token_id, temperature, quant, segments="auto",
                       fast_softmax=False):
    from zs_aac_tpu.models.gpt2 import (
        gpt2_prefill_q8,
        gpt2_step_beam_q8,
        init_beam_cache_q8,
        init_kv_cache_q8,
    )

    from zs_aac_tpu.decoding.greedy import _segment_bounds

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

    # grouped in-loop lm_head: emits [B*K, G, S] logits so every view the
    # two-stage select reads is a free reshape of one tiled buffer. The
    # padded [G, S, C] weight is built HERE, outside the while loops —
    # XLA does not hoist the 39 MB pad out of the body (measured).
    V = logits1.shape[-1]
    if V > 4096:
        from zs_aac_tpu.models.gpt2 import prepare_grouped_lm_head

        S = _group_size(V)
        vgroup = (-(-V // S), S)
        params = dict(params)
        params["wte_g"] = prepare_grouped_lm_head(params, *vgroup)
    else:
        vgroup = None

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

    smax = jnp.bfloat16 if fast_softmax else jnp.float32

    def body(state):
        i, tokens, cache, anc, scores, seq_lengths, is_stopped, cur = state
        emb = gpt2_embed(params, cur.reshape(-1))        # [B*K, D]
        logits, cache, anc = step(params, cfg, emb, cache, anc, Lp + i - 1,
                                  vocab_group=vgroup, softmax_dtype=smax)
        top_avg, src, nxt, new_len = _beam_select(
            logits, scores, seq_lengths, is_stopped, temperature, B, K,
            real_vocab=V)

        tokens = jnp.take_along_axis(tokens, src[..., None], axis=1)
        tokens = tokens.at[:, :, i].set(nxt)
        seq_lengths = jnp.take_along_axis(new_len, src, axis=1)
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
            cache = _grow_beam_cache(cache, need)
            anc = jnp.pad(anc, ((0, 0), (0, 0), (0, need - anc.shape[2])))
        state = (i, tokens, cache, anc, scores, seq_lengths, is_stopped, cur)

        def cond(state, _end=end):
            i, _, _, _, _, _, stopped, _ = state
            return (i < _end) & ~jnp.all(stopped)

        state = jax.lax.while_loop(cond, body, state)
    _, tokens, _, _, scores, seq_lengths, _, _ = state
    return tokens, seq_lengths.astype(jnp.int32), scores / seq_lengths
