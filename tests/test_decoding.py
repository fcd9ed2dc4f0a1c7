"""Decode-loop tests with a tiny deterministic LM (SURVEY.md §4c).

The KV-cached ``lax.while_loop`` decoders are checked against brute-force
full-recompute implementations (via ``gpt2_forward``) of the reference
semantics — the same oracle relationship the reference's no-cache decode has
to ours.
"""

import numpy as np
import jax
import jax.numpy as jnp

from zs_aac_tpu.decoding.beam import beam_search
from zs_aac_tpu.decoding.greedy import greedy_decode
from zs_aac_tpu.models.gpt2 import GPT2Config, gpt2_embed, gpt2_forward, init_gpt2

CFG = GPT2Config(vocab_size=50, n_positions=96, n_embd=32, n_layer=2, n_head=4)
STOP = 7


def _setup(seed=0, b=1):
    params = init_gpt2(jax.random.key(seed), CFG)
    rng = np.random.default_rng(seed)
    prefix = jnp.asarray(rng.standard_normal((b, 4, CFG.n_embd)).astype(np.float32))
    return params, prefix


def _brute_greedy(params, prefix, entry_length, stop_ids):
    """Full-recompute greedy, one stream."""
    emb = prefix
    out = []
    for _ in range(entry_length):
        logits = gpt2_forward(params, CFG, emb)
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        if nxt in stop_ids:
            break
        emb = jnp.concatenate([emb, gpt2_embed(params, jnp.asarray([[nxt]]))], axis=1)
    return out


def test_greedy_matches_brute_force():
    params, prefix = _setup(0)
    tokens, lengths = greedy_decode(params, CFG, prefix, 20, STOP, 764)
    want = _brute_greedy(params, prefix, 20, (STOP, 764))
    got = list(np.asarray(tokens[0][: int(lengths[0])]))
    assert got == want


def test_greedy_batched_matches_per_item():
    params, prefix = _setup(3, b=3)
    tokens, lengths = greedy_decode(params, CFG, prefix, 16, STOP, 764)
    for b in range(3):
        want = _brute_greedy(params, prefix[b : b + 1], 16, (STOP, 764))
        got = list(np.asarray(tokens[b][: int(lengths[b])]))
        assert got == want, f"batch row {b}"


def _brute_beam(params, prefix, beam_size, entry_length, stop):
    """Full-recompute beam search with the reference's exact scoring
    (length-normalized selection, stopped rows forced to token 0)."""
    emb = np.asarray(prefix)  # [1, Lp, D]
    scores = None
    tokens = None
    seq_lengths = np.ones(beam_size)
    is_stopped = np.zeros(beam_size, bool)
    generated = emb
    for _ in range(entry_length):
        logits = np.asarray(gpt2_forward(params, CFG, jnp.asarray(generated)))
        logp = jax.nn.log_softmax(jnp.asarray(logits[:, -1]), axis=-1)
        logp = np.array(logp)  # writable copy
        if scores is None:
            idx = np.argsort(-logp[0])[:beam_size]
            scores = logp[0][idx]
            tokens = idx[:, None]
            generated = np.repeat(generated, beam_size, axis=0)
        else:
            logp[is_stopped] = -np.inf
            logp[is_stopped, 0] = 0
            scores_sum = scores[:, None] + logp
            seq_lengths[~is_stopped] += 1
            avg = scores_sum / seq_lengths[:, None]
            flat = np.argsort(-avg.reshape(-1))[:beam_size]
            src = flat // logp.shape[1]
            nxt = flat % logp.shape[1]
            seq_lengths = seq_lengths[src]
            tokens = np.concatenate([tokens[src], nxt[:, None]], axis=1)
            generated = generated[src]
            scores = avg.reshape(-1)[flat] * seq_lengths
            is_stopped = is_stopped[src]
        nxt_tok = tokens[:, -1]
        nxt_emb = np.asarray(gpt2_embed(params, jnp.asarray(nxt_tok)))[:, None]
        generated = np.concatenate([generated, nxt_emb], axis=1)
        is_stopped = is_stopped | (nxt_tok == stop)
        if is_stopped.all():
            break
    return tokens, seq_lengths, scores / seq_lengths


def test_beam_matches_brute_force():
    params, prefix = _setup(1)
    beam = 3
    tokens, lengths, scores = beam_search(params, CFG, prefix, beam, 15, STOP)
    bt, bl, bs = _brute_beam(params, prefix, beam, 15, STOP)
    for k in range(beam):
        L = int(lengths[k])
        assert L == int(bl[k])
        got = list(np.asarray(tokens[k][:L]))
        want = list(bt[k][:L])
        assert got == want, f"beam {k}: {got} vs {want}"
    np.testing.assert_allclose(np.asarray(scores), bs, rtol=1e-4, atol=1e-4)


def test_beam_all_beams_stop():
    params, prefix = _setup(2)
    tokens, lengths, scores = beam_search(params, CFG, prefix, 4, 40, STOP)
    assert tokens.shape == (4, 40)
    assert (lengths >= 1).all() and (lengths <= 40).all()
    assert np.isfinite(np.asarray(scores)).all()


def test_batched_beam_matches_single():
    from zs_aac_tpu.decoding.beam import beam_search_batched

    params, prefix = _setup(4, b=3)
    beam = 3
    bt, bl, bs = beam_search_batched(params, CFG, prefix, beam, 12, STOP)
    assert bt.shape == (3, beam, 12)
    for b in range(3):
        st, sl, ss = beam_search(params, CFG, prefix[b : b + 1], beam, 12, STOP)
        for k in range(beam):
            L = int(sl[k])
            assert int(bl[b, k]) == L
            assert list(np.asarray(bt[b, k][:L])) == list(np.asarray(st[k][:L])), (b, k)
        np.testing.assert_allclose(np.asarray(bs[b]), np.asarray(ss), rtol=1e-4)


def test_q8_cache_decode_agrees_with_bf16():
    from zs_aac_tpu.decoding.greedy import greedy_decode_q8

    params, prefix = _setup(6, b=4)
    t_ref, l_ref = greedy_decode(params, CFG, prefix, 16, STOP, 764)
    t_q8, l_q8 = greedy_decode_q8(params, CFG, prefix, 16, STOP, 764)
    # int8 cache is an approximation; require strong agreement on this
    # well-separated toy model
    agree = (np.asarray(t_ref) == np.asarray(t_q8)).mean()
    assert agree > 0.9, (agree, np.asarray(t_ref), np.asarray(t_q8))


def test_gpt2_tp_sharded_decode_matches_unsharded():
    """Serving story: greedy AND beam decode with TP-sharded GPT-2 weights
    on the 8-device mesh must compile, run, and match unsharded decode
    token-for-token (the GPT-2 analog of the Mistral TP parity test)."""
    from jax.sharding import Mesh

    from zs_aac_tpu.decoding.beam import beam_search_batched
    from zs_aac_tpu.parallel.tp import shard_gpt2_params

    assert len(jax.devices()) == 8
    params, prefix = _setup(9, b=2)

    t_ref, l_ref = greedy_decode(params, CFG, prefix, 12, STOP, 764)
    bt_ref, bl_ref, _ = beam_search_batched(params, CFG, prefix, 3, 10, STOP)

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
    sharded = shard_gpt2_params(params, mesh)
    t_tp, l_tp = greedy_decode(sharded, CFG, prefix, 12, STOP, 764)
    bt_tp, bl_tp, _ = beam_search_batched(sharded, CFG, prefix, 3, 10, STOP)

    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_tp))
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_tp))
    np.testing.assert_array_equal(np.asarray(bt_ref), np.asarray(bt_tp))
    np.testing.assert_array_equal(np.asarray(bl_ref), np.asarray(bl_tp))


def test_two_stage_beam_select_matches_direct():
    """The grouped two-stage top-k in ``_beam_select`` (taken for real
    vocab sizes) must reproduce the direct materialized-average selection
    exactly — same winners, same scores — including stopped rows (forced
    token 0) and the temperature scaling."""
    from zs_aac_tpu.decoding.beam import _beam_select, _group_size

    B, K, V = 3, 3, 50257
    assert _group_size(V) == 512  # 50257 = 29 x 1733: ragged last group
    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.standard_normal((B * K, V)).astype(np.float32) * 4)
    scores = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))
    seq_lengths = jnp.asarray(rng.integers(1, 9, (B, K)).astype(np.float32))
    is_stopped = jnp.asarray([[False, True, False],
                              [False, False, False],
                              [True, True, False]])

    for temp in (1.0, 0.7):
        top, src, nxt, new_len = _beam_select(
            logits, scores, seq_lengths, is_stopped, temp, B, K)

        # direct reference (the small-vocab branch's semantics, in numpy)
        logp = np.array(
            jax.nn.log_softmax(logits.astype(jnp.float32) / temp, axis=-1)
        ).reshape(B, K, V)
        stopped = np.asarray(is_stopped)
        logp[stopped] = -1e9
        logp[stopped, 0] = 0.0
        nl = np.where(stopped, np.asarray(seq_lengths),
                      np.asarray(seq_lengths) + 1)
        avg = (np.asarray(scores)[..., None] + logp) / nl[..., None]
        flat = np.argsort(-avg.reshape(B, -1), kind="stable")[:, :K]
        np.testing.assert_array_equal(np.asarray(src), flat // V)
        np.testing.assert_array_equal(np.asarray(nxt), flat % V)
        want = np.take_along_axis(avg.reshape(B, -1), flat, axis=1)
        np.testing.assert_allclose(np.asarray(top), want, rtol=2e-5, atol=2e-6)
        np.testing.assert_array_equal(np.asarray(new_len), nl)

        # pre-padded lm_head path (pad lanes zero, real_vocab passed):
        # identical winners; scores match to reduction-order ULPs (the
        # logsumexp reduces over 50688 lanes instead of 50257)
        lp = jnp.pad(logits.reshape(B * K, V), ((0, 0), (0, 50688 - V)))
        top2, src2, nxt2, len2 = _beam_select(
            lp, scores, seq_lengths, is_stopped, temp, B, K, real_vocab=V)
        np.testing.assert_allclose(np.asarray(top), np.asarray(top2),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(src), np.asarray(src2))
        np.testing.assert_array_equal(np.asarray(nxt), np.asarray(nxt2))
        np.testing.assert_array_equal(np.asarray(new_len), np.asarray(len2))

        # grouped lm_head path ([B*K, G, S], the in-loop fast path): the
        # flat pre-padded path reshapes to the same group view internally,
        # so the results must be bit-identical
        lg3 = lp.reshape(B * K, 99, 512)
        top3, src3, nxt3, len3 = _beam_select(
            lg3, scores, seq_lengths, is_stopped, temp, B, K, real_vocab=V)
        np.testing.assert_array_equal(np.asarray(top2), np.asarray(top3))
        np.testing.assert_array_equal(np.asarray(src2), np.asarray(src3))
        np.testing.assert_array_equal(np.asarray(nxt2), np.asarray(nxt3))

        # bf16 grouped logits (the w8a8 in-loop dtype): winners must match
        # a flat fp32 select over the SAME bf16-rounded values (the gather
        # contraction accumulates bf16 lanes into fp32 losslessly)
        lgb = lg3.astype(jnp.bfloat16)
        topb, srcb, nxtb, _ = _beam_select(
            lgb, scores, seq_lengths, is_stopped, temp, B, K, real_vocab=V)
        topf, srcf, nxtf, _ = _beam_select(
            lgb.astype(jnp.float32).reshape(B * K, -1), scores, seq_lengths,
            is_stopped, temp, B, K, real_vocab=V)
        np.testing.assert_array_equal(np.asarray(srcb), np.asarray(srcf))
        np.testing.assert_array_equal(np.asarray(nxtb), np.asarray(nxtf))
        np.testing.assert_allclose(np.asarray(topb), np.asarray(topf),
                                   rtol=1e-5, atol=1e-6)
