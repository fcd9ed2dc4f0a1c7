"""MAGIC decode semantics, WordPiece tokenizer golden, driver smoke tests."""

import json
import os
import pickle

import zlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zs_aac_tpu.data.bert_tokenizer import WordPieceTokenizer
from zs_aac_tpu.data.tokenizer import WordTokenizer
from zs_aac_tpu.decoding.magic import clap_logprobs, magic_search, make_magic_scorer
from zs_aac_tpu.models.gpt2 import GPT2Config, init_gpt2

GCFG = GPT2Config(vocab_size=50, n_positions=96, n_embd=32, n_layer=2, n_head=4)
STOP = 7


def test_wordpiece_matches_hf():
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "dog", "bark", "##s",
             "rain", "fall", "##ing", "the", ".", ",", "in", "park"]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        vp = os.path.join(d, "vocab.txt")
        with open(vp, "w") as f:
            f.write("\n".join(vocab) + "\n")
        from transformers import BertTokenizer

        hf = BertTokenizer(vocab_file=vp, do_lower_case=True)
        ours = WordPieceTokenizer.from_file(vp)
        for text in ["A dog barks.", "rain falling in the park", "zebra unknown!"]:
            want = hf.encode(text, truncation=True, max_length=30)
            got = ours.encode(text, max_length=30)
            assert got == want, f"{text!r}: {got} vs {want}"
        ids, mask = ours.batch_encode(["a dog.", "rain falling in the park."])
        hf_batch = hf(["a dog.", "rain falling in the park."], padding="longest",
                      truncation=True, max_length=30)
        np.testing.assert_array_equal(ids, np.asarray(hf_batch["input_ids"]))
        np.testing.assert_array_equal(mask, np.asarray(hf_batch["attention_mask"]))


def test_clap_logprobs_is_log_softmax():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(8).astype(np.float32)
    t = rng.standard_normal((5, 8)).astype(np.float32)
    lp = clap_logprobs(a, t, 0.07)
    np.testing.assert_allclose(np.exp(lp).sum(), 1.0, rtol=1e-5)


def test_magic_search_beta_zero_close_to_greedy_and_guidance_steers():
    params = init_gpt2(jax.random.key(0), GCFG)
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.standard_normal((1, 4, GCFG.n_embd)).astype(np.float32))
    audio = rng.standard_normal(16).astype(np.float32)

    tok = WordTokenizer(["w%d" % i for i in range(48)])

    # fake CLAP text encoder: deterministic hash embedding of the text
    def fake_encode(texts):
        out = []
        for t in texts:
            h = zlib.crc32(t.encode()) % (2**31)
            r = np.random.default_rng(h)
            out.append(r.standard_normal(16).astype(np.float32))
        return np.stack(out)

    scorer = make_magic_scorer(None, tok, encode_text_fn=fake_encode)

    ids_a = magic_search(params, GCFG, prefix, audio, scorer,
                         beam_width=5, alpha=0.1, beta=0.0, decoding_len=10,
                         stop_token_id=STOP)
    assert 1 <= len(ids_a) <= 10
    # deterministic given same inputs
    ids_b = magic_search(params, GCFG, prefix, audio, scorer,
                         beam_width=5, alpha=0.1, beta=0.0, decoding_len=10,
                         stop_token_id=STOP)
    assert ids_a == ids_b
    # strong CLAP guidance changes the output (beta dominates)
    ids_c = magic_search(params, GCFG, prefix, audio, scorer,
                         beam_width=5, alpha=0.1, beta=50.0, decoding_len=10,
                         stop_token_id=STOP)
    assert ids_c != ids_a


def _mk_bank(path, n=48, e=512, seed=0, test=False):
    rng = np.random.default_rng(seed)
    words = ["dog", "cat", "rain", "wind", "bird", "car", "horn", "water"]
    recs = []
    for i in range(n):
        w = [words[int(x) % len(words)] for x in rng.integers(0, 8, 8)]
        cap = " ".join(w) + " sound."
        rec = {
            "audio_id": f"clip{i}",
            "text_embedding": rng.standard_normal((1, e)).astype(np.float32),
            "audio_embedding": rng.standard_normal((1, e)).astype(np.float32),
        }
        if test:
            rec["caption"] = [{"caption": cap}, {"caption": cap}]
        else:
            rec["caption"] = cap
        recs.append(rec)
    if test:
        with open(path, "wb") as f:
            pickle.dump(recs, f)
    else:
        with open(path, "wb") as f:
            for r in recs:
                pickle.dump(r, f)
    return recs


def test_train_and_predict_drivers_smoke(tmp_path):
    train_bank = str(tmp_path / "train.pkl")
    test_bank = str(tmp_path / "test.pkl")
    _mk_bank(train_bank, n=40)
    _mk_bank(test_bank, n=3, seed=1, test=True)

    from zs_aac_tpu.train.train_prompt import main as train_main

    out_dir = train_main([
        "--data", train_bank, "--valdata", test_bank,
        "--out_dir", str(tmp_path / "runs"),
        "--bs", "8", "--epochs", "1", "--warmup", "0",
        "--val_interval", "3", "--gpt2_size", "tiny",
        "--prefix_length", "4", "--prefix_length_clip", "4",
        "--noise_variance", "0.016",
    ])
    assert os.path.exists(os.path.join(out_dir, "params.json"))
    assert os.path.exists(os.path.join(out_dir, "best.pth"))
    assert os.path.exists(os.path.join(out_dir, "last.pth"))
    assert os.path.exists(os.path.join(out_dir, "train_caption.log"))

    from zs_aac_tpu.train.predict_prompt import main as predict_main

    scores = predict_main(["--test_dir", out_dir, "--data", test_bank, "--isbeam"])
    assert os.path.exists(os.path.join(out_dir, "scores.txt"))
    out = json.load(open(os.path.join(out_dir, "output.txt")))
    assert len(out["predictions"]) == 3
    assert "SPIDEr" in scores
    txt = open(os.path.join(out_dir, "scores.txt")).read()
    assert "Bleu-4" in txt and "SPIDEr" in txt
    # cold-cost itemization contract (round-5): per-run timing split
    timing = json.load(open(os.path.join(out_dir, "timing.json")))
    assert {"setup_s", "decode_s", "chunk_walls_s", "eval_and_write_s",
            "total_s", "n_clips"} <= set(timing)
    assert timing["n_clips"] == 3 and len(timing["chunk_walls_s"]) >= 1


def test_generate_beam_magic():
    from zs_aac_tpu.decoding.magic import generate_beam_magic

    params = init_gpt2(jax.random.key(0), GCFG)
    rng = np.random.default_rng(5)
    prefix = jnp.asarray(rng.standard_normal((1, 4, GCFG.n_embd)).astype(np.float32))
    audio = rng.standard_normal(16).astype(np.float32)
    tok = WordTokenizer(["w%d" % i for i in range(48)])

    def fake_encode(texts):
        out = []
        for t in texts:
            r = np.random.default_rng(zlib.crc32(t.encode()) % (2**31))
            out.append(r.standard_normal(16).astype(np.float32))
        return np.stack(out)

    scorer = make_magic_scorer(None, tok, encode_text_fn=fake_encode)
    cands, scores = generate_beam_magic(
        params, GCFG, prefix, audio, scorer,
        beam_size=3, magic_width=5, alpha=0.1, beta=0.2,
        entry_length=8, stop_token_id=STOP,
    )
    assert len(cands) == 3
    assert all(1 <= len(c) <= 8 for c in cands)
    assert list(scores) == sorted(scores, reverse=True)
    # deterministic
    cands2, _ = generate_beam_magic(
        params, GCFG, prefix, audio, scorer,
        beam_size=3, magic_width=5, alpha=0.1, beta=0.2,
        entry_length=8, stop_token_id=STOP,
    )
    assert cands == cands2


def test_only_prefix_freezes_gpt2():
    from zs_aac_tpu.models.caption import CaptionConfig
    from zs_aac_tpu.models.gpt2 import GPT2Config
    from zs_aac_tpu.train.caption_trainer import (
        create_caption_state,
        make_caption_optimizer,
        make_caption_train_step,
    )
    from zs_aac_tpu.train.optim import linear_warmup_lr

    cfg = CaptionConfig(prefix_length=4, prefix_size=16, clip_length=4,
                        only_prefix=True, gpt2=GPT2Config(
                            vocab_size=64, n_positions=64, n_embd=32,
                            n_layer=2, n_head=4))
    opt = make_caption_optimizer(cfg, linear_warmup_lr(1e-3, 0, 10))
    state = create_caption_state(jax.random.key(0), cfg, opt)
    step = make_caption_train_step(cfg, opt)
    rng = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(rng.integers(1, 60, (4, 8))),
        "mask": jnp.ones((4, 12), jnp.float32),
        "prefix": jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32)),
    }
    new_state, loss = step(state, batch, jax.random.key(1))
    new_state, loss = step(new_state, batch, jax.random.key(1))
    gdiff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params["gpt2"], new_state.params["gpt2"])
    mdiff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params["mapper"], new_state.params["mapper"])
    assert max(jax.tree.leaves(gdiff)) == 0.0  # GPT-2 frozen
    assert max(jax.tree.leaves(mdiff)) > 0.0   # mapper trains


def test_train_prompt_data_parallel_flag(tmp_path):
    import jax

    train_bank = str(tmp_path / "train.pkl")
    test_bank = str(tmp_path / "test.pkl")
    _mk_bank(train_bank, n=32)
    _mk_bank(test_bank, n=2, seed=1, test=True)
    from zs_aac_tpu.train.train_prompt import main as train_main

    out_dir = train_main([
        "--data", train_bank, "--valdata", test_bank,
        "--out_dir", str(tmp_path / "runs"),
        "--bs", "16", "--epochs", "1", "--warmup", "0",
        "--val_interval", "100", "--gpt2_size", "tiny",
        "--prefix_length", "4", "--prefix_length_clip", "4",
        "--data_parallel",
    ])
    assert os.path.exists(os.path.join(out_dir, "best.pth"))


def _brute_magic(params, prefix, audio, score_fn, beam_width, alpha, beta,
                 decoding_len, stop):
    """Full-recompute MAGIC oracle: no KV cache, no probe step — the
    reference's PlugAndPlayContrastiveDecodingOneStepFast semantics
    (gpt2_prefix_eval.py:396-534) built directly on gpt2_forward."""
    from zs_aac_tpu.models.gpt2 import gpt2_embed, gpt2_forward
    from zs_aac_tpu.models.gpt2 import _ln  # post-ln_f hiddens for the penalty

    def hiddens(emb):
        # replicate gpt2_forward's trunk to expose post-ln_f hidden states
        import jax.numpy as jnp
        from zs_aac_tpu.models.gpt2 import _block
        B, L, D = emb.shape
        x = emb + params["wpe"][jnp.arange(L)][None]
        causal = jnp.tril(jnp.ones((L, L), bool))
        bias = jnp.where(causal, 0.0, -1e9)[None, None].astype(x.dtype)
        for i in range(GCFG.n_layer):
            x, _ = _block(params["h"][i], GCFG, x, bias=bias)
        return _ln(x, params["ln_f"], GCFG.layer_norm_epsilon)

    emb = prefix
    generated = []
    for _ in range(decoding_len):
        logits = gpt2_forward(params, GCFG, emb)[0, -1]
        probs = np.asarray(jax.nn.softmax(logits))
        top = np.argsort(-probs)[:beam_width]
        h_ctx = np.asarray(hiddens(emb))[0]  # [L, D]
        scores = np.zeros(beam_width)
        for j, t in enumerate(top):
            emb_j = jnp.concatenate(
                [emb, gpt2_embed(params, jnp.asarray([[int(t)]]))], axis=1)
            h_all = np.asarray(hiddens(emb_j))[0]
            h_new = h_all[-1]
            ctx = h_ctx / np.maximum(
                np.linalg.norm(h_ctx, axis=-1, keepdims=True), 1e-12)
            nh = h_new / max(np.linalg.norm(h_new), 1e-12)
            deg = float((ctx @ nh).max())
            scores[j] = (1 - alpha) * probs[t] - alpha * deg
        clap = score_fn(audio, [generated + [int(t)] for t in top])
        scores = scores + beta * np.asarray(clap)
        sel = int(np.argmax(scores))
        tok = int(top[sel])
        generated.append(tok)
        emb = jnp.concatenate(
            [emb, gpt2_embed(params, jnp.asarray([[tok]]))], axis=1)
        if tok == stop:
            break
    return generated


def test_magic_search_matches_brute_force_oracle():
    params = init_gpt2(jax.random.key(3), GCFG)
    rng = np.random.default_rng(3)
    prefix = jnp.asarray(rng.standard_normal((1, 4, GCFG.n_embd)).astype(np.float32))
    audio = rng.standard_normal(16).astype(np.float32)
    tok = WordTokenizer(["w%d" % i for i in range(48)])
    emb_table = rng.standard_normal((50, 16)).astype(np.float32)

    def fake_encode(texts):
        out = []
        for s in texts:
            ids = [int(w[1:]) for w in s.split() if w.startswith("w")]
            v = emb_table[ids].sum(0) if ids else np.zeros(16, np.float32)
            out.append(v)
        return np.stack(out)

    scorer = make_magic_scorer(None, tok, encode_text_fn=fake_encode)
    got = magic_search(params, GCFG, prefix, audio, scorer,
                       beam_width=5, alpha=0.1, beta=0.2,
                       decoding_len=10, stop_token_id=STOP)
    want = _brute_magic(params, prefix, audio, scorer, 5, 0.1, 0.2, 10, STOP)
    assert got == want, (got, want)


def test_magic_search_batched_matches_single_clip():
    """Batch-invariance (VERDICT r2 #2): decoding B clips in one batched
    probe loop emits exactly the tokens each clip gets alone, including
    clips that stop early while others continue."""
    from zs_aac_tpu.decoding.magic import magic_search_batched

    params = init_gpt2(jax.random.key(1), GCFG)
    rng = np.random.default_rng(5)
    B = 6
    prefix = jnp.asarray(
        rng.standard_normal((B, 4, GCFG.n_embd)).astype(np.float32)
    )
    audio = rng.standard_normal((B, 16)).astype(np.float32)
    tok = WordTokenizer(["w%d" % i for i in range(48)])

    def fake_encode(texts):
        out = []
        for t in texts:
            h = zlib.crc32(t.encode()) % (2**31)
            r = np.random.default_rng(h)
            out.append(r.standard_normal(16).astype(np.float32))
        return np.stack(out)

    scorer = make_magic_scorer(None, tok, encode_text_fn=fake_encode)

    batched = magic_search_batched(
        params, GCFG, prefix, audio, scorer, beam_width=5, alpha=0.1,
        beta=0.2, decoding_len=12, stop_token_id=STOP,
    )
    singles = [
        magic_search(params, GCFG, prefix[b:b + 1], audio[b], scorer,
                     beam_width=5, alpha=0.1, beta=0.2, decoding_len=12,
                     stop_token_id=STOP)
        for b in range(B)
    ]
    assert batched == singles

    # Exercise the early-stop path deterministically: declare a token that
    # clip 0 actually emits mid-sequence to be the stop token and re-run —
    # clip 0 must stop early while the others keep decoding, with per-clip
    # streams still identical to their solo runs.
    stop2 = batched[0][2]
    assert any(stop2 not in s[:3] for s in batched[1:])
    batched2 = magic_search_batched(
        params, GCFG, prefix, audio, scorer, beam_width=5, alpha=0.1,
        beta=0.2, decoding_len=12, stop_token_id=stop2,
    )
    singles2 = [
        magic_search(params, GCFG, prefix[b:b + 1], audio[b], scorer,
                     beam_width=5, alpha=0.1, beta=0.2, decoding_len=12,
                     stop_token_id=stop2)
        for b in range(B)
    ]
    assert batched2 == singles2
    assert len(batched2[0]) == 3
    assert len({len(s) for s in batched2}) > 1


def test_magic_fused_device_scorer_matches_host_path():
    """The fully-fused batched step (CLAP tower + score + select + commit +
    probe in one device program) emits the same tokens as the host-side
    scoring path."""
    import types

    from zs_aac_tpu.decoding.magic import magic_search_batched

    params = init_gpt2(jax.random.key(2), GCFG)
    rng = np.random.default_rng(9)
    B = 4
    prefix = jnp.asarray(
        rng.standard_normal((B, 4, GCFG.n_embd)).astype(np.float32)
    )
    audio = rng.standard_normal((B, 16)).astype(np.float32)
    tok = WordTokenizer(["w%d" % i for i in range(48)])

    V, L = 64, 12
    W = rng.standard_normal((V, 16)).astype(np.float32)

    def tok_texts(texts):
        ids = np.zeros((len(texts), L), np.int32)
        mask = np.zeros((len(texts), L), np.float32)
        for i, t in enumerate(texts):
            for j, w in enumerate(t.split()[:L]):
                ids[i, j] = (zlib.crc32(w.encode()) % (V - 1)) + 1
                mask[i, j] = 1.0
        return ids, mask

    def host_encode(texts):  # numpy path -> host-side scoring
        ids, mask = tok_texts(texts)
        return (W[ids] * mask[..., None]).sum(1)

    def dev_apply(vv, ids):  # identical math, jittable; mask from pad id 0
        mask = (ids != 0).astype(vv["W"].dtype)
        return (vv["W"][ids] * mask[..., None]).sum(1)

    dev_encode = lambda texts: None  # body unused when .device present
    dev_encode.device = types.SimpleNamespace(
        apply_fn=dev_apply, variables={"W": jnp.asarray(W)},
        tokenize=lambda texts: tok_texts(texts)[0],
    )

    host_scorer = make_magic_scorer(None, tok, encode_text_fn=host_encode)
    dev_scorer = make_magic_scorer(None, tok, encode_text_fn=dev_encode)
    assert hasattr(dev_scorer, "device")

    kw = dict(beam_width=5, alpha=0.1, beta=0.2, decoding_len=10,
              stop_token_id=STOP)
    want = magic_search_batched(params, GCFG, prefix, audio, host_scorer, **kw)
    got = magic_search_batched(params, GCFG, prefix, audio, dev_scorer, **kw)
    assert got == want
    # also with a forced mid-sequence stop (early-exit bookkeeping differs
    # between the two loops)
    stop2 = want[0][2]
    kw["stop_token_id"] = stop2
    want2 = magic_search_batched(params, GCFG, prefix, audio, host_scorer, **kw)
    got2 = magic_search_batched(params, GCFG, prefix, audio, dev_scorer, **kw)
    assert got2 == want2
    # the stream is unchanged until stop2 first appears, then clip 0 stops
    assert len(want2[0]) == want[0].index(stop2) + 1


# ---------------------------------------------------------------------------
# Incremental host tokenization (round-4 VERDICT #6)
# ---------------------------------------------------------------------------


def _train_bpe(corpus, vocab_size=300):
    """Small byte-level BPE in the GPT-2 file format (HF `tokenizers` rust
    trainer as the independent builder)."""
    import tempfile

    from tokenizers.implementations import ByteLevelBPETokenizer as HFTok

    from zs_aac_tpu.data.tokenizer import GPT2BPETokenizer

    with tempfile.TemporaryDirectory() as d:
        cpath = os.path.join(d, "corpus.txt")
        with open(cpath, "w") as f:
            f.write("\n".join(corpus))
        hf = HFTok()
        hf.train([cpath], vocab_size=vocab_size, min_frequency=1)
        hf.save_model(d)
        return GPT2BPETokenizer.from_dir(d)


def _char_wordpiece(corpus):
    chars = sorted({c for t in corpus for c in t.lower() if not c.isspace()})
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + chars
             + ["##" + c for c in chars] + ["the", "dog", "rain", "##ing"])
    return WordPieceTokenizer(vocab)


def _full_retok(wp, texts):
    """The full-retokenize upload layout (`_load_ase_text_encoder._tokenize`):
    int16 ids padded to the smallest {8, 16, 30} bucket."""
    ids, mask = wp.batch_encode(texts, max_length=30, pad_to_max=True)
    ids = np.asarray(ids, np.int16)
    actual = int(np.asarray(mask).sum(1).max())
    for bucket in (8, 16, 30):
        if actual <= bucket:
            return ids[:, :bucket]
    return ids


def test_incremental_wordpiece_matches_full_retokenize():
    """Candidate id matrices from the incremental pipeline are bit-identical
    to full per-candidate re-tokenization across a long random decode —
    including word merges (tokens without a leading space), punctuation
    splits, multi-byte UTF-8 split across BPE tokens, and the >28-piece
    truncation regime."""
    from zs_aac_tpu.decoding.magic import IncrementalWordPiece

    corpus = [
        "a dog barks loudly in the park.",
        "rain falls, falling on the tin roof all night!",
        "café naïve déjà vu — piano",
        "the engine of a car revs and fades away.",
    ]
    lm = _train_bpe(corpus)
    wp = _char_wordpiece(corpus)
    B, k, V = 3, 5, lm.vocab_size
    rng = np.random.default_rng(0)
    incr = IncrementalWordPiece(wp, lm, B)
    generated = [[] for _ in range(B)]
    for step in range(48):  # long enough to cross the 28-piece truncation
        cands = rng.integers(0, V, (B, k))
        rows = [r for b in range(B) for r in incr.candidate_rows(b, cands[b])]
        got = incr.matrix(rows)
        texts = [lm.decode(generated[b] + [int(t)])
                 for b in range(B) for t in cands[b]]
        want = _full_retok(wp, texts)
        np.testing.assert_array_equal(got, want, err_msg=f"step {step}")
        sel = rng.integers(0, k, B)
        for b in range(B):
            t = int(cands[b, sel[b]])
            generated[b].append(t)
            incr.commit(b, t)


def test_magic_fused_incremental_matches_full_retokenize_loop():
    """The fused batched loop emits identical tokens with and without the
    incremental tokenizer (same WordPiece uploads, same device program)."""
    import types

    from zs_aac_tpu.decoding.magic import magic_search_batched

    corpus = ["a dog barks loudly in the park.",
              "rain falls on the tin roof all night."]
    lm = _train_bpe(corpus)
    wp = _char_wordpiece(corpus)
    cfg = GPT2Config(vocab_size=lm.vocab_size, n_positions=96, n_embd=32,
                     n_layer=2, n_head=4)
    params = init_gpt2(jax.random.key(3), cfg)
    rng = np.random.default_rng(11)
    B = 3
    prefix = jnp.asarray(rng.standard_normal((B, 4, cfg.n_embd)).astype(np.float32))
    audio = rng.standard_normal((B, 16)).astype(np.float32)
    W = rng.standard_normal((len(wp.itos), 16)).astype(np.float32)

    def dev_apply(vv, ids):
        mask = (ids != 0).astype(vv["W"].dtype)
        return (vv["W"][ids] * mask[..., None]).sum(1)

    def mk_scorer(with_wp):
        enc = lambda texts: None
        enc.device = types.SimpleNamespace(
            apply_fn=dev_apply, variables={"W": jnp.asarray(W)},
            tokenize=lambda texts: _full_retok(wp, texts),
            wordpiece=wp if with_wp else None,
        )
        return make_magic_scorer(None, lm, encode_text_fn=enc)

    kw = dict(beam_width=5, alpha=0.1, beta=0.4, decoding_len=12,
              stop_token_id=-1)
    want = magic_search_batched(params, cfg, prefix, audio, mk_scorer(False), **kw)
    got = magic_search_batched(params, cfg, prefix, audio, mk_scorer(True), **kw)
    assert got == want


# ---------------------------------------------------------------------------
# Batched beam MAGIC (round-4 VERDICT weak #4)
# ---------------------------------------------------------------------------


def test_generate_beam_magic_batched_matches_single_clip():
    """The batched host-selection path is an exact oracle mirror of the
    per-clip ``generate_beam_magic`` loop: same tokens, same scores, for
    every clip in the batch (selection math is verbatim numpy, the device
    probe/commit programs are row-independent)."""
    from zs_aac_tpu.decoding.magic import (
        generate_beam_magic,
        generate_beam_magic_batched,
    )

    params = init_gpt2(jax.random.key(0), GCFG)
    rng = np.random.default_rng(5)
    B = 3
    prefix = jnp.asarray(
        rng.standard_normal((B, 4, GCFG.n_embd)).astype(np.float32))
    audio = rng.standard_normal((B, 16)).astype(np.float32)
    tok = WordTokenizer(["w%d" % i for i in range(48)])

    def fake_encode(texts):
        out = []
        for t in texts:
            r = np.random.default_rng(zlib.crc32(t.encode()) % (2**31))
            out.append(r.standard_normal(16).astype(np.float32))
        return np.stack(out)

    scorer = make_magic_scorer(None, tok, encode_text_fn=fake_encode)
    kw = dict(beam_size=3, magic_width=5, alpha=0.1, beta=0.2,
              entry_length=8, stop_token_id=STOP)
    got_tokens, got_scores = generate_beam_magic_batched(
        params, GCFG, prefix, audio, scorer, **kw)
    assert len(got_tokens) == B and got_scores.shape == (B, 3)
    for b in range(B):
        want_t, want_s = generate_beam_magic(
            params, GCFG, prefix[b:b + 1], audio[b], scorer, **kw)
        assert got_tokens[b] == want_t, f"clip {b}"
        np.testing.assert_allclose(got_scores[b], want_s, rtol=1e-5,
                                   err_msg=f"clip {b}")
        assert list(got_scores[b]) == sorted(got_scores[b], reverse=True)


def test_beam_magic_fused_matches_host_path():
    """The fused beam step (CLAP tower + per-clip beam select + ancestry
    reorder + commit + probe in one device program) emits the same beams
    as the host-selection oracle path."""
    import types

    from zs_aac_tpu.decoding.magic import generate_beam_magic_batched

    params = init_gpt2(jax.random.key(2), GCFG)
    rng = np.random.default_rng(9)
    B = 3
    prefix = jnp.asarray(
        rng.standard_normal((B, 4, GCFG.n_embd)).astype(np.float32))
    audio = rng.standard_normal((B, 16)).astype(np.float32)
    tok = WordTokenizer(["w%d" % i for i in range(48)])

    V, L = 64, 12
    W = rng.standard_normal((V, 16)).astype(np.float32)

    def tok_texts(texts):
        ids = np.zeros((len(texts), L), np.int32)
        mask = np.zeros((len(texts), L), np.float32)
        for i, t in enumerate(texts):
            for j, w in enumerate(t.split()[:L]):
                ids[i, j] = (zlib.crc32(w.encode()) % (V - 1)) + 1
                mask[i, j] = 1.0
        return ids, mask

    def host_encode(texts):
        ids, mask = tok_texts(texts)
        return (W[ids] * mask[..., None]).sum(1)

    def dev_apply(vv, ids):
        mask = (ids != 0).astype(vv["W"].dtype)
        return (vv["W"][ids] * mask[..., None]).sum(1)

    dev_encode = lambda texts: None
    dev_encode.device = types.SimpleNamespace(
        apply_fn=dev_apply, variables={"W": jnp.asarray(W)},
        tokenize=lambda texts: tok_texts(texts)[0],
    )
    host_scorer = make_magic_scorer(None, tok, encode_text_fn=host_encode)
    dev_scorer = make_magic_scorer(None, tok, encode_text_fn=dev_encode)

    kw = dict(beam_size=3, magic_width=5, alpha=0.1, beta=0.2,
              entry_length=9, stop_token_id=STOP)
    want_t, want_s = generate_beam_magic_batched(
        params, GCFG, prefix, audio, host_scorer, **kw)
    got_t, got_s = generate_beam_magic_batched(
        params, GCFG, prefix, audio, dev_scorer, **kw)
    assert got_t == want_t
    np.testing.assert_allclose(got_s, want_s, rtol=1e-4, atol=1e-6)
    # forced mid-sequence stop: early-exit + stopped-row bookkeeping
    stop2 = want_t[0][0][-1] if len(want_t[0][0]) > 1 else want_t[0][0][0]
    kw["stop_token_id"] = int(stop2)
    want2 = generate_beam_magic_batched(
        params, GCFG, prefix, audio, host_scorer, **kw)
    got2 = generate_beam_magic_batched(
        params, GCFG, prefix, audio, dev_scorer, **kw)
    assert got2[0] == want2[0]


def test_beam_magic_fused_incremental_matches_full_retokenize():
    """The fused beam loop with the incremental WordPiece pipeline (now
    including the per-step ancestry ``reorder``) emits identical beams to
    full per-candidate re-tokenization."""
    import types

    from zs_aac_tpu.decoding.magic import generate_beam_magic_batched

    corpus = ["a dog barks loudly in the park.",
              "rain falls on the tin roof all night."]
    lm = _train_bpe(corpus)
    wp = _char_wordpiece(corpus)
    cfg = GPT2Config(vocab_size=lm.vocab_size, n_positions=96, n_embd=32,
                     n_layer=2, n_head=4)
    params = init_gpt2(jax.random.key(3), cfg)
    rng = np.random.default_rng(11)
    B = 2
    prefix = jnp.asarray(
        rng.standard_normal((B, 4, cfg.n_embd)).astype(np.float32))
    audio = rng.standard_normal((B, 16)).astype(np.float32)
    W = rng.standard_normal((len(wp.itos), 16)).astype(np.float32)

    def dev_apply(vv, ids):
        mask = (ids != 0).astype(vv["W"].dtype)
        return (vv["W"][ids] * mask[..., None]).sum(1)

    def mk_scorer(with_wp):
        enc = lambda texts: None
        enc.device = types.SimpleNamespace(
            apply_fn=dev_apply, variables={"W": jnp.asarray(W)},
            tokenize=lambda texts: _full_retok(wp, texts),
            wordpiece=wp if with_wp else None,
        )
        return make_magic_scorer(None, lm, encode_text_fn=enc)

    kw = dict(beam_size=3, magic_width=5, alpha=0.1, beta=0.4,
              entry_length=10, stop_token_id=-1)
    want = generate_beam_magic_batched(
        params, cfg, prefix, audio, mk_scorer(False), **kw)
    got = generate_beam_magic_batched(
        params, cfg, prefix, audio, mk_scorer(True), **kw)
    assert got[0] == want[0]
    np.testing.assert_array_equal(got[1], want[1])


def test_predict_driver_magic_modes(tmp_path):
    """End-to-end `predict_prompt --magic` (greedy) and `--magic --isbeam`
    (batched beam MAGIC) through the CLI, with a real tiny ASE checkpoint
    + sidecar loaded by ``_load_ase_text_encoder`` — the driver dispatch
    these modes share was previously untested."""
    train_bank = str(tmp_path / "train.pkl")
    test_bank = str(tmp_path / "test.pkl")
    _mk_bank(train_bank, n=24)
    _mk_bank(test_bank, n=3, seed=1, test=True)

    from zs_aac_tpu.train.train_prompt import main as train_main

    out_dir = train_main([
        "--data", train_bank, "--valdata", test_bank,
        "--out_dir", str(tmp_path / "runs"),
        "--bs", "8", "--epochs", "1", "--warmup", "0",
        "--val_interval", "1000000", "--gpt2_size", "tiny",
        "--prefix_length", "4", "--prefix_length_clip", "4",
    ])

    # tiny ASE checkpoint + sidecar (the --clap_ckpt surface)
    from zs_aac_tpu.models.ase import ASE, ASEConfig
    from zs_aac_tpu.utils.checkpoints import save_params

    # embed_size must match the bank's embedding dim (the driver feeds the
    # 512-d prefix embedding as the CLAP audio embedding)
    acfg = dict(embed_size=512, audio_channels=(4, 8),
                text_model="prajjwal1/bert-tiny", spec_augmentation=False)
    ase = ASE(ASEConfig(**acfg))
    variables = ase.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 64, 64)), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32), jnp.arange(1), train=False,
    )
    ck = str(tmp_path / "ase.pth")
    save_params(ck, variables)
    vocab_path = str(tmp_path / "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
                          + ["w%d" % i for i in range(32)]
                          + list("abcdefghijklmnopqrstuvwxyz")))
    json.dump({"ase_config": {**acfg, "audio_channels": list(acfg["audio_channels"])},
               "bert_tokenizer": vocab_path}, open(ck + ".json", "w"))

    from zs_aac_tpu.train.predict_prompt import main as predict_main

    common = ["--test_dir", out_dir, "--data", test_bank, "--batch", "3",
              "--magic", "--clap_ckpt", ck, "--magic_width", "4"]
    scores_g = predict_main(common)
    out = json.load(open(os.path.join(out_dir, "output.txt")))
    assert len(out["predictions"]) == 3 and "SPIDEr" in scores_g

    scores_b = predict_main(common + ["--isbeam", "--beam_size", "2"])
    out = json.load(open(os.path.join(out_dir, "output.txt")))
    assert len(out["predictions"]) == 3 and "SPIDEr" in scores_b

    # opt-in int8 text tower through the CLI (loader quantizes the real
    # loaded ASE variables; registry guard exercised)
    scores_q = predict_main(common + ["--q8_tower"])
    out = json.load(open(os.path.join(out_dir, "output.txt")))
    assert len(out["predictions"]) == 3 and "SPIDEr" in scores_q


def test_dedup_tower_embs_exact():
    """Tower-over-uniques + inverse gather is bit-exact vs the full batch,
    across all three bucket regimes (full / quarter / saturation floor)."""
    import types

    from zs_aac_tpu.decoding.magic import _dedup_tower_embs, _tower_for

    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))

    def apply_fn(vv, ids):
        mask = (ids != 0).astype(vv["W"].dtype)
        return (vv["W"][ids] * mask[..., None]).sum(1)

    tower = _tower_for(apply_fn)
    vv = {"W": W}
    B, k, L = 4, 8, 12
    full = B * k

    def check(ids_np):
        got = np.asarray(_dedup_tower_embs(tower, vv, ids_np, B))
        want = np.asarray(tower(vv, jnp.asarray(ids_np)))
        np.testing.assert_array_equal(got, want)

    # all-unique rows: full bucket, no dedup
    check(rng.integers(1, 64, (full, L)).astype(np.int16))
    # half duplicated -> quarter bucket? (16 uniques > full//4=8 -> full)
    base = rng.integers(1, 64, (full // 2, L)).astype(np.int16)
    check(np.concatenate([base, base], 0))
    # saturation: every clip's k rows identical -> U = B <= floor bucket
    rows = rng.integers(1, 64, (B, L)).astype(np.int16)
    check(np.repeat(rows, k, axis=0))
    # quarter regime: exactly full//4 uniques
    rows = rng.integers(1, 64, (full // 4, L)).astype(np.int16)
    check(np.concatenate([rows] * 4, 0))
