"""Caption model + mapper + tokenizer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from zs_aac_tpu.models.caption import (
    CaptionConfig,
    caption_embeddings,
    caption_loss,
    caption_train_logits,
    init_caption_model,
    sound_effect_choice,
)
from zs_aac_tpu.models.gpt2 import GPT2Config
from zs_aac_tpu.data.tokenizer import GPT2BPETokenizer, WordTokenizer
from zs_aac_tpu.utils.noise import noise_injection

GCFG = GPT2Config(vocab_size=64, n_positions=96, n_embd=32, n_layer=2, n_head=4)


def _cfg(**kw):
    return CaptionConfig(
        prefix_length=4, prefix_size=16, clip_length=4, num_layers=2,
        gpt2=GCFG, max_seq_len=8, **kw,
    )


def test_caption_forward_shapes_and_mask_alignment():
    cfg = _cfg()
    params = init_caption_model(jax.random.key(0), cfg)
    B, S, H = 2, 8, 5
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, 60, (B, S)))
    prefix = jnp.asarray(rng.standard_normal((B, cfg.prefix_size)).astype(np.float32))
    hard = jnp.asarray(rng.integers(1, 60, (B, H)))
    hard_mask = jnp.ones((B, H), jnp.float32)
    mask = jnp.ones((B, cfg.prefix_length + S), jnp.float32)

    logits = caption_train_logits(params, cfg, tokens, prefix, mask, hard, hard_mask)
    assert logits.shape == (B, S, GCFG.vocab_size)

    loss = caption_loss(logits, tokens)
    assert np.isfinite(float(loss))

    # only_soft_prompt drops the hard prompt from the input.
    cfg2 = _cfg(only_soft_prompt=True)
    logits2 = caption_train_logits(params, cfg2, tokens, prefix, mask, hard, hard_mask)
    assert logits2.shape == (B, S, GCFG.vocab_size)


def test_caption_logit_slice_is_next_token_aligned():
    """logits[:, t] must be the prediction FOR tokens[:, t] (computed at the
    previous position) — the reference's H+P-1:-1 slice semantics."""
    cfg = _cfg(mapping_type="transformer")
    params = init_caption_model(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    B, S, H = 1, 6, 3
    tokens = jnp.asarray(rng.integers(1, 60, (B, S)))
    prefix = jnp.asarray(rng.standard_normal((B, cfg.prefix_size)).astype(np.float32))
    hard = jnp.asarray(rng.integers(1, 60, (B, H)))
    ones_h = jnp.ones((B, H), jnp.float32)
    mask = jnp.ones((B, cfg.prefix_length + S), jnp.float32)

    from zs_aac_tpu.models.gpt2 import gpt2_forward

    embeds = caption_embeddings(params, cfg, prefix, hard, tokens)
    assert embeds.shape == (B, H + cfg.prefix_length + S, GCFG.n_embd)
    full = gpt2_forward(
        params["gpt2"], GCFG, embeds, jnp.concatenate([ones_h, mask], axis=1)
    )
    sliced = caption_train_logits(params, cfg, tokens, prefix, mask, hard, ones_h)
    np.testing.assert_allclose(
        np.asarray(sliced),
        np.asarray(full[:, H + cfg.prefix_length - 1 : -1]),
        rtol=1e-5, atol=1e-5,
    )


def test_sound_effect_choice_topk():
    rng = np.random.default_rng(2)
    labels = jnp.asarray(rng.standard_normal((20, 16)).astype(np.float32))
    prefix = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    idx = sound_effect_choice(prefix, labels, 4)
    assert idx.shape == (3, 4)
    sims = np.asarray(prefix @ labels.T)
    for b in range(3):
        want = set(np.argsort(-sims[b])[:4])
        assert set(np.asarray(idx[b])) == want


def test_noise_injection_properties():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    y = noise_injection(jax.random.key(0), x, 0.016)
    # renormalized
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1), 1.0, rtol=1e-5)
    # zero variance is identity
    assert np.allclose(np.asarray(noise_injection(jax.random.key(0), x, 0.0)), np.asarray(x))
    # different keys -> different noise
    y2 = noise_injection(jax.random.key(1), x, 0.016)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_gpt2_bpe_matches_hf_tokenizers():
    """Train a small byte-level BPE with the HF `tokenizers` library (a rust
    implementation, independent oracle), then compare encodes/decodes."""
    import tempfile, os
    from tokenizers.implementations import ByteLevelBPETokenizer as HFTok

    corpus = [
        "a dog barks loudly in the park.",
        "rain falls on the tin roof all night.",
        "someone is playing a piano melody.",
        "the engine of a car revs and fades away.",
        "birds chirp while water flows in a stream.",
    ]
    with tempfile.TemporaryDirectory() as d:
        cpath = os.path.join(d, "corpus.txt")
        with open(cpath, "w") as f:
            f.write("\n".join(corpus))
        hf = HFTok()
        hf.train([cpath], vocab_size=200, min_frequency=1)
        hf.save_model(d)

        ours = GPT2BPETokenizer.from_dir(d)
        for text in corpus + ["an unseen zebra!? 123"]:
            want = hf.encode(text).ids
            got = ours.encode(text)
            assert got == want, f"{text!r}: {got} vs {want}"
            assert ours.decode(got) == text


def test_word_tokenizer_roundtrip():
    tok = WordTokenizer.from_corpus(["a dog barks.", "rain falls."])
    ids = tok.encode("a dog barks.")
    assert tok.decode(ids) == "a dog barks."
    assert ids[-1] == tok.stop_token_id


def test_cross_attention_variants():
    from zs_aac_tpu.models.caption import (
        caption_cross_train_logits,
        cross_attention_prefix,
        init_cross_attention,
    )

    cfg = _cfg(sound_effect_num=4)
    params = init_caption_model(jax.random.key(0), cfg)
    params["cross_attention"] = init_cross_attention(jax.random.key(1), cfg)
    rng = np.random.default_rng(4)
    B = 3
    prefix = jnp.asarray(rng.standard_normal((B, cfg.prefix_size)).astype(np.float32))
    labels = jnp.asarray(rng.standard_normal((12, cfg.prefix_size)).astype(np.float32))

    p1 = cross_attention_prefix(params, cfg, prefix, labels, version=1)
    p2 = cross_attention_prefix(params, cfg, prefix, labels, version=2)
    assert p1.shape == p2.shape == prefix.shape
    # v2 is residual: v2 - v1 == prefix (same attention inputs in eval)
    np.testing.assert_allclose(np.asarray(p2 - p1), np.asarray(prefix), rtol=1e-5)

    # v2 train masking never masks all effects
    p2t = cross_attention_prefix(
        params, cfg, prefix, labels, version=2, train=True,
        mask_probability=0.99, rng=jax.random.key(2),
    )
    assert np.isfinite(np.asarray(p2t)).all()

    tokens = jnp.asarray(rng.integers(1, 60, (B, 8)))
    mask = jnp.ones((B, cfg.prefix_length + 8), jnp.float32)
    logits = caption_cross_train_logits(
        params, cfg, tokens, prefix, mask, labels, version=2,
        train=True, rng=jax.random.key(3),
    )
    assert logits.shape == (B, 8, cfg.gpt2.vocab_size)


def test_support_memory_projection():
    from zs_aac_tpu.utils.memory import construct_support_memory, map_to_memory

    rng = np.random.default_rng(7)
    recs = [{"text_embedding": rng.standard_normal((1, 8)).astype(np.float32)}
            for _ in range(10)]
    mem = construct_support_memory(recs)
    assert mem.shape == (10, 8)
    # a query equal to a memory row maps (at high scale) to ~that row
    q = mem[3:4]
    out = map_to_memory(q, mem, scale=1000.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), rtol=1e-3, atol=1e-3)


def test_types_helpers():
    from zs_aac_tpu.utils.types import get_device, is_debugging

    d = get_device(0)
    assert d is get_device(-5)  # clamped
    assert isinstance(is_debugging(), bool)
