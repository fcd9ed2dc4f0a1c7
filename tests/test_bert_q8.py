"""int8 (w8a8) BERT text tower for MAGIC serving (models/bert_q8.py) —
opt-in approximate mode; agreement vs the float ASE.encode_text path is
bounded here (the GPT-2/Mistral w8a8 precedent: quantified slack, not
exactness)."""

import numpy as np
import jax
import jax.numpy as jnp

from zs_aac_tpu.models.ase import ASE, ASEConfig, text_config
from zs_aac_tpu.models.bert_q8 import encode_text_q8, quantize_text_tower_int8

CFG = ASEConfig(embed_size=32, audio_channels=(4, 8),
                text_model="prajjwal1/bert-tiny", spec_augmentation=False)


def _vars():
    ase = ASE(CFG)
    return ase.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 64, 64)), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32), jnp.arange(1), train=False,
    )


def test_q8_tower_matches_float_embeddings():
    variables = _vars()
    bcfg = text_config(CFG.text_model)
    qt = quantize_text_tower_int8(variables, bcfg)

    rng = np.random.default_rng(0)
    ids = np.zeros((6, 12), np.int32)
    for i in range(6):
        n = int(rng.integers(3, 12))
        ids[i, :n] = rng.integers(4, 2000, n)

    got = np.asarray(encode_text_q8(qt, bcfg, jnp.asarray(ids)))
    mask = (ids != 0).astype(np.int32)
    want = np.asarray(ASE(CFG).apply(variables, jnp.asarray(ids),
                                     jnp.asarray(mask), train=False,
                                     method=ASE.encode_text))
    # L2-normalized embeddings: cosine agreement is the meaningful bound
    cos = (got * want).sum(-1)
    assert np.all(np.isfinite(got))
    assert cos.min() > 0.98, cos
    # invariance to trailing padding (bucketed uploads rely on it)
    got2 = np.asarray(encode_text_q8(qt, bcfg, jnp.asarray(
        np.concatenate([ids, np.zeros((6, 6), np.int32)], 1))))
    np.testing.assert_allclose(got, got2, atol=2e-6)


def test_q8_tower_scorer_end_to_end():
    """magic_search_batched with a q8 tower injected as the device scorer
    runs end-to-end and is deterministic; tokens may differ from the float
    tower (approximate mode by design)."""
    import types

    from zs_aac_tpu.data.tokenizer import WordTokenizer
    from zs_aac_tpu.decoding.magic import magic_search_batched, make_magic_scorer
    from zs_aac_tpu.models.gpt2 import GPT2Config, init_gpt2

    variables = _vars()
    bcfg = text_config(CFG.text_model)
    qt = quantize_text_tower_int8(variables, bcfg)

    gcfg = GPT2Config(vocab_size=50, n_positions=96, n_embd=32, n_layer=2,
                      n_head=4)
    params = init_gpt2(jax.random.key(0), gcfg)
    rng = np.random.default_rng(1)
    B = 2
    prefix = jnp.asarray(rng.standard_normal((B, 4, 32)).astype(np.float32))
    audio = rng.standard_normal((B, CFG.embed_size)).astype(np.float32)
    tok = WordTokenizer(["w%d" % i for i in range(40)])

    def tok_ids(texts):
        ids = np.zeros((len(texts), 10), np.int16)
        for i, t in enumerate(texts):
            for j, w in enumerate(t.split()[:10]):
                ids[i, j] = (hash(w) % 1999) + 4
        return ids

    enc = lambda texts: None
    enc.device = types.SimpleNamespace(
        apply_fn=lambda vv, ids, _b=bcfg: encode_text_q8(vv, _b, ids),
        variables=qt, tokenize=tok_ids,
    )
    sc = make_magic_scorer(None, tok, encode_text_fn=enc)
    kw = dict(beam_width=4, alpha=0.1, beta=0.3, decoding_len=6,
              stop_token_id=-1)
    a = magic_search_batched(params, gcfg, prefix, audio, sc, **kw)
    b = magic_search_batched(params, gcfg, prefix, audio, sc, **kw)
    assert a == b and all(len(r) == 6 for r in a)
