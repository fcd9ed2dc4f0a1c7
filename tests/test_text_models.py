"""Golden-value tests: BertEncoder and GPT-2 vs HF torch models (random init
from config — no network), plus KV-cache decode consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from zs_aac_tpu.models.bert import BertConfig, BertEncoder, convert_bert
from zs_aac_tpu.models.gpt2 import (
    GPT2Config,
    convert_gpt2,
    gpt2_embed,
    gpt2_forward,
    gpt2_prefill,
    gpt2_step,
    init_gpt2,
    init_kv_cache,
)

BCFG = BertConfig(
    vocab_size=120, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=40,
)
GCFG = GPT2Config(vocab_size=97, n_positions=64, n_embd=32, n_layer=2, n_head=4)


def _hf_bert():
    import transformers

    cfg = transformers.BertConfig(
        vocab_size=BCFG.vocab_size,
        hidden_size=BCFG.hidden_size,
        num_hidden_layers=BCFG.num_hidden_layers,
        num_attention_heads=BCFG.num_attention_heads,
        intermediate_size=BCFG.intermediate_size,
        max_position_embeddings=BCFG.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    return transformers.BertModel(cfg).eval()


def test_bert_matches_hf():
    tm = _hf_bert()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, BCFG.vocab_size, (3, 11))
    mask = np.ones((3, 11), np.int64)
    mask[1, 7:] = 0
    mask[2, 4:] = 0

    with torch.no_grad():
        want = tm(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    model = BertEncoder(BCFG)
    variables = convert_bert(tm.state_dict(), BCFG)
    got = np.asarray(
        model.apply(variables, jnp.asarray(ids), jnp.asarray(mask))
    )
    assert got.shape == want.shape
    # Padded positions attend differently in HF (they're masked as queries
    # too via output), compare only valid positions.
    for b in range(3):
        L = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :L], want[b, :L], rtol=2e-4, atol=2e-4)


def _hf_gpt2():
    import transformers

    cfg = transformers.GPT2Config(
        vocab_size=GCFG.vocab_size,
        n_positions=GCFG.n_positions,
        n_embd=GCFG.n_embd,
        n_layer=GCFG.n_layer,
        n_head=GCFG.n_head,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(1)
    return transformers.GPT2LMHeadModel(cfg).eval()


def test_gpt2_matches_hf():
    tm = _hf_gpt2()
    params = convert_gpt2(tm.state_dict(), GCFG)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, GCFG.vocab_size, (2, 9))
    with torch.no_grad():
        want = tm(input_ids=torch.tensor(ids)).logits.numpy()

    embeds = gpt2_embed(jax.tree.map(jnp.asarray, params), jnp.asarray(ids))
    got = np.asarray(gpt2_forward(jax.tree.map(jnp.asarray, params), GCFG, embeds))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gpt2_inputs_embeds_and_mask_match_hf():
    tm = _hf_gpt2()
    params = jax.tree.map(jnp.asarray, convert_gpt2(tm.state_dict(), GCFG))
    rng = np.random.default_rng(2)
    emb = rng.standard_normal((2, 7, GCFG.n_embd)).astype(np.float32) * 0.05
    mask = np.array([[1, 1, 1, 1, 1, 1, 1], [1, 0, 1, 1, 1, 0, 1]], np.int64)
    with torch.no_grad():
        want = tm(
            inputs_embeds=torch.tensor(emb), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    got = np.asarray(gpt2_forward(params, GCFG, jnp.asarray(emb), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_full_forward():
    params = init_gpt2(jax.random.key(0), GCFG)
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.standard_normal((2, 5, GCFG.n_embd)).astype(np.float32) * 0.1)
    tail_ids = jnp.asarray(rng.integers(0, GCFG.vocab_size, (2, 4)))

    # Full forward over [prompt ++ tail embeddings].
    tail_emb = gpt2_embed(params, tail_ids)
    full = gpt2_forward(params, GCFG, jnp.concatenate([prompt, tail_emb], axis=1))

    # Prefill on prompt, then 4 cached steps.
    cache = init_kv_cache(GCFG, 2, 16)
    logits, cache = gpt2_prefill(params, GCFG, prompt, cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :5]), rtol=1e-4, atol=1e-4)

    for t in range(4):
        step_logits, cache = gpt2_step(
            params, GCFG, gpt2_embed(params, tail_ids[:, t]), cache, jnp.asarray(5 + t)
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(full[:, 5 + t]), rtol=1e-4, atol=1e-4
        )


def test_gpt2_text_encoder_matches_hf():
    from zs_aac_tpu.models.text_towers import (
        GPT2EncoderConfig,
        GPT2TextEncoder,
        convert_gpt2_encoder,
    )

    cfg = GPT2EncoderConfig(vocab_size=97, n_positions=64, n_embd=32,
                            n_layer=2, n_head=4)
    tm = _hf_gpt2()  # GPT2LMHeadModel with the same dims
    variables = convert_gpt2_encoder(tm.state_dict(), cfg)
    rng = np.random.default_rng(9)
    ids = rng.integers(0, 97, (2, 7))
    mask = np.ones((2, 7), np.int64)
    mask[1, 4:] = 0
    with torch.no_grad():
        want = tm.transformer(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(
        GPT2TextEncoder(cfg).apply(variables, jnp.asarray(ids), jnp.asarray(mask))
    )
    for b in range(2):
        L = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :L], want[b, :L], rtol=2e-4, atol=2e-4)


def test_ase_with_gpt2_text_tower():
    from zs_aac_tpu.models.ase import ASE, ASEConfig

    ase = ASE(ASEConfig(embed_size=8, audio_channels=(4, 8),
                        text_model="gpt2-tiny", spec_augmentation=False))
    v = jax.jit(lambda r: ase.init(
        {"params": r}, jnp.zeros((2, 51, 64)), jnp.zeros((2, 8), jnp.int32),
        jnp.ones((2, 8), jnp.int32), jnp.arange(2), train=False,
    ))(jax.random.key(0))
    emb = ase.apply(v, jnp.zeros((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32),
                    train=False, method=ASE.encode_text)
    assert emb.shape == (2, 8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5)


def test_clip_text_encoder_matches_hf():
    import transformers

    from zs_aac_tpu.models.text_towers import (
        CLIPTextConfig,
        CLIPTextEncoder,
        convert_clip_text,
    )

    cfg = CLIPTextConfig(vocab_size=128, hidden_size=32, n_layer=2, n_head=4,
                         intermediate_size=64, max_positions=32)
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.n_layer, num_attention_heads=cfg.n_head,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_positions,
        attention_dropout=0.0, hidden_act="quick_gelu",
    )
    torch.manual_seed(3)
    tm = transformers.CLIPTextModel(hf_cfg).eval()
    variables = convert_clip_text(tm.state_dict(), cfg)
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 128, (2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        want = tm(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(
        CLIPTextEncoder(cfg).apply(variables, jnp.asarray(ids), jnp.asarray(mask))
    )
    for b in range(2):
        L = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :L], want[b, :L], rtol=3e-4, atol=3e-4)


def test_ase_with_clip_text_tower():
    from zs_aac_tpu.models.ase import ASE, ASEConfig

    ase = ASE(ASEConfig(embed_size=8, audio_channels=(4, 8),
                        text_model="clip-tiny", spec_augmentation=False))
    v = jax.jit(lambda r: ase.init(
        {"params": r}, jnp.zeros((2, 51, 64)), jnp.zeros((2, 8), jnp.int32),
        jnp.ones((2, 8), jnp.int32), jnp.arange(2), train=False,
    ))(jax.random.key(0))
    emb = ase.apply(v, jnp.zeros((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32),
                    train=False, method=ASE.encode_text)
    assert emb.shape == (2, 8)
