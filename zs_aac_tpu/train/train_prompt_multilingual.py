"""Multilingual (Mistral + LoRA) captioner training driver (CLI).

Capability parity with ``/root/reference/train_prompt_multilingual.py``:
Mistral decoder with LoRA on <en>/<zh>/<fr>-tagged captions, CE that skips
the ``islang`` language-tag tokens (:78), cosine schedule with warmup,
per-epoch batched greedy evaluation (eos id 2, max length 60, :100-105)
scored with CIDEr, ``best.pth``/``last.pth`` + ``params.json``.

Deviations (documented): bf16 base weights instead of bitsandbytes NF4
(CUDA-only; SURVEY.md §9.8); the reference's hardcoded HF token and cache
paths (:2-25, SURVEY.md §8.7) are replaced by ``--mistral_ckpt``.

Run: ``python -m zs_aac_tpu.train.train_prompt_multilingual --data bank.pkl ...``
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import numpy as np

__all__ = ["build_parser", "main", "run_multilingual_validation", "LANG_TAGS"]

LANG_TAGS = {"en": "<en>", "zh": "<zh>", "fr": "<fr>"}


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", nargs="+", required=True)
    p.add_argument("--valdata", required=True)
    p.add_argument("--out_dir", default="./checkpoints/multilingual")
    p.add_argument("--sound_effect", default=None)
    p.add_argument("--tokenizer", default=None,
                   help="GPT-2-format BPE dir for offline runs (the reference "
                        "uses the Mistral SentencePiece tokenizer)")
    p.add_argument("--mistral_ckpt", default=None,
                   help="converted Mistral params (msgpack); random init if absent")
    p.add_argument("--mistral_size", choices=["tiny", "7b"], default="7b")
    p.add_argument("--bs", type=int, default=40)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--prefix_length", type=int, default=10)
    p.add_argument("--prefix_length_clip", type=int, default=10)
    p.add_argument("--num_layers", type=int, default=8)
    p.add_argument("--noise_variance", type=float, default=0.0)
    p.add_argument("--mapping_type", default="mlp")
    p.add_argument("--is_rn", action="store_true")
    p.add_argument("--prefix_dim", type=int, default=None,
                   help="CLAP embedding dim; default follows the reference "
                        "(1024 with --is_rn else 512, train_prompt.py:237)")
    p.add_argument("--only_soft_prompt", action="store_true")
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--lora_alpha", type=int, default=16)
    p.add_argument("--percentage", type=float, default=1.0)
    p.add_argument("--normalize_prefix", action="store_true")
    p.add_argument("--use_audio_embedding", action="store_true")
    p.add_argument("--use_related_text", action="store_true")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--max_seq_len", type=int, default=40)
    return p


def _mistral_config(size: str, vocab_size: int):
    from zs_aac_tpu.models.mistral import MistralConfig

    if size == "tiny":
        return MistralConfig(vocab_size=vocab_size, hidden_size=32, n_layers=2,
                             n_heads=4, n_kv_heads=2, intermediate_size=64,
                             sliding_window=128, max_positions=128)
    return MistralConfig(vocab_size=max(vocab_size, 32000))


def run_multilingual_validation(params, ccfg, val_ds, tokenizer, key2refs,
                                lang: str = "en", batch: int = 32,
                                q8_cache=None):
    """Batched greedy decode with the language tag appended to the prompt.

    ``q8_cache=None`` auto-selects the int8 KV cache whenever the served
    base is itself int8-quantized (the ``--q8`` predict path): measured
    +2.5%/+4.5% at 7B B=64/128 with tested token agreement."""
    import jax
    import jax.numpy as jnp

    from zs_aac_tpu.decoding.greedy import mistral_greedy_decode
    from zs_aac_tpu.eval.captioning import eval_prediction
    from zs_aac_tpu.models.caption_mistral import mistral_caption_embeddings

    if q8_cache is None:
        q8_cache = isinstance(params["mistral"]["lm_head"], dict)

    tag_ids = np.asarray(tokenizer.encode(LANG_TAGS[lang]), np.int64)
    # jit the prompt assembly: eager flax apply on the TPU dispatches
    # op-by-op through the remote tunnel (~40 ms per op on this host)
    emb_fn = jax.jit(mistral_caption_embeddings, static_argnums=(1,))
    key2pred = {}
    items = [val_ds[i] for i in range(len(val_ds))]
    for s in range(0, len(items), batch):
        chunk = items[s : s + batch]
        prefix = jnp.asarray(np.stack([it["prefix"] for it in chunk]))
        tags = jnp.asarray(np.tile(tag_ids, (len(chunk), 1)))
        hp = None
        if "hard_prompt" in chunk[0]:
            from zs_aac_tpu.data.prompts import padding_captions

            hp, _ = padding_captions([it["hard_prompt"] for it in chunk])
            hp = jnp.asarray(hp)
        emb = emb_fn(params, ccfg, prefix, hp, tags)
        toks, lens = mistral_greedy_decode(
            params["mistral"], ccfg.mistral, emb, params["lora"], 60, 2,
            q8_cache=q8_cache,
        )
        for it, t, l in zip(chunk, np.asarray(toks), np.asarray(lens)):
            key2pred[it["audio_id"]] = [tokenizer.decode(list(t[: int(l)])).lower()]
    out = eval_prediction(key2refs, key2pred, metrics=("CIDEr",))
    return out["CIDEr"], key2pred


def main(argv=None):
    from zs_aac_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # cross-CLI compile reuse (VERDICT r4 #5)
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from zs_aac_tpu.data.datasets import (
        CaptionBankDataset,
        CaptionBankTestDataset,
        CaptionDatasetConfig,
        caption_batches,
    )
    from zs_aac_tpu.models.caption_mistral import (
        MistralCaptionConfig,
        init_mistral_caption,
        mistral_caption_loss,
        mistral_caption_train_logits,
    )
    from zs_aac_tpu.train.optim import cosine_lr
    from zs_aac_tpu.train.train_prompt import _make_tokenizer
    from zs_aac_tpu.data.prefetch import prefetch
    from zs_aac_tpu.utils.checkpoints import (
        criterion_improver,
        join_async_saves,
        load_params,
        save_params_async,
    )
    from zs_aac_tpu.utils.noise import noise_injection

    np.random.seed(args.seed)
    tokenizer, _ = _make_tokenizer(args, args.data)
    # make sure the language tags tokenize (word tokenizer: extend vocab)
    if hasattr(tokenizer, "stoi"):
        for tag in LANG_TAGS.values():
            if tag not in tokenizer.stoi:
                tokenizer.stoi[tag] = len(tokenizer.itos)
                tokenizer.itos.append(tag)
    islang = len(tokenizer.encode(LANG_TAGS["en"]))

    dcfg = CaptionDatasetConfig(
        prefix_length=args.prefix_length,
        max_seq_len=args.max_seq_len,
        normalize_prefix=args.normalize_prefix,
        use_audio_embedding=args.use_audio_embedding,
        use_related_text=args.use_related_text,
        percentage=args.percentage,
        sound_effect_path=args.sound_effect,
        multilingual=True,
        lang_tags=tuple(LANG_TAGS.values()),
        seed=args.seed,
    )
    dataset = CaptionBankDataset(args.data, tokenizer, dcfg)
    val_ds = CaptionBankTestDataset(args.valdata, tokenizer, dcfg)
    key2refs = val_ds.references()

    prefix_dim = args.prefix_dim or (1024 if args.is_rn else 512)
    ccfg = MistralCaptionConfig(
        prefix_length=args.prefix_length,
        prefix_size=prefix_dim,
        clip_length=args.prefix_length_clip,
        num_layers=args.num_layers,
        mapping_type=args.mapping_type,
        only_soft_prompt=args.only_soft_prompt,
        islang=islang,
        max_seq_len=args.max_seq_len,
        lora_r=args.lora_r,
        lora_alpha=args.lora_alpha,
        mistral=_mistral_config(args.mistral_size, tokenizer.vocab_size),
    )
    # ONE jitted init program (eager dispatch through the remote tunnel is
    # pathological at 7B — see verify skill notes / round-5 driver fixes)
    params = jax.jit(
        lambda k: init_mistral_caption(k, ccfg))(jax.random.key(args.seed))
    if args.mistral_ckpt:
        params["mistral"] = load_params(args.mistral_ckpt, params["mistral"])

    out_dir = os.path.join(args.out_dir, time.strftime("%b-%d-%H-%M-%S", time.localtime()))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "params.json"), "w") as f:
        json.dump({**vars(args), "islang": islang,
                   "mistral_vocab_size": ccfg.mistral.vocab_size}, f)
    logger = logging.getLogger(f"train_caption_ml.{out_dir}")
    logger.setLevel(logging.INFO)
    logger.addHandler(logging.FileHandler(os.path.join(out_dir, "train_caption.log")))

    steps_per_epoch = max(len(dataset) // args.bs, 1)
    schedule = cosine_lr(args.lr, args.warmup * steps_per_epoch,
                         args.epochs * steps_per_epoch)
    opt = optax.adamw(schedule, weight_decay=args.weight_decay)
    # Only the mapper and LoRA train; the Mistral base is frozen
    # (prepare_model_for_kbit_training semantics, caption_model.py:361-364).
    label_fn = lambda params: {  # noqa: E731
        "mapper": "trainable",
        "lora": jax.tree.map(lambda _: "trainable", params["lora"]) | {
            "r": "frozen", "alpha": "frozen"},
        "mistral": "frozen",
    }
    optimizer = optax.multi_transform(
        {"trainable": opt, "frozen": optax.set_to_zero()}, label_fn
    )
    opt_state = optimizer.init(params)

    def loss_fn(p, batch, rng):
        prefix = noise_injection(rng, batch["prefix"], args.noise_variance) \
            if args.noise_variance else batch["prefix"]
        logits = mistral_caption_train_logits(
            p, ccfg, batch["tokens"], prefix, batch["mask"],
            batch.get("hard_prompt"), batch.get("hard_mask"),
        )
        return mistral_caption_loss(logits, batch["tokens"], ccfg.islang)

    @jax.jit
    def train_step(p, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    improved = criterion_improver("score")
    rng = jax.random.key(args.seed + 1)
    it = 0
    for epoch in range(args.epochs):
        print(f">>> Training epoch {epoch}", flush=True)
        losses = []
        for batch in prefetch(caption_batches(dataset, args.bs,
                                               seed=args.seed + epoch)):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = train_step(params, opt_state, batch, sub)
            losses.append(loss)   # on device; float() here = 40 ms RTT/step
            it += 1
            if args.max_steps and it >= args.max_steps:
                break
        score, _ = run_multilingual_validation(params, ccfg, val_ds, tokenizer, key2refs)
        mean_loss = float(jnp.stack(losses).mean()) if losses else 0.0
        logger.info("%d\t%.3g\t%.3g", epoch, mean_loss, score)
        # async: at reference scale the mapper alone is 3.4 GB fp32 — the
        # ~8 MB/s tunnel fetch would block the loop ~7 min per save
        if improved(score):
            save_params_async(os.path.join(out_dir, "best.pth"),
                              {"mapper": params["mapper"], "lora": params["lora"]})
        save_params_async(os.path.join(out_dir, "last.pth"),
                          {"mapper": params["mapper"], "lora": params["lora"]})
        if args.max_steps and it >= args.max_steps:
            break
    join_async_saves()
    print(f"run dir: {out_dir}", flush=True)
    return out_dir


if __name__ == "__main__":
    main()
