"""Captioner training driver (CLI).

Capability parity with ``/root/reference/train_prompt.py``: same flag
surface (data/valdata/out_dir/sound_effect, bs/epochs/warmup/lr,
prefix_length/mapping_type/only_prefix/only_soft_prompt/noise_variance,
use_audio_embedding/use_related_text/normalize_prefix/percentage, seed),
timestamped run dir with ``params.json`` + ``train_caption.log``, in-loop
CIDEr validation every ``--val_interval`` (600) steps with beam-3 decode,
``best.pth`` on CIDEr improvement and ``last.pth`` per epoch.

TPU adaptations: the train step is one jitted function (noise injection +
forward + CE + AdamW) over static-shape batches; validation decodes with
the KV-cached device beam search, grouping clips by hard-prompt length so
each length compiles once. The reference's accidental hard stop at
``epochs*600`` iterations (SURVEY.md §8.6) is NOT replicated by default —
pass ``--max_iters`` to reproduce it.

Run: ``python -m zs_aac_tpu.train.train_prompt --data bank.pkl ...``
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time
from collections import defaultdict

import numpy as np

__all__ = ["build_parser", "main", "run_validation"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # data (train_prompt.py:183-190)
    p.add_argument("--data", nargs="+", type=str, required=True)
    p.add_argument("--valdata", type=str, required=True)
    p.add_argument("--out_dir", default="./checkpoints/run")
    p.add_argument("--sound_effect", default=None)
    p.add_argument("--device", default="tpu")
    p.add_argument("--prefix", default="coco_prefix")
    p.add_argument("--ckpt_file", type=str, default=None)
    p.add_argument("--tokenizer", type=str, default=None,
                   help="dir with GPT-2 vocab.json/merges.txt; default: "
                        "word-level tokenizer built from the training bank")
    # training (train_prompt.py:192-200)
    p.add_argument("--bs", type=int, default=40)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--save_every", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--val_interval", type=int, default=600)
    p.add_argument("--max_iters", type=int, default=None,
                   help="reproduce the reference's epochs*600 iteration cap")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all devices (the reference's "
                        "captioner is single-device; this is an extension)")
    # model (train_prompt.py:202-214)
    p.add_argument("--prefix_length", type=int, default=10)
    p.add_argument("--prefix_length_clip", type=int, default=10)
    p.add_argument("--num_layers", type=int, default=8)
    p.add_argument("--sound_effect_num", type=int, default=0)
    p.add_argument("--noise_variance", type=float, default=0.0)
    p.add_argument("--mapping_type", type=str, default="mlp")
    p.add_argument("--is_rn", action="store_true")
    p.add_argument("--prefix_dim", type=int, default=None,
                   help="CLAP embedding dim; default follows the reference "
                        "(1024 with --is_rn else 512, train_prompt.py:237)")
    p.add_argument("--only_prefix", action="store_true")
    p.add_argument("--only_soft_prompt", action="store_true")
    p.add_argument("--use_sound_effect", action="store_true")
    p.add_argument("--mask_probability", type=float, default=0.0)
    p.add_argument("--gpt2_size", choices=["tiny", "small", "base"], default="base",
                   help="GPT-2 size for random init (no pretrained weights "
                        "in an offline env); 'tiny' for smoke runs")
    # dataset (train_prompt.py:216-220)
    p.add_argument("--percentage", type=float, default=1.0)
    p.add_argument("--normalize_prefix", action="store_true")
    p.add_argument("--use_audio_embedding", action="store_true")
    p.add_argument("--use_related_text", action="store_true")
    return p


def _gpt2_config(size: str, vocab_size: int):
    from zs_aac_tpu.models.gpt2 import GPT2Config

    if size == "tiny":
        return GPT2Config(vocab_size=vocab_size, n_positions=128, n_embd=64,
                          n_layer=2, n_head=4)
    if size == "small":
        return GPT2Config(vocab_size=vocab_size, n_positions=512, n_embd=256,
                          n_layer=6, n_head=8)
    return GPT2Config(vocab_size=max(vocab_size, 50257))


def _make_tokenizer(args, records_paths):
    from zs_aac_tpu.data.banks import iter_bank
    from zs_aac_tpu.data.tokenizer import GPT2BPETokenizer, WordTokenizer

    if args.tokenizer:
        if args.tokenizer.endswith(".model"):
            # SentencePiece model (the reference's Mistral tokenizer path,
            # /root/reference/models/caption_model.py:236-238)
            from zs_aac_tpu.data.sentencepiece import SentencePieceTokenizer

            sp = SentencePieceTokenizer.from_file(args.tokenizer)
            # Stop on the '.' piece as it appears at caption end (captions
            # end "....", so the trained final token is the word-attached
            # period piece, not eos — eos is never in the training targets).
            # Look the piece up directly; an example segmentation's tail is
            # fragile (a vocab can hold "a." as one piece, whose id is not
            # the period). Fall back to the byte piece, then eos.
            stop = sp.piece_to_id.get(".")
            if stop is None:
                stop = sp.byte_pieces.get(ord("."), sp.eos_id)
            return sp, stop
        tok = GPT2BPETokenizer.from_dir(args.tokenizer)
        return tok, tok.encode(".")[0]
    corpus = []
    for path in records_paths:
        for rec in iter_bank(path):
            cap = rec.get("caption")
            if isinstance(cap, list):
                corpus.extend(str(c["caption"]) for c in cap)
            elif cap:
                corpus.append(str(cap))
    corpus.append("there are something in this audio.")
    tok = WordTokenizer.from_corpus(corpus)
    return tok, tok.stop_token_id


def _mean_loss(losses):
    """One stacked device fetch instead of a per-step scalar round-trip."""
    if not losses:
        return 0.0
    import jax.numpy as jnp

    return float(jnp.stack(losses).mean())


def run_validation(params, ccfg, val_ds, tokenizer, stop_id, key2refs, beam_size=3):
    """Beam-decode the val set (grouped by hard-prompt length) and score CIDEr."""
    import jax.numpy as jnp

    from zs_aac_tpu.decoding.beam import beam_search_batched
    from zs_aac_tpu.eval.captioning import eval_prediction
    from zs_aac_tpu.models.caption import caption_embeddings

    import jax

    # jitted: the eager per-chunk mapper assembly dispatched op-by-op
    # through the remote tunnel (VERDICT r4 #5); one trace per hp shape
    emb_fn = jax.jit(lambda p, pr, hp: caption_embeddings(p, ccfg, pr, hp))

    groups = defaultdict(list)
    for i in range(len(val_ds)):
        item = val_ds[i]
        h = len(item.get("hard_prompt", ())) if "hard_prompt" in item else 0
        groups[h].append(item)

    key2pred = {}
    # Batched-beam device programs, one compile per hard-prompt length (the
    # reference decodes bs=1 per clip, predict_prompt.py:129-144). Chunks
    # are padded to a fixed size so each length compiles exactly once and
    # the beam-expanded KV cache stays bounded.
    CHUNK = 32
    for h, items in groups.items():
        for s in range(0, len(items), CHUNK):
            chunk = items[s : s + CHUNK]
            n = len(chunk)
            padded = chunk + [chunk[-1]] * (CHUNK - n)
            prefix = jnp.asarray(np.stack([it["prefix"] for it in padded]))
            hp = (
                jnp.asarray(np.stack([it["hard_prompt"] for it in padded]))
                if h else None
            )
            emb = emb_fn(params, prefix, hp)
            toks, lens, scores = beam_search_batched(
                params["gpt2"], ccfg.gpt2, emb, beam_size, 67, stop_id
            )
            toks, lens, scores = np.asarray(toks), np.asarray(lens), np.asarray(scores)
            for b, it in enumerate(chunk):
                best = int(np.argmax(scores[b]))
                ids = list(toks[b, best][: int(lens[b, best])])
                key2pred[it["audio_id"]] = [tokenizer.decode(ids).lower()]
    out = eval_prediction(key2refs, key2pred, metrics=("CIDEr",))
    return out["CIDEr"], key2pred


def main(argv=None):
    from zs_aac_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # cross-CLI compile reuse (VERDICT r4 #5)
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from zs_aac_tpu.data.datasets import (
        CaptionBankDataset,
        CaptionBankTestDataset,
        CaptionDatasetConfig,
        caption_batches,
    )
    from zs_aac_tpu.models.caption import CaptionConfig
    from zs_aac_tpu.train.caption_trainer import (
        create_caption_state,
        make_caption_optimizer,
        make_caption_train_step,
    )
    from zs_aac_tpu.train.optim import linear_warmup_lr
    from zs_aac_tpu.data.prefetch import prefetch
    from zs_aac_tpu.utils.checkpoints import (
        criterion_improver,
        join_async_saves,
        load_params,
        save_params_async,
    )

    np.random.seed(args.seed)

    tokenizer, stop_id = _make_tokenizer(args, args.data)

    dcfg = CaptionDatasetConfig(
        prefix_length=args.prefix_length,
        normalize_prefix=args.normalize_prefix,
        use_audio_embedding=args.use_audio_embedding,
        use_related_text=args.use_related_text,
        percentage=args.percentage,
        sound_effect_path=args.sound_effect,
        sound_effect_k=3,
        mask_probability=args.mask_probability,
        seed=args.seed,
    )
    dataset = CaptionBankDataset(args.data, tokenizer, dcfg)
    val_ds = CaptionBankTestDataset(args.valdata, tokenizer, dcfg)
    key2refs = val_ds.references()

    prefix_dim = args.prefix_dim or (1024 if args.is_rn else 512)
    ccfg = CaptionConfig(
        prefix_length=args.prefix_length,
        prefix_size=prefix_dim,
        clip_length=args.prefix_length_clip,
        num_layers=args.num_layers,
        mapping_type=args.mapping_type,
        only_prefix=args.only_prefix,
        only_soft_prompt=args.only_soft_prompt,
        sound_effect_num=args.sound_effect_num,
        gpt2=_gpt2_config(args.gpt2_size, tokenizer.vocab_size),
    )

    # run dir contract (train_prompt.py:98-105)
    out_dir = os.path.join(args.out_dir, time.strftime("%b-%d-%H-%M-%S", time.localtime()))
    os.makedirs(out_dir, exist_ok=True)
    args.output_dir = out_dir
    with open(os.path.join(out_dir, "params.json"), "w") as f:
        json.dump({**vars(args), "gpt2_vocab_size": ccfg.gpt2.vocab_size}, f)
    logger = logging.getLogger(f"train_caption.{out_dir}")
    logger.setLevel(logging.INFO)
    logger.addHandler(logging.FileHandler(os.path.join(out_dir, "train_caption.log")))
    logger.info("Args: %s", vars(args))

    steps_per_epoch = max(len(dataset) // args.bs, 1)
    schedule = linear_warmup_lr(
        args.lr, args.warmup * steps_per_epoch, args.epochs * steps_per_epoch
    )
    optimizer = make_caption_optimizer(ccfg, schedule, args.weight_decay)
    state = create_caption_state(jax.random.key(args.seed), ccfg, optimizer)
    if args.ckpt_file:
        state.params = load_params(args.ckpt_file, state.params)
    step_fn = make_caption_train_step(ccfg, optimizer, args.noise_variance)

    mesh = None
    if args.data_parallel:
        from zs_aac_tpu.parallel.mesh import make_mesh_for_batch, replicate, shard_batch

        mesh = make_mesh_for_batch(args.bs)
        state = replicate(state, mesh)

    improved = criterion_improver("score")
    rng = jax.random.key(args.seed + 1)
    logger.info("%10s\t%10s\t%10s", "Epoch", "Train loss", "Val score")

    it = 0
    for epoch in range(args.epochs):
        print(f">>> Training epoch {epoch}", flush=True)
        losses = []
        for batch in prefetch(caption_batches(dataset, args.bs, shuffle=True,
                                               seed=args.seed + epoch)):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, loss = step_fn(state, batch, rng)
            # keep the loss ON DEVICE: a float() here is a blocking ~40 ms
            # tunnel round-trip per step that serializes the pipeline
            losses.append(loss)
            it += 1
            if it % args.val_interval == 0:
                score, _ = run_validation(
                    state.params, ccfg, val_ds, tokenizer, stop_id, key2refs
                )
                logger.info("%10d\t%10.3g\t%10.3g", epoch,
                            _mean_loss(losses), score)
                if improved(score):
                    save_params_async(os.path.join(out_dir, "best.pth"),
                                      state.params)
            if args.max_iters and it >= args.max_iters:
                break
        # async: the ~8 MB/s device->host checkpoint stream was ~60 s of
        # blocked train loop per epoch on the remote tunnel (round 5)
        save_params_async(os.path.join(out_dir, "last.pth"), state.params)
        if args.max_iters and it >= args.max_iters:
            break

    # Always run a final validation so short runs still produce best.pth.
    score, _ = run_validation(state.params, ccfg, val_ds, tokenizer, stop_id, key2refs)
    logger.info("final\t%10.3g\t%10.3g", _mean_loss(losses), score)
    if improved(score):
        save_params_async(os.path.join(out_dir, "best.pth"), state.params)
    join_async_saves()
    print(f"run dir: {out_dir}  final CIDEr: {score:.4f}", flush=True)
    return out_dir


if __name__ == "__main__":
    main()
