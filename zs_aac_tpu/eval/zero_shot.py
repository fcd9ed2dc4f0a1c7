"""Zero-shot audio classification (CLI).

Capability parity with ``/root/reference/retrieval/zero_shot_classification.py``:
encode class names as text prompts, encode each clip's audio padded to 10 s,
predict argmax softmax(audio @ text.T), report per-fold and mean accuracy.
Supports the UrbanSound8K layout (active in the reference, :73-106) and the
ESC-50 layout (present but commented out there, :37-70) — here both are
first-class via ``--dataset``.

TPU adaptation: clips are batched (not bs=1) through the jitted audio
encoder.

Run: ``python -m zs_aac_tpu.eval.zero_shot --dataset urbansound8k ...``
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, List, Sequence

import numpy as np

__all__ = ["classify", "main"]


def classify(
    encode_audio: Callable,
    text_embeds: np.ndarray,          # [C, E]
    wave_batches,                     # iterable of (waves [B, T], labels [B])
) -> float:
    """Mean accuracy of argmax audio-text similarity."""
    import jax.numpy as jnp

    correct = total = 0
    for waves, labels in wave_batches:
        emb = np.asarray(encode_audio(jnp.asarray(waves)))
        sims = emb @ text_embeds.T
        pred = sims.argmax(axis=1)
        correct += int((pred == np.asarray(labels)).sum())
        total += len(labels)
    return correct / max(total, 1)


def _batched(paths: Sequence[str], labels: Sequence[int], batch: int, sr: int,
             pad_seconds: int = 10):
    from zs_aac_tpu.data.audio_io import load_audio, pad_or_truncate

    n = pad_seconds * sr
    for s in range(0, len(paths), batch):
        sel = slice(s, s + batch)
        waves = np.stack([pad_or_truncate(load_audio(p, sr), n) for p in paths[sel]])
        yield waves, np.asarray(labels[sel])


def main(argv=None):
    from zs_aac_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # cross-CLI compile reuse (VERDICT r4 #5)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--ckpt", required=True, help="ASE train-state checkpoint")
    p.add_argument("--dataset", choices=["urbansound8k", "esc50"],
                   default="urbansound8k")
    p.add_argument("--data_root", default="data")
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args(argv)

    import pandas as pd
    import yaml
    import jax
    import jax.numpy as jnp

    from zs_aac_tpu.data.bert_tokenizer import WordPieceTokenizer
    from zs_aac_tpu.ops.logmel import LogMelConfig
    from zs_aac_tpu.train.contrastive import create_ase_state, make_encode_fns
    from zs_aac_tpu.train.optim import cosine_lr, get_optimizer
    from zs_aac_tpu.train.pretrain import build_ase_from_config
    from zs_aac_tpu.utils.checkpoints import restore_train_state

    with open(args.config) as f:
        config = yaml.safe_load(f)
    tokenizer = WordPieceTokenizer.from_file(config["text_encoder_args"]["vocab"])
    ase, _ = build_ase_from_config(config)
    mel_cfg = LogMelConfig.from_dict(config["audio_args"])
    opt = get_optimizer(cosine_lr(1e-4, 1, 10))
    state = create_ase_state(jax.random.key(0), ase, opt,
                             spec_shape=(2, 101, mel_cfg.n_mels), text_len=30)
    state = restore_train_state(args.ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    encode_audio, encode_text = make_encode_fns(ase, mel_cfg)

    sr = config["audio_args"]["sr"]
    if args.dataset == "urbansound8k":
        df = pd.read_csv(f"{args.data_root}/UrbanSound8K/metadata/UrbanSound8K.csv")
        df = df.sort_values(by=["classID"])
        classes: List[str] = [x.replace("_", " ") for x in df["class"].unique()]
        folds = range(1, 11)

        def fold_items(fold):
            fd = df[df["fold"] == fold]
            paths = [
                f"{args.data_root}/UrbanSound8K/audio/fold{fold}/{n}"
                for n in fd["slice_file_name"]
            ]
            return paths, list(fd["classID"])
    else:
        df = pd.read_csv(f"{args.data_root}/ESC-50/meta/esc50.csv")
        df = df.sort_values(by=["target"])
        classes = [x.replace("_", " ") + " can be heard" for x in df["category"].unique()]
        folds = range(1, 6)

        def fold_items(fold):
            fd = df[df["fold"] == fold]
            paths = [f"{args.data_root}/ESC-50/audio/{n}" for n in fd["filename"]]
            return paths, list(fd["target"])

    ids, mask = tokenizer.batch_encode(classes, max_length=30)
    text_embeds = np.asarray(encode_text(variables, jnp.asarray(ids), jnp.asarray(mask)))

    accs = []
    for fold in folds:
        paths, labels = fold_items(fold)
        acc = classify(
            lambda w: encode_audio(variables, w),
            text_embeds,
            _batched(paths, labels, args.batch, sr),
        )
        print(f"Fold {fold} Accuracy {acc}")
        accs.append(acc)
    print(f"{args.dataset} Accuracy {np.mean(accs)}")
    return float(np.mean(accs))


if __name__ == "__main__":
    main()
