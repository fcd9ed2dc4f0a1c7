#!/usr/bin/env python3
"""Full-dress rehearsal of BASELINE config 2 at REFERENCE scale (round-4
VERDICT #3): the complete zero-shot AAC chain through the CLIs on one chip,
with every model at the reference's real geometry —

  CLAP   = HTSAT (spec 256, embed 96, depths 2/2/6/2, heads 4/8/16/32)
           + BERT-base (12L, 768h) -> 1024-d joint space
  mapper = 8-layer TransformerMapper, prefix_length 10, prefix_dim 1024
  LM     = GPT-2 124M (12L, 768h)

over a synthetic corpus of N_CLIPS 10-s 44.1 kHz wavs (the native-rate
int16 upload + on-device resample path), chaining:

  1. prepare            wav corpus -> wav.csv/text.json manifests
  2. pretrain           1-epoch CLAP contrastive warmup (CLI) -> ckpt
  3. extract            audio+text embedding banks (CLI)
  4. extract --corpus   AudioSet-style label bank (CLI)
  5. related            kNN related-caption augmentation (CLI)
  6. train_prompt       zero-shot captioner, GPT-2 124M (CLI)
  7. predict_prompt     greedy AND beam-3 decode + scores.txt with the
                        full metric suite incl. pure-Python SPICE/SPIDEr

Per-stage wall-clock is recorded to <root>/stage_times.json and printed —
the numbers land in BASELINE.md. Reference anchor:
``/root/reference/predict_prompt.py:104-181`` and call stacks SURVEY §3.

Run: python examples/full_dress_config2.py [workdir] (~25-40 min one chip)
"""

import json
import os
import subprocess
import sys
import time
import wave

import numpy as np
import pandas as pd
import yaml

N_CLIPS = int(os.environ.get("N_CLIPS", "300"))
SR = 44100

SUBJECTS = ["dog", "rain", "wind", "bird", "car", "horn", "water", "crowd",
            "engine", "bell", "thunder", "stream", "hammer", "train", "frog",
            "siren"]
PLACES = ["park", "street", "forest", "house", "station", "field", "market",
          "garage"]
VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", ",", "a", "the", "is",
         "of", "in", "this", "audio", "sound", "heard", "loud", "soft",
         "background", "near", "far", "and", "recording", "there", "are",
         "can", "be"] + SUBJECTS + PLACES


def caption_for(i: int) -> str:
    s = SUBJECTS[i % len(SUBJECTS)]
    p = PLACES[(i // len(SUBJECTS)) % len(PLACES)]
    # 9-11 words: inside the reference's 8..20-word stream filter
    return f"a loud {s} sound is heard near the {p} ."


def synth_corpus(root: str, n: int):
    """Per-class tone mixtures at 44.1 kHz; captions name the class."""
    ann = os.path.join(root, "clotho_raw", "annotation")
    aud = os.path.join(root, "clotho_raw", "audio", "dev")
    os.makedirs(ann, exist_ok=True)
    os.makedirs(aud, exist_ok=True)
    rows = []
    t = np.arange(SR * 10) / SR
    for i in range(n):
        k = i % len(SUBJECTS)
        rng = np.random.default_rng(i)
        x = 0.25 * np.sin(2 * np.pi * 150 * (k + 1) * t)
        x += 0.1 * np.sin(2 * np.pi * 90 * (k + 3) * t + rng.random())
        x += 0.02 * rng.standard_normal(len(t))
        name = f"clip_{i:04d}.wav"
        if not os.path.exists(os.path.join(aud, name)):
            with wave.open(os.path.join(aud, name), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(SR)
                w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
        cap = caption_for(i)
        rows.append({"file_name": name,
                     **{f"caption_{j}": cap for j in range(1, 6)}})
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(ann, "dev.csv"), index=False)
    df.to_csv(os.path.join(ann, "eval.csv"), index=False)
    os.makedirs(os.path.join(root, "clotho_raw", "audio", "eval"), exist_ok=True)
    for name in df["file_name"]:
        dst = os.path.join(root, "clotho_raw", "audio", "eval", name)
        if not os.path.exists(dst):
            os.link(os.path.join(root, "clotho_raw", "audio", "dev", name), dst)
    return os.path.join(root, "clotho_raw")


def main():
    root = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "full_dress")
    os.makedirs(root, exist_ok=True)
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    times_path = os.path.join(root, "stage_times.json")
    # resume guard: a stage with a recorded time already completed in a prior
    # (possibly interrupted) run against the same workdir — skip it.
    times = json.load(open(times_path)) if os.path.exists(times_path) else {}

    def run(stage, *args):
        if stage in times:
            print(f"\n[{stage}] done in prior run ({times[stage]} s) — skip",
                  flush=True)
            return
        print(f"\n[{stage}] $ python -m {' '.join(args)}", flush=True)
        t0 = time.perf_counter()
        subprocess.run([sys.executable, "-m", *args], check=True, env=env)
        times[stage] = round(time.perf_counter() - t0, 1)
        json.dump(times, open(os.path.join(root, "stage_times.json"), "w"),
                  indent=1)
        print(f"[{stage}] {times[stage]} s", flush=True)

    raw = synth_corpus(root, N_CLIPS)
    with open(os.path.join(root, "bert_vocab.txt"), "w") as f:
        f.write("\n".join(VOCAB) + "\n")

    prepared = os.path.join(root, "prepared")
    run("1_prepare", "zs_aac_tpu.pipeline.prepare", "clotho", raw, prepared,
        "--version", "1")
    for split in ("train", "val", "test"):
        dst = os.path.join(prepared, split)
        if not os.path.exists(dst):
            os.symlink(os.path.join(prepared, "dev"), dst)

    tj = json.load(open(os.path.join(prepared, "dev", "text.json")))
    wav = pd.read_csv(os.path.join(prepared, "dev", "wav.csv"), sep="\t")
    id2f = dict(zip(wav["audio_id"], wav["file_name"]))
    data = [{"audio": id2f[a["audio_id"]],
             "caption": a["captions"][0]["caption"], "id": i, "duration": 10.0}
            for i, a in enumerate(tj["audios"])]
    manifest = os.path.join(root, "pretrain.json")
    json.dump({"num_captions_per_audio": 1, "data": data}, open(manifest, "w"))

    # reference-scale CLAP config (settings/pretrain.yaml geometry; short run)
    cfg = {
        "exp_name": "dress", "seed": 20, "embed_size": 1024, "temp": 0.07,
        "embed_regularization": True, "json_files": [manifest],
        "blacklist": None, "resume": False, "val_datasets": [],
        "data_root": root, "output_dir": os.path.join(root, "outputs"),
        "compute_dtype": "bfloat16",
        "audio_args": {"sr": 32000, "n_fft": 1024, "hop_length": 320,
                       "f_min": 50, "f_max": 14000, "n_mels": 64,
                       "max_length": 10, "mono": True},
        "audio_encoder_args": {"type": "transformer", "model": "HTSAT",
                               "pretrained": False, "freeze": False},
        "data_args": {"batch_size": 32, "num_workers": 0},
        "text_encoder_args": {"type": "bert-base-uncased",
                              "vocab": os.path.join(root, "bert_vocab.txt")},
        "optim_args": {"lr": 5e-5, "scheduler": "cosine",
                       "optimizer_name": "adam", "betas": [0.9, 0.999],
                       "eps": 1e-8, "momentum": 0.9, "warmup_epochs": 0,
                       "weight_decay": 0.0},
        "training": {"spec_augmentation": True, "epochs": 1, "clip_grad": 2,
                     "dropout": 0.2},
    }
    cfg_path = os.path.join(root, "config.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    run("2_pretrain", "zs_aac_tpu.train.pretrain", "-c", cfg_path)
    ckpt = os.path.join(root, "outputs", "dress_HTSAT_lr_5e-05_seed_20",
                        "models", "best_model.ckpt")
    assert os.path.exists(ckpt), ckpt
    cfg["pretrain_path"] = ckpt
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    run("3_extract_banks", "zs_aac_tpu.pipeline.extract", "--config", cfg_path,
        "--dataset_path", prepared, "--out_path", os.path.join(root, "banks"),
        "--batch", "32")

    labels_csv = os.path.join(root, "labels.csv")
    pd.DataFrame({"display_name": SUBJECTS + PLACES}).to_csv(labels_csv,
                                                             index=False)
    label_bank = os.path.join(root, "audioset_label.pkl")
    run("4_label_bank", "zs_aac_tpu.pipeline.extract", "--config", cfg_path,
        "--corpus", "audioset", "--text_input", labels_csv,
        "--out_path", label_bank)

    train_bank = os.path.join(root, "banks", "train", "clap_embedding", "ZS",
                              "data.pkl")
    test_bank = os.path.join(root, "banks", "test", "clap_embedding", "ZS",
                             "data.pkl")
    related = os.path.join(root, "train_related.pkl")
    run("5_related_knn", "zs_aac_tpu.pipeline.related", "--input_path",
        train_bank, "--output_path", related, "--topnumber", "5")

    # 6: reference hyperparameters (train_prompt.py:181-220): GPT-2 124M,
    # TransformerMapper 8 layers, prefix 10, bs 40, noise sqrt(0.016);
    # shortened to 4 epochs over the synthetic corpus.
    run("6_train_prompt", "zs_aac_tpu.train.train_prompt",
        "--data", related, "--valdata", test_bank,
        "--out_dir", os.path.join(root, "caption_runs"),
        "--sound_effect", label_bank,
        "--bs", "40", "--epochs", "4", "--warmup", "0",
        "--val_interval", "150", "--lr", "2e-4",
        "--gpt2_size", "base", "--prefix_length", "10",
        "--prefix_length_clip", "10", "--mapping_type", "transformer",
        "--num_layers", "8", "--noise_variance", "0.016",
        "--prefix_dim", "1024", "--use_related_text", "--normalize_prefix")
    runs = os.path.join(root, "caption_runs")
    run_dir = os.path.join(runs, sorted(os.listdir(runs))[-1])

    def _timing(tag):
        p = os.path.join(run_dir, "timing.json")
        return {tag: json.load(open(p))} if os.path.exists(p) else {}

    run("7_predict_greedy", "zs_aac_tpu.train.predict_prompt",
        "--test_dir", run_dir, "--data", test_bank,
        "--sound_effect", label_bank)
    greedy_scores = open(os.path.join(run_dir, "scores.txt")).read()
    timing = _timing("greedy")            # 7b overwrites timing.json too
    run("7_predict_beam", "zs_aac_tpu.train.predict_prompt",
        "--test_dir", run_dir, "--data", test_bank,
        "--sound_effect", label_bank, "--isbeam")
    timing.update(_timing("beam"))

    print("\n--- greedy scores.txt ---\n" + greedy_scores)
    print("--- beam scores.txt ---")
    print(open(os.path.join(run_dir, "scores.txt")).read())
    if timing:   # cold-cost split per predict stage (VERDICT r4 weak #5)
        print("predict timing split:", json.dumps(timing, indent=1))
        json.dump(timing, open(os.path.join(root, "predict_timing.json"),
                               "w"), indent=1)
    preds = json.load(open(os.path.join(run_dir, "output.txt")))["predictions"]
    print("sample predictions:")
    for p in preds[:5]:
        print(" ", p["filename"], "->", p["caption"][:70])
    print("\nstage wall-clock (s):", json.dumps(times, indent=1))
    print(f"full-dress config-2 chain complete; artifacts in {root}")


if __name__ == "__main__":
    main()
