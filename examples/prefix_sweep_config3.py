#!/usr/bin/env python3
"""BASELINE config 3: beam-5 captioning + PREFIX-LENGTH SWEEP (round-4
VERDICT #9) at AudioCaps-shaped data (10-s clips, ~10-word captions —
the synthetic full-dress corpus is already that shape).

Reuses a completed ``examples/full_dress_config2.py`` workdir (its CLAP
banks and label bank) and, per prefix length Lp in the sweep, chains
through the CLIs on the chip:

  train_prompt  GPT-2 124M + TransformerMapper, --prefix_length Lp
  predict       --isbeam --beam_size 5 --q8 -> scores.txt (full suite)

and records per-Lp: CIDEr / SPIDEr, train + predict wall-clock, and an
isolated beam-5 w8a8+q8 decode-throughput probe (B=64, 67 steps, chained
-dep timing) on the TRAINED weights. Reference anchor for the
hyperparameter surface: ``/root/reference/train_prompt.py:181-220``;
beam-5 eval path ``/root/reference/gpt2_prefix_eval.py:99-158``.

Run: python examples/prefix_sweep_config3.py [full_dress_workdir]
(~15-20 min per Lp on one chip). If the workdir's banks are missing, a
synthetic 1024-d bank set at the SAME shapes/record schema is built in
seconds (``build_synth_workdir``): caption embeddings are deterministic
normalized bag-of-words projections and audio embeddings sit near their
captions' — the zero-shot transfer signal exists by construction, so the
sweep isolates the prefix-length axis (quality trend + per-Lp decode
throughput) without re-running the CLAP stages. Corpus size/epochs are
env-tunable (SWEEP_TRAIN_CLIPS / SWEEP_EVAL_CLIPS / SWEEP_EPOCHS).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LPS = (5, 10, 20, 40)
EPOCHS = os.environ.get("SWEEP_EPOCHS", "4")
EMBED = 1024
SYNTH_MARKER = "SYNTH_BANKS.json"  # bank-provenance stamp (see main)


def build_synth_workdir(root: str) -> None:
    """Banks at full_dress record schema (pipeline/extract.py:191-211,
    pipeline/related.py:105) without the CLAP stages: word vectors are
    seed-hashed gaussians, caption embedding = normalized mean, audio
    embedding = its caption's embedding + small noise."""
    import numpy as np

    from zs_aac_tpu.data.banks import write_bank_list, write_bank_stream

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from full_dress_config2 import SUBJECTS, PLACES, caption_for

    n_train = int(os.environ.get("SWEEP_TRAIN_CLIPS", "200"))
    n_eval = int(os.environ.get("SWEEP_EVAL_CLIPS", "100"))

    wvec = {}

    def word_vec(w):
        if w not in wvec:
            import zlib
            seed = zlib.crc32(("sweep:" + w).encode())  # stable across runs
            wvec[w] = np.random.default_rng(seed).standard_normal(EMBED)
        return wvec[w]

    def text_embed(caption):
        v = np.mean([word_vec(w) for w in caption.split()], axis=0)
        return (v / np.linalg.norm(v)).astype(np.float32)

    os.makedirs(os.path.join(root, "banks", "test", "clap_embedding", "ZS"),
                exist_ok=True)
    rng = np.random.default_rng(0)

    def audio_embed(cap):
        v = text_embed(cap) + 0.05 * rng.standard_normal(EMBED).astype(np.float32)
        return (v / np.linalg.norm(v)).astype(np.float32)

    train = []
    for i in range(n_train):
        cap = caption_for(i)
        ae = audio_embed(cap)[None]
        for _ in range(5):
            train.append({"audio_embedding": ae, "caption": cap,
                          "text_embedding": text_embed(cap)[None],
                          "audio_id": f"train_{i:04d}"})
    # related kNN attachment, same as pipeline/related.py: unique text
    # embeddings bank, top-5 cosine neighbors per record
    uniq, seen = [], set()
    for r in train:
        if r["caption"] not in seen:
            seen.add(r["caption"])
            uniq.append(r["text_embedding"][0])
    bank = np.stack(uniq)
    if len(bank) < 5:
        raise SystemExit(
            f"synth workdir needs >=5 unique captions for the topnumber=5 "
            f"related-kNN contract (pipeline/related.py); got {len(bank)} "
            f"from SWEEP_TRAIN_CLIPS={n_train} — raise SWEEP_TRAIN_CLIPS.")
    for r in train:
        sims = bank @ r["text_embedding"][0]
        r["related_embeddings"] = bank[np.argsort(-sims)[:5]]
    write_bank_stream(os.path.join(root, "train_related.pkl"), train)

    test = [{"audio_embedding": audio_embed(caption_for(i))[None],
             "caption": [{"caption": caption_for(i)} for _ in range(5)],
             "text_embedding": 0, "audio_id": f"eval_{i:04d}"}
            for i in range(n_eval)]
    write_bank_list(os.path.join(root, "banks", "test", "clap_embedding",
                                 "ZS", "data.pkl"), test)

    labels = SUBJECTS + PLACES
    write_bank_list(os.path.join(root, "audioset_label.pkl"),
                    [{"label": l, "label_id": i,
                      "label_embedding": text_embed(l)[None]}
                     for i, l in enumerate(labels)])
    json.dump({"provenance": "synthetic", "n_train": n_train,
               "n_eval": n_eval, "embed": EMBED},
              open(os.path.join(root, SYNTH_MARKER), "w"))
    print(f"[synth workdir] {5*n_train} train records, {n_eval} eval clips, "
          f"{len(labels)} labels -> {root}", flush=True)


def decode_probe(run_dir: str, beam: int = 5, batch: int = 64) -> dict:
    """Isolated beam decode throughput on the trained checkpoint (w8a8+q8,
    67 steps) with the verify-skill chained-dep harness. Rehydrates the
    run dir exactly as ``train/predict_prompt.py:81-137`` does."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    from zs_aac_tpu.decoding.beam import beam_search_batched_q8
    from zs_aac_tpu.models.caption import (
        CaptionConfig,
        caption_embeddings,
        init_caption_model,
    )
    from zs_aac_tpu.models.gpt2 import quantize_gpt2_int8
    from zs_aac_tpu.train.train_prompt import _gpt2_config, _make_tokenizer
    from zs_aac_tpu.utils.checkpoints import load_params

    saved = json.load(open(os.path.join(run_dir, "params.json")))

    class _A:
        tokenizer = None

    tokenizer, stop_id = _make_tokenizer(_A(), saved["data"])
    prefix_dim = saved.get("prefix_dim") or (1024 if saved.get("is_rn")
                                             else 512)
    ccfg = CaptionConfig(
        prefix_length=saved["prefix_length"],
        prefix_size=prefix_dim,
        clip_length=saved.get("prefix_length_clip", saved["prefix_length"]),
        num_layers=saved.get("num_layers", 8),
        mapping_type=saved.get("mapping_type", "mlp"),
        gpt2=_gpt2_config(saved.get("gpt2_size", "base"),
                          saved.get("gpt2_vocab_size", tokenizer.vocab_size)),
    )
    # zeros template via eval_shape (same trick as predict_prompt): eager
    # init just to be overwritten by best.pth paid one-off tunnel compiles
    shapes = jax.eval_shape(lambda k: init_caption_model(k, ccfg),
                            jax.random.key(0))
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    params = load_params(os.path.join(run_dir, "best.pth"), params)
    params = jax.device_put(params)
    gp = jax.device_put(
        jax.jit(lambda p: quantize_gpt2_int8(p, "w8a8"))(params["gpt2"]))
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(
        rng.standard_normal((batch, ccfg.prefix_size)).astype(np.float32))
    emb = jax.jit(lambda p, pr: caption_embeddings(p, ccfg, pr))(
        params, prefix).astype(jnp.bfloat16)

    def chained(e, n, salt):
        # perturbation is data-dependent on t (keeps the chain ordered)
        # AND strictly distinct per call (salt + i): `(t.sum() % 2) * eps`
        # could be a no-op when the parity lands 0, making every call
        # identical — and the tunnel serves identical (executable, args)
        # pairs from a result cache (measured: 24 ms/call "decode" that
        # was pure RTT). See .claude/skills/verify/SKILL.md timing notes.
        t = None
        for i in range(n):
            # stop id -1 is unreachable: the row is the FULL-67-step cost
            # (trained weights emit the real stop id within ~10 steps and
            # the while_loop early-exits, which is the predict-path number
            # — the sweep table's predict_timing — not this row's)
            t, l, s = beam_search_batched_q8(gp, ccfg.gpt2, e, beam, 67,
                                             -1)
            e = e + ((t.sum() % 3).astype(e.dtype) + 1.0) * 1e-3 * (salt + i + 1)
        return t

    def fresh_emb(seed):
        pr = jnp.asarray(np.random.default_rng(seed)
                         .standard_normal((batch, ccfg.prefix_size))
                         .astype(np.float32))
        return jax.jit(lambda p, r: caption_embeddings(p, ccfg, r))(
            params, pr).astype(jnp.bfloat16)

    # warmup covers the decode AND the perturbation ops, then a fetch
    # absorbs any server-side async compile; a throwaway timed single call
    # then absorbs any straggler (an inflated 1-call baseline DEFLATES the
    # difference estimate — observed: Lp=5 read 41.7 ms/call against a
    # 90-169 ms ladder at Lp=10/20/40)
    float(np.asarray(chained(emb, 3, 0))[0, 0, 0])
    e0, e1, e2 = fresh_emb(3), fresh_emb(1), fresh_emb(2)
    np.asarray(chained(e0, 1, 50))
    t0 = time.perf_counter(); np.asarray(chained(e1, 1, 100)); t1 = time.perf_counter() - t0
    n = 6
    t0 = time.perf_counter(); np.asarray(chained(e2, n + 1, 200)); t2 = time.perf_counter() - t0
    per = (t2 - t1) / n
    # the verify-skill sanity check: 1call - per should be ~one tunnel RTT;
    # a negative or >0.5 s residue means a compile leaked into a baseline
    return {"ms_per_call": round(per * 1e3, 1),
            "clips_per_s": round(batch / per, 1),
            "one_call_ms": round(t1 * 1e3, 1),
            "rtt_residue_ms": round((t1 - per) * 1e3, 1)}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--probe":
        # subprocess mode (see the decode-probe call in the sweep loop):
        # a dropped tunnel RPC inside jax hangs the calling process
        # forever, so the probe runs in its own bounded process
        print("PROBE_RESULT " + json.dumps(decode_probe(sys.argv[2])),
              flush=True)
        return
    root = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else
                           "/tmp/full_dress")
    test_bank = os.path.join(root, "banks", "test", "clap_embedding", "ZS",
                             "data.pkl")
    related = os.path.join(root, "train_related.pkl")
    label_bank = os.path.join(root, "audioset_label.pkl")
    paths = {"test bank": test_bank, "related train bank": related,
             "label bank": label_bank}
    missing = [n for n, p in paths.items() if not os.path.exists(p)]
    if missing and len(missing) < len(paths):
        # Partially populated (e.g. an interrupted full_dress run): refuse
        # rather than silently replacing the real artifacts with synthetic
        # ones. Delete the workdir or complete the full_dress run.
        present = [f"{n} ({paths[n]})" for n in paths if n not in missing]
        raise SystemExit(
            "workdir is PARTIALLY populated — refusing to overwrite real "
            f"artifacts with synthetic banks.\n  present: {present}\n"
            f"  missing: {[paths[n] for n in missing]}\n"
            f"Delete {root} for a synthetic sweep, or re-run "
            "examples/full_dress_config2.py to complete it.")
    if missing:
        build_synth_workdir(root)
    provenance = ("synthetic"
                  if os.path.exists(os.path.join(root, SYNTH_MARKER))
                  else "real")

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    out_path = os.path.join(root, "prefix_sweep.json")
    results = json.load(open(out_path)) if os.path.exists(out_path) else {}
    # Provenance stamp: never mix results/weights trained against one bank
    # generation with banks of the other. On mismatch, the stale results
    # file AND the trained run dirs are moved aside (not deleted).
    prior = results.get("_meta", {}).get("bank_provenance")
    if results and prior != provenance:
        suffix = f".stale-{int(time.time())}"
        os.replace(out_path, out_path + suffix)
        for lp in LPS:
            runs = os.path.join(root, f"sweep_runs_lp{lp}")
            if os.path.isdir(runs):
                os.replace(runs, runs + suffix)
        print(f"[provenance] prior results were {prior!r}, banks are now "
              f"{provenance!r} — moved stale results/run dirs to *{suffix}",
              flush=True)
        results = {}
    results["_meta"] = {"bank_provenance": provenance}

    for lp in LPS:
        key = f"Lp{lp}"
        if key in results and "beam5_b64_decode" in results[key]:
            print(f"[{key}] done in prior run — skip", flush=True)
            continue
        runs = os.path.join(root, f"sweep_runs_lp{lp}")
        done = [d for d in (sorted(os.listdir(runs)) if os.path.isdir(runs)
                            else [])
                if os.path.exists(os.path.join(runs, d, "best.pth"))]
        if done:   # resume: training for this Lp finished in a prior run
            run_dir, train_s = os.path.join(runs, done[-1]), None
        else:
            t0 = time.perf_counter()
            subprocess.run([
                sys.executable, "-m", "zs_aac_tpu.train.train_prompt",
                "--data", related, "--valdata", test_bank,
                "--out_dir", runs, "--sound_effect", label_bank,
                "--bs", "40", "--epochs", EPOCHS, "--warmup", "0",
                "--val_interval", "1000000", "--lr", "2e-4",
                "--gpt2_size", "base", "--prefix_length", str(lp),
                "--prefix_length_clip", str(lp),
                "--mapping_type", "transformer", "--num_layers", "8",
                "--noise_variance", "0.016", "--prefix_dim", "1024",
                "--use_related_text", "--normalize_prefix",
            ], check=True, env=env)
            train_s = round(time.perf_counter() - t0, 1)
            run_dir = os.path.join(runs, sorted(os.listdir(runs))[-1])

        if key not in results:   # resume: predict+scores done in a prior run
            t0 = time.perf_counter()
            subprocess.run([
                sys.executable, "-m", "zs_aac_tpu.train.predict_prompt",
                "--test_dir", run_dir, "--data", test_bank,
                "--sound_effect", label_bank,
                "--isbeam", "--beam_size", "5", "--q8",
            ], check=True, env=env)
            predict_s = round(time.perf_counter() - t0, 1)

            scores = {}
            for line in open(os.path.join(run_dir, "scores.txt")):
                if ":" in line and not line.startswith("#"):
                    k, v = line.split(":", 1)
                    try:
                        scores[k.strip()] = float(v)
                    except ValueError:
                        pass
            results[key] = {
                "prefix_length": lp, "train_s": train_s,
                "predict_s": predict_s,
                "cider": scores.get("CIDEr"), "spider": scores.get("SPIDEr"),
                "bleu4": scores.get("Bleu-4"),
                "rouge_l": scores.get("ROUGE_L"),
            }
            # cold-cost split written by the predict driver (VERDICT r4 #5)
            tpath = os.path.join(run_dir, "timing.json")
            if os.path.exists(tpath):
                results[key]["predict_timing"] = json.load(open(tpath))
            json.dump(results, open(out_path, "w"), indent=1)  # survive probe
        # bounded subprocess: a dead tunnel RPC would hang this process
        # forever (it did — round 5, Lp5), and jax gives no client timeout
        probe = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe", run_dir],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        rows = [l for l in probe.stdout.splitlines()
                if l.startswith("PROBE_RESULT ")]
        if probe.returncode != 0 or not rows:
            raise RuntimeError(
                f"decode probe failed for {run_dir}:\n{probe.stdout[-2000:]}"
                f"\n{probe.stderr[-2000:]}")
        results[key]["beam5_b64_decode"] = json.loads(
            rows[-1][len("PROBE_RESULT "):])
        json.dump(results, open(out_path, "w"), indent=1)
        print(f"[{key}] {json.dumps(results[key])}", flush=True)

    print("\nprefix-length sweep (config 3, beam-5, w8a8+q8):")
    for lp in LPS:
        r = results[f"Lp{lp}"]
        print(f"  Lp={lp:<3d} CIDEr {r['cider']:.3f}  SPIDEr {r['spider']:.3f}"
              f"  beam5@B=64 {r['beam5_b64_decode']['clips_per_s']} clips/s"
              f"  train {r['train_s']} s  predict {r['predict_s']} s")


if __name__ == "__main__":
    main()
