#!/usr/bin/env python3
"""MAGIC decode throughput harness (the BASELINE.md MAGIC rows).

Measures ``magic_search_batched`` (greedy) and
``generate_beam_magic_batched`` (beam) wall-clock clips/s on the real
chip at the production serving shape: GPT-2 124M LM (50,257-token
byte-level BPE decode surface), bert-base CLAP text tower served through
the production ``make_magic_scorer``/``_load_ase_text_encoder`` path
(saved ASE checkpoint + WordPiece vocab sidecar), width 25. Reference
anchor: ``/root/reference/gpt2_prefix_eval.py:396-534`` (magic_search)
and ``:602-689`` (beam+magic); the reference decodes one clip at a time
on GPU, this framework batches clips through every device program and
every host boundary (BASELINE.md MAGIC notes).

The round-3/-4 rows were measured with an ad-hoc /tmp script that the
/tmp wipe destroyed; this commits the harness so every future row is
reproducible. Weights are random (throughput does not depend on weight
values); vocabularies are synthetic at REAL sizes with realistic word
lengths, so the host-side cost terms (BPE decode, incremental WordPiece,
candidate dedup) are exercised at production scale. ``--steps 67`` with
the default unreachable stop id is the full-67-step worst case
(truncation saturates every clip's candidates, the late-step dedup
collapse regime); ``--steps 20`` is the caption-realistic row.

Timing protocol (see .claude/skills/verify/SKILL.md): one full warmup
decode absorbs server-side compiles, then each timed run uses FRESH
prefix/audio inputs (the axon tunnel serves identical (executable, args)
pairs from a result cache). The loop fetches a packed array every step,
so wall-clock is honestly synchronized by construction.

Run:  python examples/bench_magic.py --mode greedy --B 128 --steps 67
      python examples/bench_magic.py --mode beam --B 32 --beam 5
Flags: --q8_tower (int8 text tower), --q8 (int8 LM weights), --runs N.
Prints one JSON row per timed run plus a summary row.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORK = os.environ.get("BENCH_MAGIC_DIR", "/tmp/bench_magic")
GPT2_VOCAB = 50257
BERT_VOCAB = 30522
EMBED = 1024
LP = 10

_ONSETS = ["b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p",
           "r", "s", "t", "v", "w", "z", "ch", "sh", "th", "br", "cr",
           "st", "tr"]
_NUCLEI = ["a", "e", "i", "o", "u", "ai", "ea", "ou"]
_CODAS = ["", "n", "t", "r", "l", "s", "ck", "ng", "sh", "rd"]


def _words(n):
    """Deterministic realistic-length word list (5-12 chars)."""
    out = []
    syl = [o + v + c for o in _ONSETS for v in _NUCLEI for c in _CODAS]
    for i in range(n):
        a = syl[i % len(syl)]
        b = syl[(i * 7919 + i // len(syl)) % len(syl)]
        out.append(a + b if i >= len(syl) else a)
    return out


def build_workdir(root):
    """Synthetic-but-real-scale vocabularies + a saved ASE checkpoint
    (bf16 bert-base text tower — the dtype the round-3 rows used and the
    serving dtype of a bf16-pretrained ASE, train/pretrain.py:145)."""
    os.makedirs(root, exist_ok=True)
    marker = os.path.join(root, "READY")
    if os.path.exists(marker):
        return
    words = _words(GPT2_VOCAB)

    # GPT-2 file-format vocab: 256 byte tokens + "Ġword" entries. The
    # byte-encoder maps space -> "Ġ" and ASCII letters to themselves, so
    # these decode to " word" (data/tokenizer.py:48-116).
    from zs_aac_tpu.data.tokenizer import _bytes_to_unicode

    byte_toks = list(_bytes_to_unicode().values())
    vocab = {t: i for i, t in enumerate(byte_toks)}
    for w in words:
        if len(vocab) == GPT2_VOCAB:
            break
        vocab.setdefault("Ġ" + w, len(vocab))
    with open(os.path.join(root, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(root, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")

    # WordPiece vocab at bert-base size: most LM words resolve as whole
    # words (~1.3 pieces/word like real text); the rest longest-match
    # against letters/##suffix pieces.
    wp = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    wp += list("abcdefghijklmnopqrstuvwxyz0123456789")
    wp += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    syl = sorted({s for s in (_ONSETS + _NUCLEI + _CODAS) if s})
    wp += ["##" + s for s in syl]
    seen = set(wp)
    for w in words[: BERT_VOCAB - len(wp) - 64]:
        if w not in seen:
            wp.append(w)
            seen.add(w)
    while len(wp) < BERT_VOCAB:
        wp.append("[unused%d]" % len(wp))
    with open(os.path.join(root, "bert_vocab.txt"), "w") as f:
        f.write("\n".join(wp) + "\n")

    # ASE checkpoint: bert-base text tower (the measured component), tiny
    # Cnn14 audio tower (unused by the scorer). Leaves are filled host-side
    # from eval_shape — an eager init would dispatch op-by-op through the
    # remote tunnel.
    import jax
    import jax.numpy as jnp

    from zs_aac_tpu.models.ase import ASE, ASEConfig
    from zs_aac_tpu.utils.checkpoints import save_params

    acfg = dict(embed_size=EMBED, audio_channels=(4, 8),
                text_model="bert-base-uncased", spec_augmentation=False)
    ase = ASE(ASEConfig(**acfg))
    shapes = jax.eval_shape(
        lambda k: ase.init(
            {"params": k},
            jnp.zeros((1, 64, 64)), jnp.zeros((1, 8), jnp.int32),
            jnp.ones((1, 8), jnp.int32), jnp.arange(1), train=False,
        ),
        jax.random.key(0),
    )
    rng = np.random.default_rng(0)
    leaves, treedef = jax.tree.flatten(shapes)
    filled = [
        np.asarray(0.02 * rng.standard_normal(l.shape), np.float32)
        .astype(jnp.bfloat16 if np.issubdtype(l.dtype, np.floating) else l.dtype)
        for l in leaves
    ]
    variables = jax.tree.unflatten(treedef, filled)
    ck = os.path.join(root, "ase.pth")
    save_params(ck, variables)
    json.dump(
        {"ase_config": {**acfg, "audio_channels": list(acfg["audio_channels"])},
         "bert_tokenizer": os.path.join(root, "bert_vocab.txt")},
        open(ck + ".json", "w"),
    )
    open(marker, "w").write("ok\n")


def _print_trace_census(tdir, wall_s):
    """Sum device-lane op durations from the newest jax.profiler trace and
    print the top entries — the itemization tool the BASELINE MAGIC notes
    cite (device total vs wall splits device-bound from host/RTT-bound)."""
    import glob
    import gzip

    traces = sorted(glob.glob(os.path.join(tdir, "plugins/profile/*/*.trace.json.gz")),
                    key=os.path.getmtime)
    if not traces:
        print("[profile] no trace written", flush=True)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_name = {e["pid"]: e.get("args", {}).get("name", "")
                for e in events if e.get("ph") == "M"
                and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower()}
    totals = {}
    dev_total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            totals[e["name"]] = totals.get(e["name"], 0.0) + e["dur"]
            dev_total += e["dur"]
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
    print(json.dumps({"profile_device_total_ms": round(dev_total / 1e3, 1),
                      "profile_wall_ms": round(wall_s * 1e3, 1)}), flush=True)
    for name, us in top:
        print(f"  {us/1e3:9.1f} ms  {name[:110]}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["greedy", "beam"], default="greedy")
    p.add_argument("--B", type=int, default=128)
    p.add_argument("--steps", type=int, default=67)
    p.add_argument("--width", type=int, default=25)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--stop_id", type=int, default=-1,
                   help="-1 = unreachable (full-N-step worst case)")
    p.add_argument("--q8", action="store_true", help="int8 LM weights")
    p.add_argument("--q8_tower", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="jax.profiler-trace the first timed run and print "
                        "the device-op time census (top 25 by total time)")
    args = p.parse_args()

    build_workdir(WORK)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from zs_aac_tpu.data.tokenizer import GPT2BPETokenizer
    from zs_aac_tpu.decoding.magic import (
        generate_beam_magic_batched,
        magic_search_batched,
        make_magic_scorer,
    )
    from zs_aac_tpu.models.gpt2 import GPT2Config, init_gpt2

    tokenizer = GPT2BPETokenizer.from_dir(WORK)
    cfg = GPT2Config()            # 124M: vocab 50257, 12L, 768h
    params = jax.jit(lambda k: init_gpt2(k, cfg))(jax.random.key(0))
    if args.q8:
        from zs_aac_tpu.models.gpt2 import quantize_gpt2_int8

        params = jax.jit(lambda p: quantize_gpt2_int8(p, "w8a8"))(params)

    scorer = make_magic_scorer(os.path.join(WORK, "ase.pth"), tokenizer,
                               q8_tower=args.q8_tower)

    rng = np.random.default_rng(7)

    def fresh_inputs():
        pre = jnp.asarray(
            0.02 * rng.standard_normal((args.B, LP, cfg.n_embd)), jnp.float32
        )
        aud = rng.standard_normal((args.B, EMBED)).astype(np.float32)
        aud /= np.linalg.norm(aud, axis=-1, keepdims=True)
        return pre, aud

    def decode(pre, aud):
        if args.mode == "greedy":
            return magic_search_batched(
                params, cfg, pre, aud, scorer, beam_width=args.width,
                decoding_len=args.steps, stop_token_id=args.stop_id,
            )
        out, _ = generate_beam_magic_batched(
            params, cfg, pre, aud, scorer, beam_size=args.beam,
            magic_width=args.width, entry_length=args.steps,
            stop_token_id=args.stop_id,
        )
        return out

    label = dict(mode=args.mode, B=args.B, steps=args.steps,
                 width=args.width, beam=args.beam if args.mode == "beam" else None,
                 q8=args.q8, q8_tower=args.q8_tower)

    pre, aud = fresh_inputs()
    t0 = time.perf_counter()
    decode(pre, aud)              # warmup: absorbs every server compile
    warm = time.perf_counter() - t0
    print(json.dumps({**label, "warmup_wall_s": round(warm, 2)}), flush=True)

    rates = []
    for r in range(args.runs):
        pre, aud = fresh_inputs()
        t0 = time.perf_counter()
        if args.profile and r == 0:
            from zs_aac_tpu.utils.profiling import trace

            tdir = "/tmp/magic_profile"
            with trace(tdir):
                toks = decode(pre, aud)
        else:
            toks = decode(pre, aud)
        wall = time.perf_counter() - t0
        if args.profile and r == 0:
            _print_trace_census(tdir, wall)
        steps_run = max(len(t) for t in toks) if args.mode == "greedy" else args.steps
        rates.append(args.B / wall)
        print(json.dumps({**label, "run": r, "wall_s": round(wall, 3),
                          "clips_per_s": round(args.B / wall, 2),
                          "ms_per_step": round(1e3 * wall / steps_run, 2),
                          "steps_run": steps_run}), flush=True)
    print(json.dumps({**label, "clips_per_s_mean": round(float(np.mean(rates)), 2),
                      "clips_per_s_spread": round(float(np.ptp(rates)), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
