#!/usr/bin/env python3
"""Headline benchmark: zero-shot caption decode throughput on TPU.

Measures the flagship pipeline — CLAP prefix -> mapper -> GPT-2 (124M)
KV-cached greedy decode, 67 steps (the reference predict path,
``/root/reference/predict_prompt.py:129-144`` / ``gpt2_prefix_eval.py:161``)
— and prints ONE JSON line.

``vs_baseline`` compares against the reference implementation's measured
CPU throughput: PyTorch GPT2LMHeadModel, full-sequence recompute per step
(no KV cache), batch size 1, as the reference decodes. Measured on this
host (1 vCPU): 182.6 ms/step -> 0.082 captions/sec for a 67-step caption.
Re-measure with ``--measure-cpu``.

The default decode path is the fastest VALIDATED one: int8 weights with
true-int8 matmuls (w8a8) + int8 KV cache (q8). Validation = exact-caption
agreement with the float path on trained weights plus unchanged CIDEr
(tests/test_quantized_decode.py); ``--mode bf16`` measures the bf16
weights + bf16 cache path.

Timing method: the axon TPU tunnel caches identical executions and
``block_until_ready`` is unreliable, so N calls are chained with a data
dependency and timed against a 1-call baseline (see
.claude/skills/verify/SKILL.md).
"""

import argparse
import json
import sys
import time

CPU_REFERENCE_CAPTIONS_PER_SEC = 0.082  # measured 2026-08-16, see docstring


def measure_cpu_reference(steps=20):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    m = GPT2LMHeadModel(GPT2Config()).eval()
    emb = torch.randn(1, 10, 768) * 0.02
    with torch.no_grad():
        m(inputs_embeds=emb)
        gen = emb
        t0 = time.perf_counter()
        for _ in range(steps):
            out = m(inputs_embeds=gen)
            nxt = out.logits[:, -1].argmax(-1)
            gen = torch.cat([gen, m.transformer.wte(nxt)[:, None]], dim=1)
        per_step = (time.perf_counter() - t0) / steps
    return 1.0 / (per_step * 67)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--entry-length", type=int, default=67)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--measure-cpu", action="store_true")
    ap.add_argument("--mode", choices=["w8a8+q8", "q8", "bf16"], default="w8a8+q8",
                    help="decode path; the default is the fastest path whose "
                         "exact-caption agreement is validated on learned "
                         "weights (tests/test_quantized_decode.py)")
    args = ap.parse_args()

    baseline = CPU_REFERENCE_CAPTIONS_PER_SEC
    if args.measure_cpu:
        baseline = measure_cpu_reference()
        print(f"cpu reference: {baseline:.4f} captions/sec", file=sys.stderr)

    import numpy as np
    import jax

    try:  # persistent compile cache: the driver re-runs bench every round
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    # The remote-attached TPU tunnel can drop (observed: a dead RPC hangs
    # the client forever with no timeout). Probe it in bounded SUBPROCESSES
    # and retry before committing this process to device work.
    import subprocess

    _PROBE = ("import jax, jax.numpy as jnp, numpy as np;"
              "assert float(np.asarray(jax.jit(lambda a: (a@a).sum())"
              "(jnp.ones((8,8))))) == 512.0")
    for attempt in range(8):
        try:
            probe = subprocess.run([sys.executable, "-c", _PROBE],
                                   capture_output=True, timeout=120)
            if probe.returncode == 0:
                break
        except subprocess.TimeoutExpired:
            pass
        print(f"device probe failed (attempt {attempt + 1}/8), retrying in 45 s",
              file=sys.stderr)
        time.sleep(45)
    else:
        print("TPU tunnel unreachable after 8 probes", file=sys.stderr)
        sys.exit(3)
    import jax.numpy as jnp

    from zs_aac_tpu.decoding.greedy import greedy_decode, greedy_decode_q8
    from zs_aac_tpu.models.caption import CaptionConfig, caption_embeddings, init_caption_model
    from zs_aac_tpu.models.gpt2 import GPT2Config, quantize_gpt2_int8

    cfg = CaptionConfig(prefix_length=10, prefix_size=1024, gpt2=GPT2Config())
    # ONE jitted build program (eager init + ~150 per-leaf bf16 casts each
    # compiled a one-off executable through the remote tunnel on a cold
    # cache). Serving path: bf16 weights/cache, optionally int8-quantized
    # (TPU-native low precision; the reference's NF4 capability analog).

    @jax.jit
    def _build(k):
        p = init_caption_model(k, cfg)
        return p, jax.tree.map(lambda x: x.astype(jnp.bfloat16), p["gpt2"])

    params, gp = _build(jax.random.key(0))
    if args.mode == "w8a8+q8":
        gp = jax.device_put(jax.jit(lambda p: quantize_gpt2_int8(p, "w8a8"))(gp))
    decode = greedy_decode if args.mode == "bf16" else greedy_decode_q8

    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.standard_normal((args.batch, 1024)).astype(np.float32))
    embed_fn = jax.jit(lambda p, pr: caption_embeddings(p, cfg, pr))
    emb0 = embed_fn(params, prefix).astype(jnp.bfloat16)

    def chained(emb, n):
        # VISIBLE perturbation: 1e-9 rounds to a no-op in bf16, which
        # risks identical (executable, args) pairs being served from the
        # tunnel's result cache (verify-skill trap); 1e-2 keeps every call
        # distinct while the per-call work is unchanged
        toks = None
        for _ in range(n):
            toks, _ = decode(gp, cfg.gpt2, emb, args.entry_length, 13, 764)
            emb = emb + (toks.sum() % 2).astype(emb.dtype) * 1e-2
        return toks

    np.asarray(chained(emb0, 1))  # warm / compile
    t0 = time.perf_counter()
    np.asarray(chained(emb0, 1))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(chained(emb0, args.chain + 1))
    t_many = time.perf_counter() - t0
    per_call = (t_many - t_one) / args.chain
    throughput = args.batch / per_call

    print(
        f"greedy decode ({args.mode}): {per_call*1e3:.1f} ms / batch{args.batch} "
        f"x {args.entry_length} steps on {jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "caption_decode_throughput",
                "value": round(throughput, 2),
                "unit": "captions/sec",
                "vs_baseline": round(throughput / baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
