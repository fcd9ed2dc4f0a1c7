"""Embedding-bank extraction: the L4 batch-inference job.

Capability parity with ``/root/reference/data_handing/embeddings_generator.py``
(the main audio+text bank builder over wav.csv/text.json manifests, writing
``<out>/<split>/clap_embedding/ZS/data.pkl``) and the per-corpus text-only
variants ``embeddings_generator_{fsd,msd,mc,COCO,gpt,audioset}.py``,
consolidated under ``--corpus``.

TPU-first: the reference runs batch-size-1 audio through the encoder
(``embeddings_generator.py:34-63``); here host workers decode+pad clips into
fixed-shape device batches and both towers run jitted and batched — the
north-star >=10x clips/sec job (BASELINE.md). The ``_mc`` variant's
list-vs-int comparison bug (SURVEY.md §8.3) is implemented with the fixed
``len()`` semantics.

Run:
  python -m zs_aac_tpu.pipeline.extract --config configs/extract_data.yaml \
      --dataset_path data/clotho --out_path data/clotho
  python -m zs_aac_tpu.pipeline.extract --corpus audioset --text_input \
      class_labels_indices.csv --out_path data/audioset_label.pkl ...
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
from typing import Callable, List, Optional, Sequence

import numpy as np

from zs_aac_tpu.data.audio_io import load_audio, pad_or_truncate
from zs_aac_tpu.data.banks import write_bank_list
from zs_aac_tpu.data.text_transform import text_preprocess

__all__ = [
    "load_ase_encoders",
    "extract_audio_text_bank",
    "extract_text_bank",
    "main",
]


def load_ase_encoders(config: dict, ckpt: Optional[str] = None):
    """Build jitted batched (encode_audio, encode_text) from a config +
    optional train-state checkpoint."""
    import jax
    import jax.numpy as jnp

    from zs_aac_tpu.data.bert_tokenizer import WordPieceTokenizer
    from zs_aac_tpu.ops.logmel import LogMelConfig
    from zs_aac_tpu.train.contrastive import create_ase_state, make_encode_fns
    from zs_aac_tpu.train.optim import cosine_lr, get_optimizer
    from zs_aac_tpu.train.pretrain import build_ase_from_config
    from zs_aac_tpu.utils.checkpoints import restore_model_only

    tokenizer = WordPieceTokenizer.from_file(config["text_encoder_args"]["vocab"])
    ase, _ = build_ase_from_config(config)
    mel_cfg = LogMelConfig.from_dict(config["audio_args"])
    state = create_ase_state(
        jax.random.key(0), ase, get_optimizer(cosine_lr(1e-4, 1, 10)),
        spec_shape=(2, 101, mel_cfg.n_mels), text_len=30,
    )
    path = ckpt or config.get("pretrain_path")
    if path and os.path.exists(path):
        state = restore_model_only(path, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if config.get("compute_dtype") == "bfloat16":
        # inference-only cast: 1.4x embedding-gen throughput on v5e
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            variables,
        )
    if jax.default_backend() == "tpu" and config.get("fused_attn", True):
        # inference-only: the fused Pallas window attention (same params)
        import dataclasses

        from zs_aac_tpu.models.ase import ASE

        ase = ASE(dataclasses.replace(ase.cfg, fused_attn=True,
                                      fused_block=True))
    enc_a, enc_t = make_encode_fns(ase, mel_cfg, mel_impl=config.get("mel_impl", "pallas")
                                   if jax.default_backend() == "tpu" else "xla")

    def encode_audio(waves: np.ndarray) -> np.ndarray:
        return np.asarray(enc_a(variables, jnp.asarray(waves))).astype(np.float32)

    def encode_audio_pcm(pcm: np.ndarray, sr_in: int, target_len: int) -> np.ndarray:
        """int16 PCM at the file's native rate -> embeddings. Ships 2-byte
        samples through the host->device link and resamples ON DEVICE
        (``ops/resample.py``, one MXU matmul; matches the native host
        resampler to fp32 rounding) — the round-3 bank build was bound by
        the fp32 wave upload (BASELINE.md round-4 notes)."""
        from zs_aac_tpu.ops.resample import resample_poly_device

        waves = resample_poly_device(jnp.asarray(pcm), sr_in, mel_cfg.sr,
                                     target_len)
        return np.asarray(enc_a(variables, waves)).astype(np.float32)

    encode_audio.pcm = encode_audio_pcm  # opt-in fast path (same closure)

    def encode_text(texts: Sequence[str]) -> np.ndarray:
        ids, mask = tokenizer.batch_encode(
            [text_preprocess(t) for t in texts], max_length=30, pad_to_max=True
        )
        return np.asarray(
            enc_t(variables, jnp.asarray(ids), jnp.asarray(mask))
        ).astype(np.float32)

    return encode_audio, encode_text


def _batched_texts(encode_text, texts: List[str], batch: int) -> np.ndarray:
    out = []
    for s in range(0, len(texts), batch):
        out.append(encode_text(texts[s : s + batch]))
    return np.concatenate(out) if out else np.zeros((0, 0), np.float32)


def extract_audio_text_bank(
    encode_audio: Callable,
    encode_text: Callable,
    data_path: str,
    with_text: bool,
    audio_args: dict,
    batch_size: int = 32,
) -> List[dict]:
    """wav.csv + text.json -> bank records (embeddings_generator.py:34-75)."""
    import csv

    with open(os.path.join(data_path, "wav.csv")) as f:
        rows = list(csv.DictReader(f, delimiter="\t"))
    id2file = {r["audio_id"]: r["file_name"] for r in rows}
    with open(os.path.join(data_path, "text.json")) as f:
        audios = json.load(f)["audios"]

    sr = audio_args["sr"]
    n = audio_args.get("max_length", 10) * sr
    max_length = audio_args.get("max_length", 10)
    use_pcm = hasattr(encode_audio, "pcm")

    def load_chunk(chunk):
        """-> ("pcm", int16 [B, max_length*sr_native], sr_native) when every
        clip is an 8/16-bit WAV sharing one native rate (decode-only host
        work; device resamples), else ("f32", float32 [B, n], None) — the
        full host decode+resample path."""
        if use_pcm:
            from zs_aac_tpu.data.audio_io import load_audio_raw

            raws = [load_audio_raw(id2file[a["audio_id"]]) for a in chunk]
            srs = {r[1] for r in raws if r is not None}
            if all(r is not None for r in raws) and len(srs) == 1:
                sr_in = srs.pop()
                n_in = max_length * sr_in
                return ("pcm",
                        np.stack([pad_or_truncate(r[0], n_in) for r in raws]),
                        sr_in)
        return ("f32", np.stack(
            [pad_or_truncate(load_audio(id2file[a["audio_id"]], sr), n)
             for a in chunk]), None)

    chunks = []
    for s in range(0, len(audios), batch_size):
        chunk = [a for a in audios[s : s + batch_size]
                 if os.path.exists(id2file[a["audio_id"]])]
        if chunk:
            chunks.append(chunk)

    # One-batch-ahead prefetch: the host decodes/resamples batch i+1 (native
    # WAV decoder + Kaiser-sinc resampler, GIL-free through ctypes) while
    # the device encodes batch i — the reference decodes synchronously
    # between device batches (embeddings_generator.py:34-103, bs=1).
    from concurrent.futures import ThreadPoolExecutor

    out: List[dict] = []
    with ThreadPoolExecutor(max_workers=1) as ex:
        pending = ex.submit(load_chunk, chunks[0]) if chunks else None
        for ci, chunk in enumerate(chunks):
            kind, waves, sr_in = pending.result()
            pending = (ex.submit(load_chunk, chunks[ci + 1])
                       if ci + 1 < len(chunks) else None)
            if kind == "pcm":
                audio_embs = encode_audio.pcm(waves, sr_in, n)
            else:
                audio_embs = encode_audio(waves)
            if with_text:
                caps, owners = [], []
                for i, a in enumerate(chunk):
                    for c in a["captions"]:
                        caps.append(c["caption"])
                        owners.append(i)
                text_embs = _batched_texts(encode_text, caps, batch_size)
                for cap, owner, temb in zip(caps, owners, text_embs):
                    out.append(
                        {
                            "audio_embedding": audio_embs[owner : owner + 1],
                            "caption": cap,
                            "text_embedding": temb[None],
                            "audio_id": chunk[owner]["audio_id"],
                        }
                    )
            else:
                for i, a in enumerate(chunk):
                    out.append(
                        {
                            "audio_embedding": audio_embs[i : i + 1],
                            "caption": a["captions"],
                            "text_embedding": 0,
                            "audio_id": a["audio_id"],
                        }
                    )
    return out


def _corpus_texts(corpus: str, path: str) -> List[dict]:
    """Yield {caption}-bearing rows for each supported text corpus."""
    if corpus == "wavcaps_json":  # _fsd.py / SoundBible etc.
        with open(path) as f:
            obj = json.load(f)
        rows = []
        n = obj["num_captions_per_audio"]
        for i, item in enumerate(obj["data"]):
            if n == 1:
                rows.append({"caption": item["caption"].strip(), "text_id": i})
            else:
                for j in range(1, n + 1):
                    rows.append({"caption": item[f"caption_{j}"].strip(),
                                 "text_id": i * n + j})
        return rows
    if corpus == "msd":  # _msd.py: sentence split + 5..20 word filter
        with open(path, "rb") as f:
            data = pickle.load(f)
        rows = []
        for row in data:
            for sent in row["caption"].split(". "):
                if 5 <= len(sent.split()) <= 20:
                    rows.append({"caption": sent.strip()})
        return rows
    if corpus == "musiccaps":  # _mc.py with the len() fix (SURVEY §8.3)
        import pandas as pd

        df = pd.read_csv(path)
        rows = []
        for cap in df["caption"]:
            for sent in str(cap).split(". "):
                if 5 <= len(sent.split()) <= 20:
                    rows.append({"caption": sent.strip()})
        return rows
    if corpus == "coco":  # _COCO.py: annotations list
        with open(path) as f:
            anns = json.load(f)["annotations"]
        return [{"caption": a["caption"].strip(), "text_id": i}
                for i, a in enumerate(anns)]
    if corpus == "chatgpt":  # _gpt.py: txt lines
        with open(path) as f:
            lines = [l.strip() for l in f]
        return [{"caption": l, "text_id": i} for i, l in enumerate(lines) if len(l) > 1]
    if corpus == "audioset":  # _audioset.py: label bank
        import pandas as pd

        df = pd.read_csv(path)
        return [{"label": name, "label_id": i}
                for i, name in enumerate(df["display_name"])]
    raise ValueError(f"unknown corpus {corpus!r}")


def extract_text_bank(encode_text: Callable, corpus: str, path: str,
                      batch_size: int = 64) -> List[dict]:
    rows = _corpus_texts(corpus, path)
    key = "label" if corpus == "audioset" else "caption"
    embs = _batched_texts(encode_text, [r[key] for r in rows], batch_size)
    out = []
    for r, e in zip(rows, embs):
        rec = dict(r)
        rec["label_embedding" if corpus == "audioset" else "text_embedding"] = e[None]
        out.append(rec)
    return out


def main(argv=None):
    from zs_aac_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # cross-CLI compile reuse (VERDICT r4 #5)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/extract_data.yaml")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--dataset_path", default=None, help="dir with <split>/wav.csv")
    p.add_argument("--out_path", required=True)
    p.add_argument("--corpus", default=None,
                   choices=[None, "wavcaps_json", "msd", "musiccaps", "coco",
                            "chatgpt", "audioset"])
    p.add_argument("--text_input", default=None, help="corpus input file")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    args = p.parse_args(argv)

    import yaml

    with open(args.config) as f:
        config = yaml.safe_load(f)
    encode_audio, encode_text = load_ase_encoders(config, args.ckpt)

    if args.corpus:
        out = extract_text_bank(encode_text, args.corpus, args.text_input, args.batch)
        os.makedirs(os.path.dirname(args.out_path) or ".", exist_ok=True)
        write_bank_list(args.out_path, out)
        print(f"wrote {len(out)} records -> {args.out_path}")
        return

    for split in args.splits:
        data_path = os.path.join(args.dataset_path, split)
        print(f"---Extract the embeddings of {split} set---", flush=True)
        out = extract_audio_text_bank(
            encode_audio, encode_text, data_path, split == "train",
            config["audio_args"], args.batch,
        )
        dst = os.path.join(args.out_path, split, "clap_embedding", "ZS")
        os.makedirs(dst, exist_ok=True)
        write_bank_list(os.path.join(dst, "data.pkl"), out)
        print(f"wrote {len(out)} records -> {dst}/data.pkl")


if __name__ == "__main__":
    main()
