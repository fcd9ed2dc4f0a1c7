"""Dataset preparation: raw corpus layouts -> wav.csv/text.json manifests.

Capability parity with ``/root/reference/data_handing/prepare_clotho.py``
and ``prepare_audiocaps.py``: md5-hashed audio ids, a symlink farm of
``<audio_id>.wav`` files, per-split ``wav.csv`` (TSV audio_id/file_name) and
``text.json`` ({audios: [{audio_id, captions: [{caption, cap_id}]}]}).

Run:
  python -m zs_aac_tpu.pipeline.prepare clotho <root> <out> [--version 2]
  python -m zs_aac_tpu.pipeline.prepare audiocaps <root> <out> --audioset_csv wav.csv
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
from pathlib import Path

import pandas as pd

__all__ = ["prepare_clotho_split", "prepare_audiocaps_split", "main"]


def _emit(output_path: Path, split: str, rows, data):
    out = output_path / split
    out.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(rows).to_csv(out / "wav.csv", index=False, sep="\t")
    json.dump({"audios": data}, open(out / "text.json", "w"), indent=4)


def prepare_clotho_split(split: str, annotation_path: Path, audio_path: Path,
                         encoded_audio_path: Path, output_path: Path) -> int:
    df = pd.read_csv(annotation_path / f"{split}.csv")
    audio_path = audio_path / split
    data, rows = [], []
    for _, row in df.iterrows():
        raw = Path(row["file_name"]).stem
        audio_id = hashlib.md5(f"{split}_{raw}".encode()).hexdigest()
        link = encoded_audio_path / f"{audio_id}.wav"
        if not link.exists():
            link.symlink_to(audio_path.resolve() / row["file_name"])
        rows.append({"audio_id": audio_id, "file_name": str(link.absolute())})
        item = {"audio_id": audio_id, "captions": [], "raw_name": row["file_name"]}
        for cap_id in range(1, 6):
            item["captions"].append(
                {"caption": row[f"caption_{cap_id}"], "cap_id": str(cap_id)}
            )
        data.append(item)
    _emit(output_path, split, rows, data)
    return len(data)


def prepare_audiocaps_split(split: str, annotation_path: Path, audioset_csv: Path,
                            encoded_audio_path: Path, output_path: Path) -> int:
    """Join the AudioCaps csv (audiocap_id, youtube_id, caption) with an
    AudioSet wav listing by youtube_id (prepare_audiocaps.py:8-69)."""
    df = pd.read_csv(annotation_path / f"{split}.csv")
    wavs = pd.read_csv(audioset_csv, sep="\t")
    yt2path = {}
    for _, r in wavs.iterrows():
        name = Path(r["file_name"]).stem
        yt2path[name[:11]] = r["file_name"]  # youtube ids are 11 chars

    grouped = {}
    for _, row in df.iterrows():
        yt = row["youtube_id"]
        if yt not in yt2path:
            continue
        grouped.setdefault(yt, []).append(str(row["caption"]))

    data, rows = [], []
    for yt, caps in grouped.items():
        audio_id = hashlib.md5(f"{split}_{yt}".encode()).hexdigest()
        link = encoded_audio_path / f"{audio_id}.wav"
        if not link.exists():
            link.symlink_to(Path(yt2path[yt]).resolve())
        rows.append({"audio_id": audio_id, "file_name": str(link.absolute())})
        data.append(
            {
                "audio_id": audio_id,
                "captions": [
                    {"caption": c, "cap_id": str(i + 1)} for i, c in enumerate(caps)
                ],
                "raw_name": yt,
            }
        )
    _emit(output_path, split, rows, data)
    return len(data)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", choices=["clotho", "audiocaps"])
    p.add_argument("root_dir")
    p.add_argument("output_path")
    p.add_argument("--version", type=int, default=2, choices=[1, 2])
    p.add_argument("--audioset_csv", default=None)
    args = p.parse_args(argv)

    root = Path(args.root_dir)
    out = Path(args.output_path)
    hashed = out / "hashed_audio"
    if hashed.exists():
        shutil.rmtree(hashed)
    hashed.mkdir(parents=True, exist_ok=True)

    if args.dataset == "clotho":
        splits = ["dev", "eval"] if args.version == 1 else ["dev", "val", "eval"]
        for split in splits:
            n = prepare_clotho_split(split, root / "annotation", root / "audio",
                                     hashed, out)
            print(f"{split}: {n} audios")
    else:
        assert args.audioset_csv, "audiocaps needs --audioset_csv"
        for split in ["train", "val", "test"]:
            n = prepare_audiocaps_split(split, root, Path(args.audioset_csv),
                                        hashed, out)
            print(f"{split}: {n} audios")


if __name__ == "__main__":
    main()
