"""Data layer tests: banks, datasets, prompts, samplers, audio IO."""

import os
import pickle
import tempfile
import wave as wavemod

import numpy as np
import pytest

from zs_aac_tpu.data.audio_io import load_audio, load_wav, pad_or_truncate, random_crop, resample
from zs_aac_tpu.data.banks import (
    iter_bank,
    read_label_bank,
    write_bank_list,
    write_bank_stream,
)
from zs_aac_tpu.data.datasets import (
    CaptionBankDataset,
    CaptionBankTestDataset,
    CaptionDatasetConfig,
    caption_batches,
)
from zs_aac_tpu.data.prompts import compose_discrete_prompts, padding_captions
from zs_aac_tpu.data.sampler import BySequenceLengthSampler, bucket_pad_length
from zs_aac_tpu.data.text_transform import text_preprocess
from zs_aac_tpu.data.tokenizer import WordTokenizer


def _mk_records(n=20, e=16, seed=0, words=10):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        recs.append(
            {
                "audio_id": f"clip{i}",
                "caption": " ".join(["sound"] * (words - 1)) + " here.",
                "audio_embedding": rng.standard_normal((1, e)).astype(np.float32),
                "text_embedding": rng.standard_normal((1, e)).astype(np.float32),
                "related_embeddings": rng.standard_normal((5, e)).astype(np.float32),
            }
        )
    return recs


def test_bank_roundtrip_both_formats(tmp_path):
    recs = _mk_records(5)
    p1 = str(tmp_path / "list.pkl")
    p2 = str(tmp_path / "stream.pkl")
    write_bank_list(p1, recs)
    write_bank_stream(p2, recs)
    assert len(list(iter_bank(p1))) == 5
    got = list(iter_bank(p2))
    assert [r["audio_id"] for r in got] == [r["audio_id"] for r in recs]


def test_dataset_word_filter_applies_to_stream_only(tmp_path):
    short = _mk_records(4, words=3)   # 3 words -> filtered in stream format
    ok = _mk_records(6, words=10, seed=1)
    p_stream = str(tmp_path / "s.pkl")
    p_list = str(tmp_path / "l.pkl")
    write_bank_stream(p_stream, short + ok)
    write_bank_list(p_list, short)  # list format bypasses the filter

    tok = WordTokenizer.from_corpus(["sound here."])
    ds = CaptionBankDataset([p_stream, p_list], tok, CaptionDatasetConfig(prefix_length=4))
    assert len(ds) == 6 + 4  # 6 stream ok + 4 list unfiltered


def test_pad_tokens_and_prefix_sources(tmp_path):
    recs = _mk_records(8)
    p = str(tmp_path / "b.pkl")
    write_bank_stream(p, recs)
    tok = WordTokenizer.from_corpus(["sound here."])

    for kw, key in [
        (dict(use_audio_embedding=True), "audio_embedding"),
        (dict(use_related_text=True), None),
        (dict(), "text_embedding"),
    ]:
        ds = CaptionBankDataset([p], tok, CaptionDatasetConfig(prefix_length=4, **kw))
        item = ds[0]
        assert item["tokens"].shape == (25,)
        assert item["mask"].shape == (4 + 25,)
        assert item["mask"][:4].all()  # prefix mask ones
        if key:
            np.testing.assert_array_equal(
                item["prefix"], ds.records[0][key].reshape(-1)
            )
    # tokens end with '.' id then zero padding
    item = ds[0]
    nz = item["tokens"][item["tokens"] != 0]
    assert nz[-1] == tok.stop_token_id


def test_hard_prompt_and_batches(tmp_path):
    recs = _mk_records(12, e=8)
    bank = str(tmp_path / "b.pkl")
    write_bank_stream(bank, recs)
    # label bank
    rng = np.random.default_rng(2)
    labels = [
        {"label": f"label{i}", "label_embedding": rng.standard_normal((1, 8)).astype(np.float32),
         "label_id": i}
        for i in range(10)
    ]
    lp = str(tmp_path / "labels.pkl")
    write_bank_list(lp, labels)
    names, embs = read_label_bank(lp)
    assert len(names) == 10 and embs.shape == (10, 8)

    tok = WordTokenizer.from_corpus(
        ["sound here.", "there are something in this audio."]
        + [f"label{i}" for i in range(10)]
    )
    cfg = CaptionDatasetConfig(prefix_length=4, sound_effect_path=lp, sound_effect_k=3,
                               max_hard_len=16)
    ds = CaptionBankDataset([bank], tok, cfg)
    item = ds[0]
    assert "hard_prompt" in item and len(item["hard_prompt"]) > 0

    batches = list(caption_batches(ds, 4, seed=0))
    assert len(batches) == 3
    b = batches[0]
    assert b["tokens"].shape == (4, 25)
    assert b["hard_prompt"].shape == (4, 16)
    assert b["hard_mask"].shape == (4, 16)
    assert set(b["hard_mask"].ravel()) <= {0.0, 1.0}


def test_test_dataset_references(tmp_path):
    recs = []
    for i in range(3):
        recs.append({
            "audio_id": f"c{i}",
            "audio_embedding": np.ones((1, 8), np.float32),
            "caption": [{"caption": f"Ref A {i}."}, {"caption": f"REF B {i}."}],
        })
    p = str(tmp_path / "t.pkl")
    with open(p, "wb") as f:
        pickle.dump(recs, f)
    ds = CaptionBankTestDataset(p)
    refs = ds.references()
    assert refs["c0"] == ["ref a 0.", "ref b 0."]
    assert ds[1]["audio_id"] == "c1"


def test_prompt_composition_and_padding():
    tok = WordTokenizer.from_corpus(["there are dog, cat in this audio. something"])
    t = compose_discrete_prompts(tok, ["dog", "cat"])
    assert tok.decode(list(t)).startswith("there are")
    empty = compose_discrete_prompts(tok, [])
    assert "something" in tok.decode(list(empty))
    padded, mask = padding_captions([np.array([1, 2, 3]), np.array([4])], 5)
    assert padded.shape == (2, 5) and mask[1].sum() == 1


def test_bucket_sampler():
    rng = np.random.default_rng(0)
    lengths = rng.uniform(3, 32, 100)
    s = BySequenceLengthSampler(lengths, (5, 30, 6), batch_size=8, seed=1)
    batches = list(s)
    assert all(len(b) == 8 for b in batches)
    edges = np.linspace(5, 30, 6)
    for b in batches:
        ids = [np.searchsorted(edges, lengths[i], side="right") for i in b]
        assert len(set(ids)) == 1  # same bucket
    assert bucket_pad_length(7.2) == 10 * 32000


def test_text_preprocess():
    assert text_preprocess("A Dog Barks .") == "a dog barks "
    assert text_preprocess("rain, falls!") == "rain falls "


def _write_wav(path, x, sr, width=2):
    with wavemod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())


def test_audio_io_python_and_native(tmp_path):
    sr = 44100
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    _write_wav(p, x, sr)

    y, got_sr = load_wav(p)
    assert got_sr == sr and len(y) == sr
    np.testing.assert_allclose(y, x, atol=1e-3)

    z = load_audio(p, target_sr=32000)
    assert abs(len(z) - 32000) <= 2
    # energy preserved through resampling (sine at 440 Hz)
    assert abs(np.std(z) - np.std(x)) < 0.02

    assert len(pad_or_truncate(z, 16000)) == 16000
    assert len(pad_or_truncate(z, 64000)) == 64000
    assert len(random_crop(z, 8000, np.random.default_rng(0))) == 8000


def test_native_decoder_matches_python(tmp_path):
    import zs_aac_tpu.data.audio_io as aio

    if aio._native_lib() is None:
        pytest.skip("native lib not built")
    sr = 48000
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    p = str(tmp_path / "n.wav")
    _write_wav(p, x, sr)
    native = load_audio(p, 32000)  # native path
    python = resample(load_wav(p)[0], sr, 32000)
    assert abs(len(native) - len(python)) <= 2
    n = min(len(native), len(python))
    # different resamplers, same signal content
    corr = np.corrcoef(native[200:n-200], python[200:n-200])[0, 1]
    assert corr > 0.98
