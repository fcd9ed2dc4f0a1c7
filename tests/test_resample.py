"""On-device polyphase resample (ops/resample.py) vs the host resampler.

The embedding pipeline ships int16 PCM at the file's native rate and
resamples on device (round-4 VERDICT #2); these tests pin the device kernel
to the native host resampler (``native/audioio.cpp::resample_sinc``, itself
validated against the original scipy path to 1.5e-8) including the edge
renormalization, and the pipeline's pad/truncate-on-device semantics.
"""

import os
import tempfile
import wave as wavemod

import numpy as np
import pytest
import jax.numpy as jnp

from zs_aac_tpu.data.audio_io import load_audio, load_audio_raw, pad_or_truncate
from zs_aac_tpu.ops.resample import resample_poly_device


def _write_wav(path, pcm, sr, ch=1, width=2):
    with wavemod.open(path, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(width)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.mark.parametrize("sr_in,n", [(44100, 441000), (48000, 144000),
                                     (22050, 44100), (16000, 16000),
                                     (44100, 308823)])
def test_device_resample_matches_host(tmp_path, sr_in, n):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) * 0.3).clip(-1, 1).astype(np.float32)
    pcm = (x * 32767).astype(np.int16)
    got = np.asarray(resample_poly_device(jnp.asarray(pcm[None]), sr_in, 32000))[0]

    p = os.path.join(tmp_path, "x.wav")
    _write_wav(p, pcm, sr_in)
    want = load_audio(p, 32000)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_device_resample_identity_and_target_len():
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(1000) * 1000).astype(np.int16)
    # same-rate: pure int16 -> float conversion
    y = np.asarray(resample_poly_device(jnp.asarray(pcm[None]), 32000, 32000))
    np.testing.assert_allclose(y[0], pcm.astype(np.float32) / 32768.0)
    # target_len pad / truncate
    y = np.asarray(resample_poly_device(jnp.asarray(pcm[None]), 32000, 32000, 1500))
    assert y.shape == (1, 1500) and not y[0, 1000:].any()
    y = np.asarray(resample_poly_device(jnp.asarray(pcm[None]), 32000, 32000, 700))
    assert y.shape == (1, 700)
    # float input passes through the same kernel
    y = np.asarray(resample_poly_device(
        jnp.asarray(pcm[None].astype(np.float32) / 32768.0), 44100, 32000))
    assert y.shape == (1, 1000 * 32000 // 44100)


def test_load_audio_raw_variants(tmp_path):
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(5000) * 0.3).clip(-1, 1)
    pcm = (x * 32767).astype(np.int16)

    p = os.path.join(tmp_path, "mono16.wav")
    _write_wav(p, pcm, 44100)
    raw, sr = load_audio_raw(p)
    assert sr == 44100
    np.testing.assert_array_equal(raw, pcm)  # lossless for 16-bit mono

    # stereo: float mean then round
    st = np.stack([pcm, (pcm // 2)], axis=1).reshape(-1)
    p2 = os.path.join(tmp_path, "st16.wav")
    _write_wav(p2, st, 44100, ch=2)
    raw2, _ = load_audio_raw(p2)
    want = np.round((pcm.astype(np.float64) + (pcm // 2)) / 2).astype(np.int16)
    np.testing.assert_array_equal(raw2, want)

    # 24-bit: fast path declines (full-precision host path instead)
    b24 = np.zeros(300, np.uint8)
    p3 = os.path.join(tmp_path, "w24.wav")
    _write_wav(p3, b24, 44100, ch=1, width=3)
    assert load_audio_raw(p3) is None
    assert load_audio_raw(os.path.join(tmp_path, "missing.flac")) is None


def test_bank_pcm_path_matches_f32_path(tmp_path):
    """extract_audio_text_bank with an encode_audio carrying the .pcm fast
    path must produce the same records as the f32 host path — same
    embeddings to resample-rounding tolerance, same ids/captions."""
    import json

    import pandas as pd

    from zs_aac_tpu.pipeline.extract import extract_audio_text_bank

    rng = np.random.default_rng(3)
    rows, audios = [], []
    for i in range(5):
        p = os.path.join(tmp_path, f"a{i}.wav")
        x = (rng.standard_normal(44100 * 2) * 0.2).clip(-1, 1)
        _write_wav(p, (x * 32767).astype(np.int16), 44100)
        rows.append({"audio_id": f"id{i}", "file_name": p})
        audios.append({"audio_id": f"id{i}",
                       "captions": [{"caption": f"sound {i}", "cap_id": "1"}]})
    pd.DataFrame(rows).to_csv(os.path.join(tmp_path, "wav.csv"),
                              index=False, sep="\t")
    json.dump({"audios": audios},
              open(os.path.join(tmp_path, "text.json"), "w"))

    e = 8

    def embed(waves):
        return np.stack([np.array([w.mean() * 1e3, np.abs(w).mean(), w.std(),
                                   w[::7][: e - 3].mean(), 1, 2, 3, 4][:e])
                         for w in np.asarray(waves)]).astype(np.float32)

    def encode_audio(waves):
        return embed(waves)

    def encode_audio_pcm(pcm, sr_in, target_len):
        waves = resample_poly_device(jnp.asarray(pcm), sr_in, 32000, target_len)
        return embed(np.asarray(waves))

    args = dict(sr=32000, max_length=3)
    bank_f32 = extract_audio_text_bank(encode_audio, None, str(tmp_path),
                                       False, args, batch_size=2)
    encode_audio.pcm = encode_audio_pcm
    bank_pcm = extract_audio_text_bank(encode_audio, None, str(tmp_path),
                                       False, args, batch_size=2)
    assert [r["audio_id"] for r in bank_pcm] == [r["audio_id"] for r in bank_f32]
    for a, b in zip(bank_pcm, bank_f32):
        np.testing.assert_allclose(a["audio_embedding"], b["audio_embedding"],
                                   rtol=1e-4, atol=1e-3)
