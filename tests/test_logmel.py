"""Log-mel frontend parity tests (SURVEY.md §9 step 1).

Oracles are independent of the implementation under test:
- ``torch.stft`` for the power spectrogram (same hann/center/reflect
  semantics as the reference's torchlibrosa ``Spectrogram``).
- A loop-based numpy pipeline for the full framing->fft->mel->log chain.
- The Pallas kernel is checked against the XLA path.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from zs_aac_tpu.ops.logmel import (
    LogMelConfig,
    hann_window,
    log_mel_pallas,
    log_mel_xla,
    mel_filterbank,
    num_frames,
)

CFG = LogMelConfig()


def _rand_wave(b, t, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, t)).astype(np.float32) * 0.1


def test_power_spec_matches_torch_stft():
    wave = _rand_wave(2, 32000)
    # Reproduce only the spectrogram part of log_mel_xla.
    x = jnp.pad(jnp.asarray(wave), ((0, 0), (CFG.n_fft // 2, CFG.n_fft // 2)), mode="reflect")
    F = num_frames(wave.shape[1], CFG)
    idx = np.arange(F)[:, None] * CFG.hop_length + np.arange(CFG.n_fft)[None, :]
    frames = np.asarray(x)[:, idx] * hann_window(CFG.n_fft)
    ours = np.abs(np.fft.rfft(frames, axis=-1)) ** 2

    t = torch.stft(
        torch.from_numpy(wave),
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_length,
        win_length=CFG.n_fft,
        window=torch.hann_window(CFG.n_fft, periodic=True),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    theirs = (t.abs() ** 2).numpy().transpose(0, 2, 1)  # [B, F, freq]

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_mel_filterbank_properties():
    mel = mel_filterbank(CFG.sr, CFG.n_fft, CFG.n_mels, CFG.f_min, CFG.f_max)
    assert mel.shape == (CFG.n_fft // 2 + 1, CFG.n_mels)
    assert (mel >= 0).all()
    # Every filter is non-empty and unimodal (triangle).
    for m in range(CFG.n_mels):
        col = mel[:, m]
        assert col.max() > 0
        peak = col.argmax()
        assert (np.diff(col[: peak + 1]) >= -1e-12).all()
        assert (np.diff(col[peak:]) <= 1e-12).all()
    # No energy below fmin or above fmax bins.
    freqs = np.linspace(0, CFG.sr / 2, CFG.n_fft // 2 + 1)
    assert mel[freqs < CFG.f_min - CFG.sr / CFG.n_fft].sum() == 0
    assert mel[freqs > CFG.f_max + CFG.sr / CFG.n_fft].sum() == 0


def _numpy_logmel(wave):
    """Independent loop-based reference for the full chain."""
    pad = CFG.n_fft // 2
    out = []
    mel_w = mel_filterbank(CFG.sr, CFG.n_fft, CFG.n_mels, CFG.f_min, CFG.f_max, np.float64)
    win = hann_window(CFG.n_fft, np.float64)
    for row in wave:
        x = np.pad(row.astype(np.float64), pad, mode="reflect")
        F = num_frames(len(row), CFG)
        feats = np.zeros((F, CFG.n_mels))
        for i in range(F):
            fr = x[i * CFG.hop_length : i * CFG.hop_length + CFG.n_fft] * win
            p = np.abs(np.fft.rfft(fr)) ** 2
            feats[i] = 10 * np.log10(np.maximum(p @ mel_w, CFG.amin))
        out.append(feats)
    return np.stack(out)[:, None]


def test_log_mel_xla_matches_numpy():
    wave = _rand_wave(2, 16000, seed=1)
    got = np.asarray(log_mel_xla(jnp.asarray(wave), CFG))
    want = _numpy_logmel(wave)
    assert got.shape == want.shape == (2, 1, 51, 64)
    np.testing.assert_allclose(got, want, rtol=0, atol=0.05)  # dB


@pytest.mark.parametrize("t", [16000, 96000])
def test_log_mel_pallas_matches_xla(t):
    wave = _rand_wave(2, t, seed=2)
    want = np.asarray(log_mel_xla(jnp.asarray(wave), CFG))
    got = np.asarray(log_mel_pallas(jnp.asarray(wave), CFG, 128))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=0.05)  # dB


def test_pallas_logmel_gradient_matches_xla():
    """The fused kernel's custom_vjp must return the XLA path's gradients
    (the train step uses the fused forward, VERDICT r1 #7)."""
    import jax
    import jax.numpy as jnp

    from zs_aac_tpu.ops.logmel import LogMelConfig, log_mel_pallas, log_mel_xla

    cfg = LogMelConfig()
    rng = np.random.default_rng(5)
    wave = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)

    def loss_p(w):
        return (log_mel_pallas(w, cfg) ** 2).mean()

    def loss_x(w):
        return (log_mel_xla(w, cfg) ** 2).mean()

    gp = jax.grad(loss_p)(wave)
    gx = jax.grad(loss_x)(wave)
    # forward values differ only by MXU rounding; gradients are the XLA
    # closed form evaluated at the same input -> near-identical
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=2e-3, atol=2e-6)


def test_train_step_runs_with_pallas_frontend():
    import jax
    import jax.numpy as jnp

    from zs_aac_tpu.models.ase import ASE, ASEConfig
    from zs_aac_tpu.train.contrastive import create_ase_state, make_ase_train_step
    from zs_aac_tpu.train.optim import cosine_lr, get_optimizer

    ase = ASE(ASEConfig(embed_size=16, audio_channels=(4, 8),
                        text_model="prajjwal1/bert-tiny"))
    opt = get_optimizer(cosine_lr(1e-4, 2, 10), "adamw")
    state = create_ase_state(jax.random.key(0), ase, opt,
                             spec_shape=(2, 51, 64), text_len=8)
    step = make_ase_train_step(ase, opt)  # default mel_impl="pallas"
    rng = np.random.default_rng(0)
    batch = {
        "wave": jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1),
        "input_ids": jnp.asarray(rng.integers(0, 1000, (2, 8))),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
        "idx": jnp.asarray([0, 1]),
    }
    state2, loss = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
