"""On-device polyphase Kaiser-sinc resampling (MXU matmul formulation).

Capability parity with the host resampler the embedding pipeline uses
(``zs_aac_tpu/native/audioio.cpp::resample_sinc`` — itself the librosa
``res_type='polyphase'`` quality class the reference's ``librosa.load(sr=
32000)`` calls imply, ``/root/reference/data_handing/embeddings_generator.py:
34-63``). Same kernel: 32-tap Kaiser-windowed sinc (beta 8.6, HALF=16),
per-phase weight normalization, and the native path's edge renormalization
(partial-window weight sums at the signal boundaries) reproduced exactly via
a precomputed per-output correction vector.

TPU-first formulation: for a reduced ratio ``sr_out/sr_in = L/M`` the output
is processed in blocks of L samples; block ``b``'s L outputs all read from
the input window ``x[b*M - 15 : b*M + M + 16]`` (length ``F = M + 31``), so
the whole resample is ONE matmul ``frames [K, F] @ W [F, L]`` per clip —
frames are composed from two shifted reshapes (stride M < F < 2M), no
gather. For a 64-clip batch of 10 s 44.1 kHz audio this is ~19 GFLOP: noise
on the MXU, vs ~0.7 s of host time per batch on a 1-vCPU host.

This is what lets the bank-build pipeline ship int16 PCM at the file's
native rate (2 bytes/sample at 44.1 kHz vs 4 bytes at 32 kHz = 1.45x fewer
tunnel/PCIe bytes) and resample on device — see ``pipeline/extract.py``.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["poly_resample_plan", "resample_poly_device"]

_HALF = 16
_TAPS = 2 * _HALF  # k in [-HALF+1, HALF]
_BETA = 8.6


def _bessel_i0(x: np.ndarray) -> np.ndarray:
    s = np.ones_like(x)
    t = np.ones_like(x)
    for k in range(1, 32):
        t = t * (x / (2.0 * k)) ** 2
        s = s + t
    return s


def _tap_weight(d: np.ndarray, cutoff: float) -> np.ndarray:
    """Kaiser-windowed sinc weight at distance d (native tap_weight)."""
    t = d / _HALF
    inside = np.abs(t) <= 1.0
    sinc = np.where(d == 0.0, 1.0,
                    np.sin(np.pi * cutoff * d) / np.where(d == 0.0, 1.0,
                                                          np.pi * cutoff * d))
    win = _bessel_i0(_BETA * np.sqrt(np.clip(1.0 - t * t, 0.0, None)))
    win = win / _bessel_i0(np.asarray(_BETA))
    return np.where(inside, cutoff * sinc * win, 0.0)


@functools.lru_cache(maxsize=16)
def poly_resample_plan(sr_in: int, sr_out: int, n_in: int):
    """Precompute the block-polyphase plan for a fixed input length.

    Returns ``(W [F, L] f32, corr [n_out] f32, M, L, F, n_out)``:
    ``y[b*L + p] = sum_j frames[b, j] * W[j, p]`` with ``frames[b] =
    x_pad[b*M : b*M + F]`` (x left-padded by HALF-1 zeros), times the edge
    correction ``corr`` (full-window weight sum / in-range partial sum —
    the native resampler's boundary renormalization, exactly).
    """
    assert sr_in != sr_out
    g = math.gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    cutoff = sr_out / sr_in if sr_out < sr_in else 1.0
    n_out = int(n_in * sr_out // sr_in)

    # per-phase normalized weights: wn[p, k] = w(frac_p - k) / sum_k w
    ks = np.arange(-_HALF + 1, _HALF + 1, dtype=np.float64)  # [TAPS]
    fracs = (np.arange(L, dtype=np.float64) * M % L) / L     # phase of row p
    offs = (np.arange(L) * M) // L                           # base offset of row p
    w = _tap_weight(fracs[:, None] - ks[None, :], cutoff)    # [L, TAPS]
    wsum = w.sum(axis=1, keepdims=True)
    wn = w / wsum

    # scatter into the block weight matrix: W[off_p + k + HALF - 1, p]
    F = M + _TAPS - 1
    W = np.zeros((F, L), np.float64)
    for p in range(L):
        j0 = int(offs[p])
        W[j0 : j0 + _TAPS, p] += wn[p]

    # edge correction: outputs whose 32-tap window leaves [0, n_in) were
    # normalized by the PARTIAL in-range weight sum in the native path.
    corr = np.ones(n_out, np.float64)
    for o in list(range(min(n_out, 2 * _HALF * L // M + 2))) + list(
        range(max(0, n_out - 2 * _HALF * L // M - 2), n_out)
    ):
        p = o % L           # table rows are indexed by within-block position
        base = (o * M) // L
        idx = base + ks
        valid = (idx >= 0) & (idx < n_in)
        psum = w[p][valid].sum()
        if psum > 0 and psum != wsum[p, 0]:
            corr[o] = wsum[p, 0] / psum
    return (W.astype(np.float32), corr.astype(np.float32), M, L, F, n_out)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def resample_poly_device(x: jax.Array, sr_in: int, sr_out: int,
                         target_len: int | None = None) -> jax.Array:
    """[B, n_in] (int16 PCM or float) at sr_in -> [B, n_out] float32 at
    sr_out, matching the native host resampler (interior bit-close, edges
    exactly renormalized). ``target_len`` pads/truncates the output
    (the pipeline's ``pad_or_truncate`` semantics, on device)."""
    B, n_in = x.shape
    if x.dtype == jnp.int16:
        x = x.astype(jnp.float32) / 32768.0
    else:
        x = x.astype(jnp.float32)
    if sr_in == sr_out:
        y = x
    else:
        W, corr, M, L, F, n_out = poly_resample_plan(sr_in, sr_out, n_in)
        K = -(-n_out // L)  # blocks
        # frames[b] = x_pad[b*M : b*M + F]; built from ceil(F/M)+1 shifted
        # views of one [K + nc, M] reshape (stride M) — no gather.
        nc = -(-F // M)
        pad_r = (K + nc) * M - (_HALF - 1) - n_in
        xp = jnp.pad(x, ((0, 0), (_HALF - 1, max(pad_r, 0))))
        c = xp[:, : (K + nc) * M].reshape(B, K + nc, M)
        frames = jnp.concatenate(
            [c[:, i : i + K] for i in range(nc)], axis=-1)[:, :, :F]
        # full-precision dot: the v5e default f32 matmul (bf16 passes) puts
        # ~4e-3 of noise on the waveform; HIGHEST costs 3x a trivial FLOP
        # count and restores host-resampler parity to fp32 rounding.
        y = jnp.einsum("bkf,fp->bkp", frames, jnp.asarray(W),
                       precision=jax.lax.Precision.HIGHEST)
        y = y.reshape(B, K * L)[:, :n_out] * jnp.asarray(corr)[None]
    if target_len is not None:
        n = y.shape[1]
        if n >= target_len:
            y = y[:, :target_len]
        else:
            y = jnp.pad(y, ((0, 0), (0, target_len - n)))
    return y
