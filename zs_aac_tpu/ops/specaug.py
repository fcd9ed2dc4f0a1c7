"""SpecAugment: train-time time/frequency stripe masking.

Capability parity with torchlibrosa ``SpecAugmentation`` as used by the
reference encoders (``/root/reference/retrieval/models/cnns.py:150-153``,
``htsat.py:678-682``): per example, ``stripes_num`` stripes per axis, each
with width drawn uniformly from ``[0, drop_width)`` and a uniform start, are
zeroed. Default config: time 64x2, freq 8x2.

TPU-native formulation: instead of per-example Python loops with dynamic
slice widths (shape-dynamic, unjittable), each stripe is a boolean interval
mask built from ``broadcasted_iota`` comparisons — fixed shapes, fully
vectorized over batch and stripes, fused by XLA into the surrounding
elementwise work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["spec_augment"]


def _stripe_mask(key: jax.Array, b: int, size: int, drop_width: int, n_stripes: int):
    """Boolean keep-mask [b, size] with n_stripes random zero intervals per row."""
    kw, ks = jax.random.split(key)
    widths = jax.random.randint(kw, (b, n_stripes), 0, drop_width)
    starts = jax.random.randint(ks, (b, n_stripes), 0, jnp.maximum(size - widths, 1))
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, n_stripes, size), 2)
    inside = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    return ~jnp.any(inside, axis=1)  # [b, size]


def spec_augment(
    key: jax.Array,
    x: jax.Array,
    *,
    time_drop_width: int = 64,
    time_stripes_num: int = 2,
    freq_drop_width: int = 8,
    freq_stripes_num: int = 2,
) -> jax.Array:
    """Apply SpecAugment to a spectrogram batch ``[B, 1, T, F]`` (or ``[B, T, F]``)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[:, None]
    b, _, t, f = x.shape
    kt, kf = jax.random.split(key)
    tmask = _stripe_mask(kt, b, t, time_drop_width, time_stripes_num)
    fmask = _stripe_mask(kf, b, f, freq_drop_width, freq_stripes_num)
    out = x * tmask[:, None, :, None].astype(x.dtype) * fmask[:, None, None, :].astype(x.dtype)
    return out[:, 0] if squeeze else out
