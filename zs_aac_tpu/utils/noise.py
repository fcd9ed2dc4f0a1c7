"""Embedding noise injection (modality-gap bridging).

Capability parity with ``/root/reference/utils.py:11-31``: normalize, add
Gaussian (or uniform-ball) noise of the given variance, re-normalize. Pure
``jax.random`` — callers thread keys, keeping train steps jittable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["noise_injection", "get_uniform_ball_noise"]


def _normalize(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def get_uniform_ball_noise(key: jax.Array, shape, radius: float = 0.1):
    k1, k2 = jax.random.split(key)
    sphere = _normalize(jax.random.normal(k1, shape))
    u = jax.random.uniform(k2, (shape[0],)) ** (1.0 / shape[1])
    return sphere * (u * radius)[:, None]


def noise_injection(
    key: jax.Array,
    x: jax.Array,
    variance: float = 0.001,
    uniform_noise: bool = False,
    dont_norm: bool = False,
) -> jax.Array:
    if variance == 0.0:
        return x
    std = math.sqrt(variance)
    if not dont_norm:
        x = _normalize(x)
    if uniform_noise:
        x = x + get_uniform_ball_noise(key, x.shape, radius=std)
    else:
        x = x + jax.random.normal(key, x.shape) * std
    return _normalize(x)
