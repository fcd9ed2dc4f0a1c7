"""Training-free support-memory projection.

Capability parity with ``/root/reference/predict_prompt.py:23-41``
(``map2memory`` / ``construct_support_memory``): project an audio embedding
onto a bank of support text embeddings via ``softmax(sim * scale) @ memory``
— a training-free alternative to the learned mapper for bridging the
audio/text modality gap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["map_to_memory", "construct_support_memory"]


def _norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@jax.jit
def map_to_memory(query: jax.Array, memory: jax.Array, scale: float = 100.0):
    """query: [B, E]; memory: [N, E] -> [B, E] softmax-weighted projection."""
    q = _norm(query)
    m = _norm(memory)
    w = jax.nn.softmax(q @ m.T * scale, axis=-1)
    return w @ memory


def construct_support_memory(bank_records, key: str = "text_embedding"):
    """Stack a support memory matrix from embedding-bank records."""
    import numpy as np

    return jnp.asarray(
        np.concatenate(
            [np.asarray(r[key], np.float32).reshape(1, -1) for r in bank_records]
        )
    )
