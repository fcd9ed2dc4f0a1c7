"""Tensor-parallel sharding rules for the GPT-2 decoder.

The reference has no tensor parallelism (SURVEY.md §2.4 — DDP-only); this is
a capability extension for serving/training the decoder across chips.
Megatron-style column/row sharding expressed purely through
``NamedSharding`` annotations — GSPMD propagates them and inserts the
all-reduce after each row-parallel matmul; no hand-written collectives.

Layout (mesh axes: 'data' for batch, 'model' for TP):
- attn ``c_attn`` [D, 3D]  -> column-parallel P(None, 'model')
- attn ``c_proj`` [D, D]   -> row-parallel    P('model', None)
- mlp  ``c_fc``  [D, 4D]   -> column-parallel P(None, 'model')
- mlp  ``c_proj``[4D, D]   -> row-parallel    P('model', None)
- ``wte`` [V, D]           -> vocab-sharded   P('model', None)
- layer norms, ``wpe``, biases of row-parallel layers -> replicated
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["gpt2_tp_shardings", "shard_gpt2_params"]


def gpt2_tp_shardings(mesh: Mesh, params: dict, model_axis: str = "model") -> dict:
    """Build a NamedSharding pytree matching a GPT-2 param pytree."""

    def rep():
        return NamedSharding(mesh, P())

    def col():
        return NamedSharding(mesh, P(None, model_axis))

    def row():
        return NamedSharding(mesh, P(model_axis, None))

    def col_bias():
        return NamedSharding(mesh, P(model_axis))

    def block(_):
        return {
            "ln_1": {"scale": rep(), "bias": rep()},
            "ln_2": {"scale": rep(), "bias": rep()},
            "attn": {
                "c_attn": {"w": col(), "b": col_bias()},
                "c_proj": {"w": row(), "b": rep()},
            },
            "mlp": {
                "c_fc": {"w": col(), "b": col_bias()},
                "c_proj": {"w": row(), "b": rep()},
            },
        }

    return {
        "wte": NamedSharding(mesh, P(model_axis, None)),
        "wpe": rep(),
        "h": [block(i) for i in range(len(params["h"]))],
        "ln_f": {"scale": rep(), "bias": rep()},
    }


def shard_gpt2_params(params: dict, mesh: Mesh, model_axis: str = "model") -> dict:
    """Place GPT-2 params with TP shardings."""
    sh = gpt2_tp_shardings(mesh, params, model_axis)
    return jax.tree.map(jax.device_put, params, sh)


def mistral_tp_shardings(mesh: Mesh, params: dict, model_axis: str = "model") -> dict:
    """Megatron-style TP for the Mistral decoder (the 7B model that actually
    needs multiple chips: bf16 weights alone are ~14 GB vs 16 GB HBM/v5e).

    - wq/wk/wv, gate/up -> column-parallel P(None, 'model')
    - wo, down          -> row-parallel    P('model', None)
    - embed, lm_head    -> vocab/row sharded
    - norms             -> replicated
    """

    def rep():
        return NamedSharding(mesh, P())

    def col():
        return NamedSharding(mesh, P(None, model_axis))

    def row():
        return NamedSharding(mesh, P(model_axis, None))

    def layer(_):
        return {
            "attn": {"wq": col(), "wk": col(), "wv": col(), "wo": row()},
            "mlp": {"gate": col(), "up": col(), "down": row()},
            "ln1": rep(),
            "ln2": rep(),
        }

    return {
        "embed": NamedSharding(mesh, P(model_axis, None)),
        "layers": [layer(i) for i in range(len(params["layers"]))],
        "norm": rep(),
        "lm_head": col(),
    }


def shard_mistral_params(params: dict, mesh: Mesh, model_axis: str = "model") -> dict:
    sh = mistral_tp_shardings(mesh, params, model_axis)
    return jax.tree.map(jax.device_put, params, sh)
