"""Captioner training step (the reference ``train_prompt.py:82-178`` loop
body, TPU-native).

One jitted step: noise-inject the CLAP prefix (``utils.py:19-31``), forward
through [hard prompt | mapper prefix | caption tokens], next-token CE with
ignore_index=0, AdamW with linear warmup (``train_prompt.py:111-115``).
``only_prefix`` freezes GPT-2 via an optax partition (the reference's
``ClapCaptionPrefix`` semantics) — frozen params get zero updates but remain
in the pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from zs_aac_tpu.models.caption import (
    CaptionConfig,
    caption_loss,
    caption_train_logits,
    init_caption_model,
)
from zs_aac_tpu.utils.noise import noise_injection

__all__ = ["CaptionTrainState", "create_caption_state", "make_caption_train_step",
           "make_caption_optimizer"]


@dataclasses.dataclass
class CaptionTrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    CaptionTrainState, CaptionTrainState.tree_flatten, CaptionTrainState.tree_unflatten
)


def make_caption_optimizer(
    cfg: CaptionConfig,
    schedule,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW (lr 1e-5, wd 0 in the reference) with optional GPT-2 freeze."""
    opt = optax.adamw(schedule, weight_decay=weight_decay)
    if not cfg.only_prefix:
        return opt

    def label_fn(params):
        return {k: ("frozen" if k == "gpt2" else "trainable") for k in params}

    return optax.multi_transform(
        {"trainable": opt, "frozen": optax.set_to_zero()}, label_fn
    )


def create_caption_state(
    rng: jax.Array,
    cfg: CaptionConfig,
    optimizer: optax.GradientTransformation,
    gpt2_params: Optional[dict] = None,
) -> CaptionTrainState:
    # ONE jitted program: eager flax init + optax zeros-like dispatch
    # hundreds of tiny one-off ops through a remote-TPU tunnel (verify
    # skill notes); gpt2_params rides as a jit ARG (closing over it would
    # bake it into the HLO — the tunnel rejects big constants)
    @jax.jit
    def build(r, gp):
        p = init_caption_model(r, cfg, gp)
        return CaptionTrainState(p, optimizer.init(p), jnp.zeros((), jnp.int32))

    return build(rng, gpt2_params)


def make_caption_train_step(
    cfg: CaptionConfig,
    optimizer: optax.GradientTransformation,
    noise_variance: float = 0.016,
    uniform_noise: bool = False,
    dont_norm: bool = False,
):
    """batch: {"tokens": [B,S], "mask": [B,P+S], "prefix": [B,E],
    "hard_prompt": [B,H], "hard_mask": [B,H]} (hard entries optional)."""

    def loss_fn(params, batch, rng):
        prefix = noise_injection(
            rng, batch["prefix"], noise_variance, uniform_noise, dont_norm
        )
        logits = caption_train_logits(
            params, cfg,
            batch["tokens"], prefix, batch["mask"],
            batch.get("hard_prompt"), batch.get("hard_mask"),
        )
        return caption_loss(logits, batch["tokens"])

    @jax.jit
    def train_step(state: CaptionTrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return CaptionTrainState(new_params, new_opt, state.step + 1), loss

    return train_step
