"""Optimizer/schedule factories.

Capability parity with ``/root/reference/retrieval/tools/optim_utils.py``:
AdamW/Adam/SGD selection, per-step cosine-with-linear-warmup and step decay.
Expressed as optax schedules (pure functions of the step) instead of the
reference's closures that mutate ``param_group["lr"]``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

__all__ = ["cosine_lr", "step_lr", "linear_warmup_lr", "get_optimizer"]


def cosine_lr(base_lr: float, warmup_length: int, steps: int):
    """lr(step): linear warmup then cosine to 0 (optim_utils.py:38-49)."""

    def schedule(step):
        warm = base_lr * (step + 1) / max(warmup_length, 1)
        e = step - warmup_length
        es = max(steps - warmup_length, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup_length, warm, cos)

    return schedule


def step_lr(base_lr: float, warmup_length: int, adjust_steps: int, gamma: float):
    """lr(step): warmup then multiply by gamma every adjust_steps
    (optim_utils.py:51-61)."""

    def schedule(step):
        warm = base_lr * (step + 1) / max(warmup_length, 1)
        n = jnp.maximum(step - warmup_length, 0) // adjust_steps
        return jnp.where(step < warmup_length, warm, base_lr * gamma**n)

    return schedule


def linear_warmup_lr(base_lr: float, warmup_steps: int, total_steps: int):
    """HF get_linear_schedule_with_warmup equivalent (train_prompt.py:113)."""

    def schedule(step):
        warm = base_lr * step / max(warmup_steps, 1)
        decay = base_lr * jnp.maximum(total_steps - step, 0) / max(
            total_steps - warmup_steps, 1
        )
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def get_optimizer(
    schedule,
    optimizer_name: str = "adamw",
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
):
    name = optimizer_name.lower()
    if name == "adamw":
        return optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    if name == "adam":
        return optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps)
    if name == "sgd":
        return optax.sgd(schedule, momentum=momentum)
    raise ValueError("optimizer name is not correct")
