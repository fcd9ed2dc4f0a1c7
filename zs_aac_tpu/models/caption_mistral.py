"""Mistral-based prefix caption model (the multilingual path).

Capability parity with ``ClapCaption_Mistralai`` / ``ClapCaption_Mistralai_prompt``
(``/root/reference/models/caption_model.py:208-279,340-426``): mapper
projects the CLAP embedding to ``prefix_length`` Mistral token embeddings,
hard prompts prepend, captions carry ``islang`` language-tag tokens whose
positions are excluded from the CE slice
(``caption_model.py:391-394``, ``train_prompt_multilingual.py:78``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from zs_aac_tpu.models.mistral import (
    MistralConfig,
    init_lora,
    init_mistral,
    mistral_embed,
    mistral_forward,
)
from zs_aac_tpu.models.mapper import make_mapper

__all__ = [
    "MistralCaptionConfig",
    "init_mistral_caption",
    "mistral_caption_embeddings",
    "mistral_caption_train_logits",
    "mistral_caption_loss",
]


@dataclasses.dataclass(frozen=True)
class MistralCaptionConfig:
    prefix_length: int = 10
    prefix_size: int = 1024
    clip_length: int = 10
    num_layers: int = 8
    mapping_type: str = "mlp"
    only_soft_prompt: bool = False
    islang: int = 0              # language-tag token count (3 for <en>/<zh>/<fr>)
    max_seq_len: int = 40
    lora_r: int = 8
    lora_alpha: int = 16
    mistral: MistralConfig = dataclasses.field(default_factory=MistralConfig)


def _mapper(cfg: MistralCaptionConfig):
    return make_mapper(
        cfg.mapping_type, cfg.prefix_size, cfg.mistral.hidden_size,
        cfg.prefix_length, cfg.clip_length, cfg.num_layers,
    )


def init_mistral_caption(rng: jax.Array, cfg: MistralCaptionConfig,
                         mistral_params: Optional[dict] = None) -> dict:
    """{"mapper", "lora", "mistral"}; mistral base is frozen (bf16)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    mapper = _mapper(cfg)
    return {
        "mapper": mapper.init(k1, jnp.zeros((1, cfg.prefix_size)))["params"],
        "lora": init_lora(k2, cfg.mistral, cfg.lora_r, cfg.lora_alpha),
        "mistral": mistral_params if mistral_params is not None
        else init_mistral(k3, cfg.mistral),
    }


def mistral_caption_embeddings(params, cfg: MistralCaptionConfig, prefix,
                               hard_prompt_tokens=None, text_tokens=None):
    mapper = _mapper(cfg)
    proj = mapper.apply({"params": params["mapper"]}, prefix)
    proj = proj.reshape(-1, cfg.prefix_length, cfg.mistral.hidden_size)
    proj = proj.astype(params["mistral"]["embed"].dtype)
    parts = []
    if hard_prompt_tokens is not None and not cfg.only_soft_prompt:
        parts.append(mistral_embed(params["mistral"], hard_prompt_tokens))
    parts.append(proj)
    if text_tokens is not None:
        parts.append(mistral_embed(params["mistral"], text_tokens))
    return jnp.concatenate(parts, axis=1)


def mistral_caption_train_logits(
    params, cfg: MistralCaptionConfig,
    tokens, prefix, mask,
    hard_prompt_tokens=None, hard_prompt_mask=None,
):
    """Returns logits aligned to predict ``tokens[:, islang:]``
    (``caption_model.py:391-394``)."""
    embeds = mistral_caption_embeddings(params, cfg, prefix, hard_prompt_tokens, tokens)
    full_mask = mask
    h = 0
    if hard_prompt_tokens is not None and not cfg.only_soft_prompt:
        h = hard_prompt_tokens.shape[1]
        full_mask = jnp.concatenate([hard_prompt_mask, mask], axis=1)
    logits = mistral_forward(params["mistral"], cfg.mistral, embeds, full_mask,
                             lora=params["lora"])
    start = h + cfg.prefix_length + cfg.islang - 1
    return logits[:, start:-1]


def mistral_caption_loss(logits, tokens, islang: int) -> jax.Array:
    """CE vs tokens[:, islang:], ignore_index=0
    (``train_prompt_multilingual.py:78``)."""
    targets = tokens[:, islang:]
    valid = targets != 0
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), targets
    )
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)
