"""Prefix-tuned caption models (layer L5), TPU-native.

Capability parity with ``/root/reference/models/caption_model.py``:

- ``ClapCaptionModel`` base (``caption_model.py:13-88``): GPT-2 + mapper;
  optional sound-effect prefix tokens projected from top-k AudioSet label
  embeddings; training forward returns logits aligned for next-token CE.
- ``ClapCaptionPrefix`` (``:90``): freeze GPT-2, train only the mapper —
  here expressed as an optimizer partition, not a module subclass (see
  ``trainable_filter``).
- ``ClapCaption_prompt`` (``:291``): hard prompt token embeddings prepended
  before the soft prefix; ``only_soft_prompt`` drops them.

Pure functions over ``{"mapper": ..., "gpt2": ..., ["sound_effect": ...]}``
parameter pytrees; the GPT-2 tower is ``zs_aac_tpu.models.gpt2``. Everything
is fixed-shape and jittable; the embedding concat order matches the
reference: [sound_effects | hard_prompt | soft_prefix | text].
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from zs_aac_tpu.models.gpt2 import GPT2Config, gpt2_embed, gpt2_forward, init_gpt2
from zs_aac_tpu.models.mapper import make_mapper

__all__ = [
    "CaptionConfig",
    "sound_effect_choice",
    "init_caption_model",
    "prefix_projections",
    "caption_embeddings",
    "caption_train_logits",
    "caption_loss",
    "trainable_filter",
]


@dataclasses.dataclass(frozen=True)
class CaptionConfig:
    """Mirrors the reference constructor args (``caption_model.py:40,291``)."""

    prefix_length: int = 10
    prefix_size: int = 1024  # CLAP embed dim (reference --is_rn path)
    clip_length: int = 10
    num_layers: int = 8
    mapping_type: str = "mlp"
    only_prefix: bool = False
    only_soft_prompt: bool = False
    sound_effect_num: int = 0
    max_seq_len: int = 25
    gpt2: GPT2Config = dataclasses.field(default_factory=GPT2Config)

    @property
    def gpt_embedding_size(self) -> int:
        return self.gpt2.n_embd


def sound_effect_choice(prefix: jax.Array, label_embeddings: jax.Array, k: int):
    """Top-k AudioSet label indices by similarity (``utils.py:131-137``).

    ``prefix``: [B, E] (or [B, 1, E]); ``label_embeddings``: [N, E].
    Softmax is monotonic, so top-k over raw similarities is identical to the
    reference's softmax-then-topk — computed on device instead of ``.cpu()``.
    """
    if prefix.ndim == 3:
        prefix = prefix[:, 0]
    sims = prefix @ label_embeddings.T
    _, idx = jax.lax.top_k(sims, k)
    return idx


def _mapper_module(cfg: CaptionConfig):
    return make_mapper(
        cfg.mapping_type, cfg.prefix_size, cfg.gpt_embedding_size,
        cfg.prefix_length, cfg.clip_length, cfg.num_layers,
    )


def init_caption_model(
    rng: jax.Array,
    cfg: CaptionConfig,
    gpt2_params: Optional[dict] = None,
    with_sound_effect: bool = False,
) -> dict:
    """Build the caption-model parameter pytree."""
    k_map, k_gpt, k_se = jax.random.split(rng, 3)
    mapper = _mapper_module(cfg)
    dummy = jnp.zeros((1, cfg.prefix_size))
    params = {
        "mapper": mapper.init(k_map, dummy)["params"],
        "gpt2": gpt2_params if gpt2_params is not None else init_gpt2(k_gpt, cfg.gpt2),
    }
    if with_sound_effect or cfg.sound_effect_num:
        # Reference: MLP((prefix_size, gpt_embedding_size // 2, gpt_embedding_size))
        from zs_aac_tpu.models.mapper import MLP

        se = MLP((cfg.prefix_size, cfg.gpt_embedding_size // 2, cfg.gpt_embedding_size))
        params["sound_effect"] = se.init(k_se, dummy)["params"]
    return params


def prefix_projections(params: dict, cfg: CaptionConfig, prefix: jax.Array) -> jax.Array:
    """Mapper output reshaped to ``[B, prefix_length, D]``."""
    mapper = _mapper_module(cfg)
    out = mapper.apply({"params": params["mapper"]}, prefix)
    return out.reshape(-1, cfg.prefix_length, cfg.gpt_embedding_size)


def _sound_effect_embeds(params, cfg, prefix, label_embeddings):
    from zs_aac_tpu.models.mapper import MLP

    idx = sound_effect_choice(prefix, label_embeddings, cfg.sound_effect_num)
    chosen = label_embeddings[idx]  # [B, k, E]
    se = MLP((cfg.prefix_size, cfg.gpt_embedding_size // 2, cfg.gpt_embedding_size))
    return se.apply({"params": params["sound_effect"]}, chosen)


def caption_embeddings(
    params: dict,
    cfg: CaptionConfig,
    prefix: jax.Array,                         # [B, prefix_size]
    hard_prompt_tokens: Optional[jax.Array] = None,   # [B, H] int
    text_tokens: Optional[jax.Array] = None,          # [B, S] int
    label_embeddings: Optional[jax.Array] = None,     # [N, E] for sound effects
) -> jax.Array:
    """Assemble GPT input embeddings: [sound|hard|soft_prefix|text]."""
    parts = []
    if cfg.sound_effect_num and label_embeddings is not None:
        parts.append(_sound_effect_embeds(params, cfg, prefix, label_embeddings))
    if hard_prompt_tokens is not None and not cfg.only_soft_prompt:
        parts.append(gpt2_embed(params["gpt2"], hard_prompt_tokens))
    parts.append(prefix_projections(params, cfg, prefix))
    if text_tokens is not None:
        parts.append(gpt2_embed(params["gpt2"], text_tokens))
    return jnp.concatenate(parts, axis=1)


def caption_train_logits(
    params: dict,
    cfg: CaptionConfig,
    tokens: jax.Array,                      # [B, S]
    prefix: jax.Array,                      # [B, prefix_size]
    mask: jax.Array,                        # [B, prefix_length + S] (pad_tokens)
    hard_prompt_tokens: Optional[jax.Array] = None,  # [B, H]
    hard_prompt_mask: Optional[jax.Array] = None,    # [B, H]
    label_embeddings: Optional[jax.Array] = None,
) -> jax.Array:
    """Training forward; returns logits aligned to predict ``tokens``.

    Matches ``ClapCaption_prompt.forward`` (``caption_model.py:297-313``):
    full mask = [hard_mask | prefix ones+token mask]; the returned slice is
    ``logits[:, H + prefix_length - 1 : -1]``.
    """
    embeds = caption_embeddings(
        params, cfg, prefix, hard_prompt_tokens, tokens, label_embeddings
    )
    full_mask = mask
    h = 0
    if hard_prompt_tokens is not None and not cfg.only_soft_prompt:
        h = hard_prompt_tokens.shape[1]
        full_mask = jnp.concatenate([hard_prompt_mask, mask], axis=1)
    if cfg.sound_effect_num and label_embeddings is not None:
        ones = jnp.ones((prefix.shape[0], cfg.sound_effect_num), full_mask.dtype)
        full_mask = jnp.concatenate([ones, full_mask], axis=1)
        h += cfg.sound_effect_num
    logits = gpt2_forward(params["gpt2"], cfg.gpt2, embeds, full_mask)
    start = h + cfg.prefix_length - 1
    return logits[:, start:-1]


def caption_loss(logits: jax.Array, tokens: jax.Array) -> jax.Array:
    """Next-token CE with ``ignore_index=0`` (``train_prompt.py:133``)."""
    valid = tokens != 0
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, tokens)
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)


def trainable_filter(cfg: CaptionConfig):
    """optax-partition label fn: 'frozen' for GPT-2 when only_prefix
    (the reference's ``ClapCaptionPrefix`` / ``only_prefix`` behavior)."""

    def label(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen"
            if cfg.only_prefix and path[0].key == "gpt2"
            else "trainable",
            params,
        )

    return label


# ---------------------------------------------------------------------------
# Cross-attention variants (ClapCaptionCrossattention / _v2,
# caption_model.py:100-207)
# ---------------------------------------------------------------------------

import flax.linen as nn  # noqa: E402


class _SoundEffectCrossAttention(nn.Module):
    """torch ``nn.MultiheadAttention(prefix_size, 4, batch_first=True)``
    equivalent: fused qkv in-projection + out projection."""

    dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, q, kv, key_mask=None):  # q: [B,1,E], kv: [B,k,E]
        B, _, E = q.shape
        h = self.num_heads
        d = E // h
        qp = nn.Dense(E, name="q_proj")(q)
        kp = nn.Dense(E, name="k_proj")(kv)
        vp = nn.Dense(E, name="v_proj")(kv)
        qp = qp.reshape(B, 1, h, d).transpose(0, 2, 1, 3)
        kp = kp.reshape(B, -1, h, d).transpose(0, 2, 1, 3)
        vp = vp.reshape(B, -1, h, d).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", qp, kp) / jnp.sqrt(d).astype(q.dtype)
        if key_mask is not None:  # True = masked out (torch attn_mask bool)
            att = jnp.where(key_mask[:, None, :, :], -1e9, att)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vp)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, E)
        return nn.Dense(E, name="out_proj")(out)


def init_cross_attention(rng: jax.Array, cfg: CaptionConfig) -> dict:
    mod = _SoundEffectCrossAttention(cfg.prefix_size)
    dummy_q = jnp.zeros((1, 1, cfg.prefix_size))
    dummy_kv = jnp.zeros((1, max(cfg.sound_effect_num, 1), cfg.prefix_size))
    return mod.init(rng, dummy_q, dummy_kv)["params"]


def cross_attention_prefix(
    params: dict,
    cfg: CaptionConfig,
    prefix: jax.Array,                 # [B, E]
    label_embeddings: jax.Array,       # [N, E]
    version: int = 1,
    train: bool = False,
    mask_probability: float = 0.25,
    rng: Optional[jax.Array] = None,
):
    """Refine the CLAP prefix by cross-attending over its top-k sound
    effects. v1 replaces the prefix (caption_model.py:120-128); v2 adds a
    residual and randomly masks effects during training, re-opening one
    effect when all got masked (:174-186)."""
    idx = sound_effect_choice(prefix, label_embeddings, cfg.sound_effect_num)
    chosen = label_embeddings[idx]  # [B, k, E]

    key_mask = None
    if version == 2 and train:
        assert rng is not None, "v2 training masking needs an rng"
        k1, k2 = jax.random.split(rng)
        k = cfg.sound_effect_num
        m = jax.random.uniform(k1, (prefix.shape[0], 1, k)) < mask_probability
        # rows that masked everything re-open one random effect
        all_masked = jnp.sum(m, axis=-1, keepdims=True) == k
        reopen = jax.nn.one_hot(
            jax.random.randint(k2, (prefix.shape[0], 1), 0, k), k, dtype=bool
        )
        key_mask = jnp.where(all_masked, m & ~reopen, m)

    mod = _SoundEffectCrossAttention(cfg.prefix_size)
    out = mod.apply({"params": params["cross_attention"]},
                    prefix[:, None], chosen, key_mask)[:, 0]
    return out if version == 1 else out + prefix


def caption_cross_train_logits(
    params: dict,
    cfg: CaptionConfig,
    tokens: jax.Array,
    prefix: jax.Array,
    mask: jax.Array,
    label_embeddings: jax.Array,
    version: int = 1,
    train: bool = True,
    mask_probability: float = 0.25,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Cross-attention caption forward; logits aligned like the base model
    without hard prompts (slice ``prefix_length-1:-1``)."""
    refined = cross_attention_prefix(
        params, cfg, prefix, label_embeddings, version, train,
        mask_probability, rng,
    )
    proj = prefix_projections(params, cfg, refined)
    embeds = jnp.concatenate([proj, gpt2_embed(params["gpt2"], tokens)], axis=1)
    logits = gpt2_forward(params["gpt2"], cfg.gpt2, embeds, mask)
    return logits[:, cfg.prefix_length - 1 : -1]
