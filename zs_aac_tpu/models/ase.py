"""ASE — the CLAP-style audio-text contrastive model (layer L2).

Capability parity with ``/root/reference/retrieval/models/ase_model.py``:
audio and text towers projected through 2-layer ReLU MLPs into a shared
L2-normalized ``embed_size`` (1024) space, a learnable temperature (init
0.07), bidirectional soft-target contrastive loss with multi-positive
targets derived from audio ids (``ase_model.py:62-80``), and optional
embedding L1/L2 regularization.

The text-model registry mirrors the reference's 13-entry MODELS table
(``text_encoder.py:22-35``) as named BertConfig presets (all the live
configs are BERT-family; GPT-2/CLIP text towers can be added when used).

Towers: ``models.cnns.Cnn14`` / ``models.htsat.HTSAT`` (audio, takes
precomputed log-mel from ``ops.logmel``) and ``models.bert.BertEncoder``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from zs_aac_tpu.models.bert import BertConfig, BertEncoder

__all__ = ["ASEConfig", "ASE", "atc_loss", "ntxent_loss", "TEXT_MODEL_REGISTRY", "text_config"]


# name -> (BertConfig kwargs, width). Mirrors text_encoder.py:22-35.
TEXT_MODEL_REGISTRY = {
    "prajjwal1/bert-tiny": dict(hidden_size=128, num_hidden_layers=2,
                                num_attention_heads=2, intermediate_size=512),
    "prajjwal1/bert-mini": dict(hidden_size=256, num_hidden_layers=4,
                                num_attention_heads=4, intermediate_size=1024),
    "prajjwal1/bert-small": dict(hidden_size=512, num_hidden_layers=4,
                                 num_attention_heads=8, intermediate_size=2048),
    "prajjwal1/bert-medium": dict(hidden_size=512, num_hidden_layers=8,
                                  num_attention_heads=8, intermediate_size=2048),
    "bert-base-uncased": dict(hidden_size=768, num_hidden_layers=12,
                              num_attention_heads=12, intermediate_size=3072),
    "bert-large-uncased": dict(hidden_size=1024, num_hidden_layers=24,
                               num_attention_heads=16, intermediate_size=4096),
    # RoBERTa / DistilBERT entries from the reference registry: same
    # encoder architecture at these widths (RoBERTa's vocab/position offset
    # differences are handled at conversion time; DistilBERT has no token
    # types — type_vocab_size=2 embeddings simply stay zero-indexed).
    "roberta-base": dict(vocab_size=50265, hidden_size=768, num_hidden_layers=12,
                         num_attention_heads=12, intermediate_size=3072,
                         max_position_embeddings=514),
    "roberta-large": dict(vocab_size=50265, hidden_size=1024, num_hidden_layers=24,
                          num_attention_heads=16, intermediate_size=4096,
                          max_position_embeddings=514),
    "distilroberta-base": dict(vocab_size=50265, hidden_size=768,
                               num_hidden_layers=6, num_attention_heads=12,
                               intermediate_size=3072,
                               max_position_embeddings=514),
    "distilbert-base-uncased": dict(hidden_size=768, num_hidden_layers=6,
                                    num_attention_heads=12,
                                    intermediate_size=3072),
}

# GPT-2 family text towers (registry rows 'gpt2'/'distilgpt2',
# text_encoder.py:27-28) — built by models.text_towers.GPT2TextEncoder.
CLIP_TEXT_REGISTRY = {
    "openai/clip-vit-base-patch32": dict(),
    "clip-tiny": dict(vocab_size=128, hidden_size=32, n_layer=2, n_head=4,
                      intermediate_size=64, max_positions=32),  # tests
}

GPT2_TEXT_REGISTRY = {
    "gpt2": dict(n_layer=12, n_embd=768, n_head=12),
    "distilgpt2": dict(n_layer=6, n_embd=768, n_head=12),
    "gpt2-tiny": dict(vocab_size=256, n_positions=64, n_layer=2, n_embd=32,
                      n_head=4),  # tests
}


def text_config(name: str) -> BertConfig:
    return BertConfig(**TEXT_MODEL_REGISTRY[name])


@dataclasses.dataclass(frozen=True)
class ASEConfig:
    embed_size: int = 1024
    temp: float = 0.07
    embed_regularization: bool = True
    audio_encoder: str = "cnn14"      # "cnn14" | "htsat"
    text_model: str = "bert-base-uncased"
    spec_augmentation: bool = True
    audio_channels: Optional[tuple] = None  # override Cnn14 widths (tests)
    # override HTSAT geometry (tests / small configs): a tuple of
    # (key, value) pairs passed through to models.htsat.HTSAT — a tuple
    # (not a dict) so the frozen config stays hashable.
    htsat_kwargs: Optional[tuple] = None
    # fused Pallas window attention in HTSAT (1.38x on the full trunk at
    # B=64 bf16 on v5e, chained-dep timing). Training-capable: the kernel
    # carries a custom_vjp whose backward is the standard XLA attention
    # grads (grad-parity-tested vs the XLA path). True/False or a tuple of
    # stage indices.
    fused_attn: Any = False
    # whole-block Pallas fusion (eval only; LN/attn/MLP/residuals in one
    # kernel — Swin trunk 21.5 -> 15.6 ms/batch at B=64 bf16 on v5e). Same
    # True/False/stage-tuple convention; over-budget stages fall back to
    # fused_attn's path per block.
    fused_block: Any = False
    dtype: Any = jnp.float32


def atc_loss(sim_a2t, sim_t2a, sim_targets=None):
    """Bidirectional soft-target contrastive loss (losses.py:13-37)."""
    if sim_targets is None:
        sim_targets = jnp.eye(sim_a2t.shape[0], dtype=sim_a2t.dtype)
    loss_a2t = -jnp.sum(jax.nn.log_softmax(sim_a2t, axis=1) * sim_targets, axis=1).mean()
    loss_t2a = -jnp.sum(jax.nn.log_softmax(sim_t2a, axis=1) * sim_targets, axis=1).mean()
    return (loss_a2t + loss_t2a) / 2


def ntxent_loss(audio_embeds, text_embeds, temperature: float = 0.07):
    """Cosine-sim NT-Xent (losses.py:40-68 — present in the reference's loss
    registry but unused by the main path)."""
    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    a, t = norm(audio_embeds), norm(text_embeds)
    a2t = a @ t.T / temperature
    t2a = t @ a.T / temperature
    return 0.5 * (-jax.nn.log_softmax(a2t, axis=1).mean()
                  - jax.nn.log_softmax(t2a, axis=1).mean())


class _Proj(nn.Module):
    embed_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_size, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.embed_size, dtype=self.dtype, name="fc2")(x)


def _l2norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class ASE(nn.Module):
    cfg: ASEConfig

    def setup(self):
        c = self.cfg
        if c.audio_encoder == "cnn14":
            from zs_aac_tpu.models.cnns import Cnn14

            kw = {"channels": c.audio_channels} if c.audio_channels else {}
            self.audio_enc = Cnn14(
                spec_augmentation=c.spec_augmentation, dtype=c.dtype,
                name="audio_enc", **kw,
            )
        elif c.audio_encoder == "resnet38":
            from zs_aac_tpu.models.cnns import ResNet38

            self.audio_enc = ResNet38(
                spec_augmentation=c.spec_augmentation, dtype=c.dtype, name="audio_enc"
            )
        elif c.audio_encoder == "htsat":
            from zs_aac_tpu.models.htsat import HTSAT

            kw = dict(
                spec_augmentation=c.spec_augmentation, dtype=c.dtype,
                fused_attn=c.fused_attn, fused_block=c.fused_block,
            )
            kw.update(dict(c.htsat_kwargs) if c.htsat_kwargs else {})
            self.audio_enc = HTSAT(name="audio_enc", **kw)
        else:
            raise ValueError(f"unknown audio encoder {c.audio_encoder!r}")
        if c.text_model in CLIP_TEXT_REGISTRY:
            from zs_aac_tpu.models.text_towers import CLIPTextConfig, CLIPTextEncoder

            self.text_enc = CLIPTextEncoder(
                CLIPTextConfig(**CLIP_TEXT_REGISTRY[c.text_model]),
                dtype=c.dtype, name="text_enc",
            )
        elif c.text_model in GPT2_TEXT_REGISTRY:
            from zs_aac_tpu.models.text_towers import GPT2EncoderConfig, GPT2TextEncoder

            self.text_enc = GPT2TextEncoder(
                GPT2EncoderConfig(**GPT2_TEXT_REGISTRY[c.text_model]),
                dtype=c.dtype, name="text_enc",
            )
        else:
            self.text_enc = BertEncoder(text_config(c.text_model), dtype=c.dtype,
                                        name="text_enc")
        self.audio_proj = _Proj(c.embed_size, c.dtype, name="audio_proj")
        self.text_proj = _Proj(c.embed_size, c.dtype, name="text_proj")
        self.temp = self.param("temp", lambda _: jnp.asarray(c.temp, jnp.float32))

    def encode_audio(self, spec, train: bool = False):
        """spec: [B, T, F] log-mel -> [B, embed_size] L2-normalized."""
        feats = self.audio_enc(spec, train=train)
        return _l2norm(self.audio_proj(feats))

    def encode_text(self, input_ids, attention_mask=None, train: bool = False):
        """-> [B, embed_size] L2-normalized CLS projection."""
        hidden = self.text_enc(input_ids, attention_mask)
        return _l2norm(self.text_proj(hidden[:, 0, :]))

    def __call__(self, spec, input_ids, attention_mask, idx, train: bool = True):
        """Contrastive loss over a batch; ``idx`` marks same-audio positives."""
        audio_embeds = self.encode_audio(spec, train=train)
        text_embeds = self.encode_text(input_ids, attention_mask, train=train)

        pos_idx = (idx[:, None] == idx[None, :]).astype(audio_embeds.dtype)
        sim_targets = pos_idx / pos_idx.sum(axis=1, keepdims=True)

        sim_a2t = audio_embeds @ text_embeds.T / self.temp
        sim_t2a = text_embeds @ audio_embeds.T / self.temp
        loss = atc_loss(sim_a2t, sim_t2a, sim_targets)
        if self.cfg.embed_regularization:
            loss = (
                loss
                + jnp.mean(jnp.abs(audio_embeds)) / jnp.sqrt(jnp.sum(audio_embeds**2))
                + jnp.mean(jnp.abs(text_embeds)) / jnp.sqrt(jnp.sum(text_embeds**2))
            )
        return loss
