"""PyTorch checkpoint -> flax pytree weight conversion.

The reference ecosystem ships PyTorch checkpoints (PANNs ``Cnn14.pth``,
``HTSAT.ckpt``, CLAP ``HTSAT-BERT-ZS.pt``, HF BERT/GPT-2 state_dicts —
loaded at ``/root/reference/retrieval/models/audio_encoder.py:29-62`` and
``text_encoder.py``). This module re-expresses those tensors in the layouts
this framework's flax modules use:

- Conv2d ``[O, I, kH, kW]``  -> ``[kH, kW, I, O]`` (NHWC/HWIO)
- Linear ``[O, I]``          -> ``[I, O]``
- GPT-2 HF ``Conv1D`` weights are already ``[I, O]`` (no transpose)
- BatchNorm/LayerNorm weight/bias -> scale/bias (+ batch_stats mean/var)

Converters return ``{"params": ..., "batch_stats": ...}`` variable dicts
ready for ``module.apply``. Inputs are either torch state_dicts or plain
``{name: np.ndarray}`` mappings (so tests need no torch).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np
from flax.traverse_util import unflatten_dict

__all__ = [
    "to_numpy_state_dict",
    "conv_kernel",
    "linear_kernel",
    "convert_cnn",
    "convert_resnet38",
    "convert_htsat",
    "convert_mapper",
    "convert_caption",
    "convert_ase",
]


def to_numpy_state_dict(state_dict: Mapping) -> Dict[str, np.ndarray]:
    """Detach a torch (or numpy) state_dict into plain float32 numpy arrays."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [O, I, kH, kW] -> flax [kH, kW, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear [O, I] -> flax [I, O]."""
    return np.transpose(w)


def _put_bn(params, stats, path, sd, prefix):
    params[path + ("scale",)] = sd[prefix + ".weight"]
    params[path + ("bias",)] = sd[prefix + ".bias"]
    stats[path + ("mean",)] = sd[prefix + ".running_mean"]
    stats[path + ("var",)] = sd[prefix + ".running_var"]


def _put_conv(params, path, sd, prefix):
    params[path + ("kernel",)] = conv_kernel(sd[prefix + ".weight"])
    if prefix + ".bias" in sd:
        params[path + ("bias",)] = sd[prefix + ".bias"]


def _put_conv_block(params, stats, path, sd, prefix):
    for c in ("conv1", "conv2"):
        _put_conv(params, path + (c,), sd, f"{prefix}.{c}")
    for b in ("bn1", "bn2"):
        _put_bn(params, stats, path + (b,), sd, f"{prefix}.{b}")


def _finish(params, stats):
    return {
        "params": unflatten_dict(params),
        "batch_stats": unflatten_dict(stats),
    }


def convert_cnn(state_dict: Mapping, n_blocks: int) -> dict:
    """PANNs Cnn10 (n_blocks=4) / Cnn14 (n_blocks=6) state_dict -> variables.

    Mirrors the reference's key filter (skip fc/spectrogram/logmel entries,
    ``audio_encoder.py:32-36``) by only consuming the bn0/conv_block keys.
    """
    sd = to_numpy_state_dict(state_dict)
    params, stats = {}, {}
    _put_bn(params, stats, ("bn0",), sd, "bn0")
    for i in range(1, n_blocks + 1):
        _put_conv_block(params, stats, (f"conv_block{i}",), sd, f"conv_block{i}")
    return _finish(params, stats)


def convert_resnet38(state_dict: Mapping, layers=(3, 4, 6, 3)) -> dict:
    """PANNs ResNet38 state_dict -> variables for ``models.cnns.ResNet38``."""
    sd = to_numpy_state_dict(state_dict)
    params, stats = {}, {}
    _put_bn(params, stats, ("bn0",), sd, "bn0")
    _put_conv_block(params, stats, ("conv_block1",), sd, "conv_block1")
    _put_conv_block(params, stats, ("conv_block_after1",), sd, "conv_block_after1")

    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            src = f"resnet.layer{stage + 1}.{b}"
            _convert_resnet_block(params, stats, sd, src, (f"layer{stage + 1}_block{b}",))
    return _finish(params, stats)


def _convert_resnet_block(params, stats, sd, src, dst):
    for c in ("conv1", "conv2"):
        _put_conv(params, dst + (c,), sd, f"{src}.{c}")
    for bn in ("bn1", "bn2"):
        _put_bn(params, stats, dst + (bn,), sd, f"{src}.{bn}")
    # Downsample Sequential: stride-1 stages are (conv, bn) = (0, 1);
    # stride-2 stages are (AvgPool, conv, bn) = (_, 1, 2)
    # (reference `_make_layer`, cnns.py:303-330).
    for ci, bi in ((0, 1), (1, 2)):
        key = f"{src}.downsample.{ci}.weight"
        if key in sd and sd[key].ndim == 4:
            _put_conv(params, dst + ("ds_conv",), sd, f"{src}.downsample.{ci}")
            _put_bn(params, stats, dst + ("ds_bn",), sd, f"{src}.downsample.{bi}")
            break


def convert_htsat(state_dict: Mapping, depths=None) -> dict:
    """HTSAT (WavCaps ``HTSAT.ckpt`` / CLAP audio tower) state_dict ->
    variables for ``models.htsat.HTSAT``.

    Mirrors the reference's key surgery (skip spectrogram_extractor /
    logmel_extractor / spec_augmenter; the unused ``head`` Linear is also
    dropped — the embedding path never applies it, htsat.py:957).
    ``depths`` defaults to inferring the stage/block structure from the
    ``layers.{i}.blocks.{j}`` keys themselves.
    """
    sd = to_numpy_state_dict(state_dict)
    if depths is None:
        found = {}
        for k in sd:
            m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.", k)
            if m:
                i, j = int(m.group(1)), int(m.group(2))
                found[i] = max(found.get(i, 0), j + 1)
        depths = tuple(found[i] for i in sorted(found))
    params, stats = {}, {}

    def put_ln(path, prefix):
        params[path + ("scale",)] = sd[prefix + ".weight"]
        params[path + ("bias",)] = sd[prefix + ".bias"]

    def put_dense(path, prefix, bias=True):
        params[path + ("kernel",)] = linear_kernel(sd[prefix + ".weight"])
        if bias and prefix + ".bias" in sd:
            params[path + ("bias",)] = sd[prefix + ".bias"]

    _put_bn(params, stats, ("bn0",), sd, "bn0")
    _put_conv(params, ("patch_proj",), sd, "patch_embed.proj")
    put_ln(("patch_norm",), "patch_embed.norm")

    for i, depth in enumerate(depths):
        for j in range(depth):
            src = f"layers.{i}.blocks.{j}"
            dst = (f"layer{i}_block{j}",)
            put_ln(dst + ("norm1",), f"{src}.norm1")
            put_ln(dst + ("norm2",), f"{src}.norm2")
            put_dense(dst + ("attn", "qkv"), f"{src}.attn.qkv")
            put_dense(dst + ("attn", "proj"), f"{src}.attn.proj")
            params[dst + ("attn", "rpb_table")] = sd[
                f"{src}.attn.relative_position_bias_table"
            ]
            put_dense(dst + ("fc1",), f"{src}.mlp.fc1")
            put_dense(dst + ("fc2",), f"{src}.mlp.fc2")
        if i < len(depths) - 1:
            put_ln((f"downsample{i}", "norm"), f"layers.{i}.downsample.norm")
            put_dense(
                (f"downsample{i}", "reduction"), f"layers.{i}.downsample.reduction",
                bias=False,
            )

    put_ln(("norm",), "norm")
    _put_conv(params, ("tscam_conv",), sd, "tscam_conv")
    return _finish(params, stats)


# ---------------------------------------------------------------------------
# Captioner checkpoints (best.pth) and full CLAP checkpoints (HTSAT-BERT-*.pt)
# ---------------------------------------------------------------------------


def convert_mapper(state_dict: Mapping, mapping_type: str, num_layers: int = 8) -> dict:
    """Reference mapper state_dict -> params for ``models.mapper``.

    Torch layouts (``/root/reference/models/mapper.py``): the MLP is an
    ``nn.Sequential`` under ``model.`` with Linears at even indices
    (``mapper.py:6-18``); the TransformerMapper holds ``linear``,
    ``prefix_const`` and ``transformer.layers.{i}`` with ``norm1/norm2``,
    ``attn.{to_queries,to_keys_values,project}`` (q/kv bias-free —
    ``TransformerLayer`` defaults ``bias=False``, ``mapper.py:81``) and
    ``mlp.{fc1,fc2}`` (``mapper.py:20-35``).
    """
    sd = to_numpy_state_dict(state_dict)
    if mapping_type == "mlp":
        idxs = sorted({int(k.split(".")[1]) for k in sd if k.startswith("model.")})
        p = {}
        for j, i in enumerate(idxs):
            p[f"fc{j}"] = {"kernel": linear_kernel(sd[f"model.{i}.weight"])}
            if f"model.{i}.bias" in sd:
                p[f"fc{j}"]["bias"] = sd[f"model.{i}.bias"]
        return p
    if mapping_type != "transformer":
        raise ValueError(f"unknown mapping_type {mapping_type!r}")

    def dense(prefix, bias=True):
        out = {"kernel": linear_kernel(sd[prefix + ".weight"])}
        if bias and prefix + ".bias" in sd:
            out["bias"] = sd[prefix + ".bias"]
        return out

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    p = {"linear": dense("linear"), "prefix_const": sd["prefix_const"]}
    for i in range(num_layers):
        src = f"transformer.layers.{i}"
        p[f"layer{i}"] = {
            "norm1": ln(f"{src}.norm1"),
            "norm2": ln(f"{src}.norm2"),
            "attn": {
                "to_queries": dense(f"{src}.attn.to_queries", bias=False),
                "to_keys_values": dense(f"{src}.attn.to_keys_values", bias=False),
                "project": dense(f"{src}.attn.project"),
            },
            "fc1": dense(f"{src}.mlp.fc1"),
            "fc2": dense(f"{src}.mlp.fc2"),
        }
    return p


def convert_caption(state_dict: Mapping, cfg) -> dict:
    """Reference ``ClapCaption*`` checkpoint (``best.pth``/``last.pth``,
    ``/root/reference/train_prompt.py:167-177``) -> the caption-model param
    pytree {"mapper", "gpt2"[, "sound_effect"]}.

    ``cfg`` is a ``models.caption.CaptionConfig`` (supplies mapping_type,
    num_layers and the GPT-2 shape). Keys: ``gpt.*`` (HF GPT2LMHeadModel),
    ``clap_project.*`` (mapper), optional ``soundeffect_project.*``.
    """
    from zs_aac_tpu.models.gpt2 import convert_gpt2

    sd = to_numpy_state_dict(state_dict)

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    out = {
        "gpt2": convert_gpt2(sub("gpt."), cfg.gpt2),
        "mapper": convert_mapper(sub("clap_project."), cfg.mapping_type,
                                 cfg.num_layers),
    }
    se = sub("soundeffect_project.")
    if se:
        out["sound_effect"] = convert_mapper(se, "mlp")
    return out


def convert_ase(state_dict: Mapping, cfg) -> dict:
    """Full CLAP checkpoint (the reference's ``HTSAT-BERT-ZS.pt`` layout,
    ``retrieval/models/ase_model.py:21-46``) -> ``models.ase.ASE`` variables.

    ``cfg`` is an ``ASEConfig``. Keys: ``audio_encoder.audio_enc.*`` (PANNs
    CNN or HTSAT), ``text_encoder.text_encoder.*`` (the HF tower),
    ``audio_proj.{0,2}.*`` / ``text_proj.{0,2}.*`` (Linear-ReLU-Linear
    Sequentials) and the scalar ``temp``.
    """
    sd = to_numpy_state_dict(state_dict)

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    audio_sd = sub("audio_encoder.audio_enc.")
    if cfg.audio_encoder == "htsat":
        audio = convert_htsat(audio_sd)
    elif cfg.audio_encoder == "resnet38":
        audio = convert_resnet38(audio_sd)
    else:
        n_blocks = len(cfg.audio_channels) if cfg.audio_channels else 6
        audio = convert_cnn(audio_sd, n_blocks=n_blocks)

    text_sd = sub("text_encoder.text_encoder.")
    from zs_aac_tpu.models.ase import CLIP_TEXT_REGISTRY, GPT2_TEXT_REGISTRY, text_config

    if cfg.text_model in CLIP_TEXT_REGISTRY:
        from zs_aac_tpu.models.text_towers import CLIPTextConfig, convert_clip_text

        text = convert_clip_text(text_sd, CLIPTextConfig(**CLIP_TEXT_REGISTRY[cfg.text_model]))
    elif cfg.text_model in GPT2_TEXT_REGISTRY:
        from zs_aac_tpu.models.text_towers import GPT2EncoderConfig, convert_gpt2_encoder

        text = convert_gpt2_encoder(text_sd, GPT2EncoderConfig(**GPT2_TEXT_REGISTRY[cfg.text_model]))
    else:
        from zs_aac_tpu.models.bert import convert_bert

        text = convert_bert(text_sd, text_config(cfg.text_model))

    def proj(prefix):
        return {
            "fc1": {"kernel": linear_kernel(sd[prefix + ".0.weight"]),
                    "bias": sd[prefix + ".0.bias"]},
            "fc2": {"kernel": linear_kernel(sd[prefix + ".2.weight"]),
                    "bias": sd[prefix + ".2.bias"]},
        }

    params = {
        "audio_enc": audio["params"],
        "text_enc": text["params"],
        "audio_proj": proj("audio_proj"),
        "text_proj": proj("text_proj"),
        "temp": np.asarray(sd["temp"], np.float32).reshape(()),
    }
    batch_stats = {}
    if audio.get("batch_stats"):
        batch_stats["audio_enc"] = audio["batch_stats"]
    return {"params": params, "batch_stats": batch_stats}
