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


def convert_htsat(state_dict: Mapping, depths=(2, 2, 6, 2)) -> dict:
    """HTSAT (WavCaps ``HTSAT.ckpt`` / CLAP audio tower) state_dict ->
    variables for ``models.htsat.HTSAT``.

    Mirrors the reference's key surgery (skip spectrogram_extractor /
    logmel_extractor / spec_augmenter; the unused ``head`` Linear is also
    dropped — the embedding path never applies it, htsat.py:957).
    """
    sd = to_numpy_state_dict(state_dict)
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
