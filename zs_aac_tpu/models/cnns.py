"""PANNs-family CNN audio encoders (layer L1), TPU-native flax.linen.

Capability parity with ``/root/reference/retrieval/models/cnns.py``:
``Cnn10`` (4 conv blocks -> 512-d), ``Cnn14`` (6 conv blocks -> 2048-d, the
live CNN encoder), and ``ResNet38`` (ResNet-34-style trunk -> 2048-d), each:
input BatchNorm over mel bins, optional SpecAugment, conv stack with 2x2 avg
pooling and dropout 0.2, mel-mean then time-(max+mean) clip pooling.

Reference bugs intentionally NOT replicated (SURVEY.md §8.2): the reference's
``Cnn10``/``ResNet38`` crash on an undefined ``self.dropout``; here all three
use the working p=0.2.

TPU-first design choices: NHWC layout throughout (XLA's preferred conv
layout on TPU; PyTorch OIHW weights are transposed once at conversion time),
the log-mel frontend is kept outside the module (parameter-free, see
``zs_aac_tpu.ops.logmel``), and SpecAugment is a fixed-shape masked multiply
(``zs_aac_tpu.ops.specaug``) so the whole train step stays jittable.

Modules take spectrograms ``[B, T, F]`` and return clip features ``[B, C]``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from zs_aac_tpu.ops.specaug import spec_augment

__all__ = ["ConvBlock", "Cnn10", "Cnn14", "ResNet38"]


class ConvBlock(nn.Module):
    """Two 3x3 conv+BN+ReLU layers followed by pooling."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, pool_size=(2, 2), pool_type="avg"):
        for name in ("conv1", "conv2"):
            x = nn.Conv(
                self.features, (3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype, name=name,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name.replace("conv", "bn"),
            )(x)
            x = nn.relu(x)
        if pool_size != (1, 1):
            if pool_type == "avg":
                x = nn.avg_pool(x, pool_size, strides=pool_size)
            elif pool_type == "max":
                x = nn.max_pool(x, pool_size, strides=pool_size)
            elif pool_type == "avg+max":
                x = nn.avg_pool(x, pool_size, strides=pool_size) + nn.max_pool(
                    x, pool_size, strides=pool_size
                )
            else:
                raise ValueError(f"unknown pool_type {pool_type!r}")
        return x


def _input_bn_and_augment(mod, x, train: bool, spec_augmentation: bool):
    """Shared stem: per-mel-bin BatchNorm + optional SpecAugment.

    The reference transposes the spectrogram so the 64 mel bins sit in the
    BatchNorm2d channel dim; here the mel axis is already last ([B, T, F])
    so a feature-axis BatchNorm is the same statistic.
    """
    x = nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=mod.dtype, name="bn0",
    )(x)
    if train and spec_augmentation:
        x = spec_augment(mod.make_rng("specaug"), x)
    return x


class _CnnBase(nn.Module):
    """Shared forward for Cnn10/Cnn14: conv blocks + dropout + clip pooling."""

    channels: Sequence[int] = ()
    spec_augmentation: bool = True
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spec, *, train: bool = False):
        x = _input_bn_and_augment(self, spec, train, self.spec_augmentation)
        x = x[..., None]  # [B, T, F, 1] NHWC
        for i, ch in enumerate(self.channels):
            x = ConvBlock(ch, dtype=self.dtype, name=f"conv_block{i + 1}")(
                x, train=train, pool_size=(2, 2), pool_type="avg"
            )
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = jnp.mean(x, axis=2)  # mean over mel -> [B, T', C]
        x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)  # time max + mean
        return x


class Cnn10(_CnnBase):
    channels: Sequence[int] = (64, 128, 256, 512)


class Cnn14(_CnnBase):
    channels: Sequence[int] = (64, 128, 256, 512, 1024, 2048)


class _ResnetBasicBlock(nn.Module):
    """PANNs ResNet basic block: stride-2 realized as a leading 2x2 avg pool."""

    features: int
    stride: int = 1
    use_downsample: bool = False
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        identity = x
        out = nn.avg_pool(x, (2, 2), strides=(2, 2)) if self.stride == 2 else x
        out = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                      dtype=self.dtype, name="conv1")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        out = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn2")(out)

        if self.use_downsample:
            if self.stride == 2:
                identity = nn.avg_pool(identity, (2, 2), strides=(2, 2))
            identity = nn.Conv(self.features, (1, 1), use_bias=False,
                               dtype=self.dtype, name="ds_conv")(identity)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype, name="ds_bn")(identity)

        return nn.relu(out + identity)


class ResNet38(nn.Module):
    """PANNs ResNet38: ConvBlock stem, ResNet-34 trunk [3,4,6,3], 2048-d head."""

    spec_augmentation: bool = True
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, spec, *, train: bool = False):
        x = _input_bn_and_augment(self, spec, train, self.spec_augmentation)
        x = x[..., None]
        x = ConvBlock(64, dtype=self.dtype, name="conv_block1")(
            x, train=train, pool_size=(2, 2), pool_type="avg"
        )
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        in_planes = 64
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                ds = b == 0 and (s != 1 or in_planes != planes)
                x = _ResnetBasicBlock(
                    planes, stride=s, use_downsample=ds,
                    dropout_rate=self.dropout_rate, dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x, train=train)
                in_planes = planes

        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = ConvBlock(2048, dtype=self.dtype, name="conv_block_after1")(
            x, train=train, pool_size=(1, 1), pool_type="avg"
        )
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = jnp.mean(x, axis=2)
        x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)
        return x
