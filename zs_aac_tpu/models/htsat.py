"""HTSAT — hierarchical token-semantic audio transformer (Swin) encoder.

Capability parity with ``/root/reference/retrieval/models/htsat.py``
(WavCaps' HTSAT_Swin_Transformer): the log-mel spectrogram is folded into a
256x256 "image" (``reshape_wav2img``, htsat.py:908-923), patch-embedded 4x4,
processed by 4 Swin stages (depths [2,2,6,2], heads [4,8,16,32], window 8,
shifted windows on odd blocks, relative position bias, patch merging), then
re-grouped over frequency for a token-semantic conv head. ``__call__``
returns the 768-d ``embedding`` (the ASE audio feature, htsat.py:941-958);
``forward_features`` also exposes clipwise/framewise outputs for tagging.

TPU-native notes: everything is fixed-shape — window partition is pure
reshape/transpose, the shifted-window attention mask and relative-position
index are precomputed in numpy at module-construction time, and the
reference's ``nn.functional.interpolate(mode="bicubic",
align_corners=True)`` time-axis resize is expressed as one precomputed
sparse matmul (exact same semantics, MXU-friendly).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from zs_aac_tpu.ops.specaug import spec_augment

__all__ = ["HTSAT", "bicubic_resize_matrix"]


# ---------------------------------------------------------------------------
# numpy-precomputed constants
# ---------------------------------------------------------------------------


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """PyTorch's bicubic convolution kernel (Keys, a=-0.75)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1,
        (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=8)
def bicubic_resize_matrix(t_in: int, t_out: int) -> np.ndarray:
    """[t_in, t_out] weights for 1-D bicubic resize with align_corners=True."""
    if t_in == t_out:
        return np.eye(t_in, dtype=np.float32)
    scale = (t_in - 1) / (t_out - 1)
    w = np.zeros((t_in, t_out), np.float64)
    for o in range(t_out):
        src = o * scale
        base = int(np.floor(src))
        for k in range(-1, 3):
            idx = min(max(base + k, 0), t_in - 1)
            w[idx, o] += _cubic_kernel(np.array(src - (base + k)))
    return w.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # [wh*ww, wh*ww]


@functools.lru_cache(maxsize=32)
def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> Optional[np.ndarray]:
    """[nW, win*win, win*win] additive mask (0 / -100) for SW-MSA."""
    if shift == 0:
        return None
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = (
        img.reshape(h // window, window, w // window, window)
        .transpose(0, 2, 1, 3)
        .reshape(-1, window * window)
    )
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x, window):
    """[B, H, W, C] -> [B*nW, window*window, C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


def _window_reverse(x, window, H, W):
    B = x.shape[0] // ((H // window) * (W // window))
    x = x.reshape(B, H // window, W // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


class _LinParams(nn.Module):
    """Bare Dense parameters (same init AND same param paths as nn.Dense,
    so checkpoints/converters are layout-stable) — lets the fused Pallas
    path consume the raw kernels."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.din, self.dout))
        b = self.param("bias", nn.initializers.zeros, (self.dout,))
        return k, b


class _LNParams(nn.Module):
    """Bare LayerNorm parameters (same init and param paths as
    nn.LayerNorm) — lets the whole-block fused Pallas path consume the raw
    scale/bias while the XLA path keeps using nn.LayerNorm on the
    identical tree."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class _WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, fused_image=None, shift: int = 0,
                 return_raw: bool = False):
        """Windowed attention.

        XLA path: ``x`` is pre-partitioned [B_, N, C]. Fused path: pass the
        un-partitioned image via ``fused_image`` [B, H, W, C] (ignore ``x``)
        — the whole roll/partition/attend/reverse/unroll chain runs inside
        one Pallas kernel (ops/window_attn.py). ``return_raw`` instead
        returns the raw kernels + per-window bias for the whole-block fused
        path (``fused_image`` supplies the grid shape only)."""
        C = self.dim
        h = self.num_heads
        d = C // h
        N = self.window * self.window
        dt = self.dtype
        qkv_k, qkv_b = _LinParams(C, 3 * C, name="qkv")()
        proj_k, proj_b = _LinParams(C, C, name="proj")()
        table = self.param(
            "rpb_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        idx = _relative_position_index(self.window, self.window)
        rpb = table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)

        if fused_image is not None:
            from zs_aac_tpu.ops.window_attn import (
                build_window_bias,
                fused_window_attention,
            )

            B, H, W, _ = fused_image.shape
            nH, nW = H // self.window, W // self.window
            bias = build_window_bias(rpb, mask, nH, nW)
            if return_raw:
                return (qkv_k.astype(dt), qkv_b.astype(dt),
                        proj_k.astype(dt), proj_b.astype(dt), bias)
            return fused_window_attention(
                fused_image.astype(dt), qkv_k.astype(dt), qkv_b.astype(dt),
                proj_k.astype(dt), proj_b.astype(dt), bias,
                self.window, h, shift,
            )

        x = x.astype(dt)
        B_, N_, C_ = x.shape
        qkv = x @ qkv_k.astype(dt) + qkv_b.astype(dt)
        qkv = qkv.reshape(B_, N_, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = jnp.einsum("bhqd,bhkd->bhqk", q * (d**-0.5), k)
        att = att + rpb[None]

        if mask is not None:
            nWm = mask.shape[0]
            att = att.reshape(B_ // nWm, nWm, h, N_, N_) + mask[None, :, None]
            att = att.reshape(B_, h, N_, N_)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N_, C_)
        return (out.astype(dt) @ proj_k.astype(dt) + proj_b.astype(dt))


class _SwinBlock(nn.Module):
    dim: int
    input_resolution: tuple
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32
    fused_attn: bool = False
    fused_block: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        H, W = self.input_resolution
        window, shift = self.window, self.shift
        if min(H, W) <= window:
            shift = 0
            window = min(H, W)
        B, L, C = x.shape

        if self.fused_block and train:
            # whole-block TRAIN kernels: fused Pallas forward AND split
            # Pallas backward (ops/window_attn.py::fused_swin_block_train);
            # drop_path enters as per-sample keep scales. Falls through to
            # the layered path when the working set exceeds VMEM.
            from zs_aac_tpu.ops.window_attn import (
                _pick_rows_block_train,
                fused_swin_block_train,
            )

            hidden = int(C * self.mlp_ratio)
            fits = _pick_rows_block_train(
                H // window, W // window, window * window, C,
                self.num_heads, hidden, jnp.dtype(self.dtype).itemsize,
            ) is not None
            if fits:
                dt = self.dtype
                x4 = x.reshape(B, H, W, C).astype(dt)
                mask = _shift_attn_mask(H, W, window, shift)
                mask = jnp.asarray(mask) if mask is not None else None
                attn = _WindowAttention(C, window, self.num_heads, dt,
                                        name="attn")
                qkv_k, qkv_b, proj_k, proj_b, bias = attn(
                    None, mask, fused_image=x4, shift=shift,
                    return_raw=True)
                ln1_s, ln1_b = _LNParams(C, name="norm1")()
                ln2_s, ln2_b = _LNParams(C, name="norm2")()
                fc1_k, fc1_b = _LinParams(C, hidden, name="fc1")()
                fc2_k, fc2_b = _LinParams(hidden, C, name="fc2")()
                if self.drop_path > 0.0:
                    keep = 1.0 - self.drop_path
                    r1, r2 = jax.random.split(self.make_rng("dropout"))
                    m1 = jax.random.bernoulli(r1, keep, (B,)).astype(
                        jnp.float32) / keep
                    m2 = jax.random.bernoulli(r2, keep, (B,)).astype(
                        jnp.float32) / keep
                else:
                    m1 = m2 = jnp.ones((B,), jnp.float32)
                out = fused_swin_block_train(
                    x4, ln1_s, ln1_b, qkv_k, qkv_b, proj_k, proj_b,
                    ln2_s, ln2_b, fc1_k.astype(dt), fc1_b.astype(dt),
                    fc2_k.astype(dt), fc2_b.astype(dt), bias, m1, m2,
                    window, self.num_heads, shift, 1e-6,
                )
                return out.reshape(B, L, C)

        if self.fused_block and not train:
            # whole-block Pallas kernel (LN1/attn/residual/LN2/MLP/residual
            # VMEM-resident); eval-only — drop_path is identity there.
            # Stage 4 (MLP weights ~14 MB > VMEM) stays on the attention-
            # only kernel + XLA MLP: the round-4 MLP-streamed whole-block
            # variant (ops/window_attn.py::_block_kernel_stream) measured
            # NEGATIVE end-to-end (26.41 vs 25.82 ms/batch @B=64 — with
            # the chunk grid dim innermost the fc chunks re-stream per
            # batch element, ~600 MB/block invocation; batch-blocking the
            # grid is VMEM-infeasible under the masked-head attention
            # formulation). Kernel + parity test retained as the record.
            from zs_aac_tpu.ops.window_attn import (
                _pick_rows_block,
                fused_swin_block,
            )

            hidden = int(C * self.mlp_ratio)
            fits = _pick_rows_block(
                H // window, W // window, window * window, C,
                self.num_heads, hidden, jnp.dtype(self.dtype).itemsize,
            ) is not None
            if fits:
                dt = self.dtype
                x4 = x.reshape(B, H, W, C).astype(dt)
                mask = _shift_attn_mask(H, W, window, shift)
                mask = jnp.asarray(mask) if mask is not None else None
                attn = _WindowAttention(C, window, self.num_heads, dt,
                                        name="attn")
                qkv_k, qkv_b, proj_k, proj_b, bias = attn(
                    None, mask, fused_image=x4, shift=shift,
                    return_raw=True)
                ln1_s, ln1_b = _LNParams(C, name="norm1")()
                ln2_s, ln2_b = _LNParams(C, name="norm2")()
                fc1_k, fc1_b = _LinParams(C, hidden, name="fc1")()
                fc2_k, fc2_b = _LinParams(hidden, C, name="fc2")()
                out = fused_swin_block(
                    x4, ln1_s, ln1_b, qkv_k, qkv_b, proj_k, proj_b,
                    ln2_s, ln2_b, fc1_k.astype(dt), fc1_b.astype(dt),
                    fc2_k.astype(dt), fc2_b.astype(dt), bias,
                    window, self.num_heads, shift, 1e-6,
                )
                return out.reshape(B, L, C)

        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(B, H, W, C)
        mask = _shift_attn_mask(H, W, window, shift)
        mask = jnp.asarray(mask) if mask is not None else None
        attn = _WindowAttention(C, window, self.num_heads, self.dtype,
                                name="attn")
        if self.fused_attn:
            x = attn(None, mask, fused_image=x, shift=shift)
        else:
            if shift > 0:
                x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            xw = _window_partition(x, window)
            xw = attn(xw, mask)
            x = _window_reverse(xw, window, H, W)
            if shift > 0:
                x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(B, L, C)

        x = shortcut + self._drop_path(x, train)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, dtype=self.dtype, name="fc2")(h)
        return x + self._drop_path(h, train)

    def _drop_path(self, x, train):
        if not train or self.drop_path == 0.0:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1))
        return x * mask.astype(x.dtype) / keep


class _PatchMerging(nn.Module):
    input_resolution: tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(B, -1, 4 * C)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)


class HTSAT(nn.Module):
    """Swin audio encoder. ``__call__(spec [B,T,F], train) -> [B, 768]``."""

    spec_size: int = 256
    patch_stride: int = 4
    patch_size: int = 4
    num_classes: int = 527
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    n_mels: int = 64
    spec_augmentation: bool = True
    remat: bool = False  # rematerialize swin blocks (reference use_checkpoint)
    # Pallas fused window attention (inference): True/False for all stages,
    # or a tuple of stage indices (e.g. (0, 1)) to fuse only those stages.
    fused_attn: Any = False
    # Pallas whole-block fusion (eval only; LN/attn/MLP/residuals in one
    # kernel). Same True/False/stage-tuple convention; a stage whose MLP
    # weights exceed the kernel's VMEM budget silently falls back to
    # ``fused_attn``'s path for that block.
    fused_block: Any = False
    dtype: Any = jnp.float32

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.n_mels

    def _stage_fused(self, i: int, attr=None) -> bool:
        attr = self.fused_attn if attr is None else attr
        if isinstance(attr, (tuple, list, frozenset)):
            return i in attr
        return bool(attr)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    def _reshape_wav2img(self, x):
        """[B, T, F] -> [B, 256, 256, 1] (htsat.py:908-923)."""
        B, T, F = x.shape
        target_T = self.spec_size * self.freq_ratio
        target_F = self.spec_size // self.freq_ratio
        assert T <= target_T and F <= target_F, "spectrogram larger than swin input"
        if T < target_T:
            x = jnp.einsum(
                "btf,to->bof", x, jnp.asarray(bicubic_resize_matrix(T, target_T))
            )
        if F < target_F:
            x = jnp.einsum(
                "btf,fo->bto", x, jnp.asarray(bicubic_resize_matrix(F, target_F))
            )
        # [B, F, T] -> fold time into freq_ratio vertical chunks.
        x = x.transpose(0, 2, 1)  # B, F, T
        fr = self.freq_ratio
        x = x.reshape(B, target_F, fr, target_T // fr)
        x = x.transpose(0, 2, 1, 3).reshape(B, fr * target_F, target_T // fr)
        return x[..., None]  # NHWC, H=freq-folded axis, W=time

    @nn.compact
    def __call__(self, spec, *, train: bool = False, return_dict: bool = False):
        # Input BN over mel bins + SpecAugment (htsat.py:941-950).
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn0",
        )(spec)
        if train and self.spec_augmentation:
            x = spec_augment(self.make_rng("specaug"), x)

        x = self._reshape_wav2img(x)  # [B, 256, 256, 1]

        # Patch embed: conv k4 s4 + LN.
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_stride, self.patch_stride),
            padding="VALID", dtype=self.dtype, name="patch_proj",
        )(x)
        B, Hp, Wp, C = x.shape
        x = x.reshape(B, Hp * Wp, C)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        res = (Hp, Wp)
        blk_id = 0
        for i, depth in enumerate(self.depths):
            dim = int(self.embed_dim * 2**i)
            for j in range(depth):
                block_cls = _SwinBlock
                if self.remat:
                    # trade FLOPs for HBM during training (the reference's
                    # use_checkpoint flag, htsat.py:612 / BasicLayer:614).
                    # static_argnums=(2,): (module, x, train) — train static.
                    block_cls = nn.remat(_SwinBlock, static_argnums=(2,))
                x = block_cls(
                    dim=dim, input_resolution=res, num_heads=self.num_heads[i],
                    window=self.window_size,
                    shift=0 if j % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, drop_path=float(dpr[blk_id]),
                    dtype=self.dtype, fused_attn=self._stage_fused(i),
                    fused_block=self._stage_fused(i, self.fused_block),
                    name=f"layer{i}_block{j}",
                )(x, train)
                blk_id += 1
            if i < len(self.depths) - 1:
                x = _PatchMerging(res, dtype=self.dtype, name=f"downsample{i}")(x)
                res = (res[0] // 2, res[1] // 2)

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)  # [B, SF*ST, C]
        SF, ST = res
        C = x.shape[-1]
        x = x.transpose(0, 2, 1).reshape(B, C, SF, ST)

        # Frequency re-grouping (htsat.py:836-841).
        fr = self.freq_ratio
        c_freq_bin = SF // fr
        x = x.reshape(B, C, SF // c_freq_bin, c_freq_bin, ST)
        x = x.transpose(0, 1, 3, 2, 4).reshape(B, C, c_freq_bin, -1)

        # The ASE audio feature: global average (htsat.py:851-853).
        embedding = jnp.mean(x.reshape(B, C, -1), axis=-1)
        if not return_dict:
            return embedding

        # Fine-grained latent: mean over the regrouped freq bins, then the
        # reference's nearest-neighbour time upsample (htsat.py:836-841 —
        # ``interpolate`` repeats each step 8*patch_stride times) to
        # [B, T'*8*ps, C].
        fine_grained = jnp.mean(x, axis=2).transpose(0, 2, 1)  # [B, T', C]
        fine_grained = jnp.repeat(fine_grained, 8 * self.patch_stride, axis=1)
        # Token-semantic conv head: kernel (c_freq_bin, 3), padding (0, 1).
        xt = x.transpose(0, 2, 3, 1)  # NHWC
        logits_map = nn.Conv(
            self.num_classes, (c_freq_bin, 3), padding=((0, 0), (1, 1)),
            dtype=self.dtype, name="tscam_conv",
        )(xt)  # [B, 1, T', classes]
        logits = logits_map[:, 0]  # [B, T', classes]
        framewise = jax.nn.sigmoid(logits)
        framewise = jnp.repeat(framewise, 8 * self.patch_stride, axis=1)
        clipwise = jax.nn.sigmoid(jnp.mean(logits, axis=1))
        return {
            "embedding": embedding,
            "fine_grained_embedding": fine_grained,
            "framewise_output": framewise,
            "clipwise_output": clipwise,
        }
