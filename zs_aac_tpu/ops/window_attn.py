"""Fused Swin window attention as a Pallas TPU kernel.

The Swin blocks in ``models/htsat.py`` are the CLAP audio tower's hot loop
(SURVEY.md §3 hot-loop #1). The XLA path spends most of stage-1/2 time NOT
in matmuls but in HBM relayouts: ``roll -> window_partition (transpose) ->
attention -> window_reverse (transpose) -> roll back`` each materialize the
full [B, H, W, C] activation (measured: stage 1 alone is half the trunk
time at ~2% MFU). This kernel reads each window-row slab into VMEM once and
does the (cyclic column shift, windowing, qkv, bias+mask, softmax, value,
proj, un-shift) chain entirely in VMEM — no windowed or column-rolled HBM
intermediates exist. The row component of the cyclic shift is expressed as
a wrap-extended slice on input and a single roll on output (1 copy vs the
XLA path's ~5 full-activation relayouts per shifted block).

Measured (v5e, chained-data-dep timing — NOT repeated identical calls,
which the axon tunnel serves from cache): full-trunk parity with the XLA
path but perf-NEUTRAL (28.7 ms vs 28.7 ms at B=64 bf16; 0.96x at B=32).
The relayout savings are currently offset by the per-head python loop's
small matmuls ([nW, N, d] with d=24..32 pads badly on the MXU). Kept
off-by-default as the base for further stage-1 kernel work.

``bias``: per-window fp32 (relative-position bias + shift mask), shape
[nH, nW, h, N, N], precomputed on host in the rolled window frame.

Parity: tests require the kernel to match the XLA formulation
(``models/htsat.py::_WindowAttention`` + partition/roll) on all HTSAT
stage shapes, shifted and unshifted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_window_attention", "build_window_bias"]


def build_window_bias(rpb, mask, nH: int, nW: int):
    """Per-window additive bias for the fused kernel.

    ``rpb`` [h, N, N] relative-position bias; ``mask`` [nH*nW, N, N] shift
    mask or None. Returns [nH, nW, h, N, N] fp32 (window id = i*nW + j,
    the rolled-frame partition order, matching ``_shift_attn_mask``)."""
    h, N, _ = rpb.shape
    b = jnp.broadcast_to(rpb[None, None], (nH, nW, h, N, N))
    if mask is not None:
        b = b + jnp.asarray(mask).reshape(nH, nW, 1, N, N)
    return b.astype(jnp.float32)


def _kernel(x_ref, qkv_w_ref, qkv_b_ref, proj_w_ref, proj_b_ref, bias_ref,
            out_ref, *, window: int, num_heads: int, shift: int):
    """One window-row slab: x_ref [1, w, W, C] -> out_ref [1, w, W, C]."""
    w = window
    slab = x_ref[0]                       # [w, W, C]
    W = slab.shape[1]
    C = slab.shape[2]
    h = num_heads
    d = C // h
    N = w * w
    nW = W // w

    if shift:
        # cyclic column shift in VMEM
        slab = jnp.concatenate([slab[:, shift:], slab[:, :shift]], axis=1)

    # [w, W, C] -> [nW, N, C]: column chunks become windows
    xw = slab.reshape(w, nW, w, C).transpose(1, 0, 2, 3).reshape(nW, N, C)

    qkv = (
        jnp.dot(xw.reshape(nW * N, C), qkv_w_ref[:],
                preferred_element_type=jnp.float32)
        + qkv_b_ref[0]
    )                                      # [nW*N, 3C]
    # Mosaic constraints shape the next part: tpu.matmul takes at most one
    # batch dim, and shape casts may only split/merge MAJOR dims (the
    # [.., 3, h, d] minor-dim split is rejected). So heads are a small
    # static python loop over major-dim-only reshapes.
    scale = float(1.0 / np.sqrt(d))
    bias = bias_ref[0]                     # [nW, h, N, N]
    head_outs = []
    for head in range(h):
        def sl(base):
            col = base + head * d
            return qkv[:, col : col + d].reshape(nW, N, d)

        qh, kh, vh = sl(0), sl(C), sl(2 * C)
        s = jax.lax.dot_general(
            qh * scale, kh,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                  # [nW, N, N]
        s = s + bias[:, head]
        p = jax.nn.softmax(s, axis=-1)
        oh = jax.lax.dot_general(
            p, vh,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                  # [nW, N, d]
        head_outs.append(oh.reshape(nW * N, d))
    o = jnp.concatenate(head_outs, axis=1).astype(x_ref.dtype)  # [nW*N, C]
    o = (
        jnp.dot(o, proj_w_ref[:], preferred_element_type=jnp.float32)
        + proj_b_ref[0]
    ).astype(x_ref.dtype)

    # [nW, N, C] -> [w, W, C]
    o = o.reshape(nW, w, w, C).transpose(1, 0, 2, 3).reshape(w, W, C)
    if shift:
        # cyclic column un-shift in VMEM
        o = jnp.concatenate([o[:, W - shift :], o[:, : W - shift]], axis=1)
    out_ref[0] = o


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def fused_window_attention(
    x: jax.Array,          # [B, H, W, C]
    qkv_w: jax.Array,      # [C, 3C]
    qkv_b: jax.Array,      # [3C]
    proj_w: jax.Array,     # [C, C]
    proj_b: jax.Array,     # [C]
    bias: jax.Array,       # [nH, nW, h, N, N] fp32
    window: int,
    num_heads: int,
    shift: int,
) -> jax.Array:
    B, H, W, C = x.shape
    w = window
    nH, nW = H // w, W // w
    N = w * w

    if shift:
        # rolled row p holds original row (p+shift) mod H: a wrap-extended
        # slice replaces the row roll on input
        x_in = jax.lax.slice_in_dim(
            jnp.concatenate([x, x[:, :w]], axis=1), shift, shift + H, axis=1
        )
    else:
        x_in = x

    out = pl.pallas_call(
        functools.partial(_kernel, window=w, num_heads=num_heads, shift=shift),
        grid=(B, nH),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, w, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nW, num_heads, N, N), lambda b, i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
    )(x_in, qkv_w, qkv_b.reshape(1, -1), proj_w, proj_b.reshape(1, -1), bias)

    if shift:
        # single row un-roll (the only full-activation copy on this path)
        out = jnp.roll(out, shift, axis=1)
    return out
