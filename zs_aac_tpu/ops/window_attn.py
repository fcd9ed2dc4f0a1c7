"""Fused Swin window attention as a Pallas TPU kernel.

The Swin blocks in ``models/htsat.py`` are the CLAP audio tower's hot loop
(SURVEY.md §3 hot-loop #1; reference torch chain
``models/htsat.py:WindowAttention.forward`` + roll/partition/reverse).
The XLA path spends most of stage-1/2 time NOT in matmuls but in HBM
relayouts: ``roll -> window_partition (transpose) -> attention ->
window_reverse (transpose) -> roll back`` each materialize the full
[B, H, W, C] activation, and the attention matmuls contract over head dim
24 (19% MXU lane utilization). This kernel:

- reads a multi-window-row slab into VMEM once and runs the whole (cyclic
  column shift, windowing, qkv, bias+mask, softmax, value, proj, un-shift)
  chain in VMEM — no windowed or column-rolled HBM intermediates exist;
  the row component of the cyclic shift is a wrap-extended slice on input
  plus a single roll on output.
- uses a *masked-head* attention formulation: instead of h small
  [N, d=24]-contraction matmuls per window, it builds
  ``q_all [nWin, h*N, C]`` where head-block h of rows is q with all but
  that head's channels zeroed, so scores for ALL heads come from ONE
  full-C-contraction MXU dot ``q_all @ k^T`` (and values from one
  ``p_all @ v``). This costs h x the naive flops but at full lane
  utilization — and h*C*H*W is constant across HTSAT stages, so every
  fused block costs the same ~26 GFLOP at batch 64, well under the MXU
  roofline where the relayout-bound XLA path sits.

Measured (v5e, chained-data-dep timing — NOT repeated identical calls,
which the axon tunnel serves from cache), full HTSAT trunk B=64 bf16:
30.6 ms all-XLA -> 22.2 ms all-fused (1.38x); per-stage ablation shows
stage 1 contributes most (-5.9 ms). A first kernel version that kept the
reference's per-head [N, d=24] dots was perf-NEUTRAL despite fusing the
relayouts — the masked-head big-matmul formulation is what unlocks it.

``bias``: per-window fp32 (relative-position bias + shift mask), shape
[nH, nW, h, N, N], precomputed on host in the rolled window frame.

Parity: tests require the kernel to match the XLA formulation
(``models/htsat.py::_WindowAttention`` + partition/roll) on all HTSAT
stage shapes, shifted and unshifted (tests/test_htsat.py).
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
            out_ref, *, window: int, num_heads: int, shift: int, rows: int):
    """``rows`` window-rows per instance: x_ref [1, rows*w, W, C]."""
    w = window
    slab = x_ref[0]                       # [R, W, C], R = rows*w
    W = slab.shape[1]
    C = slab.shape[2]
    h = num_heads
    d = C // h
    N = w * w
    nW = W // w
    nWin = rows * nW
    dt = slab.dtype

    if shift:
        # cyclic column shift in VMEM
        slab = jnp.concatenate([slab[:, shift:], slab[:, :shift]], axis=1)

    # [R, W, C] -> [nWin, N, C]: window partition via major-dim-only
    # reshape/transpose (minor (w, C) dims untouched — a Mosaic constraint)
    xw = (
        slab.reshape(rows, w, nW, w, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(nWin * N, C)
    )

    qkv = (
        jnp.dot(xw, qkv_w_ref[:], preferred_element_type=jnp.float32)
        + qkv_b_ref[0]
    ).astype(dt)                           # [nWin*N, 3C]
    q = qkv[:, 0 * C : 1 * C].reshape(nWin, N, C)
    k = qkv[:, 1 * C : 2 * C].reshape(nWin, N, C)
    v = qkv[:, 2 * C : 3 * C].reshape(nWin, N, C)

    # masked-head expansion: mask2[r, c] = 1 iff channel c belongs to the
    # head owning row-block r//N. Built as a 2-D iota (Mosaic rejects the
    # [h, C] -> [1, h, 1, C] unit-dim-adjacent-to-minor broadcast).
    mask2 = (
        jax.lax.broadcasted_iota(jnp.int32, (h * N, C), 1) // d
        == jax.lax.broadcasted_iota(jnp.int32, (h * N, C), 0) // N
    ).astype(dt)                           # [h*N, C]
    scale = float(1.0 / np.sqrt(d))
    q_all = jnp.concatenate([q] * h, axis=1) * mask2[None]  # [nWin, h*N, C]

    s = jax.lax.dot_general(
        q_all * jnp.asarray(scale, dt), k,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                      # [nWin, h*N, N]
    s = s + bias_ref[:].reshape(nWin, h * N, N)
    p = jax.nn.softmax(s, axis=-1).astype(dt)
    o_all = jax.lax.dot_general(
        p, v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)                           # [nWin, h*N, C]
    # head h's rows carry sums over ALL C of p@v; only head-h channels are
    # wanted — mask and add the head blocks back together
    o_all = o_all * mask2[None]
    o = o_all[:, 0:N, :]
    for head in range(1, h):
        o = o + o_all[:, head * N : (head + 1) * N, :]

    o = (
        jnp.dot(o.reshape(nWin * N, C), proj_w_ref[:],
                preferred_element_type=jnp.float32)
        + proj_b_ref[0]
    ).astype(dt)

    # [nWin, N, C] -> [R, W, C]
    o = (
        o.reshape(rows, nW, w, w, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * w, W, C)
    )
    if shift:
        # cyclic column un-shift in VMEM
        o = jnp.concatenate([o[:, W - shift :], o[:, : W - shift]], axis=1)
    out_ref[0] = o


def _pick_rows(nH: int, nW: int, N: int, C: int, num_heads: int,
               itemsize: int) -> int:
    """Largest divisor of nH whose dominant VMEM buffers fit ~10 MB
    (the in/out x-slabs are small; intermediates dominate — profiled
    per-instance overhead ~5.6 us makes fewer, fatter instances win)."""
    for rows in range(nH, 0, -1):
        if nH % rows:
            continue
        nWin = rows * nW
        q_all = nWin * num_heads * N * C * itemsize
        s = nWin * num_heads * N * N * 4
        o_all = nWin * num_heads * N * C * itemsize
        bias = s
        if q_all + 2 * s + o_all + bias < 10 * 1024 * 1024:
            return rows
    return 1


def _reference_window_attention(x, qkv_w, qkv_b, proj_w, proj_b, bias,
                                window: int, num_heads: int, shift: int):
    """Pure-jnp twin of the fused kernel's math (roll, partition, per-head
    attention with additive bias, reverse, unroll) — the backward pass
    linearizes THIS (standard attention grads), so training through the
    fused forward gets exactly the XLA formulation's gradients."""
    B, H, W, C = x.shape
    w = window
    nH, nW = H // w, W // w
    N = w * w
    h = num_heads
    d = C // h
    dt = x.dtype
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    xw = (
        x.reshape(B, nH, w, nW, w, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B * nH * nW, N, C)
    )
    qkv = xw @ qkv_w + qkv_b
    qkv = qkv.reshape(-1, N, 3, h, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    att = jnp.einsum("bhqd,bhkd->bhqk",
                     q * jnp.asarray(float(d) ** -0.5, dt), k)
    att = att.astype(jnp.float32).reshape(B, nH * nW, h, N, N)
    att = att + bias.reshape(1, nH * nW, h, N, N)
    att = jax.nn.softmax(att, axis=-1).astype(dt).reshape(-1, h, N, N)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    out = out.transpose(0, 2, 1, 3).reshape(-1, N, C)
    out = out @ proj_w + proj_b
    out = (
        out.reshape(B, nH, nW, w, w, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H, W, C)
    )
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
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
    return _fused_window_attention_fwd_only(
        x, qkv_w, qkv_b, proj_w, proj_b, bias, window, num_heads, shift
    )


def _fwa_fwd(x, qkv_w, qkv_b, proj_w, proj_b, bias, window, num_heads, shift):
    out = _fused_window_attention_fwd_only(
        x, qkv_w, qkv_b, proj_w, proj_b, bias, window, num_heads, shift
    )
    return out, (x, qkv_w, qkv_b, proj_w, proj_b, bias)


def _fwa_bwd(window, num_heads, shift, res, g):
    # flash-style recompute: residuals are just the inputs; the attention
    # matrix is rebuilt inside the linearized reference
    f = functools.partial(_reference_window_attention, window=window,
                          num_heads=num_heads, shift=shift)
    _, vjp = jax.vjp(f, *res)
    return vjp(g)


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _fused_window_attention_fwd_only(
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
    rows = _pick_rows(nH, nW, N, C, num_heads, x.dtype.itemsize)

    if shift:
        # rolled row p holds original row (p+shift) mod H: a wrap-extended
        # slice replaces the row roll on input
        x_in = jax.lax.slice_in_dim(
            jnp.concatenate([x, x[:, :w]], axis=1), shift, shift + H, axis=1
        )
    else:
        x_in = x

    out = pl.pallas_call(
        functools.partial(_kernel, window=w, num_heads=num_heads, shift=shift,
                          rows=rows),
        grid=(B, nH // rows),
        # both grid dims are independent: lets Mosaic pipeline the block
        # DMAs across instances (profiled ~5.6 us/instance without this —
        # pure serial-DMA overhead across the ~1,300-instance trunk)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, rows * w, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, nW, num_heads, N, N),
                         lambda b, i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows * w, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
    )(x_in, qkv_w, qkv_b.reshape(1, -1), proj_w, proj_b.reshape(1, -1), bias)

    if shift:
        # single row un-roll (the only full-activation copy on this path)
        out = jnp.roll(out, shift, axis=1)
    return out
