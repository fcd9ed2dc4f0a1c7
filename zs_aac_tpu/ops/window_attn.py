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

Training: the BACKWARD is a Pallas kernel too (``_bwd_kernel`` — the
analytic attention backward with flash-style in-VMEM forward recompute,
weight/bias grads accumulated across a sequential grid). HTSAT+BERT
contrastive step b64 bf16: 463 samples/s (XLA path) -> 598 fused
(+29%); an earlier backward that linearized the pure-jnp twin (i.e.
re-ran the XLA forward) was a measured wash. Stage-4-class shapes fall
back to the twin backward (``_pick_rows_bwd``).

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

__all__ = ["fused_window_attention", "fused_swin_block",
           "fused_swin_block_train", "build_window_bias"]


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
    """Largest divisor of nH whose dominant VMEM buffers fit the budget
    (the in/out x-slabs are small; intermediates dominate — profiled
    per-instance overhead ~5.6 us makes fewer, fatter instances win).

    Budget: the estimate below undercounts Mosaic's true scoped-vmem stack
    by ~1.8x (fused qkv intermediate is 3x the counted q_all, operands are
    double-buffered under parallel grid semantics, plus transient op
    stack) — measured: HTSAT stage-0 (nH=nW=8, N=64, C=96, h=4, bf16)
    estimates 9.4 MB at rows=4 but allocates 17.08 MB scoped against the
    16 MB limit and FAILS TO COMPILE at B=64. 8 MB keeps the real trunk
    shapes' estimates x1.9 under the hardware limit."""
    for rows in range(nH, 0, -1):
        if nH % rows:
            continue
        nWin = rows * nW
        q_all = nWin * num_heads * N * C * itemsize
        s = nWin * num_heads * N * N * 4
        o_all = nWin * num_heads * N * C * itemsize
        bias = s
        if q_all + 2 * s + o_all + bias < 8 * 1024 * 1024:
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


def _ln(x, scale, bias, eps):
    """LayerNorm over the minor (channel) axis, statistics in fp32 —
    matches flax ``nn.LayerNorm`` semantics (biased variance) to within
    statistic-precision ULPs."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


def _gelu_exact_f32(x):
    """Exact (erf) gelu for fp32 kernel operands. Mosaic has no erf/erfc
    lowering, so erf uses Abramowitz & Stegun 7.1.26 (|abs err| <= 1.5e-7
    — two decades below bf16 resolution; the XLA twin keeps the native
    erf)."""
    z = x * 0.7071067811865476
    s = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    erf = s * (1.0 - poly * jnp.exp(-az * az))
    return 0.5 * x * (1.0 + erf)


def _block_kernel(x_ref, ln1_ref, qkv_w_ref, qkv_b_ref, proj_w_ref,
                  proj_b_ref, ln2_ref, fc1_w_ref, fc1_b_ref, fc2_w_ref,
                  fc2_b_ref, bias_ref, out_ref, *, window: int,
                  num_heads: int, shift: int, rows: int, eps: float):
    """Whole Swin block (LN1 -> window attention -> residual -> LN2 -> MLP
    -> residual) on one row-slab, VMEM-resident end to end. The residuals
    use the UN-column-shifted slab; the column shift/unshift wrap only the
    attention chain (LN is pointwise, so normalizing before the shift is
    exact)."""
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

    xn = _ln(slab, ln1_ref[0], ln1_ref[1], eps)
    if shift:
        xn = jnp.concatenate([xn[:, shift:], xn[:, :shift]], axis=1)

    xw = (
        xn.reshape(rows, w, nW, w, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(nWin * N, C)
    )
    qkv = (
        jnp.dot(xw, qkv_w_ref[:], preferred_element_type=jnp.float32)
        + qkv_b_ref[0]
    ).astype(dt)
    q = qkv[:, 0 * C : 1 * C].reshape(nWin, N, C)
    k = qkv[:, 1 * C : 2 * C].reshape(nWin, N, C)
    v = qkv[:, 2 * C : 3 * C].reshape(nWin, N, C)

    mask2 = (
        jax.lax.broadcasted_iota(jnp.int32, (h * N, C), 1) // d
        == jax.lax.broadcasted_iota(jnp.int32, (h * N, C), 0) // N
    ).astype(dt)
    scale = float(1.0 / np.sqrt(d))
    q_all = jnp.concatenate([q] * h, axis=1) * mask2[None]

    s = jax.lax.dot_general(
        q_all * jnp.asarray(scale, dt), k,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_ref[:].reshape(nWin, h * N, N)
    p = jax.nn.softmax(s, axis=-1).astype(dt)
    o_all = jax.lax.dot_general(
        p, v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    o_all = o_all * mask2[None]
    o = o_all[:, 0:N, :]
    for head in range(1, h):
        o = o + o_all[:, head * N : (head + 1) * N, :]

    o = (
        jnp.dot(o.reshape(nWin * N, C), proj_w_ref[:],
                preferred_element_type=jnp.float32)
        + proj_b_ref[0]
    ).astype(dt)
    o = (
        o.reshape(rows, nW, w, w, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * w, W, C)
    )
    if shift:
        o = jnp.concatenate([o[:, W - shift :], o[:, : W - shift]], axis=1)

    y = slab + o                          # residual 1 (original positions)
    yn = _ln(y, ln2_ref[0], ln2_ref[1], eps).reshape(rows * w * W, C)
    hmid = (
        jnp.dot(yn, fc1_w_ref[:], preferred_element_type=jnp.float32)
        + fc1_b_ref[0]
    )
    hmid = _gelu_exact_f32(hmid).astype(dt)
    z = (
        jnp.dot(hmid, fc2_w_ref[:], preferred_element_type=jnp.float32)
        + fc2_b_ref[0]
    ).astype(dt)
    out_ref[0] = y + z.reshape(rows * w, W, C)


def _pick_rows_block(nH: int, nW: int, N: int, C: int, num_heads: int,
                     hidden: int, itemsize: int):
    """Row count for the whole-block kernel, or ``None`` when even one
    window-row (plus the resident MLP weights) exceeds the VMEM budget —
    callers then fall back to the attention-only kernel + XLA MLP
    (stage 4's C=768 MLP weights alone are ~14 MB)."""
    weights = (C * 3 * C + C * C + C * hidden + hidden * C) * itemsize
    for rows in range(nH, 0, -1):
        if nH % rows:
            continue
        nWin = rows * nW
        q_all = nWin * num_heads * N * C * itemsize
        s = nWin * num_heads * N * N * 4
        mlp = nWin * N * hidden * (itemsize + 4)   # bf16 act + f32 pre-gelu
        if weights + q_all + 2 * s + s + mlp < 10 * 1024 * 1024:
            return rows
    return None


def _block_kernel_stream(x_ref, ln1_ref, qkv_w_ref, qkv_b_ref, proj_w_ref,
                         proj_b_ref, ln2_ref, fc1_w_ref, fc1_b_ref,
                         fc2_w_ref, fc2_b_ref, bias_ref, out_ref,
                         y_s, yn_s, z_s, *, window: int, num_heads: int,
                         shift: int, rows: int, eps: float, n_chunks: int):
    """``_block_kernel`` with the MLP weights STREAMED in hidden-dim chunks
    (round-4 VERDICT #8): grid dim 2 walks ``n_chunks`` column blocks of
    fc1 / row blocks of fc2, so only one (double-buffered) chunk pair is
    VMEM-resident at a time — stage 4's C=768/hidden=3072 MLP (~14 MB in
    bf16) no longer evicts the whole-block kernel. Chunk 0 runs the
    attention chain once and stashes the residual ``y`` and LN2 output
    ``yn`` in VMEM scratch; every chunk accumulates its fc2 partial into an
    f32 scratch (matmul-grade accumulation — only the final add rounds to
    the compute dtype, same as the unstreamed kernel up to f32 reduction
    order across chunks); the last chunk writes the output block.

    MEASURED-NEGATIVE for HTSAT eval (round 4, profiled on v5e): stage-4
    streamed blocks run 0.91 ms each and end-to-end encode is 26.41 vs
    25.82 ms/batch @B=64 with the attention-only fallback — with the
    chunk grid dim innermost, the fc chunk blocks change every grid step
    so the ~9.4 MB of MLP weight re-streams PER BATCH ELEMENT (~600 MB
    per block invocation), while XLA's fallback runs one big batched MLP
    dot. Putting kc outermost would need per-batch attention scratch
    (impossible), and batch-blocking the grid blows VMEM via the
    masked-head ``q_all`` buffer. Models therefore keep stage 4 on the
    attention-only kernel; this path stays for direct callers and the
    parity test (test_fused_swin_block_streamed_matches_twin) as the
    recorded negative."""
    kc = pl.program_id(2)
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
    S = rows * w * W

    @pl.when(kc == 0)
    def _attention():
        xn = _ln(slab, ln1_ref[0], ln1_ref[1], eps)
        if shift:
            xn = jnp.concatenate([xn[:, shift:], xn[:, :shift]], axis=1)
        xw = (
            xn.reshape(rows, w, nW, w, C)
            .transpose(0, 2, 1, 3, 4)
            .reshape(nWin * N, C)
        )
        qkv = (
            jnp.dot(xw, qkv_w_ref[:], preferred_element_type=jnp.float32)
            + qkv_b_ref[0]
        ).astype(dt)
        q = qkv[:, 0 * C : 1 * C].reshape(nWin, N, C)
        k = qkv[:, 1 * C : 2 * C].reshape(nWin, N, C)
        v = qkv[:, 2 * C : 3 * C].reshape(nWin, N, C)

        mask2 = (
            jax.lax.broadcasted_iota(jnp.int32, (h * N, C), 1) // d
            == jax.lax.broadcasted_iota(jnp.int32, (h * N, C), 0) // N
        ).astype(dt)
        scale = float(1.0 / np.sqrt(d))
        q_all = jnp.concatenate([q] * h, axis=1) * mask2[None]
        s = jax.lax.dot_general(
            q_all * jnp.asarray(scale, dt), k,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s + bias_ref[:].reshape(nWin, h * N, N)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        o_all = jax.lax.dot_general(
            p, v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        o_all = o_all * mask2[None]
        o = o_all[:, 0:N, :]
        for head in range(1, h):
            o = o + o_all[:, head * N : (head + 1) * N, :]
        o = (
            jnp.dot(o.reshape(nWin * N, C), proj_w_ref[:],
                    preferred_element_type=jnp.float32)
            + proj_b_ref[0]
        ).astype(dt)
        o = (
            o.reshape(rows, nW, w, w, C)
            .transpose(0, 2, 1, 3, 4)
            .reshape(rows * w, W, C)
        )
        if shift:
            o = jnp.concatenate([o[:, W - shift :], o[:, : W - shift]],
                                axis=1)
        y = slab + o                      # residual 1 (original positions)
        y_s[:] = y.reshape(S, C)
        yn_s[:] = _ln(y, ln2_ref[0], ln2_ref[1], eps).reshape(S, C)

    hmid = (
        jnp.dot(yn_s[:], fc1_w_ref[:], preferred_element_type=jnp.float32)
        + fc1_b_ref[0]
    )
    hmid = _gelu_exact_f32(hmid).astype(dt)
    partial = jnp.dot(hmid, fc2_w_ref[:],
                      preferred_element_type=jnp.float32)

    @pl.when(kc == 0)
    def _init_acc():
        z_s[:] = partial

    @pl.when(kc > 0)
    def _acc():
        z_s[:] = z_s[:] + partial

    @pl.when(kc == n_chunks - 1)
    def _emit():
        z = (z_s[:] + fc2_b_ref[0]).astype(dt)
        out_ref[0] = (y_s[:] + z).reshape(rows * w, W, C)


def _pick_stream_block(nH: int, nW: int, N: int, C: int, num_heads: int,
                       hidden: int, itemsize: int):
    """(rows, hidden_chunk) for the MLP-streamed whole-block kernel, or
    ``None``. Budget: attention weights + q_all + score temps + ONE
    double-buffered fc chunk pair + activations + the y/yn/z scratches,
    against a 12 MB ceiling (v5e VMEM ~16 MB; the resident-MLP kernel's
    10 MB budget keeps extra slack it needs for the fc buffers it holds
    across the whole grid step — here the big pair is pipelined)."""
    attn_w = (C * 3 * C + C * C) * itemsize
    for rows in range(nH, 0, -1):
        if nH % rows:
            continue
        nWin = rows * nW
        S = nWin * N
        q_all = nWin * num_heads * N * C * itemsize
        s = nWin * num_heads * N * N * 4
        scr = S * C * (itemsize + itemsize + 4)     # y, yn, z(f32)
        for hc in (1024, 768, 512, 384, 256, 128):
            if hidden % hc:
                continue
            pair = 2 * (C * hc + hc * C) * itemsize  # double-buffered
            act = S * hc * (itemsize + 4)            # hmid bf16 + f32 pre-gelu
            if attn_w + q_all + 3 * s + pair + act + scr < 12 * 1024 * 1024:
                return rows, hc
    return None




def _reference_swin_block(x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b,
                          ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b, bias,
                          window: int, num_heads: int, shift: int,
                          eps: float):
    """Pure-jnp twin of ``_block_kernel`` (the backward linearizes this)."""
    xn = _ln(x, ln1_s, ln1_b, eps)
    o = _reference_window_attention(xn, qkv_w, qkv_b, proj_w, proj_b, bias,
                                    window, num_heads, shift)
    y = x + o
    yn = _ln(y, ln2_s, ln2_b, eps)
    hmid = yn.astype(jnp.float32) @ fc1_w.astype(jnp.float32) + fc1_b
    hmid = jax.nn.gelu(hmid, approximate=False).astype(x.dtype)
    z = (hmid.astype(jnp.float32) @ fc2_w.astype(jnp.float32)
         + fc2_b).astype(x.dtype)
    return y + z


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17))
def fused_swin_block(x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b,
                     ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b, bias,
                     window: int, num_heads: int, shift: int, eps: float):
    """One whole Swin block fused into a single Pallas kernel.

    Parity target: ``models/htsat.py::_SwinBlock`` eval path (reference
    torch chain ``/root/reference/retrieval/models/htsat.py:269-475``:
    norm1 -> roll -> partition -> attention -> reverse -> unroll ->
    residual -> norm2 -> MLP -> residual; drop_path is identity in eval).
    Extends ``fused_window_attention`` with VMEM-resident LN1/LN2/MLP —
    the encode profile showed ~60% of end-to-end time in the XLA glue
    around the attention kernels (LN reduces, residual adds and MLP
    relayouts over the lane-hostile C=96/192 stage activations).

    Blocks whose MLP weights fit VMEM run the resident kernel
    (``_pick_rows_block``); larger shapes (stage 4's C=768/hidden=3072)
    dispatch to the MLP-streamed kernel (``_block_kernel_stream``).
    NOTE the streamed variant is a recorded MEASURED-NEGATIVE for HTSAT
    eval (BASELINE.md round-4 notes): models gate stage 4 to the
    attention-only kernel instead; the streamed path stays for direct
    callers and its parity test.
    """
    return _fused_swin_block_fwd_only(
        x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
        fc1_w, fc1_b, fc2_w, fc2_b, bias, window, num_heads, shift, eps,
    )


def _fsb_fwd(x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
             fc1_w, fc1_b, fc2_w, fc2_b, bias, window, num_heads, shift,
             eps):
    out = _fused_swin_block_fwd_only(
        x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
        fc1_w, fc1_b, fc2_w, fc2_b, bias, window, num_heads, shift, eps,
    )
    return out, (x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s,
                 ln2_b, fc1_w, fc1_b, fc2_w, fc2_b, bias)


def _fsb_bwd(window, num_heads, shift, eps, res, g):
    f = functools.partial(_reference_swin_block, window=window,
                          num_heads=num_heads, shift=shift, eps=eps)
    _, vjp = jax.vjp(f, *res)
    return vjp(g)


fused_swin_block.defvjp(_fsb_fwd, _fsb_bwd)


@functools.partial(jax.jit, static_argnums=(14, 15, 16, 17))
def _fused_swin_block_fwd_only(x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w,
                               proj_b, ln2_s, ln2_b, fc1_w, fc1_b, fc2_w,
                               fc2_b, bias, window: int, num_heads: int,
                               shift: int, eps: float):
    B, H, W, C = x.shape
    w = window
    nH, nW = H // w, W // w
    N = w * w
    hidden = fc1_w.shape[1]
    rows = _pick_rows_block(nH, nW, N, C, num_heads, hidden, x.dtype.itemsize)

    if shift:
        x_in = jax.lax.slice_in_dim(
            jnp.concatenate([x, x[:, :w]], axis=1), shift, shift + H, axis=1
        )
    else:
        x_in = x

    pair = lambda s, b: jnp.stack([s, b]).astype(x.dtype)  # [2, C]/[2, hid]

    if rows is None:
        # MLP weights don't fit resident (stage 4) -> stream them in
        # hidden-dim chunks over a third grid dimension.
        sel = _pick_stream_block(nH, nW, N, C, num_heads, hidden,
                                 x.dtype.itemsize)
        assert sel is not None, (
            "shape fits neither whole-block kernel; gate on _pick_rows_block"
        )
        srows, hc = sel
        n_chunks = hidden // hc
        S = srows * w * W
        out = pl.pallas_call(
            functools.partial(_block_kernel_stream, window=w,
                              num_heads=num_heads, shift=shift, rows=srows,
                              eps=eps, n_chunks=n_chunks),
            grid=(B, nH // srows, n_chunks),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=jax.default_backend() != "tpu",
            in_specs=[
                pl.BlockSpec((1, srows * w, W, C),
                             lambda b, i, kc: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, C), lambda b, i, kc: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 3 * C), lambda b, i, kc: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * C), lambda b, i, kc: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda b, i, kc: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda b, i, kc: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, C), lambda b, i, kc: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, hc), lambda b, i, kc: (0, kc),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hc), lambda b, i, kc: (0, kc),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hc, C), lambda b, i, kc: (kc, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda b, i, kc: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((srows, nW, num_heads, N, N),
                             lambda b, i, kc: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, srows * w, W, C),
                                   lambda b, i, kc: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((S, C), x.dtype),           # y (residual 1)
                pltpu.VMEM((S, C), x.dtype),           # yn (LN2 output)
                pltpu.VMEM((S, C), jnp.float32),       # fc2 accumulator
            ],
        )(
            x_in, pair(ln1_s, ln1_b), qkv_w, qkv_b.reshape(1, -1), proj_w,
            proj_b.reshape(1, -1), pair(ln2_s, ln2_b), fc1_w,
            fc1_b.reshape(1, -1), fc2_w, fc2_b.reshape(1, -1), bias,
        )
        if shift:
            out = jnp.roll(out, shift, axis=1)
        return out

    out = pl.pallas_call(
        functools.partial(_block_kernel, window=w, num_heads=num_heads,
                          shift=shift, rows=rows, eps=eps),
        grid=(B, nH // rows),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, rows * w, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda b, i: (0, 0),
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
    )(
        x_in, pair(ln1_s, ln1_b), qkv_w, qkv_b.reshape(1, -1), proj_w,
        proj_b.reshape(1, -1), pair(ln2_s, ln2_b), fc1_w,
        fc1_b.reshape(1, -1), fc2_w, fc2_b.reshape(1, -1), bias,
    )

    if shift:
        out = jnp.roll(out, shift, axis=1)
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
    x, qkv_w, qkv_b, proj_w, proj_b, bias = res
    B, H, W, C = x.shape
    nH, nW = H // window, W // window
    N = window * window
    rows = _pick_rows_bwd(nH, nW, N, C, num_heads, x.dtype.itemsize)
    if rows is None:
        # stage-4-class shapes: the grad working set exceeds VMEM — fall
        # back to linearizing the pure-jnp twin (XLA recompute backward)
        f = functools.partial(_reference_window_attention, window=window,
                              num_heads=num_heads, shift=shift)
        _, vjp = jax.vjp(f, *res)
        return vjp(g)
    return _fused_window_attention_bwd(
        x, g, qkv_w, qkv_b, proj_w, proj_b, bias, window, num_heads, shift,
    )


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)


def _bwd_kernel(x_ref, g_ref, qkv_w_ref, qkv_b_ref, proj_w_ref, bias_ref,
                dx_ref, dqkvw_ref, dqkvb_ref, dprojw_ref, dprojb_ref,
                dbias_ref, *, window: int, num_heads: int, shift: int,
                rows: int):
    """Analytic backward of ``_kernel`` on one row-slab, VMEM-resident.

    Recomputes the forward internals (flash-style — the attention matrix
    is never stored in HBM), then runs the standard attention backward in
    the same masked-head big-matmul formulation as the forward: all grad
    contractions are full-C (or full-h*N) MXU dots, and the window
    partition/shift relayouts of BOTH the activations and their gradients
    stay in VMEM. Weight/bias grads are accumulated across the sequential
    (i, b) grid into f32 output blocks (init on first visit)."""
    w = window
    slab = x_ref[0]                       # [R, W, C]
    gs = g_ref[0]                         # [R, W, C] output cotangent slab
    W_ = slab.shape[1]
    C = slab.shape[2]
    h = num_heads
    d = C // h
    N = w * w
    nW = W_ // w
    nWin = rows * nW
    dt = slab.dtype

    if shift:
        slab = jnp.concatenate([slab[:, shift:], slab[:, :shift]], axis=1)
        gs = jnp.concatenate([gs[:, shift:], gs[:, :shift]], axis=1)

    def part(t):                           # [R, W, C] -> [nWin*N, C]
        return (
            t.reshape(rows, w, nW, w, C)
            .transpose(0, 2, 1, 3, 4)
            .reshape(nWin * N, C)
        )

    xw = part(slab)
    gw = part(gs)

    # ---- forward recompute (identical math to _kernel) ----
    qkv = (
        jnp.dot(xw, qkv_w_ref[:], preferred_element_type=jnp.float32)
        + qkv_b_ref[0]
    ).astype(dt)
    q = qkv[:, 0 * C : 1 * C].reshape(nWin, N, C)
    k = qkv[:, 1 * C : 2 * C].reshape(nWin, N, C)
    v = qkv[:, 2 * C : 3 * C].reshape(nWin, N, C)
    mask2 = (
        jax.lax.broadcasted_iota(jnp.int32, (h * N, C), 1) // d
        == jax.lax.broadcasted_iota(jnp.int32, (h * N, C), 0) // N
    ).astype(dt)
    scale = float(1.0 / np.sqrt(d))
    q_all = jnp.concatenate([q] * h, axis=1) * mask2[None]  # [nWin, h*N, C]
    qs_all = q_all * jnp.asarray(scale, dt)
    s = jax.lax.dot_general(
        qs_all, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:].reshape(nWin, h * N, N)
    p = jax.nn.softmax(s, axis=-1)         # f32 [nWin, h*N, N]
    pdt = p.astype(dt)
    o_all = jax.lax.dot_general(
        pdt, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt) * mask2[None]
    o = o_all[:, 0:N, :]
    for head in range(1, h):
        o = o + o_all[:, head * N : (head + 1) * N, :]
    o_flat = o.reshape(nWin * N, C)

    # ---- backward ----
    # proj: out = o_flat @ proj_w + proj_b
    do = jax.lax.dot_general(
        gw, proj_w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt).reshape(nWin, N, C)
    dprojw = jax.lax.dot_general(
        o_flat, gw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # [C, C] f32
    dprojb = jnp.sum(gw.astype(jnp.float32), axis=0, keepdims=True)  # [1, C]

    do_all = jnp.concatenate([do] * h, axis=1) * mask2[None]  # [nWin, h*N, C]
    dp = jax.lax.dot_general(
        do_all, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                      # [nWin, h*N, N] f32
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # f32
    ds_dt = ds.astype(dt)

    dq_all = jax.lax.dot_general(
        ds_dt, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt) * mask2[None]             # [nWin, h*N, C]
    dq = dq_all[:, 0:N, :]
    for head in range(1, h):
        dq = dq + dq_all[:, head * N : (head + 1) * N, :]
    dq = dq * jnp.asarray(scale, dt)
    dk = jax.lax.dot_general(
        ds_dt, qs_all, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)                           # [nWin, N, C]
    dv = jax.lax.dot_general(
        pdt, do_all, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)                           # [nWin, N, C]

    dqkv = jnp.concatenate(
        [dq.reshape(nWin * N, C), dk.reshape(nWin * N, C),
         dv.reshape(nWin * N, C)], axis=1,
    )                                      # [nWin*N, 3C]
    dxw = jax.lax.dot_general(
        dqkv, qkv_w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    dqkvw = jax.lax.dot_general(
        xw, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # [C, 3C] f32
    dqkvb = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)

    dxs = (
        dxw.reshape(rows, nW, w, w, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * w, W_, C)
    )
    if shift:
        dxs = jnp.concatenate(
            [dxs[:, W_ - shift :], dxs[:, : W_ - shift]], axis=1)
    dx_ref[0] = dxs

    dbias_blk = ds.reshape(rows, nW, h, N, N)
    b_id = pl.program_id(1)
    i_id = pl.program_id(0)
    first_all = jnp.logical_and(i_id == 0, b_id == 0)

    @pl.when(b_id == 0)
    def _():
        dbias_ref[...] = dbias_blk

    @pl.when(b_id != 0)
    def _():
        dbias_ref[...] += dbias_blk

    @pl.when(first_all)
    def _():
        dqkvw_ref[...] = dqkvw
        dqkvb_ref[...] = dqkvb
        dprojw_ref[...] = dprojw
        dprojb_ref[...] = dprojb

    @pl.when(jnp.logical_not(first_all))
    def _():
        dqkvw_ref[...] += dqkvw
        dqkvb_ref[...] += dqkvb
        dprojw_ref[...] += dprojw
        dprojb_ref[...] += dprojb


def _pick_rows_bwd(nH: int, nW: int, N: int, C: int, num_heads: int,
                   itemsize: int):
    """Row count for the backward kernel, or ``None`` when even one
    window-row exceeds the VMEM budget (stage-4-class shapes: the f32
    weight-grad accumulators alone are ~9 MB at C=768) — callers fall back
    to the XLA-twin backward."""
    h = num_heads
    wacc = (C * 3 * C + C * C) * 4
    for rows in range(nH, 0, -1):
        if nH % rows:
            continue
        nWin = rows * nW
        score = nWin * h * N * N * 4       # s/p/dp/ds f32 + bias + dbias
        big_dt = nWin * h * N * C * itemsize  # q_all/do_all/dq_all/o_all
        slabs = 3 * rows * N * nW * C * itemsize
        if wacc + 6 * score + 4 * big_dt + slabs < 9 * 1024 * 1024:
            return rows
    return None


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def _fused_window_attention_bwd(x, g, qkv_w, qkv_b, proj_w, proj_b, bias,
                                window: int, num_heads: int, shift: int):
    """Pallas backward for ``fused_window_attention``: one sequential-grid
    kernel emits dx and accumulates the weight/bias grads in f32 across
    (window-row-group, batch) instances. Returns cotangents matching the
    primal dtypes."""
    B, H, W, C = x.shape
    w = window
    nH, nW = H // w, W // w
    N = w * w
    rows = _pick_rows_bwd(nH, nW, N, C, num_heads, x.dtype.itemsize)
    assert rows is not None, "caller must gate on _pick_rows_bwd"

    def rolled(t):
        return jax.lax.slice_in_dim(
            jnp.concatenate([t, t[:, :w]], axis=1), shift, shift + H, axis=1
        )

    x_in = rolled(x) if shift else x
    g_in = rolled(g) if shift else g

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, window=w, num_heads=num_heads,
                          shift=shift, rows=rows),
        grid=(nH // rows, B),
        # sequential grid: the weight/bias grad outputs are revisited and
        # accumulated across instances (init on first visit)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, rows * w, W, C), lambda i, b: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows * w, W, C), lambda i, b: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, nW, num_heads, N, N),
                         lambda i, b: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows * w, W, C), lambda i, b: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, nW, num_heads, N, N),
                         lambda i, b: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((nH, nW, num_heads, N, N), jnp.float32),
        ],
    )(x_in, g_in, qkv_w, qkv_b.reshape(1, -1), proj_w, bias)

    dx, dqkvw, dqkvb, dprojw, dprojb, dbias = outs
    if shift:
        dx = jnp.roll(dx, shift, axis=1)
    return (
        dx,
        dqkvw.astype(qkv_w.dtype),
        dqkvb.reshape(-1).astype(qkv_b.dtype),
        dprojw.astype(proj_w.dtype),
        dprojb.reshape(-1).astype(proj_b.dtype),
        dbias.astype(bias.dtype),
    )


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


# ---------------------------------------------------------------------------
# whole-block TRAINING kernels (forward + split Pallas backward)
# ---------------------------------------------------------------------------
#
# The eval whole-block kernel above is forward-only (its custom_vjp
# linearizes the jnp twin, re-paying the XLA forward — measured a wash for
# training). The training path fuses BOTH directions:
#
#   forward  : one kernel per row-slab emitting (out, y) where
#              y = x + m1*attn(LN1(x)) is the post-attention residual —
#              saving y costs one extra [B, H, W, C] bf16 HBM stream but
#              lets the backward split into two small kernels with no
#              attention recompute in the MLP half.
#   backward : kernel A (MLP+LN2): from (y, g, m2) -> dy_total, dLN2, dFC;
#              kernel B (attention+LN1): from (x, dy_total, m1) -> dx,
#              dLN1, dQKV/dproj, dbias — the _bwd_kernel math wrapped in
#              the LN1 chain.
#
# ``m1``/``m2`` are per-sample drop-path keep scales ([B] f32, mask/keep —
# the reference's stochastic depth, ``htsat.py:369-475`` drop_path). Their
# cotangents are returned as zeros (they are Bernoulli draws, never
# differentiated).


def _ln_fwd_f32(u, scale, bias, eps):
    """LN forward returning (out_dt, xhat_f32, inv_sigma_f32)."""
    uf = u.astype(jnp.float32)
    mean = jnp.mean(uf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(uf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (uf - mean) * inv
    out = (xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32))
    return out.astype(u.dtype), xhat, inv


def _ln_bwd_f32(dout, xhat, inv, scale):
    """LN backward: returns (du_f32, dscale_rowsum, dbias_rowsum).
    dout may be dt or f32; stats f32. Row sums are reduced over all rows
    (the caller accumulates across slabs)."""
    g = dout.astype(jnp.float32)
    C = xhat.shape[-1]
    gs = g * scale.astype(jnp.float32)
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    du = (gs - m1 - xhat * m2) * inv
    dscale = jnp.sum(g * xhat, axis=tuple(range(g.ndim - 1)))
    dbias = jnp.sum(g, axis=tuple(range(g.ndim - 1)))
    return du, dscale, dbias


def _gelu_grad_f32(x):
    """d/dx gelu_exact(x) in f32 (A&S erf + exact pdf term)."""
    z = x * 0.7071067811865476
    s = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    erf = s * (1.0 - poly * jnp.exp(-az * az))
    pdf = jnp.exp(-0.5 * x * x) * 0.3989422804014327
    return 0.5 * (1.0 + erf) + x * pdf


def _block_train_kernel(x_ref, m1_ref, m2_ref, ln1_ref, qkv_w_ref, qkv_b_ref,
                        proj_w_ref, proj_b_ref, ln2_ref, fc1_w_ref, fc1_b_ref,
                        fc2_w_ref, fc2_b_ref, bias_ref, out_ref, y_ref, *,
                        window: int, num_heads: int, shift: int, rows: int,
                        eps: float):
    """``_block_kernel`` with drop-path scales, emitting (out, y)."""
    w = window
    slab = x_ref[0]
    W = slab.shape[1]
    C = slab.shape[2]
    h = num_heads
    d = C // h
    N = w * w
    nW = W // w
    nWin = rows * nW
    dt = slab.dtype
    m1 = m1_ref[0, 0, 0].astype(dt)
    m2 = m2_ref[0, 0, 0].astype(dt)

    xn, _, _ = _ln_fwd_f32(slab, ln1_ref[0], ln1_ref[1], eps)
    if shift:
        xn = jnp.concatenate([xn[:, shift:], xn[:, :shift]], axis=1)
    xw = (
        xn.reshape(rows, w, nW, w, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(nWin * N, C)
    )
    qkv = (
        jnp.dot(xw, qkv_w_ref[:], preferred_element_type=jnp.float32)
        + qkv_b_ref[0]
    ).astype(dt)
    q = qkv[:, 0 * C : 1 * C].reshape(nWin, N, C)
    k = qkv[:, 1 * C : 2 * C].reshape(nWin, N, C)
    v = qkv[:, 2 * C : 3 * C].reshape(nWin, N, C)
    mask2 = (
        jax.lax.broadcasted_iota(jnp.int32, (h * N, C), 1) // d
        == jax.lax.broadcasted_iota(jnp.int32, (h * N, C), 0) // N
    ).astype(dt)
    scale = float(1.0 / np.sqrt(d))
    q_all = jnp.concatenate([q] * h, axis=1) * mask2[None]
    s = jax.lax.dot_general(
        q_all * jnp.asarray(scale, dt), k,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:].reshape(nWin, h * N, N)
    p = jax.nn.softmax(s, axis=-1).astype(dt)
    o_all = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt) * mask2[None]
    o = o_all[:, 0:N, :]
    for head in range(1, h):
        o = o + o_all[:, head * N : (head + 1) * N, :]
    o = (
        jnp.dot(o.reshape(nWin * N, C), proj_w_ref[:],
                preferred_element_type=jnp.float32)
        + proj_b_ref[0]
    ).astype(dt)
    o = (
        o.reshape(rows, nW, w, w, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * w, W, C)
    )
    if shift:
        o = jnp.concatenate([o[:, W - shift :], o[:, : W - shift]], axis=1)

    y = slab + m1 * o
    y_ref[0] = y
    yn, _, _ = _ln_fwd_f32(y, ln2_ref[0], ln2_ref[1], eps)
    ynf = yn.reshape(rows * w * W, C)
    hmid = (
        jnp.dot(ynf, fc1_w_ref[:], preferred_element_type=jnp.float32)
        + fc1_b_ref[0]
    )
    hg = _gelu_exact_f32(hmid).astype(dt)
    z = (
        jnp.dot(hg, fc2_w_ref[:], preferred_element_type=jnp.float32)
        + fc2_b_ref[0]
    ).astype(dt)
    out_ref[0] = y + m2 * z.reshape(rows * w, W, C)


def _mlp_bwd_kernel(y_ref, g_ref, m2_ref, ln2_ref, fc1_w_ref, fc1_b_ref,
                    fc2_w_ref, dy_ref, dln2s_ref, dln2b_ref, dfc1w_ref,
                    dfc1b_ref, dfc2w_ref, dfc2b_ref, *, rows: int,
                    eps: float):
    """Backward of (LN2 -> fc1 -> gelu -> fc2, + residual) from the saved
    post-attention residual ``y``. Emits dy_total = g + m2 * d(mlp)/dy and
    accumulates LN2/FC grads across the sequential grid."""
    y = y_ref[0]                          # [R, W, C]
    g = g_ref[0]
    C = y.shape[2]
    dt = y.dtype
    m2 = m2_ref[0, 0, 0]

    yn, yhat, inv = _ln_fwd_f32(y, ln2_ref[0], ln2_ref[1], eps)
    R, W, _ = y.shape
    ynf = yn.reshape(R * W, C)
    hmid = (
        jnp.dot(ynf, fc1_w_ref[:], preferred_element_type=jnp.float32)
        + fc1_b_ref[0]
    )
    hg = _gelu_exact_f32(hmid).astype(dt)

    gz = (g.reshape(R * W, C).astype(jnp.float32)
          * jnp.asarray(m2, jnp.float32)).astype(dt)
    dfc2w = jax.lax.dot_general(
        hg, gz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dfc2b = jnp.sum(gz.astype(jnp.float32), axis=0, keepdims=True)
    dhg = jax.lax.dot_general(
        gz, fc2_w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh1 = dhg * _gelu_grad_f32(hmid)       # f32 [R*W, hidden]
    dh1_dt = dh1.astype(dt)
    dfc1w = jax.lax.dot_general(
        ynf, dh1_dt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dfc1b = jnp.sum(dh1, axis=0, keepdims=True)
    dyn = jax.lax.dot_general(
        dh1_dt, fc1_w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(R, W, C)
    dy_mlp, dln2s, dln2b = _ln_bwd_f32(dyn, yhat, inv, ln2_ref[0])
    dy_ref[0] = g + dy_mlp.astype(dt)

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dln2s_ref[...] = dln2s.reshape(1, -1)
        dln2b_ref[...] = dln2b.reshape(1, -1)
        dfc1w_ref[...] = dfc1w
        dfc1b_ref[...] = dfc1b
        dfc2w_ref[...] = dfc2w
        dfc2b_ref[...] = dfc2b

    @pl.when(jnp.logical_not(first))
    def _():
        dln2s_ref[...] += dln2s.reshape(1, -1)
        dln2b_ref[...] += dln2b.reshape(1, -1)
        dfc1w_ref[...] += dfc1w
        dfc1b_ref[...] += dfc1b
        dfc2w_ref[...] += dfc2w
        dfc2b_ref[...] += dfc2b


def _attn_ln1_bwd_kernel(x_ref, dy_ref, m1_ref, ln1_ref, qkv_w_ref,
                         qkv_b_ref, proj_w_ref, bias_ref, dx_ref, dln1s_ref,
                         dln1b_ref, dqkvw_ref, dqkvb_ref, dprojw_ref,
                         dprojb_ref, dbias_ref, *, window: int,
                         num_heads: int, shift: int, rows: int, eps: float):
    """Backward of (LN1 -> window attention, + residual) given the total
    residual cotangent ``dy``: the ``_bwd_kernel`` attention math wrapped
    in the LN1 chain. dx = dy + dLN1(d_attn_in)."""
    w = window
    slab = x_ref[0]
    dy = dy_ref[0]
    W_ = slab.shape[1]
    C = slab.shape[2]
    h = num_heads
    d = C // h
    N = w * w
    nW = W_ // w
    nWin = rows * nW
    dt = slab.dtype
    m1 = m1_ref[0, 0, 0].astype(dt)

    xn, xhat1, inv1 = _ln_fwd_f32(slab, ln1_ref[0], ln1_ref[1], eps)
    go = dy * m1                          # cotangent of attn output (unshifted)
    if shift:
        xn = jnp.concatenate([xn[:, shift:], xn[:, :shift]], axis=1)
        go = jnp.concatenate([go[:, shift:], go[:, :shift]], axis=1)

    def part(t):
        return (
            t.reshape(rows, w, nW, w, C)
            .transpose(0, 2, 1, 3, 4)
            .reshape(nWin * N, C)
        )

    xw = part(xn)
    gw = part(go)

    qkv = (
        jnp.dot(xw, qkv_w_ref[:], preferred_element_type=jnp.float32)
        + qkv_b_ref[0]
    ).astype(dt)
    q = qkv[:, 0 * C : 1 * C].reshape(nWin, N, C)
    k = qkv[:, 1 * C : 2 * C].reshape(nWin, N, C)
    v = qkv[:, 2 * C : 3 * C].reshape(nWin, N, C)
    mask2 = (
        jax.lax.broadcasted_iota(jnp.int32, (h * N, C), 1) // d
        == jax.lax.broadcasted_iota(jnp.int32, (h * N, C), 0) // N
    ).astype(dt)
    scale = float(1.0 / np.sqrt(d))
    q_all = jnp.concatenate([q] * h, axis=1) * mask2[None]
    qs_all = q_all * jnp.asarray(scale, dt)
    s = jax.lax.dot_general(
        qs_all, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:].reshape(nWin, h * N, N)
    p = jax.nn.softmax(s, axis=-1)
    pdt = p.astype(dt)
    o_all = jax.lax.dot_general(
        pdt, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt) * mask2[None]
    o = o_all[:, 0:N, :]
    for head in range(1, h):
        o = o + o_all[:, head * N : (head + 1) * N, :]
    o_flat = o.reshape(nWin * N, C)

    do = jax.lax.dot_general(
        gw, proj_w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt).reshape(nWin, N, C)
    dprojw = jax.lax.dot_general(
        o_flat, gw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dprojb = jnp.sum(gw.astype(jnp.float32), axis=0, keepdims=True)

    do_all = jnp.concatenate([do] * h, axis=1) * mask2[None]
    dp = jax.lax.dot_general(
        do_all, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_dt = ds.astype(dt)

    dq_all = jax.lax.dot_general(
        ds_dt, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt) * mask2[None]
    dq = dq_all[:, 0:N, :]
    for head in range(1, h):
        dq = dq + dq_all[:, head * N : (head + 1) * N, :]
    dq = dq * jnp.asarray(scale, dt)
    dk = jax.lax.dot_general(
        ds_dt, qs_all, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    dv = jax.lax.dot_general(
        pdt, do_all, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)

    dqkv = jnp.concatenate(
        [dq.reshape(nWin * N, C), dk.reshape(nWin * N, C),
         dv.reshape(nWin * N, C)], axis=1,
    )
    dxw = jax.lax.dot_general(
        dqkv, qkv_w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    dqkvw = jax.lax.dot_general(
        xw, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dqkvb = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)

    dxn = (
        dxw.reshape(rows, nW, w, w, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * w, W_, C)
    )
    if shift:
        dxn = jnp.concatenate(
            [dxn[:, W_ - shift :], dxn[:, : W_ - shift]], axis=1)

    dx_ln, dln1s, dln1b = _ln_bwd_f32(dxn, xhat1, inv1, ln1_ref[0])
    dx_ref[0] = dy + dx_ln.astype(dt)

    dbias_blk = ds.reshape(rows, nW, h, N, N)
    b_id = pl.program_id(1)
    first_all = jnp.logical_and(pl.program_id(0) == 0, b_id == 0)

    @pl.when(b_id == 0)
    def _():
        dbias_ref[...] = dbias_blk

    @pl.when(b_id != 0)
    def _():
        dbias_ref[...] += dbias_blk

    @pl.when(first_all)
    def _():
        dln1s_ref[...] = dln1s.reshape(1, -1)
        dln1b_ref[...] = dln1b.reshape(1, -1)
        dqkvw_ref[...] = dqkvw
        dqkvb_ref[...] = dqkvb
        dprojw_ref[...] = dprojw
        dprojb_ref[...] = dprojb

    @pl.when(jnp.logical_not(first_all))
    def _():
        dln1s_ref[...] += dln1s.reshape(1, -1)
        dln1b_ref[...] += dln1b.reshape(1, -1)
        dqkvw_ref[...] += dqkvw
        dqkvb_ref[...] += dqkvb
        dprojw_ref[...] += dprojw
        dprojb_ref[...] += dprojb


def _pick_rows_block_train(nH: int, nW: int, N: int, C: int, num_heads: int,
                           hidden: int, itemsize: int):
    """Row count for the train-block kernels, or ``None`` to fall back to
    the layered XLA path. Gates on the LARGEST of the three kernels (the
    attention+LN1 backward: the _bwd_kernel working set plus the LN f32
    stats); the forward reuses the eval block estimate and the MLP
    backward is strictly smaller."""
    fwd = _pick_rows_block(nH, nW, N, C, num_heads, hidden, itemsize)
    bwd = _pick_rows_bwd(nH, nW, N, C, num_heads, itemsize)
    if fwd is None or bwd is None:
        return None
    return min(fwd, bwd)


def _reference_swin_block_train(x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w,
                                proj_b, ln2_s, ln2_b, fc1_w, fc1_b, fc2_w,
                                fc2_b, bias, m1, m2, window: int,
                                num_heads: int, shift: int, eps: float):
    """Pure-jnp twin of the train block (drop-path keep scales m1/m2 [B])."""
    xn = _ln(x, ln1_s, ln1_b, eps)
    o = _reference_window_attention(xn, qkv_w, qkv_b, proj_w, proj_b, bias,
                                    window, num_heads, shift)
    y = x + m1[:, None, None, None].astype(x.dtype) * o
    yn = _ln(y, ln2_s, ln2_b, eps)
    hmid = yn.astype(jnp.float32) @ fc1_w.astype(jnp.float32) + fc1_b
    hmid = jax.nn.gelu(hmid, approximate=False).astype(x.dtype)
    z = (hmid.astype(jnp.float32) @ fc2_w.astype(jnp.float32)
         + fc2_b).astype(x.dtype)
    return y + m2[:, None, None, None].astype(x.dtype) * z


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18, 19))
def fused_swin_block_train(x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b,
                           ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b, bias,
                           m1, m2, window: int, num_heads: int, shift: int,
                           eps: float):
    """Whole Swin block for TRAINING: fused Pallas forward AND backward.

    ``m1``/``m2`` are per-sample drop-path keep scales ([B] f32 — the
    reference's stochastic depth applied to the attention / MLP branches;
    pass ones for eval semantics). Callers must gate on
    ``_pick_rows_block_train(...) is not None``. Gradients flow to every
    weight and ``x``; the mask cotangents are zeros (Bernoulli draws)."""
    out, _ = _fused_swin_block_train_fwd_only(
        x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
        fc1_w, fc1_b, fc2_w, fc2_b, bias, m1, m2, window, num_heads, shift,
        eps,
    )
    return out


def _fsbt_fwd(x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
              fc1_w, fc1_b, fc2_w, fc2_b, bias, m1, m2, window, num_heads,
              shift, eps):
    out, y = _fused_swin_block_train_fwd_only(
        x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
        fc1_w, fc1_b, fc2_w, fc2_b, bias, m1, m2, window, num_heads, shift,
        eps,
    )
    res = (x, y, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, ln2_s, ln2_b,
           fc1_w, fc1_b, fc2_w, bias, m1, m2)
    return out, res


def _fsbt_bwd(window, num_heads, shift, eps, res, g):
    (x, y, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, ln2_s, ln2_b,
     fc1_w, fc1_b, fc2_w, bias, m1, m2) = res
    (dy, dln2s, dln2b, dfc1w, dfc1b, dfc2w, dfc2b) = _mlp_bwd_call(
        y, g, m2, ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, eps)
    (dx, dln1s, dln1b, dqkvw, dqkvb, dprojw, dprojb, dbias) = (
        _attn_ln1_bwd_call(x, dy, m1, ln1_s, ln1_b, qkv_w, qkv_b, proj_w,
                           bias, window, num_heads, shift, eps))
    zeros_m = jnp.zeros_like(m1)
    return (dx,
            dln1s.astype(ln1_s.dtype), dln1b.astype(ln1_b.dtype),
            dqkvw.astype(qkv_w.dtype), dqkvb.astype(qkv_b.dtype),
            dprojw.astype(proj_w.dtype), dprojb.astype(proj_w.dtype),
            dln2s.astype(ln2_s.dtype), dln2b.astype(ln2_b.dtype),
            dfc1w.astype(fc1_w.dtype), dfc1b.astype(fc1_b.dtype),
            dfc2w.astype(fc2_w.dtype), dfc2b.astype(fc2_w.dtype),
            dbias.astype(bias.dtype), zeros_m, jnp.zeros_like(m2))


fused_swin_block_train.defvjp(_fsbt_fwd, _fsbt_bwd)


@functools.partial(jax.jit, static_argnums=(16, 17, 18, 19))
def _fused_swin_block_train_fwd_only(x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w,
                                     proj_b, ln2_s, ln2_b, fc1_w, fc1_b,
                                     fc2_w, fc2_b, bias, m1, m2,
                                     window: int, num_heads: int, shift: int,
                                     eps: float):
    B, H, W, C = x.shape
    w = window
    nH, nW = H // w, W // w
    N = w * w
    hidden = fc1_w.shape[1]
    rows = _pick_rows_block_train(nH, nW, N, C, num_heads, hidden,
                                  x.dtype.itemsize)
    assert rows is not None, "caller must gate on _pick_rows_block_train"

    if shift:
        x_in = jax.lax.slice_in_dim(
            jnp.concatenate([x, x[:, :w]], axis=1), shift, shift + H, axis=1
        )
    else:
        x_in = x
    pair = lambda s, b: jnp.stack([s, b]).astype(x.dtype)
    m1c = m1.reshape(B, 1, 1).astype(jnp.float32)
    m2c = m2.reshape(B, 1, 1).astype(jnp.float32)

    out, y = pl.pallas_call(
        functools.partial(_block_train_kernel, window=w, num_heads=num_heads,
                          shift=shift, rows=rows, eps=eps),
        grid=(B, nH // rows),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, rows * w, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, nW, num_heads, N, N),
                         lambda b, i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows * w, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows * w, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        ],
    )(
        x_in, m1c, m2c, pair(ln1_s, ln1_b), qkv_w, qkv_b.reshape(1, -1),
        proj_w, proj_b.reshape(1, -1), pair(ln2_s, ln2_b), fc1_w,
        fc1_b.reshape(1, -1), fc2_w, fc2_b.reshape(1, -1), bias,
    )
    if shift:
        out = jnp.roll(out, shift, axis=1)
        y = jnp.roll(y, shift, axis=1)
    return out, y


@functools.partial(jax.jit, static_argnums=(8,))
def _mlp_bwd_call(y, g, m2, ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, eps: float):
    B, H, W, C = y.shape
    hidden = fc1_w.shape[1]
    it = y.dtype.itemsize
    # slab over rows of the image: largest divisor of H whose buffers fit.
    # Per-row estimate: three f32 + one dt hidden-wide buffers (hmid, dhg,
    # dh1, dh1_dt) plus the C-wide slabs/LN intermediates; Mosaic's true
    # scoped stack runs ~1.8x the estimate (see _pick_rows), so budget 5 MB.
    per_row = W * hidden * (12 + it) + W * C * (4 * it + 12)
    rows = 1
    for r in range(H, 0, -1):
        if H % r == 0 and r * per_row < 5 * 1024 * 1024:
            rows = r
            break
    pair = lambda s, b: jnp.stack([s, b]).astype(y.dtype)
    m2c = m2.reshape(B, 1, 1).astype(jnp.float32)

    outs = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, rows=rows, eps=eps),
        grid=(H // rows, B),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, rows, W, C), lambda i, b: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, W, C), lambda i, b: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, W, C), lambda i, b: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), y.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
    )(y, g, m2c, pair(ln2_s, ln2_b), fc1_w, fc1_b.reshape(1, -1), fc2_w)
    dy, dln2s, dln2b, dfc1w, dfc1b, dfc2w, dfc2b = outs
    return (dy, dln2s.reshape(-1), dln2b.reshape(-1), dfc1w,
            dfc1b.reshape(-1), dfc2w, dfc2b.reshape(-1))


@functools.partial(jax.jit, static_argnums=(9, 10, 11, 12))
def _attn_ln1_bwd_call(x, dy, m1, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, bias,
                       window: int, num_heads: int, shift: int, eps: float):
    B, H, W, C = x.shape
    w = window
    nH, nW = H // w, W // w
    N = w * w
    rows = _pick_rows_bwd(nH, nW, N, C, num_heads, x.dtype.itemsize)
    assert rows is not None

    def rolled(t):
        return jax.lax.slice_in_dim(
            jnp.concatenate([t, t[:, :w]], axis=1), shift, shift + H, axis=1
        )

    # LN1 and the residual live in the UNSHIFTED frame; the kernel applies
    # the column shift internally and the row shift is this wrap slice —
    # both x and dy enter row-rolled, and dx leaves row-rolled.
    x_in = rolled(x) if shift else x
    dy_in = rolled(dy) if shift else dy
    pair = lambda s, b: jnp.stack([s, b]).astype(x.dtype)
    m1c = m1.reshape(B, 1, 1).astype(jnp.float32)

    outs = pl.pallas_call(
        functools.partial(_attn_ln1_bwd_kernel, window=w,
                          num_heads=num_heads, shift=shift, rows=rows,
                          eps=eps),
        grid=(nH // rows, B),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, rows * w, W, C), lambda i, b: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows * w, W, C), lambda i, b: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, nW, num_heads, N, N),
                         lambda i, b: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows * w, W, C), lambda i, b: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, nW, num_heads, N, N),
                         lambda i, b: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((nH, nW, num_heads, N, N), jnp.float32),
        ],
    )(x_in, dy_in, m1c, pair(ln1_s, ln1_b), qkv_w, qkv_b.reshape(1, -1),
      proj_w, bias)
    dx, dln1s, dln1b, dqkvw, dqkvb, dprojw, dprojb, dbias = outs
    if shift:
        dx = jnp.roll(dx, shift, axis=1)
    return (dx, dln1s.reshape(-1), dln1b.reshape(-1), dqkvw,
            dqkvb.reshape(-1), dprojw, dprojb.reshape(-1), dbias)
