"""Fused decode-step attention over the channel-packed int8 KV cache.

Why a kernel: the packed q8 cache (``models/gpt2.py::init_kv_cache_q8p``,
layout k/v [B, T, C] int8) keeps the cache's int8 tiles lane-dense (the
head-structured [B, H, T=77, d=64] layout pads TPU int8 tiles ~2x). But
XLA lowers *batched* int8 ``dot_general`` over this layout to
``convolution-base-dilated`` (measured 2.5x slower end to end), so the
attention contractions live here: the int8 blocks are DMA'd lane-dense,
converted to bf16 **in VMEM** (VPU, no HBM cost), and contracted with
plain one-batch-dim bf16 MXU dots. Head structure is handled masked-head
style (cf. ``ops/window_attn.py``): q arrives expanded to [B, H, C] with
other heads' channels zeroed, scores/probabilities keep the [B, H, T]
orientation end to end (softmax over the minor/lane dim, no transposes),
and the value pass computes [B, H, C] from which each channel keeps its
own head's row.

The kernel ALSO commits the current token's quantized K/V row into the
cache, in place: the cache operands are input-output aliased and the
output BlockSpec uses a scalar-prefetched ``index`` to address just the
[bb, 1, C] row. Ablation (batch 256, 67 steps) showed why both halves
must live in one op: an XLA-side ``.at[:, index].set`` on the cache that
a pallas_call then reads makes buffer assignment materialize copies of
both int8 buffers every layer (+1.7 ms/step); writing after the read
regressed further. In-kernel aliased writes leave XLA nothing to copy.
Within the step the current token's row rides as an appended column T
(VMEM concat), with its scales appended by the caller.

Numerics are IDENTICAL to the reference-parity q8 step
(``gpt2_step_q8``): k-scales fold into the scores after the QK dot,
v-scales fold into the probabilities before the PV dot, softmax in fp32
— no additional quantization is introduced, so the exact-caption
agreement validated in tests/test_quantized_decode.py carries over.

Reference anchor: the torch decode loop this accelerates is
``/root/reference/gpt2_prefix_eval.py:161-214`` (generate2) /
``predict_prompt.py:129-144``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["q8_decode_attention"]


def _kernel(idx_ref, qm_ref, ck_ref, cv_ref, kn_ref, vn_ref, sqk_ref,
            sv_ref, bias_ref, ck_out_ref, cv_out_ref, out_ref,
            *, num_heads: int):
    bb, H, C = qm_ref.shape
    d = C // H

    # Old cache + the current token's quantized row appended as column T
    # (concat on the non-minor T dim, VMEM-resident)
    k = jnp.concatenate([ck_ref[:], kn_ref[:]], axis=1).astype(jnp.bfloat16)
    v = jnp.concatenate([cv_ref[:], vn_ref[:]], axis=1).astype(jnp.bfloat16)
    qm = qm_ref[:]                              # [bb, H, C] bf16, head-masked

    s = jax.lax.dot_general(                    # [bb, H, T+1]
        qm, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s * sqk_ref[:] + bias_ref[:]            # k-scales/sqrt(d) + validity
    att = jax.nn.softmax(s, axis=-1)
    p = (att * sv_ref[:]).astype(jnp.bfloat16)  # v-scales folded in
    o = jax.lax.dot_general(                    # [bb, H, C]
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # channel c keeps its own head's row
    mh = (
        jax.lax.broadcasted_iota(jnp.int32, (H, C), 1) // d
        == jax.lax.broadcasted_iota(jnp.int32, (H, C), 0)
    ).astype(jnp.float32)
    o = o * mh[None]
    acc = o[:, 0, :]
    for h in range(1, H):
        acc = acc + o[:, h, :]
    out_ref[:] = acc.astype(out_ref.dtype)

    # Commit the current token's row in place: the aliased out block is the
    # 8-row-aligned slab containing ``index`` (Pallas requires second-minor
    # block dims divisible by 8), rebuilt from the old cache with the new
    # row masked in.
    idx = idx_ref[0]
    row0 = (idx // 8) * 8
    T = ck_ref.shape[1]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (8, C), 0) + row0 == idx
    )                                           # [8, C]
    old_k = ck_ref[:, pl.dslice(row0, 8), :]
    old_v = cv_ref[:, pl.dslice(row0, 8), :]
    kn8 = jnp.concatenate([kn_ref[:]] * 8, axis=1)
    vn8 = jnp.concatenate([vn_ref[:]] * 8, axis=1)
    ck_out_ref[:] = jnp.where(sel[None], kn8, old_k)
    cv_out_ref[:] = jnp.where(sel[None], vn8, old_v)


@functools.partial(jax.jit, static_argnums=(9,))
def q8_decode_attention(
    index: jax.Array,     # [1] int32 — cache row the current token occupies
    qm: jax.Array,        # [B, H, C] bf16 — q, head-masked expansion
    ck: jax.Array,        # [B, T, C] int8 — cache BEFORE this step's write
    cv: jax.Array,        # [B, T, C] int8
    kn: jax.Array,        # [B, 1, C] int8 — current token's quantized k
    vn: jax.Array,        # [B, 1, C] int8
    scale_qk: jax.Array,  # [B, H, T+1] f32 — k_scale * q-side scaling
    sv: jax.Array,        # [B, H, T+1] f32 — v_scale
    bias: jax.Array,      # [1, 1, T+1] f32 — 0 / -1e9 validity mask
    block_b: int = 16,
):
    """Returns (o [B, C] f32, ck' [B, T, C] int8, cv' [B, T, C] int8).

    Column T of ``scale_qk``/``sv``/``bias`` describes the appended
    current-token row (must be valid in ``bias``); cache rows at and
    beyond ``index`` must be masked. ck'/cv' are ck/cv with row ``index``
    replaced by kn/vn — computed in place via aliasing (do not reuse the
    passed-in ck/cv afterwards)."""
    B, H, C = qm.shape
    T = ck.shape[1]
    assert T % 8 == 0, "cache length must be 8-aligned (init_kv_cache_q8p)"
    bb = block_b
    while B % bb:
        bb //= 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, H, C), lambda i, idx: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, T, C), lambda i, idx: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, T, C), lambda i, idx: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, C), lambda i, idx: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, C), lambda i, idx: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, H, T + 1), lambda i, idx: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, H, T + 1), lambda i, idx: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T + 1), lambda i, idx: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, 8, C), lambda i, idx: (i, idx[0] // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 8, C), lambda i, idx: (i, idx[0] // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, C), lambda i, idx: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    ck_new, cv_new, o = pl.pallas_call(
        functools.partial(_kernel, num_heads=H),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), jnp.int8),
            jax.ShapeDtypeStruct((B, T, C), jnp.int8),
            jax.ShapeDtypeStruct((B, C), jnp.float32),
        ],
        # operand indices INCLUDE the scalar-prefetch arg: 0=index, 1=qm,
        # 2=ck, 3=cv, ... — a version-sensitive Pallas convention (verified
        # on jax 0.9.0; TPU-path aliasing exercised via the verify skill,
        # the CPU interpret-mode tests do not prove the TPU lowering).
        # If a JAX upgrade shifts whether scalar-prefetch args count, the
        # symptom is a wrong-operand alias: cache rows stop persisting.
        input_output_aliases={2: 0, 3: 1},
        interpret=jax.default_backend() != "tpu",
    )(index, qm, ck, cv, kn, vn, scale_qk, sv, bias)
    return o, ck_new, cv_new
