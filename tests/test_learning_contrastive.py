"""End-to-end learning test for the retrieval (ASE) side.

Synthetic paired data with real structure: each audio clip is a distinct
pure tone; its captions are cluster-determined token sequences. After a few
hundred contrastive steps on the 8-device data-parallel mesh, text->audio
retrieval must become much better than chance — catching loss-sign,
sharding, BN, and metric bugs that unit tests cannot.
"""

import numpy as np
import jax
import jax.numpy as jnp

from zs_aac_tpu.eval.retrieval import t2a
from zs_aac_tpu.models.ase import ASE, ASEConfig
from zs_aac_tpu.parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from zs_aac_tpu.train.contrastive import (
    create_ase_state,
    make_ase_train_step,
    make_encode_fns,
)
from zs_aac_tpu.train.optim import cosine_lr, get_optimizer

N_CLASSES = 8
SR = 32000


def _tone(k, seconds=0.5, seed=0):
    t = np.arange(int(SR * seconds)) / SR
    f = 200.0 * (k + 1)
    x = 0.3 * np.sin(2 * np.pi * f * t)
    x += 0.01 * np.random.default_rng(seed).standard_normal(len(t))
    return x.astype(np.float32)


def _text(k, rng):
    # class token + a couple of random filler tokens
    ids = np.zeros(6, np.int32)
    ids[0] = 10 + k
    ids[1:4] = rng.integers(30, 60, 3)
    return ids


def test_contrastive_training_learns_retrieval():
    _run_contrastive_learning(jnp.float32)


def test_contrastive_training_learns_retrieval_bf16():
    # bf16 compute (``compute_dtype: bfloat16`` in pretrain.yaml, the TPU
    # fast path: 366 -> 778 samples/s Cnn14 / 295 -> 461 HTSAT measured on
    # v5e) must converge the same way — params/optimizer state stay fp32,
    # only activations run bf16
    _run_contrastive_learning(jnp.bfloat16)


def _run_contrastive_learning(dtype):
    cfg = ASEConfig(embed_size=16, audio_channels=(4, 8),
                    text_model="prajjwal1/bert-tiny", spec_augmentation=False,
                    embed_regularization=False, dtype=dtype)
    ase = ASE(cfg)
    steps = 120
    opt = get_optimizer(cosine_lr(2e-3, 10, steps), "adam")
    state = create_ase_state(jax.random.key(0), ase, opt,
                             spec_shape=(2, 51, 64), text_len=6)
    step = make_ase_train_step(ase, opt)

    mesh = make_mesh_for_batch(16)
    state = replicate(state, mesh)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        ks = r.integers(0, N_CLASSES, 16)
        return {
            "wave": np.stack([_tone(k, seed=seed * 100 + i)
                              for i, k in enumerate(ks)]),
            "input_ids": np.stack([_text(k, r) for k in ks]),
            "attention_mask": np.ones((16, 6), np.int32),
            "idx": ks.astype(np.int64),
        }

    first = None
    for s in range(steps):
        state, loss = step(state, shard_batch(make_batch(s), mesh), jax.random.key(1))
        if first is None:
            first = float(loss)
    assert float(loss) < 0.7 * first, (first, float(loss))

    # retrieval eval: 5 captions per audio (the metric's layout)
    enc_a, enc_t = make_encode_fns(ase)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    r = np.random.default_rng(777)
    waves, texts = [], []
    for k in range(N_CLASSES):
        for j in range(5):
            waves.append(_tone(k, seed=7000 + k * 5 + j))
            texts.append(_text(k, r))
    audio_emb = np.asarray(enc_a(variables, jnp.asarray(np.stack(waves))))
    text_emb = np.asarray(
        enc_t(variables, jnp.asarray(np.stack(texts)),
              jnp.ones((len(texts), 6), jnp.int32))
    )
    m = t2a(audio_emb, text_emb)
    # chance r1 = 12.5% over 8 audios; trained should be far above
    assert m["r1"] >= 50.0, m
