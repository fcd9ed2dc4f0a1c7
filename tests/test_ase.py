"""ASE contrastive model + data-parallel train step tests."""

import numpy as np
import jax
import jax.numpy as jnp

from zs_aac_tpu.models.ase import ASE, ASEConfig, atc_loss
from zs_aac_tpu.parallel.mesh import data_sharding, make_mesh, replicate, shard_batch
from zs_aac_tpu.train.contrastive import (
    create_ase_state,
    make_ase_train_step,
    make_encode_fns,
)
from zs_aac_tpu.train.optim import cosine_lr, get_optimizer

CFG = ASEConfig(
    embed_size=32,
    audio_channels=(8, 16),
    text_model="prajjwal1/bert-tiny",
    spec_augmentation=True,
)


def _tiny_ase():
    return ASE(CFG)


def _batch(b=8, t=16000, l=12, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "wave": jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.1),
        "input_ids": jnp.asarray(rng.integers(0, 1000, (b, l))),
        "attention_mask": jnp.ones((b, l), jnp.int32),
        "idx": jnp.asarray(np.repeat(np.arange(b // 2), 2)),  # paired positives
    }


def test_atc_loss_matches_manual():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 8)).astype(np.float32)
    t = rng.standard_normal((4, 8)).astype(np.float32)
    idx = np.array([0, 0, 1, 2])
    pos = (idx[:, None] == idx[None, :]).astype(np.float32)
    targets = pos / pos.sum(1, keepdims=True)
    sim = a @ t.T / 0.07

    def logsoftmax(x):
        x = x - x.max(axis=1, keepdims=True)
        return x - np.log(np.exp(x).sum(axis=1, keepdims=True))

    want = 0.5 * (
        -(logsoftmax(sim) * targets).sum(1).mean()
        - (logsoftmax(sim.T) * targets).sum(1).mean()
    )
    got = float(atc_loss(jnp.asarray(sim), jnp.asarray(sim.T), jnp.asarray(targets)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_train_step_on_8_device_mesh():
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    mesh = make_mesh()
    ase = _tiny_ase()
    opt = get_optimizer(cosine_lr(5e-5, 10, 100), "adamw")
    state = create_ase_state(jax.random.key(0), ase, opt, spec_shape=(2, 51, 64), text_len=12)
    step = make_ase_train_step(ase, opt)

    state = replicate(state, mesh)
    batch = shard_batch(_batch(), mesh)
    assert batch["wave"].sharding == data_sharding(mesh)

    state1, loss1 = step(state, batch, jax.random.key(1))
    state2, loss2 = step(state1, shard_batch(_batch(seed=1), mesh), jax.random.key(1))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert int(state2.step) == 2
    # params actually moved
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree.leaves(d)) > 0


def test_train_step_sharded_matches_single_device():
    ase = _tiny_ase()
    opt = get_optimizer(cosine_lr(5e-5, 10, 100), "adamw")
    state = create_ase_state(jax.random.key(0), ase, opt, spec_shape=(2, 51, 64), text_len=12)
    step = make_ase_train_step(ase, opt)
    batch = _batch()

    _, loss_single = step(state, batch, jax.random.key(1))

    mesh = make_mesh()
    _, loss_sharded = step(
        replicate(state, mesh), shard_batch(batch, mesh), jax.random.key(1)
    )
    np.testing.assert_allclose(float(loss_single), float(loss_sharded), rtol=1e-4)


def test_encode_fns_normalized():
    ase = _tiny_ase()
    opt = get_optimizer(cosine_lr(5e-5, 10, 100), "adamw")
    state = create_ase_state(jax.random.key(0), ase, opt, spec_shape=(2, 51, 64), text_len=12)
    enc_a, enc_t = make_encode_fns(ase)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    b = _batch(b=4)
    ea = enc_a(variables, b["wave"])
    et = enc_t(variables, b["input_ids"], b["attention_mask"])
    assert ea.shape == (4, CFG.embed_size) and et.shape == (4, CFG.embed_size)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(ea), axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(et), axis=1), 1.0, rtol=1e-5)
