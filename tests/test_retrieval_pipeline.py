"""End-to-end retrieval pipeline smoke: synthetic wavs + manifests ->
pretrain CLI (2 steps) -> checkpoints -> finetune warm start."""

import json
import os
import wave as wavemod

import numpy as np
import pytest
import yaml

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "dog", "bark", "##s", "rain",
         "fall", "##ing", "wind", "blow", "bird", "sing", "car", "horn", "the",
         "in", "park", "sound", "of", ".", ","]
WORDS = ["dog", "rain", "wind", "bird", "car", "park", "sound"]


def _write_wav(path, seconds, sr=32000, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(int(seconds * sr)) * 0.05).astype(np.float32)
    with wavemod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype("<i2").tobytes())


def _mk_corpus(root, n_audio=12, n_cap=5):
    os.makedirs(f"{root}/Toy/json_files", exist_ok=True)
    os.makedirs(f"{root}/wavs", exist_ok=True)
    rng = np.random.default_rng(0)
    items = []
    for i in range(n_audio):
        dur = float(rng.uniform(2, 8))
        p = f"{root}/wavs/a{i}.wav"
        _write_wav(p, dur, seed=i)
        item = {"audio": p, "duration": dur, "id": i}
        for c in range(1, n_cap + 1):
            ws = [WORDS[int(x) % len(WORDS)] for x in rng.integers(0, 7, 5)]
            item[f"caption_{c}"] = " ".join(ws) + "."
        items.append(item)
    for split in ("train", "val", "test"):
        with open(f"{root}/Toy/json_files/{split}.json", "w") as f:
            json.dump({"num_captions_per_audio": n_cap, "data": items}, f)
    # single-caption pretrain manifest
    single = [{"audio": it["audio"], "caption": it["caption_1"], "id": i,
               "duration": it["duration"]} for i, it in enumerate(items)]
    with open(f"{root}/pretrain.json", "w") as f:
        json.dump({"num_captions_per_audio": 1, "data": single}, f)
    vp = f"{root}/vocab.txt"
    with open(vp, "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    return vp


def _mk_config(root, vocab, **overrides):
    cfg = {
        "exp_name": "smoke",
        "seed": 20,
        "embed_size": 16,
        "temp": 0.07,
        "embed_regularization": True,
        "json_files": [f"{root}/pretrain.json"],
        "blacklist": None,
        "resume": False,
        "val_datasets": ["Toy"],
        "data_root": root,
        "output_dir": f"{root}/outputs",
        "audio_channels": [4, 8],
        "audio_args": {"sr": 32000, "n_fft": 1024, "hop_length": 320,
                       "f_min": 50, "f_max": 14000, "n_mels": 64,
                       "max_length": 5, "mono": True},
        "audio_encoder_args": {"type": "cnn", "model": "Cnn14",
                               "pretrained": False, "freeze": False},
        "data_args": {"batch_size": 4, "num_workers": 0},
        "text_encoder_args": {"type": "prajjwal1/bert-tiny", "vocab": vocab},
        "optim_args": {"lr": 5e-4, "scheduler": "cosine",
                       "optimizer_name": "adam", "betas": [0.9, 0.999],
                       "eps": 1e-8, "momentum": 0.9, "warmup_epochs": 0,
                       "weight_decay": 0.0},
        "training": {"spec_augmentation": True, "epochs": 1, "clip_grad": 2,
                     "dropout": 0.2},
    }
    cfg.update(overrides)
    path = f"{root}/config.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def test_manifest_loading_and_blacklist(tmp_path):
    root = str(tmp_path)
    _mk_corpus(root, n_audio=4)
    from zs_aac_tpu.data.retrieval_data import load_manifest_files

    data = load_manifest_files([f"{root}/Toy/json_files/train.json"])
    assert len(data) == 4 * 5
    assert data[0]["id"] == data[4]["id"]      # 5 captions share an audio id
    assert data[5]["id"] == data[0]["id"] + 1  # next audio gets the next id
    # blacklist filters FreeSound ids
    bl = {"FreeSound": [0, 1], "AudioSet": []}
    blp = f"{root}/bl.json"
    with open(blp, "w") as f:
        json.dump(bl, f)
    import shutil

    os.makedirs(f"{root}/FreeSound_x", exist_ok=True)
    fs_manifest = f"{root}/FreeSound_x/m.json"
    shutil.copy(f"{root}/pretrain.json", fs_manifest)
    data2 = load_manifest_files([fs_manifest], blp)
    assert len(data2) == 2  # ids 0,1 dropped of 4


def test_pretrain_and_finetune_cli_smoke(tmp_path):
    root = str(tmp_path)
    vocab = _mk_corpus(root)
    cfg_path = _mk_config(root, vocab)

    from zs_aac_tpu.train.pretrain import main as pretrain_main

    ckpt_dir = pretrain_main(["-c", cfg_path, "--max_steps", "2",
                              "--max_val_batches", "2"])
    assert os.path.exists(os.path.join(ckpt_dir, "best_model.ckpt"))
    log = open(glob_one(f"{root}/outputs", "output.log")).read()
    assert "t2a" in log and "r1" in log
    # checkpoint-faithful final eval (reference pretrain.py:232-255): every
    # SAVED checkpoint is restored and evaluated on the test set — best-by-
    # loss plus the per-dataset best-by-recall one.
    assert "Toy-test[best_model]" in log
    assert "Toy-test[Toy_best_model]" in log

    from zs_aac_tpu.train.finetune import main as finetune_main

    ck2 = finetune_main([
        "-c", cfg_path, "-d", "Toy", "--max_steps", "1", "--max_val_batches", "2",
        "--pretrain_path", os.path.join(ckpt_dir, "best_model.ckpt"),
    ])
    assert os.path.exists(os.path.join(ck2, "best_model.ckpt"))


def glob_one(root, name):
    for dirpath, _, files in os.walk(root):
        if name in files:
            return os.path.join(dirpath, name)
    raise FileNotFoundError(name)


def test_pretrained_encoder_load_and_freeze(tmp_path):
    """PANNs-style npz checkpoint loads into the ASE audio tower; frozen
    towers receive zero updates."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import yaml as _yaml

    from zs_aac_tpu.models.ase import ASE, ASEConfig
    from zs_aac_tpu.train.contrastive import create_ase_state
    from zs_aac_tpu.train.optim import cosine_lr, get_optimizer
    from zs_aac_tpu.train.pretrain import apply_freeze, load_pretrained_encoder

    cfg = ASEConfig(embed_size=8, audio_channels=(4, 8),
                    text_model="prajjwal1/bert-tiny", spec_augmentation=False)
    ase = ASE(cfg)
    opt = get_optimizer(cosine_lr(1e-3, 1, 10))
    state = create_ase_state(jax.random.key(0), ase, opt,
                             spec_shape=(2, 51, 64), text_len=8)

    # synth a PANNs-style state dict matching the tiny channels (4, 8)
    sd = {}
    sd["bn0.weight"] = np.full(64, 2.0, np.float32)
    sd["bn0.bias"] = np.zeros(64, np.float32)
    sd["bn0.running_mean"] = np.zeros(64, np.float32)
    sd["bn0.running_var"] = np.ones(64, np.float32)
    cin = 1
    for i, c in enumerate((4, 8), 1):
        sd[f"conv_block{i}.conv1.weight"] = np.zeros((c, cin, 3, 3), np.float32)
        sd[f"conv_block{i}.conv2.weight"] = np.zeros((c, c, 3, 3), np.float32)
        for bn in ("bn1", "bn2"):
            sd[f"conv_block{i}.{bn}.weight"] = np.ones(c, np.float32)
            sd[f"conv_block{i}.{bn}.bias"] = np.zeros(c, np.float32)
            sd[f"conv_block{i}.{bn}.running_mean"] = np.zeros(c, np.float32)
            sd[f"conv_block{i}.{bn}.running_var"] = np.ones(c, np.float32)
        cin = c
    npz = str(tmp_path / "cnn.npz")
    np.savez(npz, **sd)

    config = {"audio_encoder_args": {"pretrained": True, "pretrained_path": npz,
                                     "type": "cnn", "model": "Cnn14", "freeze": True},
              "text_encoder_args": {"freeze": False}}
    # patch convert to 2 blocks for the tiny model
    import zs_aac_tpu.train.pretrain as pt
    import zs_aac_tpu.models.convert as cvt

    orig = cvt.convert_cnn
    cvt.convert_cnn = lambda sd, n_blocks: orig(sd, 2)
    try:
        state = load_pretrained_encoder(state, config)
    finally:
        cvt.convert_cnn = orig
    np.testing.assert_array_equal(
        np.asarray(state.params["audio_enc"]["bn0"]["scale"]), np.full(64, 2.0)
    )

    frozen_opt = apply_freeze(opt, config)
    opt_state = frozen_opt.init(state.params)
    grads = jax.tree.map(jnp.ones_like, state.params)
    updates, _ = frozen_opt.update(grads, opt_state, state.params)
    assert float(jnp.abs(updates["audio_enc"]["bn0"]["scale"]).max()) == 0.0
    assert float(jnp.abs(updates["text_proj"]["fc1"]["kernel"]).max()) > 0.0


def test_preemption_guard_checkpoints(tmp_path):
    """SIGTERM mid-run -> preempt_model.ckpt written, clean exit."""
    import signal

    from zs_aac_tpu.utils.preemption import PreemptionGuard

    g = PreemptionGuard(verbose=False)
    assert not g.should_stop
    signal.raise_signal(signal.SIGTERM)
    assert g.should_stop
    g.restore()

    # full-driver path: a subprocess that SIGTERMs itself after the guard is live
    import subprocess, sys, textwrap

    root = str(tmp_path)
    vocab = _mk_corpus(root, n_audio=8)
    cfg_path = _mk_config(root, vocab)
    code = textwrap.dedent(f"""
        import glob, os, signal, threading, time
        os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
        import jax; jax.config.update('jax_platforms', 'cpu')
        pid = os.getpid()
        def killer():
            # wait until the run's logger exists (the guard installs just
            # after it), then preempt — robust to machine load.
            while not glob.glob('{root}/outputs/*/logging/output.log'):
                time.sleep(0.5)
            time.sleep(8.0)
            os.kill(pid, signal.SIGTERM)
        threading.Thread(target=killer, daemon=True).start()
        from zs_aac_tpu.train.pretrain import main
        main(['-c', '{cfg_path}', '--epochs', '500', '--max_val_batches', '1'])
    """)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                       timeout=580)
    found = list(__import__("pathlib").Path(root).rglob("preempt_model.ckpt"))
    assert found, f"no preemption checkpoint; stderr: {r.stderr[-800:]}"
