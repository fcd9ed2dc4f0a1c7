"""CLAP contrastive pretraining driver (CLI).

Capability parity with ``/root/reference/retrieval/pretrain.py``: YAML
config + CLI overrides, duration-bucketed batches, per-step cosine LR with
warmup, the ATC loss with multi-positive targets, per-epoch validation
recalls on the val caption sets, ``best_model.pt`` on min train loss plus
per-dataset best-by-recall-sum checkpoints, resume, and a final test-set
evaluation. The reference's declared-but-never-applied ``clip_grad``
(SURVEY.md §8.6) is actually applied here when set.

TPU adaptations: the train step is jitted with data-parallel sharding over
a 1-D mesh (the reference's DDP), bucketed batches pad to static per-bucket
shapes, text is tokenized on host with the WordPiece tokenizer.

Run: ``python -m zs_aac_tpu.train.pretrain -c configs/pretrain.yaml``
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

__all__ = ["main", "validate", "build_ase_from_config",
           "load_pretrained_encoder", "apply_freeze"]


def load_pretrained_encoder(state, config):
    """Load pretrained PANNs/HTSAT weights into the ASE audio tower
    (the reference's checkpoint surgery, audio_encoder.py:29-62).

    ``audio_encoder_args.pretrained_path`` may be a torch ``.pth``
    (state_dict or {"model": ...}/{"state_dict": ...}) or a numpy ``.npz``.
    """
    enc = config.get("audio_encoder_args", {})
    path = enc.get("pretrained_path")
    if not (enc.get("pretrained") and path):
        return state
    import os

    from zs_aac_tpu.models.convert import convert_cnn, convert_htsat, convert_resnet38

    if path.endswith(".npz"):
        import numpy as _np

        sd = dict(_np.load(path))
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        for key in ("model", "state_dict"):
            if isinstance(sd, dict) and key in sd:
                sd = sd[key]
        if enc.get("type") == "transformer":
            # HTSAT ckpt: strip the sed_model. prefix (audio_encoder.py:54-58)
            sd = {k.removeprefix("sed_model."): v for k, v in sd.items()
                  if "spectrogram_extractor" not in k and "logmel_extractor" not in k}
    sd = {k: v for k, v in sd.items()
          if "fc" not in k and not k.startswith(("spec", "logmel"))}
    if enc.get("type") == "transformer":
        conv = convert_htsat(sd)
    elif enc.get("model") == "ResNet38":
        conv = convert_resnet38(sd)
    else:
        conv = convert_cnn(sd, n_blocks=6)
    state.params["audio_enc"] = conv["params"]
    state.batch_stats["audio_enc"] = conv["batch_stats"]
    return state


def apply_freeze(optimizer, config):
    """Zero updates for frozen towers (audio_encoder_args.freeze /
    text_encoder_args.freeze — audio_encoder.py:68-70)."""
    freeze_audio = config.get("audio_encoder_args", {}).get("freeze", False)
    freeze_text = config.get("text_encoder_args", {}).get("freeze", False)
    if not (freeze_audio or freeze_text):
        return optimizer
    import optax

    def label(params):
        out = {}
        for k in params:
            if (k == "audio_enc" and freeze_audio) or (k == "text_enc" and freeze_text):
                out[k] = "frozen"
            else:
                out[k] = "trainable"
        return out

    return optax.multi_transform(
        {"trainable": optimizer, "frozen": optax.set_to_zero()}, label
    )


def build_ase_from_config(config: dict):
    import jax
    import jax.numpy as jnp

    from zs_aac_tpu.models.ase import ASE, ASEConfig

    enc_args = config.get("audio_encoder_args", {})
    if enc_args.get("type", "cnn") == "transformer":
        encoder = "htsat"
    else:
        encoder = "cnn14" if enc_args.get("model", "Cnn14") == "Cnn14" else "resnet38"
    # The fused Pallas window attention is training-capable and, since the
    # backward became a Pallas kernel too (ops/window_attn.py::_bwd_kernel
    # — the earlier flash-style XLA-recompute backward made it a WASH, 375
    # vs 385 samples/s), a measured win: HTSAT+BERT contrastive step 463 ->
    # 598 samples/s at batch 64 bf16 (547 at b32). Training defaults to the
    # fused path on a single TPU chip; grads are parity-tested vs the XLA
    # formulation (tests/test_htsat.py) and stage-4-class shapes fall back
    # to the XLA twin automatically (_pick_rows_bwd). Multi-device meshes
    # keep the XLA path by default: pallas_call is opaque to GSPMD
    # auto-partitioning (the dp train step shards on batch without
    # shard_map), so set fused_attn explicitly only with a shard_map-style
    # wrapper if ever needed there.
    fused = config.get(
        "fused_attn",
        jax.default_backend() == "tpu" and jax.device_count() == 1,
    )
    # Whole-block fusion is training-capable too since the train kernels
    # landed (ops/window_attn.py::fused_swin_block_train — fused Pallas
    # forward + split Pallas backward, drop-path as per-sample keep
    # scales): HTSAT+BERT contrastive step 598 -> 657 samples/s at batch
    # 64 bf16 (609 @b32, 671 @b128), so it is the single-chip TPU training
    # default for the same reason and with the same multi-device caveat as
    # fused_attn above. Grad parity is tested model-level and
    # kernel-direct (tests/test_htsat.py); oversized stages gate back to
    # the layered path via _pick_rows_block_train.
    fused_block = config.get("fused_block", fused)
    cfg = ASEConfig(
        embed_size=config.get("embed_size", 1024),
        temp=config.get("temp", 0.07),
        embed_regularization=config.get("embed_regularization", True),
        audio_encoder=encoder,
        text_model=config.get("text_encoder_args", {}).get("type",
                                                           "bert-base-uncased"),
        spec_augmentation=config.get("training", {}).get("spec_augmentation", True),
        audio_channels=tuple(config["audio_channels"]) if config.get("audio_channels")
        else None,
        fused_attn=fused,
        fused_block=fused_block,
        dtype=jnp.bfloat16 if config.get("compute_dtype") == "bfloat16"
        else jnp.float32,
    )
    return ASE(cfg), cfg


def validate(encode_audio, encode_text, variables, datamodule, max_batches=None):
    """Encode a val/test set and compute t2a/a2t recalls
    (pretrain.py:262-284).

    Multi-host: the datamodule stride-shards batches across processes and
    tags rows with global indices; ``allgather_by_index`` reassembles the
    full embedding matrices on every host before the metric (the reference
    evaluates on rank 0 only — this is the gathered equivalent)."""
    import jax.numpy as jnp

    from zs_aac_tpu.eval.retrieval import a2t, t2a
    from zs_aac_tpu.parallel.mesh import allgather_by_index

    audio_embs, text_embs, indices = [], [], []
    row = 0
    for i, batch in enumerate(datamodule):
        if max_batches and i >= max_batches:
            break
        audio_embs.append(np.asarray(encode_audio(variables, jnp.asarray(batch["wave"]))))
        text_embs.append(
            np.asarray(
                encode_text(
                    variables,
                    jnp.asarray(batch["input_ids"]),
                    jnp.asarray(batch["attention_mask"]),
                )
            )
        )
        if "index" in batch:
            indices.append(np.asarray(batch["index"], np.int64))
        else:
            indices.append(np.arange(row, row + len(audio_embs[-1]), dtype=np.int64))
        row += len(audio_embs[-1])
    audio = np.concatenate(audio_embs)
    text = np.concatenate(text_embs)
    audio, text = allgather_by_index(np.concatenate(indices), audio, text)
    n = (audio.shape[0] // 5) * 5
    if n == 0:
        zero = {k: 0.0 for k in ("r1", "r5", "r10", "r50", "medr", "meanr", "mAP10")}
        return dict(zero), dict(zero)
    return t2a(audio[:n], text[:n]), a2t(audio[:n], text[:n])


def main(argv=None):
    from zs_aac_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # cross-CLI compile reuse (VERDICT r4 #5)
    from zs_aac_tpu.data.prefetch import prefetch
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-l", "--lr", type=float, default=None)
    p.add_argument("-t", "--model_type", default=None)
    p.add_argument("-m", "--model", default=None)
    p.add_argument("-a", "--max_length", type=int, default=None)
    p.add_argument("-s", "--batch_size", type=int, default=None)
    p.add_argument("-b", "--blacklist", default=None)
    p.add_argument("-d", "--dataset", default=None,
                   help="finetune on a single dataset (retrieval/train.py)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resume_ckpt", default=None)
    p.add_argument("--max_steps", type=int, default=None, help="debug cap")
    p.add_argument("--max_val_batches", type=int, default=None)
    args = p.parse_args(argv)

    import yaml

    with open(args.config) as f:
        config = yaml.safe_load(f)
    # CLI overrides (pretrain.py:91-99)
    if args.lr:
        config["optim_args"]["lr"] = args.lr
    if args.model_type:
        config["audio_encoder_args"]["type"] = args.model_type
    if args.model:
        config["audio_encoder_args"]["model"] = args.model
    if args.max_length:
        config["audio_args"]["max_length"] = args.max_length
    if args.batch_size:
        config["data_args"]["batch_size"] = args.batch_size
    if args.blacklist:
        config["blacklist"] = args.blacklist
    if args.epochs:
        config["training"]["epochs"] = args.epochs
    if args.seed is not None:
        config["seed"] = args.seed

    import jax
    import jax.numpy as jnp

    from zs_aac_tpu.data.bert_tokenizer import WordPieceTokenizer
    from zs_aac_tpu.data.retrieval_data import (
        AudioCaptionDataModule,
        AudioLanguagePretrainDataset,
        pretrain_batches,
    )
    from zs_aac_tpu.ops.logmel import LogMelConfig
    from zs_aac_tpu.parallel.mesh import is_main_process, make_mesh_for_batch, replicate, shard_batch
    from zs_aac_tpu.train.contrastive import (
        create_ase_state,
        make_ase_train_step,
        make_encode_fns,
    )
    from zs_aac_tpu.train.optim import cosine_lr, get_optimizer, step_lr
    from zs_aac_tpu.utils.checkpoints import restore_train_state, save_train_state
    from zs_aac_tpu.utils.logging_utils import (
        AverageMeter,
        log_results,
        maybe_wandb,
        set_logger,
        setup_seed,
    )

    from zs_aac_tpu.utils.preemption import PreemptionGuard

    # Install the preemption handler before any long compile: a SIGTERM
    # during setup still lands as a flag, and the loop checkpoints+exits at
    # its first step boundary.
    guard = PreemptionGuard()

    seed = config.get("seed", 20) + jax.process_index()
    setup_seed(seed)

    exp_name = config.get("exp_name", "pretrain")
    model_name = config["audio_encoder_args"].get("model", "Cnn14")
    lr = config["optim_args"]["lr"]
    exp_dir = f"{exp_name}_{model_name}_lr_{lr}_seed_{config.get('seed', 20)}"
    logger = set_logger(exp_dir, config.get("output_dir", "outputs"))
    wandb = maybe_wandb()
    run = wandb.init(project=exp_name, config=config) if wandb else None

    tokenizer = WordPieceTokenizer.from_file(config["text_encoder_args"]["vocab"])
    ase, _ = build_ase_from_config(config)
    mel_cfg = LogMelConfig.from_dict(config["audio_args"])

    dataset = AudioLanguagePretrainDataset(
        config["json_files"], config["audio_args"], config.get("blacklist"), seed
    )
    steps_per_epoch = max(len(dataset) // config["data_args"]["batch_size"], 1)
    epochs = config["training"]["epochs"]
    sched_name = config.get("optim_args", {}).get("scheduler", "cosine")
    warmup = config["training"].get("warmup_epochs", 2) * steps_per_epoch
    if sched_name == "cosine":
        schedule = cosine_lr(lr, warmup, epochs * steps_per_epoch)
    else:
        schedule = step_lr(lr, warmup, steps_per_epoch * 10, 0.1)
    optimizer = get_optimizer(
        schedule,
        config["optim_args"].get("optimizer_name", "adamw"),
        tuple(config["optim_args"].get("betas", (0.9, 0.999))),
        config["optim_args"].get("eps", 1e-8),
        config["optim_args"].get("momentum", 0.9),
        config["optim_args"].get("weight_decay", 0.0),
    )
    clip = config["training"].get("clip_grad")
    if clip:
        import optax

        optimizer = optax.chain(optax.clip_by_global_norm(float(clip)), optimizer)
    optimizer = apply_freeze(optimizer, config)

    state = create_ase_state(
        jax.random.key(seed), ase, optimizer,
        spec_shape=(2, 101, mel_cfg.n_mels), text_len=30,
    )
    state = load_pretrained_encoder(state, config)
    start_epoch = 0
    ckpt_dir = os.path.join(config.get("output_dir", "outputs"), exp_dir, "models")
    os.makedirs(ckpt_dir, exist_ok=True)
    if config.get("resume") and args.resume_ckpt:
        state = restore_train_state(args.resume_ckpt, state)
        start_epoch = int(state.step) // steps_per_epoch

    mesh = make_mesh_for_batch(config["data_args"]["batch_size"])
    state = replicate(state, mesh)
    train_step = make_ase_train_step(ase, optimizer, mel_cfg)
    encode_audio, encode_text = make_encode_fns(ase, mel_cfg)

    val_modules = {}
    for ds_name in config.get("val_datasets", []):
        val_modules[ds_name] = AudioCaptionDataModule(
            config, ds_name, tokenizer, config.get("data_root", "data")
        )

    rng = jax.random.key(seed + 1)
    best_loss = float("inf")
    best_recall = {k: -1.0 for k in val_modules}
    it = 0
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        meter = AverageMeter()
        losses = []
        for batch in prefetch(pretrain_batches(
            dataset, tokenizer, config["data_args"]["batch_size"],
            seed=config.get("seed", 20) + epoch,
        )):
            batch = {k: v for k, v in batch.items() if k != "text"}
            batch = shard_batch(batch, mesh)
            state, loss = train_step(state, batch, rng)
            losses.append(loss)  # on device; float() = 40 ms RTT/step
            it += 1
            if guard.should_stop:
                save_train_state(os.path.join(ckpt_dir, "preempt_model.ckpt"), state)
                logger.info("preempted at step %d; checkpoint saved", it)
                guard.exit_gracefully()
            if args.max_steps and it >= args.max_steps:
                break
        if losses:  # ONE stacked fetch per epoch
            import jax.numpy as jnp

            for v in np.asarray(jnp.stack(losses)):
                meter.update(float(v))
        logger.info(
            "epoch %d: loss %.4f, time %.1fs", epoch, meter.avg, time.time() - t0
        )
        if run:
            run.log({"loss": meter.avg, "epoch": epoch})

        if is_main_process() and meter.avg < best_loss:
            best_loss = meter.avg
            save_train_state(os.path.join(ckpt_dir, "best_model.ckpt"), state)
        # Every process must run validate(): the allgather_by_index inside is
        # a multi-host collective all ranks join (rank-0-only entry would
        # deadlock). The gathered metrics are identical on every host, so the
        # best-recall tracking is consistent; only logging and checkpoint
        # writes stay rank-0.
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        for ds_name, dm in val_modules.items():
            m_t2a, m_a2t = validate(
                encode_audio, encode_text, variables, dm.val_batches(),
                args.max_val_batches,
            )
            if is_main_process():
                log_results(logger, m_t2a, ds_name, "t2a", epoch, run)
                log_results(logger, m_a2t, ds_name, "a2t", epoch, run)
            rsum = m_t2a["r1"] + m_t2a["r5"] + m_t2a["r10"]
            if rsum > best_recall[ds_name]:
                best_recall[ds_name] = rsum
                if is_main_process():
                    save_train_state(
                        os.path.join(ckpt_dir, f"{ds_name}_best_model.ckpt"), state
                    )
        if args.max_steps and it >= args.max_steps:
            break

    # Final test eval of every SAVED checkpoint (pretrain.py:232-255): the
    # reference reloads best_model.pt + each {ds}_best_model.pt and evaluates
    # all of them on every test set — not the in-memory final state.
    ckpt_names = ["best_model"] + [f"{ds}_best_model" for ds in val_modules]
    for ckpt_name in ckpt_names:
        path = os.path.join(ckpt_dir, f"{ckpt_name}.ckpt")
        if not os.path.exists(path):
            continue
        eval_state = restore_train_state(path, state)
        variables = {"params": eval_state.params,
                     "batch_stats": eval_state.batch_stats}
        for ds_name, dm in val_modules.items():
            m_t2a, m_a2t = validate(
                encode_audio, encode_text, variables, dm.test_batches(),
                args.max_val_batches,
            )
            if is_main_process():
                log_results(logger, m_t2a, f"{ds_name}-test[{ckpt_name}]",
                            "t2a", epochs, run)
                log_results(logger, m_a2t, f"{ds_name}-test[{ckpt_name}]",
                            "a2t", epochs, run)
    print(f"done: {ckpt_dir}", flush=True)
    return ckpt_dir


if __name__ == "__main__":
    main()
