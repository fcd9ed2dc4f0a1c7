"""End-to-end embedding-bank build benchmark: wav files on disk -> bank
records (native WAV decode + pad + HTSAT encode), vs encoder-only rate."""
import json, os, struct, sys, time, wave
import numpy as np

N_CLIPS = int(os.environ.get("N_CLIPS", "512"))
SR = 44100            # realistic source rate: exercises the Kaiser resampler
TARGET_SR = 32000
D = "/tmp/bankbench"

if not os.path.exists(os.path.join(D, f"c{N_CLIPS-1:04d}.wav")):
    os.makedirs(D, exist_ok=True)
    rng = np.random.default_rng(0)
    t = np.arange(SR * 10) / SR
    for i in range(N_CLIPS):
        x = (0.2 * np.sin(2 * np.pi * (100 + i) * t)
             + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
        pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
        with wave.open(os.path.join(D, f"c{i:04d}.wav"), "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(SR)
            w.writeframes(pcm.tobytes())
    rows = ["audio_id\tfile_name"]
    audios = []
    for i in range(N_CLIPS):
        rows.append(f"a{i}\t{D}/c{i:04d}.wav")
        audios.append({"audio_id": f"a{i}", "captions": [f"clip {i}"]})
    open(os.path.join(D, "wav.csv"), "w").write("\n".join(rows) + "\n")
    json.dump({"audios": audios}, open(os.path.join(D, "text.json"), "w"))
    print("fixtures written", flush=True)

import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from zs_aac_tpu.data.audio_io import load_audio, pad_or_truncate
from zs_aac_tpu.pipeline.extract import extract_audio_text_bank
from zs_aac_tpu.models.ase import ASE, ASEConfig
from zs_aac_tpu.ops.logmel import LogMelConfig
from zs_aac_tpu.train.contrastive import make_encode_fns

BATCH = 64
mel_cfg = LogMelConfig(sr=TARGET_SR, n_mels=64)
cfg = ASEConfig(audio_encoder="htsat", embed_size=1024,
                fused_attn=True, fused_block=True, dtype=jnp.bfloat16)
ase = ASE(cfg)
n = TARGET_SR * 10
spec = jnp.zeros((2, 1001, 64), jnp.bfloat16)
ids = jnp.zeros((2, 8), jnp.int32); mask = jnp.ones((2, 8), jnp.int32)
variables = jax.jit(lambda r: ase.init(
    {"params": r}, spec, ids, mask, jnp.arange(2),
    train=False))(jax.random.key(0))
variables = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16)
    if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)

enc, _ = make_encode_fns(ase, mel_cfg, mel_impl="pallas")

def encode_audio(waves):
    return np.asarray(enc(variables, jnp.asarray(waves))).astype(np.float32)

def encode_audio_pcm(pcm, sr_in, target_len):
    from zs_aac_tpu.ops.resample import resample_poly_device
    waves = resample_poly_device(jnp.asarray(pcm), sr_in, TARGET_SR, target_len)
    return np.asarray(enc(variables, waves)).astype(np.float32)

if os.environ.get("BANK_PCM", "1") == "1":
    encode_audio.pcm = encode_audio_pcm  # int16 native-rate upload + device resample

# warm up (compile) and host decode-rate probe
w0 = np.stack([pad_or_truncate(load_audio(f"{D}/c{i:04d}.wav", TARGET_SR), n)
               for i in range(BATCH)])
_ = float(encode_audio(w0)[0, 0])
_ = float(encode_audio(w0 * 1.01)[0, 0])
if hasattr(encode_audio, "pcm"):
    from zs_aac_tpu.data.audio_io import load_audio_raw
    p0 = np.stack([pad_or_truncate(load_audio_raw(f"{D}/c{i:04d}.wav")[0],
                                   SR * 10) for i in range(BATCH)])
    _ = float(encode_audio.pcm(p0, SR, n)[0, 0])
    _ = float(encode_audio.pcm(p0 + 1, SR, n)[0, 0])
print("warm", flush=True)

t0 = time.perf_counter()
for i in range(BATCH):
    load_audio(f"{D}/c{i:04d}.wav", TARGET_SR)
host_rate = BATCH / (time.perf_counter() - t0)
print(f"host decode+resample alone: {host_rate:.0f} clips/s", flush=True)
if hasattr(encode_audio, "pcm"):
    from zs_aac_tpu.data.audio_io import load_audio_raw
    t0 = time.perf_counter()
    for i in range(BATCH):
        load_audio_raw(f"{D}/c{i:04d}.wav")
    print(f"host RAW int16 decode alone: {BATCH/(time.perf_counter()-t0):.0f} clips/s",
          flush=True)

args = dict(sr=TARGET_SR, max_length=10)
t0 = time.perf_counter()
bank = extract_audio_text_bank(encode_audio, None, D, False, args, BATCH)
dt = time.perf_counter() - t0
assert len(bank) == N_CLIPS
print(f"end-to-end bank build: {N_CLIPS/dt:.0f} clips/s "
      f"({dt:.1f} s for {N_CLIPS} clips, batch {BATCH})", flush=True)
