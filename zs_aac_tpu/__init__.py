"""zs_aac_tpu — a TPU-native zero-shot Automated Audio Captioning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
XinMing0411/zero-shot-AAC (reference layout documented in SURVEY.md):

- ``ops``       : TPU compute kernels (fused log-mel frontend, SpecAugment,
                  cosine top-k) — Pallas where XLA fusion is not enough.
- ``models``    : flax.linen towers (CNN14/CNN10/ResNet38, HTSAT Swin, BERT,
                  GPT-2 with device KV cache, mapper networks, ASE/CLAP,
                  caption models).
- ``decoding``  : device-resident decode loops (greedy/top-p, beam, MAGIC)
                  built on ``lax.while_loop`` with preallocated KV caches.
- ``parallel``  : mesh construction + sharding rules (data-parallel pjit,
                  multi-host utilities) replacing the reference's DDP/NCCL.
- ``data``      : embedding banks (reference pickle-compatible), datasets,
                  bucketed samplers, audio IO (native C++ WAV decode with a
                  scipy fallback), manifests, text normalization.
- ``train``     : training drivers (captioner prompt-training, CLAP
                  contrastive pretraining) with Orbax checkpointing.
- ``eval``      : captioning metrics (BLEU/ROUGE-L/CIDEr/SPIDEr in pure
                  Python), retrieval recalls, zero-shot classification.
"""

__version__ = "0.1.0"
