"""End-to-end learning test: the captioner must actually learn.

A synthetic zero-shot task with signal: embeddings live in K well-separated
clusters and the caption is determined by the cluster. Training on (text
embedding, caption) pairs and evaluating on *audio* embeddings from the same
clusters (the zero-shot transfer setup) must reach near-perfect CIDEr —
random weights score ~0, so this catches sign errors, mask misalignment,
optimizer wiring, and decode bugs that shape tests cannot.
"""

import numpy as np
import jax
import jax.numpy as jnp

from zs_aac_tpu.decoding.greedy import greedy_decode
from zs_aac_tpu.eval.captioning import eval_prediction
from zs_aac_tpu.models.caption import (
    CaptionConfig,
    caption_embeddings,
    caption_loss,
    caption_train_logits,
    init_caption_model,
)
from zs_aac_tpu.models.gpt2 import GPT2Config
from zs_aac_tpu.data.tokenizer import WordTokenizer
from zs_aac_tpu.train.caption_trainer import (
    create_caption_state,
    make_caption_optimizer,
    make_caption_train_step,
)
from zs_aac_tpu.train.optim import linear_warmup_lr

CAPTIONS = [
    "a dog barks in the yard.",
    "rain falls on the roof.",
    "a car horn blares loudly.",
    "birds sing in the trees.",
]


def _cluster_embedding(rng, k, e=32, noise=0.05):
    center = np.zeros(e, np.float32)
    center[k * 8 : (k + 1) * 8] = 1.0
    return (center + noise * rng.standard_normal(e)).astype(np.float32)


def test_caption_training_learns_cluster_captions():
    tok = WordTokenizer.from_corpus(CAPTIONS)
    gcfg = GPT2Config(vocab_size=tok.vocab_size, n_positions=64, n_embd=64,
                      n_layer=2, n_head=4)
    ccfg = CaptionConfig(prefix_length=4, prefix_size=32, clip_length=4,
                         gpt2=gcfg, max_seq_len=12)

    rng = np.random.default_rng(0)
    B, steps = 32, 150
    opt = make_caption_optimizer(ccfg, linear_warmup_lr(3e-3, 10, steps))
    state = create_caption_state(jax.random.key(0), ccfg, opt)
    step_fn = make_caption_train_step(ccfg, opt, noise_variance=0.0)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        ks = r.integers(0, 4, B)
        prefix = np.stack([_cluster_embedding(r, k) for k in ks])
        tokens = np.zeros((B, ccfg.max_seq_len), np.int64)
        mask = np.zeros((B, ccfg.prefix_length + ccfg.max_seq_len), np.float32)
        mask[:, : ccfg.prefix_length] = 1.0
        for i, k in enumerate(ks):
            ids = tok.encode(CAPTIONS[k])
            tokens[i, : len(ids)] = ids
            mask[i, ccfg.prefix_length : ccfg.prefix_length + len(ids)] = 1.0
        return {"tokens": jnp.asarray(tokens), "mask": jnp.asarray(mask),
                "prefix": jnp.asarray(prefix)}

    first_loss = None
    for s in range(steps):
        state, loss = step_fn(state, make_batch(s), jax.random.key(1))
        if first_loss is None:
            first_loss = float(loss)
    assert float(loss) < 0.25 * first_loss, (first_loss, float(loss))

    # zero-shot eval: "audio" embeddings = same clusters, different noise draw
    r = np.random.default_rng(999)
    key2refs, key2pred = {}, {}
    prefixes = []
    for i in range(12):
        k = i % 4
        prefixes.append(_cluster_embedding(r, k))
        key2refs[f"clip{i}"] = [CAPTIONS[k]]
    emb = caption_embeddings(state.params, ccfg, jnp.asarray(np.stack(prefixes)))
    toks, lens = greedy_decode(state.params["gpt2"], ccfg.gpt2, emb, 12,
                               tok.stop_token_id, 10**9)
    for i in range(12):
        ids = list(np.asarray(toks[i][: int(lens[i])]))
        key2pred[f"clip{i}"] = [tok.decode(ids).lower()]

    scores = eval_prediction(key2refs, key2pred, metrics=("Bleu", "CIDEr"))
    # near-perfect retrieval of the cluster caption
    assert scores["Bleu"][0] > 0.9, (scores, key2pred)
    exact = sum(key2pred[k][0] == key2refs[k][0] for k in key2refs)
    assert exact >= 10, key2pred
