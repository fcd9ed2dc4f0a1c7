"""End-to-end reference-parity harness (the SURVEY.md §9 done-bar).

Constructs the reference's *own* pipeline in torch with seeded random
weights, runs the reference's *own* decode procedures, converts the same
weights through ``models/convert.py``, and requires this framework to emit
**token-identical captions** (and cosine-identical CLAP embeddings). This
is the only way to prove the "bit-faithful captions given converted
weights" claim offline (no pretrained checkpoints can be downloaded here).

Torch-side components mirror, with exact semantics and state_dict layout
(so the converters consume them as they would a real ``best.pth``):

- ``ClapCaption_prompt`` (`/root/reference/models/caption_model.py:291-339`):
  HF ``GPT2LMHeadModel`` + the MLP / TransformerMapper of
  `/root/reference/models/mapper.py`, with the hard-prompt-then-soft-prefix
  concat of ``clap_to_gpt``.
- ``generate2`` (`/root/reference/gpt2_prefix_eval.py:161-226`): top-p mask
  then argmax, stop on '.' or the hardcoded id 764 — reimplemented line-by-
  line semantics (including the literal nucleus filtering, not the
  argmax-equivalence shortcut the framework uses).
- ``generate_beam`` (`/root/reference/gpt2_prefix_eval.py:99-158`):
  length-normalized selection over ``scores_sum / seq_lengths``, stopped
  beams forced to token 0 at logprob 0, final order by normalized score.
- The ASE CLAP model (`/root/reference/retrieval/models/ase_model.py:21-60`
  + ``feature_extractor.py:12-38`` + ``cnns.py:137-201``): torch.stft
  frontend, Cnn14, HF BERT, Linear-ReLU-Linear projections, L2 normalize.
"""

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tnf

import jax
import jax.numpy as jnp

from zs_aac_tpu.models.caption import (
    CaptionConfig,
    caption_embeddings,
)
from zs_aac_tpu.models.convert import convert_ase, convert_caption
from zs_aac_tpu.models.gpt2 import GPT2Config

STOP = 13        # stands in for the '.' token id
EXTRA_STOP = 47  # stands in for the reference's hardcoded id 764
VOCAB = 211
GCFG = GPT2Config(vocab_size=VOCAB, n_positions=96, n_embd=64, n_layer=3, n_head=4)


# ---------------------------------------------------------------------------
# Torch reference models (state_dict layout == the reference checkpoints')
# ---------------------------------------------------------------------------


class RefMLP(tnn.Module):
    """mapper.py:6-18 — Sequential of Linear(+Tanh between)."""

    def __init__(self, sizes, bias=True):
        super().__init__()
        layers = []
        for i in range(len(sizes) - 1):
            layers.append(tnn.Linear(sizes[i], sizes[i + 1], bias=bias))
            if i < len(sizes) - 2:
                layers.append(tnn.Tanh())
        self.model = tnn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class RefMapperAttention(tnn.Module):
    """mapper.py:37-66 — einsum attention, fused KV, bias-free q/kv."""

    def __init__(self, dim, num_heads, bias=False):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.to_queries = tnn.Linear(dim, dim, bias=bias)
        self.to_keys_values = tnn.Linear(dim, dim * 2, bias=bias)
        self.project = tnn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        h = self.num_heads
        q = self.to_queries(x).reshape(b, n, h, c // h)
        kv = self.to_keys_values(x).reshape(b, n, 2, h, c // h)
        k, v = kv[:, :, 0], kv[:, :, 1]
        att = torch.einsum("bnhd,bmhd->bnmh", q, k) * self.scale
        att = att.softmax(dim=2)
        out = torch.einsum("bnmh,bmhd->bnhd", att, v).reshape(b, n, c)
        return self.project(out)


class RefMapperMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(tnf.relu(self.fc1(x)))


class RefTransformerLayer(tnn.Module):
    """mapper.py:68-88 — pre-norm attn + pre-norm ReLU MLP (mlp_ratio 2)."""

    def __init__(self, dim, num_heads, mlp_ratio=2.0):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = RefMapperAttention(dim, num_heads, bias=False)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = RefMapperMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class RefTransformer(tnn.Module):
    def __init__(self, dim, num_heads, num_layers):
        super().__init__()
        self.layers = tnn.ModuleList(
            [RefTransformerLayer(dim, num_heads) for _ in range(num_layers)]
        )

    def forward(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class RefTransformerMapper(tnn.Module):
    """mapper.py:125-139."""

    def __init__(self, dim_clip, dim_embedding, prefix_length, clip_length,
                 num_layers=8):
        super().__init__()
        self.clip_length = clip_length
        self.transformer = RefTransformer(dim_embedding, 8, num_layers)
        self.linear = tnn.Linear(dim_clip, clip_length * dim_embedding)
        self.prefix_const = tnn.Parameter(
            torch.randn(prefix_length, dim_embedding)
        )

    def forward(self, x):
        x = self.linear(x).view(x.shape[0], self.clip_length, -1)
        pre = self.prefix_const.unsqueeze(0).expand(
            x.shape[0], *self.prefix_const.shape
        )
        return self.transformer(torch.cat((x, pre), dim=1))[:, self.clip_length:]


class RefClapCaptionPrompt(tnn.Module):
    """caption_model.py:291-339 (decode-relevant surface)."""

    def __init__(self, prefix_length, prefix_size, mapping_type, hf_cfg,
                 clip_length=None, num_layers=8):
        super().__init__()
        from transformers import GPT2LMHeadModel

        self.prefix_length = prefix_length
        self.gpt = GPT2LMHeadModel(hf_cfg)
        self.gpt_embedding_size = self.gpt.transformer.wte.weight.shape[1]
        if mapping_type == "mlp":
            self.clap_project = RefMLP(
                (prefix_size, (self.gpt_embedding_size * prefix_length) // 2,
                 self.gpt_embedding_size * prefix_length)
            )
        else:
            self.clap_project = RefTransformerMapper(
                prefix_size, self.gpt_embedding_size, prefix_length,
                clip_length or prefix_length, num_layers,
            )

    def clap_to_gpt(self, prefix, embedding_hard_prompt=None):
        proj = self.clap_project(prefix).view(
            -1, self.prefix_length, self.gpt_embedding_size
        )
        if embedding_hard_prompt is not None:
            proj = torch.cat((embedding_hard_prompt, proj), dim=1)
        return proj


# ---------------------------------------------------------------------------
# Reference decode procedures (gpt2_prefix_eval.py), exact semantics
# ---------------------------------------------------------------------------


def ref_generate2(model, embed, entry_length=67, top_p=0.8, temperature=1.0,
                  stop_token_index=STOP, extra_stop=EXTRA_STOP):
    """gpt2_prefix_eval.py:161-226 at batch 1 — including the literal
    nucleus mask before argmax (a no-op the framework exploits; running the
    literal computation here is the point of the harness)."""
    model.eval()
    generated = embed
    tokens = None
    with torch.no_grad():
        for _ in range(entry_length):
            logits = model.gpt(inputs_embeds=generated).logits
            logits = logits[:, -1, :] / (temperature if temperature > 0 else 1.0)
            sorted_logits, sorted_indices = torch.sort(logits, descending=True)
            cum = torch.cumsum(tnf.softmax(sorted_logits, dim=-1), dim=-1)
            remove = cum > top_p
            remove[..., 1:] = remove[..., :-1].clone()
            remove[..., 0] = 0
            logits[:, sorted_indices[remove]] = -float("inf")
            next_token = torch.argmax(logits, -1).unsqueeze(0)
            tokens = next_token if tokens is None else torch.cat(
                (tokens, next_token), dim=1
            )
            generated = torch.cat(
                (generated, model.gpt.transformer.wte(next_token)), dim=1
            )
            if next_token.item() in (stop_token_index, extra_stop):
                break
    return tokens.squeeze(0).tolist()


def ref_generate_beam(model, embed, beam_size=5, entry_length=67,
                      temperature=1.0, stop_token_index=STOP):
    """gpt2_prefix_eval.py:99-158 — returns (token lists truncated to their
    seq_lengths, normalized scores), ordered by score descending."""
    model.eval()
    device = embed.device
    seq_lengths = torch.ones(beam_size, device=device)
    is_stopped = torch.zeros(beam_size, device=device, dtype=torch.bool)
    tokens = scores = None
    generated = embed
    with torch.no_grad():
        for _ in range(entry_length):
            logits = model.gpt(inputs_embeds=generated).logits
            logits = logits[:, -1, :] / (temperature if temperature > 0 else 1.0)
            logits = logits.softmax(-1).log()
            if scores is None:
                scores, next_tokens = logits.topk(beam_size, -1)
                generated = generated.expand(beam_size, *generated.shape[1:])
                next_tokens, scores = next_tokens.permute(1, 0), scores.squeeze(0)
                tokens = next_tokens
            else:
                logits[is_stopped] = -float(np.inf)
                logits[is_stopped, 0] = 0
                scores_sum = scores[:, None] + logits
                seq_lengths[~is_stopped] += 1
                avg = scores_sum / seq_lengths[:, None]
                avg, next_tokens = avg.view(-1).topk(beam_size, -1)
                src = next_tokens // scores_sum.shape[1]
                seq_lengths = seq_lengths[src]
                next_tokens = (next_tokens % scores_sum.shape[1]).unsqueeze(1)
                tokens = torch.cat((tokens[src], next_tokens), dim=1)
                generated = generated[src]
                scores = avg * seq_lengths
                is_stopped = is_stopped[src]
            emb = model.gpt.transformer.wte(next_tokens.squeeze()).view(
                generated.shape[0], 1, -1
            )
            generated = torch.cat((generated, emb), dim=1)
            is_stopped = is_stopped + next_tokens.eq(stop_token_index).squeeze()
            if is_stopped.all():
                break
    scores = scores / seq_lengths
    out = tokens.cpu().numpy()
    lists = [out[i][: int(seq_lengths[i])].tolist() for i in range(beam_size)]
    order = scores.argsort(descending=True).tolist()
    return [lists[i] for i in order], scores[order].tolist()


# ---------------------------------------------------------------------------
# Caption parity: torch reference pipeline vs this framework
# ---------------------------------------------------------------------------


def _build_ref_caption(mapping_type, seed):
    from transformers import GPT2Config as HFGPT2Config

    torch.manual_seed(seed)
    hf_cfg = HFGPT2Config(
        vocab_size=GCFG.vocab_size, n_positions=GCFG.n_positions,
        n_embd=GCFG.n_embd, n_layer=GCFG.n_layer, n_head=GCFG.n_head,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    model = RefClapCaptionPrompt(
        prefix_length=4, prefix_size=24, mapping_type=mapping_type,
        hf_cfg=hf_cfg, num_layers=2,
    )
    # Amplify the positional signal: a freshly-initialized GPT-2 is nearly
    # position-invariant and greedy-decodes a constant token, which would
    # make the parity assertion vacuous. A large wpe makes every step's
    # argmax position-dependent (varied trajectories, incl. organic stops).
    with torch.no_grad():
        model.gpt.transformer.wpe.weight.mul_(25.0)
    model.eval()
    return model


def _convert(model, mapping_type):
    cfg = CaptionConfig(
        prefix_length=4, prefix_size=24, clip_length=4, num_layers=2,
        mapping_type=mapping_type, gpt2=GCFG,
    )
    params = convert_caption(model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)
    return cfg, params


@pytest.mark.parametrize("mapping_type", ["mlp", "transformer"])
def test_prefix_projection_parity(mapping_type):
    """clap_to_gpt == caption_embeddings on the same prefix + hard prompt."""
    model = _build_ref_caption(mapping_type, seed=0)
    cfg, params = _convert(model, mapping_type)
    rng = np.random.default_rng(1)
    prefix = rng.standard_normal((2, 24)).astype(np.float32)
    hard = rng.integers(1, VOCAB, (2, 3))

    with torch.no_grad():
        hard_emb = model.gpt.transformer.wte(torch.from_numpy(hard))
        want = model.clap_to_gpt(torch.from_numpy(prefix), hard_emb).numpy()
    got = np.asarray(
        caption_embeddings(params, cfg, jnp.asarray(prefix), jnp.asarray(hard))
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mapping_type", ["mlp", "transformer"])
def test_greedy_caption_tokens_bit_faithful(mapping_type):
    """The done-bar: reference generate2 on torch weights == this
    framework's greedy_decode on the converted weights, token for token."""
    from zs_aac_tpu.decoding.greedy import greedy_decode

    model = _build_ref_caption(mapping_type, seed=2)
    cfg, params = _convert(model, mapping_type)
    rng = np.random.default_rng(3)

    emitted = []
    for trial in range(4):
        prefix = rng.standard_normal((1, 24)).astype(np.float32)
        hard = rng.integers(1, VOCAB, (1, 3))
        with torch.no_grad():
            hard_emb = model.gpt.transformer.wte(torch.from_numpy(hard))
            embed = model.clap_to_gpt(torch.from_numpy(prefix), hard_emb)
        want = ref_generate2(model, embed, entry_length=24)

        pe = caption_embeddings(params, cfg, jnp.asarray(prefix), jnp.asarray(hard))
        tokens, lengths = greedy_decode(
            params["gpt2"], GCFG, pe, 24, STOP, EXTRA_STOP
        )
        got = np.asarray(tokens)[0][: int(lengths[0])].tolist()
        assert got == want, f"trial {trial}: {got} != {want}"
        emitted.append(got)
    # guard against a vacuous pass: trajectories must vary within and
    # across trials (constant-token decodes would match trivially)
    assert any(len(set(seq)) > 2 for seq in emitted), emitted


@pytest.mark.parametrize("mapping_type", ["mlp", "transformer"])
def test_beam_caption_tokens_bit_faithful(mapping_type):
    """Reference generate_beam == beam_search on converted weights: the
    emitted caption (best beam) is token-identical and every beam's
    normalized score matches."""
    from zs_aac_tpu.decoding.beam import beam_search

    model = _build_ref_caption(mapping_type, seed=4)
    cfg, params = _convert(model, mapping_type)
    rng = np.random.default_rng(5)

    for trial in range(3):
        prefix = rng.standard_normal((1, 24)).astype(np.float32)
        with torch.no_grad():
            embed = model.clap_to_gpt(torch.from_numpy(prefix))
        want_lists, want_scores = ref_generate_beam(
            model, embed, beam_size=3, entry_length=20
        )

        pe = caption_embeddings(params, cfg, jnp.asarray(prefix))
        tokens, lengths, scores = beam_search(params["gpt2"], GCFG, pe, 3, 20, STOP)
        tokens, lengths = np.asarray(tokens), np.asarray(lengths)
        order = np.argsort(-np.asarray(scores), kind="stable")
        got_lists = [
            tokens[i][: int(lengths[i])].tolist() for i in order
        ]
        got_scores = [float(scores[i]) for i in order]
        assert got_lists[0] == want_lists[0], f"trial {trial}"
        np.testing.assert_allclose(got_scores, want_scores, rtol=1e-3,
                                   atol=1e-4)


# ---------------------------------------------------------------------------
# CLAP parity: torch ASE (stft + Cnn14 + BERT + projections) vs models/ase.py
# ---------------------------------------------------------------------------

CHANNELS = (16, 32, 64, 128, 256, 512)


class TorchConvBlock(tnn.Module):
    """cnns.py:36-79."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        x = tnf.relu(self.bn1(self.conv1(x)))
        x = tnf.relu(self.bn2(self.conv2(x)))
        return tnf.avg_pool2d(x, 2)


class TorchCnn14(tnn.Module):
    """cnns.py:137-201 (eval mode: dropout off, spec-augment off). Takes a
    precomputed log-mel ``[B, T, F]`` — the frontend is checked separately
    below through the full encode path."""

    def __init__(self, channels=CHANNELS, mel_bins=64):
        super().__init__()
        self.bn0 = tnn.BatchNorm2d(mel_bins)
        cin = 1
        for i, c in enumerate(channels):
            setattr(self, f"conv_block{i + 1}", TorchConvBlock(cin, c))
            cin = c
        self.n_blocks = len(channels)

    def forward(self, spec):
        x = spec[:, None]               # [B, 1, T, F]
        x = self.bn0(x.transpose(1, 3)).transpose(1, 3)
        for i in range(self.n_blocks):
            x = getattr(self, f"conv_block{i + 1}")(x)
        x = torch.mean(x, dim=3)        # [B, C, T]
        return torch.max(x, dim=2)[0] + torch.mean(x, dim=2)


class TorchASE(tnn.Module):
    """ase_model.py:21-60 state_dict layout (audio_encoder.audio_enc.*,
    text_encoder.text_encoder.*, audio_proj.{0,2}, text_proj.{0,2}, temp)."""

    def __init__(self, embed_size, text_cfg, audio_width, text_width):
        super().__init__()
        from transformers import BertModel

        self.audio_encoder = tnn.Module()
        self.audio_encoder.audio_enc = TorchCnn14()
        self.text_encoder = tnn.Module()
        self.text_encoder.text_encoder = BertModel(
            text_cfg, add_pooling_layer=False
        )
        self.audio_proj = tnn.Sequential(
            tnn.Linear(audio_width, embed_size), tnn.ReLU(),
            tnn.Linear(embed_size, embed_size),
        )
        self.text_proj = tnn.Sequential(
            tnn.Linear(text_width, embed_size), tnn.ReLU(),
            tnn.Linear(embed_size, embed_size),
        )
        self.temp = tnn.Parameter(torch.ones([]) * 0.07)

    def encode_audio(self, spec):
        feats = self.audio_encoder.audio_enc(spec)
        return tnf.normalize(self.audio_proj(feats), dim=-1)

    def encode_text(self, input_ids, attention_mask):
        out = self.text_encoder.text_encoder(
            input_ids=input_ids, attention_mask=attention_mask
        )[0]
        return tnf.normalize(self.text_proj(out[:, 0, :]), dim=-1)


def _randomize_bn(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.from_numpy(
                rng.standard_normal(n).astype(np.float32) * 0.3))
            m.running_var.copy_(torch.from_numpy(
                0.5 + rng.random(n).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(
                0.5 + rng.random(n).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(
                rng.standard_normal(n).astype(np.float32) * 0.2))


def _torch_logmel(wave, cfg):
    """torchlibrosa Spectrogram+LogmelFilterBank semantics via torch.stft
    (independent of ops/logmel, which only shares the mel matrix helper —
    itself property-tested in test_logmel.py)."""
    from zs_aac_tpu.ops.logmel import mel_filterbank

    t = torch.stft(
        torch.from_numpy(wave), n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.n_fft, window=torch.hann_window(cfg.n_fft, periodic=True),
        center=True, pad_mode="reflect", return_complex=True,
    )
    power = (t.abs() ** 2).numpy().transpose(0, 2, 1)  # [B, T, freq]
    mel = power @ mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.f_min,
                                 cfg.f_max)
    return 10.0 * np.log10(np.maximum(mel, cfg.amin)).astype(np.float32)


def test_clap_embedding_parity_same_wav():
    """Same wav through the torch reference ASE and through this framework's
    jitted encode path (including its own log-mel frontend): cosine of the
    1024-d embeddings >= 0.9999 — and elementwise-close."""
    from transformers import BertConfig as HFBertConfig

    from zs_aac_tpu.models.ase import ASE, ASEConfig
    from zs_aac_tpu.ops.logmel import LogMelConfig
    from zs_aac_tpu.train.contrastive import make_encode_fns

    torch.manual_seed(7)
    rng = np.random.default_rng(8)

    text_cfg = HFBertConfig(
        hidden_size=128, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=512, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    tm = TorchASE(embed_size=64, text_cfg=text_cfg,
                  audio_width=CHANNELS[-1], text_width=128)
    _randomize_bn(tm, rng)
    tm.eval()

    cfg = ASEConfig(embed_size=64, audio_encoder="cnn14",
                    audio_channels=CHANNELS,
                    text_model="prajjwal1/bert-tiny", spec_augmentation=False)
    variables = jax.tree.map(jnp.asarray, convert_ase(tm.state_dict(), cfg))

    mel_cfg = LogMelConfig()
    encode_audio, encode_text = make_encode_fns(ASE(cfg), mel_cfg,
                                                mel_impl="xla")

    # audio leg: 2 s of noise at 32 kHz, straight from the wav
    wave = (rng.standard_normal((2, 2 * mel_cfg.sr)) * 0.1).astype(np.float32)
    with torch.no_grad():
        spec = _torch_logmel(wave, mel_cfg)
        want_a = tm.encode_audio(torch.from_numpy(spec)).numpy()
    got_a = np.asarray(encode_audio(variables, jnp.asarray(wave)))
    cos = np.sum(got_a * want_a, axis=-1)  # both rows are L2-normalized
    assert (cos >= 0.9999).all(), cos
    np.testing.assert_allclose(got_a, want_a, rtol=1e-3, atol=1e-4)

    # text leg: same token ids through both towers
    ids = rng.integers(1, 30000, (3, 12))
    mask = np.ones_like(ids)
    mask[2, 8:] = 0
    with torch.no_grad():
        want_t = tm.encode_text(torch.from_numpy(ids),
                                torch.from_numpy(mask)).numpy()
    got_t = np.asarray(
        encode_text(variables, jnp.asarray(ids), jnp.asarray(mask))
    )
    cos_t = np.sum(got_t * want_t, axis=-1)
    assert (cos_t >= 0.9999).all(), cos_t
    np.testing.assert_allclose(got_t, want_t, rtol=1e-3, atol=1e-4)


def test_clap_embedding_parity_same_wav_htsat():
    """Round-4 VERDICT #1 (second half): the published CLAP checkpoint is
    HTSAT-BERT (`/root/reference/setting/extract_data.yaml` ->
    HTSAT-BERT-ZS.pt), so the wave->embedding CLAP parity harness must cover
    the HTSAT tower too: same wav through a torch ASE whose audio tower is
    the TorchHTSAT reference twin (real random weights, reference state_dict
    layout) and through this framework's jitted encode path (own log-mel
    frontend + convert_ase), elementwise-close — on the XLA path and the
    fused whole-block default."""
    from transformers import BertConfig as HFBertConfig

    from test_htsat import TINY, TorchHTSAT, _randomize_torch_htsat
    from zs_aac_tpu.models.ase import ASE, ASEConfig
    from zs_aac_tpu.ops.logmel import LogMelConfig
    from zs_aac_tpu.train.contrastive import make_encode_fns

    torch.manual_seed(11)
    rng = np.random.default_rng(12)

    text_cfg = HFBertConfig(
        hidden_size=128, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=512, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    tm = TorchASE(embed_size=64, text_cfg=text_cfg,
                  audio_width=32, text_width=128)
    tower = TorchHTSAT()
    _randomize_torch_htsat(tower, rng)
    tm.audio_encoder.audio_enc = tower
    tm.eval()

    cfg = ASEConfig(embed_size=64, audio_encoder="htsat",
                    htsat_kwargs=tuple(TINY.items()),
                    text_model="prajjwal1/bert-tiny", spec_augmentation=False,
                    fused_attn=True, fused_block=True)
    variables = jax.tree.map(jnp.asarray, convert_ase(tm.state_dict(), cfg))

    # n_mels must match the tiny tower's 16 bins
    mel_cfg = LogMelConfig(n_mels=16)
    wave = (rng.standard_normal((2, 2 * mel_cfg.sr)) * 0.1).astype(np.float32)
    with torch.no_grad():
        spec = _torch_logmel(wave, mel_cfg)
        feats = tm.audio_encoder.audio_enc(torch.from_numpy(spec))["embedding"]
        want_a = tnf.normalize(tm.audio_proj(feats), dim=-1).numpy()

    for fused in (False, True):
        c = dataclasses.replace(cfg, fused_attn=fused, fused_block=fused)
        encode_audio, _ = make_encode_fns(ASE(c), mel_cfg, mel_impl="xla")
        got_a = np.asarray(encode_audio(variables, jnp.asarray(wave)))
        cos = np.sum(got_a * want_a, axis=-1)
        assert (cos >= 0.9999).all(), (fused, cos)
        np.testing.assert_allclose(got_a, want_a, rtol=1e-3, atol=1e-4,
                                   err_msg=f"fused={fused}")
