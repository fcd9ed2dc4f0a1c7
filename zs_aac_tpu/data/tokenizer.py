"""Self-contained tokenizers.

The reference uses HF ``GPT2Tokenizer.from_pretrained("gpt2")``
(``/root/reference/dataset/dataset.py:56``), which requires downloaded
vocab/merges files. This module provides:

- ``GPT2BPETokenizer``: a from-scratch byte-level BPE implementation that
  loads standard GPT-2-format ``vocab.json`` + ``merges.txt`` from a local
  path — drop-in id-compatible with the reference when given the same files.
- ``WordTokenizer``: a tiny deterministic word-level tokenizer for tests and
  offline smoke runs (no GPT-2 vocab files in the environment).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Sequence

import regex as re

__all__ = ["GPT2BPETokenizer", "WordTokenizer", "load_tokenizer"]

_GPT2_SPLIT = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte<->unicode mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


class GPT2BPETokenizer:
    """Byte-level BPE, GPT-2 file format."""

    def __init__(self, vocab: Dict[str, int], merges: List[tuple]):
        self.encoder = vocab
        self.decoder = {v: k for k, v in vocab.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self._cache: Dict[str, str] = {}

    @classmethod
    def from_files(cls, vocab_json: str, merges_txt: str) -> "GPT2BPETokenizer":
        with open(vocab_json) as f:
            vocab = json.load(f)
        merges = []
        with open(merges_txt) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split()
                merges.append((a, b))
        return cls(vocab, merges)

    @classmethod
    def from_dir(cls, path: str) -> "GPT2BPETokenizer":
        return cls.from_files(
            os.path.join(path, "vocab.json"), os.path.join(path, "merges.txt")
        )

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            a, b = best
            out = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        result = " ".join(word)
        self._cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        ids = []
        for tok in _GPT2_SPLIT.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        data = bytearray(self.byte_decoder[c] for c in text)
        return data.decode("utf-8", errors="replace")

    def token_bytes(self, token_id: int) -> bytes:
        """Raw UTF-8 bytes of one token. ``decode(ids)`` is exactly the
        concatenation of each id's ``token_bytes`` utf-8-decoded, which is
        what makes incremental decoding (append bytes, split at ASCII
        whitespace) exact — see decoding/magic.py's incremental WordPiece
        path."""
        return bytes(self.byte_decoder[c] for c in self.decoder[int(token_id)])

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)


class WordTokenizer:
    """Deterministic word-level tokenizer for offline tests.

    id 0 is reserved (doubles as the pad id, matching the reference's
    pad-with-0 convention); '.' gets a dedicated id usable as stop token.
    """

    def __init__(self, words: Sequence[str]):
        base = ["<unk>", "."]
        seen = dict.fromkeys(w for w in words if w not in base)
        self.itos = base + list(seen)
        self.stoi = {w: i for i, w in enumerate(self.itos)}

    @classmethod
    def from_corpus(cls, captions: Sequence[str]) -> "WordTokenizer":
        words: List[str] = []
        for c in captions:
            words.extend(c.lower().replace(".", " .").split())
        return cls(words)

    def encode(self, text: str) -> List[int]:
        return [
            self.stoi.get(w, 0) for w in text.lower().replace(".", " .").split()
        ]

    def decode(self, ids: Sequence[int]) -> str:
        words = [self.itos[int(i)] for i in ids if 0 <= int(i) < len(self.itos)]
        return " ".join(words).replace(" .", ".")

    @property
    def stop_token_id(self) -> int:
        return self.stoi["."]

    @property
    def vocab_size(self) -> int:
        return len(self.itos)


def load_tokenizer(path_or_kind: str):
    """Load a tokenizer: a directory with GPT-2 files, or 'word:<corpus.txt>'."""
    if os.path.isdir(path_or_kind):
        return GPT2BPETokenizer.from_dir(path_or_kind)
    raise ValueError(f"cannot load tokenizer from {path_or_kind!r}")
