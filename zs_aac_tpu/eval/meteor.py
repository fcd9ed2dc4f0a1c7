"""Pure-Python METEOR (no JVM).

The reference scores captions with the pycocoevalcap METEOR jar
(``/root/reference/utils.py:107-129``, ``predict_prompt.py:151-160``), which
needs a Java runtime this environment lacks. This module reimplements the
METEOR algorithm (Banerjee & Lavie 2005; Lavie & Agarwal 2007) from its
published description:

1. Align hypothesis and reference unigrams in matcher stages — *exact*,
   *stem* (Porter), *synonym* (injectable table) — each word used at most
   once, stages applied in order to the words left unmatched by earlier
   stages.
2. ``P = m/|hyp|``, ``R = m/|ref|``,
   ``Fmean = P*R / (alpha*P + (1-alpha)*R)``.
3. Fragmentation penalty ``gamma * (chunks/m) ** beta`` where ``chunks`` is
   the number of contiguous aligned runs (monotone, adjacent in both
   sentences).
4. ``score = (1 - penalty) * Fmean``; against multiple references the best
   segment score wins.

The corpus-level score aggregates the sufficient statistics (matches,
lengths, chunks) of each segment's best-scoring reference and applies the
same formula once — the METEOR jar's aggregation — rather than averaging
per-segment scores.

Deviations from the meteor-1.5 jar, documented per VERDICT r1 #4:
- No WordNet synonym data ships offline; the synonym stage takes an
  injectable ``synonyms`` mapping and defaults to empty.
- No paraphrase table (meteor-1.5's fourth stage) for the same reason.
- No content/function-word weighting (meteor-1.5's ``delta``): the
  function-word list is jar data. All words count equally, as in METEOR
  up to 1.0/NLTK.
- Default parameters are therefore the classic exact+stem+synonym ones
  (``alpha=0.9, beta=3.0, gamma=0.5``) rather than the 1.5 English task
  tune — the published setting this implementation actually realizes.

The alignment is greedy right-to-left per stage (identical to NLTK's
``meteor_score``); tests golden-check both the Porter stemmer and full
segment scores against NLTK.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Mapping, Optional, Sequence, Set, Tuple

__all__ = ["PorterStemmer", "meteor_segment", "meteor_corpus"]


# ---------------------------------------------------------------------------
# Porter stemmer — the original 1980 algorithm (golden-tested vs NLTK's
# ORIGINAL_ALGORITHM mode).
# ---------------------------------------------------------------------------


class PorterStemmer:
    """Porter 1980, 'An algorithm for suffix stripping' — original rules."""

    def _cons(self, w: str, i: int) -> bool:
        c = w[i]
        if c in "aeiou":
            return False
        if c == "y":
            return i == 0 or not self._cons(w, i - 1)
        return True

    def _m(self, stem: str) -> int:
        """Number of VC sequences in [C](VC)^m[V]."""
        i, n, m = 0, len(stem), 0
        while i < n and self._cons(stem, i):
            i += 1
        while i < n:
            while i < n and not self._cons(stem, i):
                i += 1
            if i >= n:
                break
            m += 1
            while i < n and self._cons(stem, i):
                i += 1
        return m

    def _has_vowel(self, stem: str) -> bool:
        return any(not self._cons(stem, i) for i in range(len(stem)))

    def _double_cons(self, w: str) -> bool:
        return len(w) >= 2 and w[-1] == w[-2] and self._cons(w, len(w) - 1)

    def _cvc(self, w: str) -> bool:
        if len(w) < 3:
            return False
        return (
            self._cons(w, len(w) - 3)
            and not self._cons(w, len(w) - 2)
            and self._cons(w, len(w) - 1)
            and w[-1] not in "wxy"
        )

    def _step1ab(self, w: str) -> str:
        if w.endswith("s"):
            if w.endswith("sses"):
                w = w[:-2]
            elif w.endswith("ies"):
                w = w[:-2]
            elif not w.endswith("ss"):
                w = w[:-1]
        if w.endswith("eed"):
            if self._m(w[:-3]) > 0:
                w = w[:-1]
        elif (w.endswith("ed") and self._has_vowel(w[:-2])) or (
            w.endswith("ing") and self._has_vowel(w[:-3])
        ):
            w = w[:-2] if w.endswith("ed") else w[:-3]
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif self._double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif self._m(w) == 1 and self._cvc(w):
                w += "e"
        return w

    def _step1c(self, w: str) -> str:
        if w.endswith("y") and self._has_vowel(w[:-1]):
            return w[:-1] + "i"
        return w

    _STEP2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
        ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
        ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ]
    _STEP3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    _STEP4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]

    def _rules(self, w: str, rules, min_m: int) -> str:
        for suf, rep in rules:
            if w.endswith(suf):
                stem = w[: len(w) - len(suf)]
                if self._m(stem) > min_m:
                    return stem + rep
                return w
        return w

    def _step4(self, w: str) -> str:
        for suf in self._STEP4:
            if w.endswith(suf):
                stem = w[: len(w) - len(suf)]
                if suf == "ion" and not stem.endswith(("s", "t")):
                    return w
                if self._m(stem) > 1:
                    return stem
                return w
        return w

    def _step5(self, w: str) -> str:
        if w.endswith("e"):
            stem = w[:-1]
            m = self._m(stem)
            if m > 1 or (m == 1 and not self._cvc(stem)):
                w = stem
        if self._m(w[:-1]) > 1 and w.endswith("ll"):
            w = w[:-1]
        return w

    def stem(self, word: str) -> str:
        w = word.lower()
        if len(w) <= 2:
            return w
        w = self._step1ab(w)
        w = self._step1c(w)
        w = self._rules(w, self._STEP2, 0)
        w = self._rules(w, self._STEP3, 0)
        w = self._step4(w)
        w = self._step5(w)
        return w


# ---------------------------------------------------------------------------
# Alignment and scoring
# ---------------------------------------------------------------------------

_Stats = Tuple[int, int, int, int]  # matches, hyp_len, ref_len, chunks


def _match_stage(hyp, ref, equal) -> List[Tuple[int, int]]:
    """Greedy right-to-left matching (NLTK-identical): for each remaining
    hyp word (scanned from the end), pair it with the last remaining ref
    word ``equal`` deems a match. ``hyp``/``ref`` are mutated lists of
    (position, word)."""
    matched = []
    for i in range(len(hyp))[::-1]:
        for j in range(len(ref))[::-1]:
            if equal(hyp[i][1], ref[j][1]):
                matched.append((hyp[i][0], ref[j][0]))
                hyp.pop(i)
                ref.pop(j)
                break
    return matched


def _align(
    hyp_tokens: Sequence[str],
    ref_tokens: Sequence[str],
    stemmer: Callable[[str], str],
    synonyms: Optional[Mapping[str, Set[str]]],
) -> List[Tuple[int, int]]:
    hyp = list(enumerate(hyp_tokens))
    ref = list(enumerate(ref_tokens))
    matches = _match_stage(hyp, ref, lambda a, b: a == b)
    matches += _match_stage(hyp, ref, lambda a, b: stemmer(a) == stemmer(b))
    if synonyms:
        def syn(a, b):
            return b in synonyms.get(a, ()) or a in synonyms.get(b, ())
        matches += _match_stage(hyp, ref, syn)
    return sorted(matches)


def _count_chunks(matches: List[Tuple[int, int]]) -> int:
    """Contiguous aligned runs: adjacent in hyp AND ref, in order."""
    if not matches:
        return 0
    chunks = 1
    for (h0, r0), (h1, r1) in zip(matches, matches[1:]):
        if h1 != h0 + 1 or r1 != r0 + 1:
            chunks += 1
    return chunks


def _segment_stats(
    hyp_tokens: Sequence[str],
    ref_tokens: Sequence[str],
    stemmer,
    synonyms,
) -> _Stats:
    matches = _align(hyp_tokens, ref_tokens, stemmer, synonyms)
    return (len(matches), len(hyp_tokens), len(ref_tokens),
            _count_chunks(matches))


def _score(stats: _Stats, alpha: float, beta: float, gamma: float) -> float:
    m, hl, rl, ch = stats
    if m == 0 or hl == 0 or rl == 0:
        return 0.0
    p = m / hl
    r = m / rl
    fmean = p * r / (alpha * p + (1 - alpha) * r)
    penalty = gamma * (ch / m) ** beta
    return (1 - penalty) * fmean


def meteor_segment(
    ref_token_lists: Sequence[Sequence[str]],
    hyp_tokens: Sequence[str],
    alpha: float = 0.9,
    beta: float = 3.0,
    gamma: float = 0.5,
    stemmer: Optional[Callable[[str], str]] = None,
    synonyms: Optional[Mapping[str, Set[str]]] = None,
) -> float:
    """Best METEOR score of ``hyp_tokens`` against each reference."""
    stemmer = stemmer or PorterStemmer().stem
    return max(
        _score(_segment_stats(hyp_tokens, r, stemmer, synonyms),
               alpha, beta, gamma)
        for r in ref_token_lists
    )


def meteor_corpus(
    refs: Dict[str, List[List[str]]],
    hyps: Dict[str, List[str]],
    alpha: float = 0.9,
    beta: float = 3.0,
    gamma: float = 0.5,
    stemmer: Optional[Callable[[str], str]] = None,
    synonyms: Optional[Mapping[str, Set[str]]] = None,
) -> float:
    """Corpus METEOR: per segment pick the best-scoring reference, sum the
    sufficient statistics across segments, apply the formula once (the
    jar's ``MeteorStats`` aggregation)."""
    stemmer = stemmer or PorterStemmer().stem
    tm = th = tr = tc = 0
    for key, hyp in hyps.items():
        best, best_stats = -1.0, (0, len(hyp), 0, 0)
        for r in refs[key]:
            stats = _segment_stats(hyp, r, stemmer, synonyms)
            s = _score(stats, alpha, beta, gamma)
            if s > best:
                best, best_stats = s, stats
        m, hl, rl, ch = best_stats
        tm, th, tr, tc = tm + m, th + hl, tr + rl, tc + ch
    return _score((tm, th, tr, tc), alpha, beta, gamma)
