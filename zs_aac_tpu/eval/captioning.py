"""COCO-caption-style metrics, natively in Python (no Java).

Capability parity with the reference's pycocoevalcap usage
(``/root/reference/predict_prompt.py:151-173``, ``utils.py:96-129``):
PTB-style tokenization then BLEU-1..4 / ROUGE-L / CIDEr / SPIDEr. The
reference shells out to the pycocoevalcap Java jars; this environment has
no JVM, so the scorers are reimplemented from their published algorithms:

- BLEU: corpus-level, closest-reference-length brevity penalty (the
  pycocoevalcap ``option="closest"`` default).
- ROUGE-L: per-candidate max F_lcs over references (beta=1.2), averaged.
- CIDEr: n=1..4 TF-IDF cosine with gaussian length penalty (sigma=6),
  document frequency over the reference corpus, x10 scale.
- METEOR: the Java jar is used when ``pycocoevalcap`` is importable;
  otherwise the pure-Python reimplementation in ``zs_aac_tpu/eval/meteor.py``
  (exact+stem+injectable-synonym alignment, NLTK-golden-tested) computes it.
- SPICE: the Java scene-graph parser is used when ``pycocoevalcap`` is
  importable; otherwise the pure-Python reimplementation in
  ``zs_aac_tpu/eval/spice.py`` (rule tagger + chunk scene graph +
  bipartite tuple F1, documented deviations) computes it, and
  ``SPICE_approx`` is flagged true in the output so downstream consumers
  know the number came from the approximate chunk grammar.

``eval_prediction(key2refs, key2pred, metrics)`` mirrors the reference's
entry point shape.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence

__all__ = ["ptb_tokenize", "bleu", "rouge_l", "cider", "eval_prediction"]

# Punctuation stripped by pycocoevalcap's PTBTokenizer wrapper.
_PUNCT = {
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
}
# words may contain internal hyphens/apostrophes (PTB keeps "well-known"
# and "o'clock" single); everything else splits to single non-space chars
_TOKEN_RE = re.compile(r"[a-z0-9]+(?:[-'][a-z0-9]+)*|[^\sa-z0-9]")
# PTB contraction splitting: "don't" -> do + n't, "cat's" -> cat + 's,
# "we'll" -> we + 'll, etc. (Stanford PTBTokenizer behavior).
_CONTR_RE = re.compile(r"^([a-z0-9].*?)(n't|'(?:s|d|m|ll|re|ve))$")


def ptb_tokenize(text: str) -> List[str]:
    """Lowercase word tokenization approximating the Java PTBTokenizer +
    pycocoevalcap's punctuation strip.

    Matches PTB on contractions (split), possessives (split), and
    hyphenated words (kept whole). Known deviations, quantified in
    tests/test_metrics.py::test_ptb_tokenize_fixture: decimal/comma-grouped
    numbers split at the separator ("3.5" -> 3, 5 — PTB keeps them), and
    PTB's special-cased lexicon ("gonna" -> gon + na, "cannot" -> can +
    not) is not applied. Neither form occurs in the caption corpora.
    """
    out: List[str] = []
    for t in _TOKEN_RE.findall(text.lower()):
        m = _CONTR_RE.match(t)
        if m:
            out.extend((m.group(1), m.group(2)))
        else:
            out.append(t)
    return [t for t in out if t not in _PUNCT and not re.fullmatch(r"[^\w]+", t)]


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def bleu(
    refs: Dict[str, List[List[str]]],
    hyps: Dict[str, List[str]],
    max_n: int = 4,
) -> List[float]:
    """Corpus BLEU-1..max_n with closest-ref-length brevity penalty."""
    clipped = [0] * max_n
    totals = [0] * max_n
    hyp_len = 0
    ref_len = 0
    for key, hyp in hyps.items():
        rs = refs[key]
        hyp_len += len(hyp)
        ref_len += min((abs(len(r) - len(hyp)), len(r)) for r in rs)[1]
        for n in range(1, max_n + 1):
            hc = _ngrams(hyp, n)
            maxref: Counter = Counter()
            for r in rs:
                rc = _ngrams(r, n)
                for g, c in rc.items():
                    maxref[g] = max(maxref[g], c)
            totals[n - 1] += max(len(hyp) - n + 1, 0)
            clipped[n - 1] += sum(min(c, maxref.get(g, 0)) for g, c in hc.items())

    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    scores = []
    log_sum = 0.0
    for n in range(max_n):
        p = clipped[n] / totals[n] if totals[n] > 0 else 0.0
        log_sum += math.log(max(p, 1e-12))
        scores.append(bp * math.exp(log_sum / (n + 1)))
    return scores


def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def rouge_l(
    refs: Dict[str, List[List[str]]],
    hyps: Dict[str, List[str]],
    beta: float = 1.2,
) -> float:
    total = 0.0
    for key, hyp in hyps.items():
        # pycocoevalcap's rouge.py takes max precision and max recall over
        # the references SEPARATELY (possibly from different references)
        # and combines those — not the max per-reference F score.
        prec_max = 0.0
        rec_max = 0.0
        for r in refs[key]:
            l = _lcs_len(hyp, r)
            prec_max = max(prec_max, l / len(hyp) if hyp else 0.0)
            rec_max = max(rec_max, l / len(r) if r else 0.0)
        if prec_max and rec_max:
            total += ((1 + beta**2) * prec_max * rec_max) / (
                rec_max + beta**2 * prec_max
            )
    return total / max(len(hyps), 1)


def cider(
    refs: Dict[str, List[List[str]]],
    hyps: Dict[str, List[str]],
    max_n: int = 4,
    sigma: float = 6.0,
) -> float:
    """CIDEr-D as in pycocoevalcap (df over refs, gaussian length penalty)."""
    # document frequency over reference sets
    df: Dict[tuple, float] = defaultdict(float)
    for rs in refs.values():
        seen = set()
        for r in rs:
            for n in range(1, max_n + 1):
                seen |= set(_ngrams(r, n).keys())
        for g in seen:
            df[g] += 1.0
    log_docs = math.log(max(len(refs), 1))

    def tfidf_vec(tokens):
        vecs = []
        norms = []
        for n in range(1, max_n + 1):
            cnt = _ngrams(tokens, n)
            vec = {}
            norm = 0.0
            for g, c in cnt.items():
                idf = log_docs - math.log(max(df.get(g, 0.0), 1.0))
                v = c * idf
                vec[g] = v
                norm += v * v
            vecs.append(vec)
            norms.append(math.sqrt(norm))
        return vecs, norms

    score_total = 0.0
    for key, hyp in hyps.items():
        hv, hn = tfidf_vec(hyp)
        score_n = [0.0] * max_n
        for r in refs[key]:
            rv, rn = tfidf_vec(r)
            delta = len(hyp) - len(r)
            length_pen = math.exp(-(delta**2) / (2 * sigma**2))
            for n in range(max_n):
                # CIDEr-D: clip hyp counts at ref counts
                num = sum(min(v, rv[n].get(g, 0.0)) * rv[n].get(g, 0.0)
                          for g, v in hv[n].items())
                if hn[n] > 0 and rn[n] > 0:
                    score_n[n] += length_pen * num / (hn[n] * rn[n])
        score_total += 10.0 * sum(score_n) / max_n / max(len(refs[key]), 1)
    return score_total / max(len(hyps), 1)


def eval_prediction(
    key2refs: Dict[str, List[str]],
    key2pred: Dict[str, List[str]],
    metrics: Sequence[str] = ("Bleu", "ROUGE_L", "CIDEr", "METEOR", "SPICE"),
    pretokenized: bool = False,
) -> Dict[str, object]:
    """Compute caption metrics; mirrors ``utils.py:96-129``.

    Returns {"Bleu": [b1..b4], "ROUGE_L": f, "CIDEr": f, "METEOR": f|None,
    "SPICE": f|None, "SPIDEr": f, "SPIDEr_approx": bool}.
    """
    if pretokenized:
        refs = {k: [r.split() for r in v] for k, v in key2refs.items()}
        hyps = {k: v[0].split() for k, v in key2pred.items()}
    else:
        refs = {k: [ptb_tokenize(r) for r in v] for k, v in key2refs.items()}
        hyps = {k: ptb_tokenize(v[0]) for k, v in key2pred.items()}

    out: Dict[str, object] = {}
    if "Bleu" in metrics:
        out["Bleu"] = bleu(refs, hyps)
    if "ROUGE_L" in metrics:
        out["ROUGE_L"] = rouge_l(refs, hyps)
    if "CIDEr" in metrics:
        out["CIDEr"] = cider(refs, hyps)

    meteor = spice = None
    try:  # use the Java stack when available (reference behavior)
        from pycocoevalcap.meteor.meteor import Meteor
        from pycocoevalcap.spice.spice import Spice

        r4 = {k: [" ".join(t) for t in v] for k, v in refs.items()}
        h4 = {k: [" ".join(v)] for k, v in hyps.items()}
        if "METEOR" in metrics:
            meteor, _ = Meteor().compute_score(r4, h4)
        if "SPICE" in metrics:
            spice, _ = Spice().compute_score(r4, h4)
    except Exception:
        pass
    if meteor is None and "METEOR" in metrics:
        # pure-Python METEOR (exact+stem alignment, corpus-aggregated
        # sufficient statistics) — see zs_aac_tpu/eval/meteor.py for the
        # documented deviations from the meteor-1.5 jar
        from zs_aac_tpu.eval.meteor import meteor_corpus

        meteor = meteor_corpus(refs, hyps)
    out["METEOR"] = meteor
    spice_approx = False
    if spice is None and "SPICE" in metrics:
        # pure-Python SPICE (rule tagger + chunk scene graph + bipartite
        # tuple F1) — see zs_aac_tpu/eval/spice.py for the documented
        # deviations from the Java CoreNLP stack
        from zs_aac_tpu.eval.spice import spice_corpus

        spice = spice_corpus(refs, hyps)
        spice_approx = True
    out["SPICE"] = spice
    out["SPICE_approx"] = spice_approx

    if "CIDEr" in out:
        if spice is not None:
            out["SPIDEr"] = (out["CIDEr"] + spice) / 2
            out["SPIDEr_approx"] = spice_approx
        else:
            out["SPIDEr"] = out["CIDEr"] / 2
            out["SPIDEr_approx"] = True
    return out
