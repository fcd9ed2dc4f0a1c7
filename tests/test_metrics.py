"""Metric tests: retrieval recalls vs loop-based reference semantics,
captioning scorers on hand-checkable fixtures."""

import numpy as np

from zs_aac_tpu.eval.captioning import bleu, cider, eval_prediction, ptb_tokenize, rouge_l
from zs_aac_tpu.eval.retrieval import a2t, t2a


def _loop_a2t(audio_embs, cap_embs):
    """Direct transcription of the reference's per-item loop semantics."""
    def cos(a, b):
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        return a @ b.T

    num = audio_embs.shape[0] // 5
    ranks = np.zeros(num)
    ap10 = np.zeros(num)
    for index in range(num):
        d = cos(audio_embs[5 * index : 5 * index + 1], cap_embs)[0]
        inds = np.argsort(d)[::-1]
        rank = 1e20
        hits = []
        for i in range(5 * index, 5 * index + 5):
            tmp = np.where(inds == i)[0][0]
            rank = min(rank, tmp)
            if tmp < 10:
                hits.append(tmp + 1)
        hits = np.sort(np.array(hits))
        ap10[index] = np.sum(np.arange(1, len(hits) + 1) / hits) / 5 if len(hits) else 0
        ranks[index] = rank
    out = {
        "r1": 100 * np.mean(ranks < 1),
        "r5": 100 * np.mean(ranks < 5),
        "r10": 100 * np.mean(ranks < 10),
        "r50": 100 * np.mean(ranks < 50),
        "medr": np.floor(np.median(ranks)) + 1,
        "meanr": ranks.mean() + 1,
        "mAP10": 100 * ap10.mean(),
    }
    return out


def test_a2t_matches_loop_reference():
    rng = np.random.default_rng(0)
    A = 12
    audio = np.repeat(rng.standard_normal((A, 16)), 5, axis=0).astype(np.float32)
    caps = rng.standard_normal((5 * A, 16)).astype(np.float32)
    # make some captions correlated with their audio
    caps[::5] += 2.0 * audio[::5]
    got = a2t(audio, caps)
    want = _loop_a2t(audio, caps)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, err_msg=k)


def test_t2a_perfect_retrieval():
    rng = np.random.default_rng(1)
    A = 8
    base = rng.standard_normal((A, 16)).astype(np.float32)
    audio = np.repeat(base, 5, axis=0)
    caps = np.repeat(base, 5, axis=0) + 0.01 * rng.standard_normal((5 * A, 16)).astype(np.float32)
    m = t2a(audio, caps)
    assert m["r1"] == 100.0
    assert m["medr"] == 1.0


def test_ptb_tokenize():
    assert ptb_tokenize("A dog barks, loudly!") == ["a", "dog", "barks", "loudly"]
    assert ptb_tokenize("it's raining.") == ["it's", "raining"]


def test_bleu_perfect_and_partial():
    refs = {"a": [["the", "cat", "sat", "on", "the", "mat"]]}
    hyps = {"a": ["the", "cat", "sat", "on", "the", "mat"]}
    s = bleu(refs, hyps)
    np.testing.assert_allclose(s, [1.0] * 4, atol=1e-9)

    hyps2 = {"a": ["the", "cat", "sat"]}
    s2 = bleu(refs, hyps2)
    # unigram precision 1.0, brevity penalty exp(1 - 6/3)
    np.testing.assert_allclose(s2[0], np.exp(1 - 2.0), rtol=1e-6)


def test_rouge_and_cider_sanity():
    refs = {
        "a": [["a", "dog", "barks", "in", "the", "park"]],
        "b": [["rain", "falls", "on", "the", "roof"]],
    }
    perfect = {k: v[0] for k, v in refs.items()}
    assert rouge_l(refs, perfect) == 1.0
    assert abs(cider(refs, perfect) - 10.0) < 1e-6

    disjoint = {"a": ["x", "y"], "b": ["z", "w"]}
    assert rouge_l(refs, disjoint) == 0.0
    assert cider(refs, disjoint) == 0.0


def test_eval_prediction_end_to_end():
    key2refs = {
        "clip1": ["A dog barks in the park.", "a dog is barking outside."],
        "clip2": ["Rain falls on a tin roof."],
    }
    key2pred = {
        "clip1": ["a dog barks in the park."],
        "clip2": ["rain falls on a roof."],
    }
    out = eval_prediction(key2refs, key2pred)
    assert out["Bleu"][0] > 0.8
    assert out["CIDEr"] > 0
    assert out["SPIDEr_approx"] is True  # no Java stack in this env
    assert out["SPIDEr"] == out["CIDEr"] / 2
