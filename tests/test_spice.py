"""Tests for the pure-Python SPICE scorer (zs_aac_tpu/eval/spice.py).

Covers: POS tagging + lemmatization fixtures, scene-graph extraction on
caption-domain sentences (exact tuple sets), clause-boundary handling (the
cases a naive chunk linker gets wrong), synonym-class matching, the
bipartite-matcher == canonical-multiset-intersection property, score-order
sanity (better captions score higher), and the eval_prediction integration
(SPICE_approx / SPIDEr flags). Deviation from the Java stack is quantified
in test_deviation_passive_degrades_to_recall_loss: passives and long-range
attachments lose relations but never fabricate wrong ones.
"""

import random

from zs_aac_tpu.eval.captioning import eval_prediction
from zs_aac_tpu.eval.spice import (
    DEFAULT_SYNONYMS,
    _class_map,
    _max_bipartite,
    lemma,
    pos_tag,
    scene_graph_tuples,
    spice_corpus,
    spice_segment,
)


# ---------------------------------------------------------------------------
# POS tagging + lemmas
# ---------------------------------------------------------------------------


def test_pos_tag_fixtures():
    cases = {
        "a dog barks in the distance": list("DNVPDN"),
        "the loud music is playing": list("DJNBV"),
        "rain falls on a tin roof": list("NVPDNN"),
        "people are talking and a door slams": list("NBVCDNV"),
        "a barking dog": list("DJN"),
    }
    for sent, want in cases.items():
        assert pos_tag(sent.split()) == want, sent


def test_lemma():
    assert lemma("barks", "V") == "bark"
    assert lemma("running", "V") == "run"
    assert lemma("making", "V") == "make"
    assert lemma("spoken", "V") == "speak"
    assert lemma("crashes", "V") == "crash"
    assert lemma("dogs", "N") == "dog"
    assert lemma("benches", "N") == "bench"
    assert lemma("puppies", "N") == "puppy"
    assert lemma("people", "N") == "person"
    assert lemma("glass", "N") == "glass"  # -ss is not a plural


# ---------------------------------------------------------------------------
# Scene-graph extraction
# ---------------------------------------------------------------------------


def test_scene_graph_basic():
    got = scene_graph_tuples("a dog barks in the distance".split())
    assert got == {
        ("dog",), ("distance",),
        ("dog", "bark"),
        ("dog", "bark_in", "distance"),
        ("dog", "in", "distance"),
    }


def test_scene_graph_attributes_and_copula():
    got = scene_graph_tuples("the loud music is playing".split())
    assert got == {("music",), ("music", "loud"), ("music", "play")}
    got = scene_graph_tuples("rain falls on a tin roof".split())
    assert ("rain", "fall") in got
    assert ("roof", "tin") in got  # compound-noun modifier -> attribute
    assert ("rain", "fall_on", "roof") in got


def test_scene_graph_clause_boundary():
    # conjunction = clause boundary: no relation across "and"
    got = scene_graph_tuples("people are talking and a door slams".split())
    assert got == {
        ("person",), ("door",),
        ("person", "talk"), ("door", "slam"),
    }
    # "while" behaves the same
    got = scene_graph_tuples(
        "a man is speaking while birds chirp in the background".split())
    assert ("man", "speak") in got
    assert ("bird", "chirp") in got
    assert not any(t[0] == "man" and len(t) == 3 and t[2] == "bird"
                   for t in got)


def test_scene_graph_coordinated_verbs_share_subject():
    got = scene_graph_tuples("a dog barks and chases a cat".split())
    assert ("dog", "bark") in got
    assert ("dog", "chase", "cat") in got
    assert ("cat",) in got


def test_deviation_passive_degrades_to_recall_loss():
    """Documented deviation: without a dependency parse, passives lose the
    agent relation but never invert it — objects survive, and no tuple
    claims the wrong direction."""
    got = scene_graph_tuples("a song is played by a man".split())
    assert ("song",) in got and ("man",) in got
    # must NOT fabricate (man, play, song) reversed as (song, play, man)
    # with 'play' as the relation verb naming man as the object patient:
    assert ("man", "play", "song") not in got


# ---------------------------------------------------------------------------
# Matching + scores
# ---------------------------------------------------------------------------


def test_spice_self_match_is_one():
    for sent in [
        "a dog barks in the distance",
        "rain falls on a tin roof",
        "a young woman speaks followed by laughter",
    ]:
        toks = sent.split()
        assert spice_segment([toks], toks) == 1.0


def test_spice_disjoint_is_zero():
    assert spice_segment([["a", "dog", "barks"]], ["rain", "falls"]) == 0.0


def test_spice_synonym_match():
    # 'big' and 'large' share a DEFAULT_SYNONYMS class
    assert spice_segment([["a", "large", "truck"]],
                         ["a", "big", "truck"]) == 1.0
    # without synonyms the attribute tuple misses
    s = spice_segment([["a", "large", "truck"]], ["a", "big", "truck"],
                      synonyms=None)
    assert 0.0 < s < 1.0


def test_bipartite_equals_canonical_intersection():
    """With disjoint synonym classes the max matching equals the
    canonical-form multiset intersection (union-of-bicliques property)."""
    from collections import Counter

    cmap = _class_map(DEFAULT_SYNONYMS)
    vocab = ["dog", "canine", "cat", "loud", "noisy", "big", "large",
             "car", "vehicle", "bark", "run"]
    rng = random.Random(0)

    def canon(t):
        return tuple(("c%d" % cmap[w]) if w in cmap else w for w in t)

    for _ in range(50):
        def rand_tuples():
            out = set()
            for _ in range(rng.randint(1, 8)):
                k = rng.choice([1, 2, 3])
                out.add(tuple(rng.choice(vocab) for _ in range(k)))
            return sorted(out)

        cand, ref = rand_tuples(), rand_tuples()
        want = sum((Counter(map(canon, cand)) &
                    Counter(map(canon, ref))).values())
        assert _max_bipartite(cand, ref, cmap) == want


def test_spice_score_ordering():
    refs = {
        "a": [["a", "dog", "barks", "in", "the", "distance"],
              ["a", "dog", "is", "barking", "far", "away"]],
        "b": [["rain", "falls", "on", "a", "tin", "roof"]],
    }
    perfect = {"a": refs["a"][0], "b": refs["b"][0]}
    partial = {"a": ["a", "dog", "barks"], "b": ["rain", "falls"]}
    wrong = {"a": ["a", "car", "honks"], "b": ["music", "plays"]}
    sp = spice_corpus(refs, perfect)
    sl = spice_corpus(refs, partial)
    sw = spice_corpus(refs, wrong)
    # sp < 1: reference tuples are the UNION over refs (jar semantics), so
    # matching ref[0] exactly still leaves ref[1]-only tuples unrecalled.
    assert 0.8 < sp < 1.0
    assert sp > sl > sw
    assert sw == 0.0


def test_eval_prediction_spice_integration():
    key2refs = {
        "clip1": ["A dog barks in the park.", "a dog is barking outside."],
        "clip2": ["Rain falls on a tin roof."],
    }
    key2pred = {
        "clip1": ["a dog barks in the park."],
        "clip2": ["rain falls on a roof."],
    }
    out = eval_prediction(key2refs, key2pred)
    assert out["SPICE_approx"] is True  # no Java stack in this env
    assert 0.0 < out["SPICE"] <= 1.0
    assert out["SPIDEr"] == (out["CIDEr"] + out["SPICE"]) / 2
    assert out["SPIDEr_approx"] is True
