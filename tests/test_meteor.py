"""Golden tests for the pure-Python METEOR (zs_aac_tpu/eval/meteor.py).

The Porter stemmer is checked word-for-word against NLTK's
ORIGINAL_ALGORITHM mode, and full segment scores against
``nltk.translate.meteor_score`` (synonym stage stubbed off — WordNet data
is unavailable offline, which is also this module's documented default).
"""

import math

import pytest

from zs_aac_tpu.eval.meteor import PorterStemmer, meteor_corpus, meteor_segment

WORDS = """caresses flies dies mules denied died agreed owned humbled sized
meeting stating siezing itemization sensational traditional reference
colonizer plotted running runner ran rain falls roof car horn blares loudly
birds sing trees relational conditional rational valenci hesitanci digitizer
operator feudalism decisiveness hopefulness callousness formaliti sensitiviti
sensibiliti triplicate formative formalize electriciti electrical hopeful
goodness revival allowance inference airliner gyroscopic adjustable
defensible irritant replacement adjustment dependent adoption homologou
communism activate angulariti homologous effective bowdlerize probate rate
cease controll roll sky y a generalization oscillators""".split()


def test_porter_stemmer_matches_nltk_original():
    from nltk.stem.porter import PorterStemmer as NltkPorter

    ref = NltkPorter(mode=NltkPorter.ORIGINAL_ALGORITHM)
    mine = PorterStemmer()
    for w in WORDS:
        assert mine.stem(w) == ref.stem(w), w


def _nltk_meteor(refs, hyp):
    from nltk.translate.meteor_score import meteor_score

    class _NoWordnet:  # offline: no synonym data, same as our default
        def synsets(self, word):
            return []

    return meteor_score(refs, hyp, wordnet=_NoWordnet())


SEGMENTS = [
    (["a dog barks in the yard".split()], "a dog barks in the yard".split()),
    (["a dog barks in the yard".split()], "the dog barked in a yard".split()),
    (["rain falls on the roof".split(),
      "heavy rain hits a tin roof".split()], "rain is falling on the roof".split()),
    (["a car horn blares loudly".split()], "birds sing in the trees".split()),
    (["it is a guide to action which ensures that the military always obeys the commands of the party".split()],
     "it is a guide to action that ensures that the military will forever heed party commands".split()),
    (["water runs running ran".split()], "running water ran runs".split()),
]


@pytest.mark.parametrize("refs,hyp", SEGMENTS)
def test_segment_score_matches_nltk(refs, hyp):
    got = meteor_segment(refs, hyp)
    want = _nltk_meteor(refs, hyp)
    assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-12), (got, want)


def test_identical_sentence_score_hand_computed():
    # P=R=1 -> Fmean=1; one chunk of m=6 -> penalty = 0.5*(1/6)^3
    hyp = "a dog barks in the yard".split()
    want = 1.0 - 0.5 * (1 / 6) ** 3
    assert math.isclose(meteor_segment([hyp], hyp), want, rel_tol=1e-12)


def test_synonym_stage_with_injected_table():
    refs = [["a", "hound", "barks"]]
    hyp = ["a", "dog", "barks"]
    base = meteor_segment(refs, hyp)
    with_syn = meteor_segment(refs, hyp, synonyms={"dog": {"hound"}})
    assert with_syn > base
    # all three words now match in one chunk: score = 1 - 0.5*(1/3)^3
    assert math.isclose(with_syn, 1.0 - 0.5 * (1 / 3) ** 3, rel_tol=1e-12)


def test_corpus_aggregation_is_not_mean_of_segments():
    refs = {"a": [["a", "dog", "barks"]], "b": [["rain", "falls", "today"]]}
    hyps = {"a": ["a", "dog", "barks"], "b": ["rain", "shines", "bright"]}
    c = meteor_corpus(refs, hyps)
    s1 = meteor_segment(refs["a"], hyps["a"])
    s2 = meteor_segment(refs["b"], hyps["b"])
    # aggregate: m=4, th=6, tr=6, ch=2 -> P=R=2/3, Fmean=2/3,
    # penalty=0.5*(2/4)^3
    want = (1 - 0.5 * (2 / 4) ** 3) * (2 / 3)
    assert math.isclose(c, want, rel_tol=1e-12)
    assert not math.isclose(c, (s1 + s2) / 2, rel_tol=1e-6)


def test_eval_prediction_returns_real_meteor():
    from zs_aac_tpu.eval.captioning import eval_prediction

    key2refs = {"k1": ["a dog barks in the yard."],
                "k2": ["rain falls on the roof."]}
    key2pred = {"k1": ["a dog barks in the yard."],
                "k2": ["rain falls on the roof."]}
    out = eval_prediction(key2refs, key2pred)
    assert out["METEOR"] is not None and out["METEOR"] > 0.9
