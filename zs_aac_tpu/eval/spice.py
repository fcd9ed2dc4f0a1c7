"""SPICE — Semantic Propositional Image Caption Evaluation, natively in Python.

Capability parity with the reference's SPICE usage
(``/root/reference/predict_prompt.py:150-173``): the reference shells out to
pycocoevalcap's Java jar (Stanford CoreNLP dependency parse -> scene-graph
rules -> WordNet-matched tuple F1, Anderson et al. 2016). This environment has
no JVM, no CoreNLP models, and no WordNet corpus, so the whole chain is
reimplemented from the published algorithm on a caption-domain footing:

1. **POS tagging** — a self-contained rule tagger: closed-class lexicons
   (determiners/prepositions/copulas/pronouns/conjunctions), a caption-domain
   open-class lexicon (frequent Clotho/AudioCaps/COCO nouns, verbs and
   adjectives), morphological suffix rules, and two context repairs
   (noun-after-determiner, verb-after-copula/noun-phrase).
2. **Scene-graph extraction** — chunk rules over the tag sequence instead of a
   full dependency parse: NP chunks yield *objects* (head noun lemma) and
   *attributes* (adjectives/participles/numbers/compound-noun modifiers in the
   chunk, plus copula-predicated adjectives); verbs between NPs yield
   *relations* ``(subj, verb[_prep], obj)``; bare prepositions between NPs
   yield ``(subj, prep, obj)``; verbs with no object yield the 2-tuple
   ``(subj, verb)`` (the paper folds intransitives into attribute position).
3. **Tuple matching** — candidate tuples match reference tuples slot-wise on
   lemmas, with an *injectable* synonym table standing in for WordNet synsets
   (same pattern as ``eval/meteor.py``; a small built-in caption-domain
   default ships in ``DEFAULT_SYNONYMS``). Matching is a true maximum
   bipartite matching (augmenting paths), so it stays exact even under
   non-transitive synonym semantics.
4. **Score** — per caption: P = |M|/|T(cand)|, R = |M|/|T(refs)| (reference
   tuples are the union over all references, deduplicated), F1 = 2PR/(P+R);
   corpus SPICE is the mean F1 (the jar's default aggregation).

Documented deviations from the Java stack (quantified in
``tests/test_spice.py``): the chunk grammar is shallower than a CoreNLP
dependency parse (long-range attachments, passives and relative clauses
degrade to objects-without-relations rather than wrong relations), and the
synonym table is a short curated list instead of WordNet. Both deviations are
*recall-side* on the graph, applied identically to candidate and references,
so scores remain comparable within a corpus. The Java jar is still preferred
when importable (``eval/captioning.py``); this module is the fallback tier,
exactly as ``meteor.py`` is for METEOR.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Mapping, Optional, Sequence, Set, Tuple

__all__ = [
    "pos_tag",
    "lemma",
    "scene_graph_tuples",
    "spice_segment",
    "spice_corpus",
    "DEFAULT_SYNONYMS",
]

# ---------------------------------------------------------------------------
# Lexicons (closed classes + frequent caption-domain open-class words)
# ---------------------------------------------------------------------------

_DETERMINERS = {
    "a", "an", "the", "this", "that", "these", "those", "some", "any", "no",
    "each", "every", "all", "both", "another", "other", "several", "many",
    "few", "much", "more", "most", "its", "his", "her", "their", "my", "your",
}
_PREPOSITIONS = {
    "in", "on", "at", "by", "with", "of", "from", "into", "onto", "over",
    "under", "above", "below", "near", "beside", "behind", "through",
    "across", "around", "against", "between", "along", "upon", "within",
    "amid", "amidst", "toward", "towards", "past", "inside", "outside",
    "next", "during", "after", "before", "off", "down", "up", "out", "to",
}
_COPULAS = {"is", "are", "was", "were", "be", "been", "being", "am"}
_AUXILIARIES = {"has", "have", "had", "does", "do", "did", "can", "could",
                "will", "would", "may", "might", "shall", "should", "must"}
_PRONOUNS = {"it", "he", "she", "they", "someone", "something", "there",
             "who", "which", "what", "itself", "them", "him"}
_CONJUNCTIONS = {"and", "or", "but", "while", "as", "when", "then", "also"}
_NEGATIONS = {"not", "n't"}

# Frequent caption verbs (base forms). Inflections are resolved by lemma().
_VERB_LEXICON = {
    "play", "sing", "speak", "talk", "bark", "blow", "ring", "run", "walk",
    "fly", "drive", "ride", "hit", "bang", "knock", "tap", "click", "hum",
    "buzz", "chirp", "tweet", "squeak", "squeal", "whistle", "howl", "roar",
    "rumble", "splash", "drip", "pour", "rain", "thunder", "echo", "fade",
    "start", "stop", "begin", "end", "continue", "repeat", "follow", "make",
    "produce", "emit", "create", "sound", "hear", "listen", "move", "pass",
    "approach", "leave", "open", "close", "slam", "crash", "break", "crack",
    "pop", "snap", "rattle", "shake", "vibrate", "spin", "turn", "rev",
    "accelerate", "honk", "beep", "siren", "cry", "laugh", "shout", "yell",
    "whisper", "cough", "sneeze", "breathe", "snore", "chew", "eat", "drink",
    "cut", "saw", "drill", "hammer", "grind", "scrape", "scratch", "rub",
    "sweep", "brush", "wash", "flush", "boil", "fry", "sizzle", "crackle",
    "flow", "gurgle", "trickle", "wave", "crow", "quack", "meow", "moo",
    "neigh", "oink", "bleat", "hiss", "croak", "gobble", "flap", "peck",
    "stand", "sit", "lie", "hold", "carry", "throw", "catch", "pull", "push",
    "look", "watch", "wear", "jump", "swim", "climb", "fall", "land", "go",
    "come", "get", "put", "use", "work", "type", "write", "read", "strum",
    "idle", "applaud", "cheer", "clap", "whir", "screech", "slide", "roll",
    "tick", "chime", "strike", "wail", "mutter", "murmur", "rustle", "clank",
    "clang", "thud", "thump", "whoosh", "chug", "sputter", "spray", "drum",
    "chase", "clatter", "jingle", "swish", "chatter", "giggle", "groan",
    "grunt", "moan", "pant", "scream", "sob", "wheeze", "yelp", "growl",
}
# -ing forms that are (almost always) nouns in caption text.
_ING_NOUNS = {
    "building", "ceiling", "morning", "evening", "painting", "lightning",
    "recording", "ring", "king", "spring", "string", "wing", "thing",
    "something", "nothing", "anything", "everything", "clothing", "during",
    "sing",  # guarded: bare "sing" handled by verb lexicon first
}
# Frequent caption adjectives that no suffix rule catches.
_ADJ_LEXICON = {
    "loud", "quiet", "soft", "large", "small", "big", "little", "fast",
    "slow", "high", "low", "heavy", "light", "deep", "sharp", "dull",
    "distant", "close", "near", "constant", "steady", "intermittent",
    "repetitive", "rhythmic", "metallic", "muffled", "faint", "clear",
    "young", "old", "long", "short", "wet", "dry", "hot", "cold", "warm",
    "busy", "empty", "full", "open", "dark", "bright", "white", "black",
    "red", "green", "blue", "yellow", "brown", "gray", "grey", "orange",
    "wooden", "plastic", "electric", "electronic", "mechanical", "human",
    "male", "female", "multiple", "single", "various", "strong", "gentle",
    "harsh", "crisp", "hollow", "shrill", "monotonous",
}
# Suffixes that reliably mark adjectives in caption text. Deliberately does
# NOT include "ic"/"ant"/"ent"/"ary": those catch common caption NOUNS
# (music, traffic, elephant, instrument, moment). Mis-tagging an adjective
# as a noun is benign here (compound-noun modifiers become attributes too);
# mis-tagging a noun as an adjective loses the chunk head — so bias toward N
# and carry the common -ic adjectives in _ADJ_LEXICON instead.
_ADJ_SUFFIXES = ("ous", "ful", "ive", "able", "ible", "ish", "less")

_IRREGULAR_PLURALS = {
    "men": "man", "women": "woman", "children": "child", "people": "person",
    "geese": "goose", "feet": "foot", "mice": "mouse", "teeth": "tooth",
    "leaves": "leaf", "knives": "knife", "wolves": "wolf", "lives": "life",
    "shelves": "shelf",
}
_IRREGULAR_VERBS = {
    "is": "be", "are": "be", "was": "be", "were": "be", "been": "be",
    "being": "be", "am": "be", "has": "have", "had": "have", "goes": "go",
    "went": "go", "gone": "go", "does": "do", "did": "do", "done": "do",
    "spoke": "speak", "spoken": "speak", "sang": "sing", "sung": "sing",
    "ran": "run", "flew": "fly", "flown": "fly", "drove": "drive",
    "driven": "drive", "rode": "ride", "ridden": "ride", "blew": "blow",
    "blown": "blow", "rang": "ring", "rung": "ring", "broke": "break",
    "broken": "break", "fell": "fall", "fallen": "fall", "held": "hold",
    "threw": "throw", "thrown": "throw", "caught": "catch", "wore": "wear",
    "worn": "wear", "sat": "sit", "stood": "stand", "lay": "lie", "ate": "eat",
    "drank": "drink", "drunk": "drink", "made": "make", "heard": "hear",
    "came": "come", "got": "get", "put": "put", "cried": "cry", "crew": "crow",
    "swam": "swim", "wrote": "write", "written": "write", "read": "read",
    "cutting": "cut", "hitting": "hit", "sitting": "sit", "running": "run",
    "stopping": "stop", "tapping": "tap", "popping": "pop",
    "dripping": "drip", "revving": "rev", "humming": "hum",
    "chirping": "chirp", "flapping": "flap", "strumming": "strum",
}

# Small curated stand-in for WordNet synsets; injectable/extensible exactly
# like meteor.py's synonym table. Each set is one equivalence class.
DEFAULT_SYNONYMS: Tuple[FrozenSet[str], ...] = tuple(
    frozenset(group) for group in [
        {"bike", "bicycle"}, {"car", "automobile", "vehicle"},
        {"kid", "child"}, {"photo", "picture", "image"},
        {"talk", "speak"}, {"big", "large"}, {"small", "little"},
        {"sofa", "couch"}, {"tv", "television"}, {"begin", "start"},
        {"stone", "rock"}, {"street", "road"}, {"loud", "noisy"},
        {"quiet", "silent"}, {"quick", "fast", "rapid"},
        {"person", "individual"}, {"motorbike", "motorcycle"},
        {"plane", "airplane", "aircraft"}, {"boat", "ship"},
        {"dog", "canine"}, {"cat", "feline"}, {"bird", "fowl"},
        {"rain", "rainfall"}, {"engine", "motor"},
    ]
)


# ---------------------------------------------------------------------------
# Lemmatizer
# ---------------------------------------------------------------------------

def lemma(word: str, tag: str) -> str:
    """Lemmatize ``word`` given its coarse tag (N/V/J/other).

    Irregular tables first, then suffix stripping with consonant-doubling
    and silent-e restoration (the standard CoreNLP/morpha rules that matter
    in caption text).
    """
    w = word.lower()
    if tag == "V":
        if w in _IRREGULAR_VERBS:
            return _IRREGULAR_VERBS[w]
        for suf in ("ing", "ed", "es", "s"):
            if w.endswith(suf) and len(w) > len(suf) + 2:
                stem = w[: -len(suf)]
                if suf in ("ing", "ed"):
                    if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in "aeiouls":
                        return stem[:-1]          # running -> run
                    if (stem + "e") in _VERB_LEXICON:
                        return stem + "e"          # making -> make
                    if stem in _VERB_LEXICON:
                        return stem
                    return stem
                if suf == "es" and stem.endswith(("sh", "ch", "ss", "x", "z")):
                    return stem                    # crashes -> crash
                if suf == "s" and not w.endswith("ss"):
                    return stem                    # barks -> bark
        return w
    if tag == "N":
        if w in _IRREGULAR_PLURALS:
            return _IRREGULAR_PLURALS[w]
        if w.endswith("ies") and len(w) > 4:
            return w[:-3] + "y"                    # puppies -> puppy
        if w.endswith("es") and w[:-2].endswith(("sh", "ch", "ss", "x", "z")):
            return w[:-2]                          # benches -> bench
        if w.endswith("s") and not w.endswith(("ss", "us", "is")) and len(w) > 3:
            return w[:-1]
        return w
    return w


# ---------------------------------------------------------------------------
# POS tagger
# ---------------------------------------------------------------------------

def _lexical_tag(w: str) -> str:
    """Context-free tag guess: D/P/C/B(copula)/X(aux)/R(pron)/G(neg)/V/J/N/#."""
    if w in _DETERMINERS:
        return "D"
    if w in _COPULAS:
        return "B"
    if w in _AUXILIARIES:
        return "X"
    if w in _PREPOSITIONS:
        return "P"
    if w in _CONJUNCTIONS:
        return "C"
    if w in _PRONOUNS:
        return "R"
    if w in _NEGATIONS:
        return "G"
    if w.isdigit() or w in {"one", "two", "three", "four", "five", "six",
                            "seven", "eight", "nine", "ten"}:
        return "#"
    if w in _ADJ_LEXICON:
        return "J"
    if w.endswith("ing") and w not in _ING_NOUNS:
        base = lemma(w, "V")
        if base in _VERB_LEXICON or base + "e" in _VERB_LEXICON:
            return "V"
        return "J"          # unknown -ing: attributive participle
    if w in _VERB_LEXICON or w in _IRREGULAR_VERBS:
        return "V"
    if lemma(w, "V") in _VERB_LEXICON and w.endswith(("s", "ed")):
        return "V"
    if w.endswith("ly") and len(w) > 4:
        return "A"          # adverb — dropped from the graph
    if w.endswith(_ADJ_SUFFIXES) and len(w) > 4:
        return "J"
    if w.endswith("ed") and len(w) > 4:
        return "J"          # unknown -ed: attributive participle
    return "N"


def pos_tag(tokens: Sequence[str]) -> List[str]:
    """Tag a tokenized caption. Tags: N noun, V verb, J adjective, D det,
    P preposition, B copula, C conjunction, R pronoun, # number, A adverb,
    X auxiliary, G negation."""
    tags = [_lexical_tag(t.lower()) for t in tokens]
    # Context repair 1: a V/J directly after a determiner heading a chunk is
    # (almost always) the chunk's noun if nothing nominal follows it
    # ("a ring", "the recording ends").
    for i, t in enumerate(tags):
        # Context repair 0: a verb-lexicon word opening a clause with a verb
        # right after it is the clause's subject noun ("rain falls",
        # "thunder rumbles and ...").
        if t == "V" and i + 1 < len(tags) and tags[i + 1] == "V" \
                and (i == 0 or tags[i - 1] == "C"):
            tags[i] = "N"
            continue
        if t == "V" and i > 0 and tags[i - 1] in ("D", "#", "J"):
            nxt = tags[i + 1] if i + 1 < len(tags) else None
            if nxt not in ("N", "J", "#"):  # "a barking dog" keeps V->J below
                tags[i] = "N"
        # Context repair 2: V between a determiner and a noun is attributive
        # ("a barking dog").
        if t == "V" and i > 0 and tags[i - 1] in ("D", "J", "#") \
                and i + 1 < len(tags) and tags[i + 1] in ("N", "J"):
            tags[i] = "J"
        # Context repair 3: plain N after copula/aux followed by nothing
        # nominal is usually a verb misread ("the dog is barking" handled by
        # -ing; "a man speaks" by lexicon) — leave as N otherwise: safer.
    return tags


# ---------------------------------------------------------------------------
# Scene-graph extraction
# ---------------------------------------------------------------------------

def scene_graph_tuples(tokens: Sequence[str]) -> Set[Tuple[str, ...]]:
    """Extract SPICE tuples from a tokenized caption.

    Returns a set of 1-tuples (objects), 2-tuples (object, attribute) — which
    also covers intransitive verbs — and 3-tuples (subject, relation, object).
    """
    tags = pos_tag(tokens)
    words = [t.lower() for t in tokens]
    n = len(words)

    # --- chunk NPs: maximal runs of D/J/#/N ending in N -------------------
    # each chunk -> (heads, attrs, start, end)
    chunks: List[Tuple[List[str], List[str], int, int]] = []
    i = 0
    while i < n:
        if tags[i] in ("D", "J", "#", "N"):
            j = i
            while j < n and tags[j] in ("D", "J", "#", "N", "C"):
                # allow "and" INSIDE a chunk only between nominals; a J
                # before the C is predicative ("is loud and a man") and
                # must not be absorbed into the next NP
                if tags[j] == "C" and not (
                    j + 1 < n and tags[j + 1] in ("D", "J", "#", "N")
                    and j > i and tags[j - 1] in ("N", "#")
                ):
                    break
                j += 1
            seg = list(range(i, j))
            noun_idx = [k for k in seg if tags[k] == "N"]
            if noun_idx:
                # coordinate heads: nouns separated by C are all heads;
                # otherwise the last noun heads and earlier nouns are
                # compound modifiers (documented approximation).
                has_conj = any(tags[k] == "C" for k in seg)
                if has_conj:
                    heads = [lemma(words[k], "N") for k in noun_idx]
                    attr_idx = [k for k in seg if tags[k] in ("J", "#")]
                else:
                    heads = [lemma(words[noun_idx[-1]], "N")]
                    attr_idx = [k for k in seg
                                if tags[k] in ("J", "#") or
                                (tags[k] == "N" and k != noun_idx[-1])]
                attrs = [lemma(words[k], "N") if tags[k] == "N"
                         else lemma(words[k], "J") for k in attr_idx]
                chunks.append((heads, attrs, i, j))
                i = j
                continue
        i += 1

    tuples: Set[Tuple[str, ...]] = set()
    for heads, attrs, _, _ in chunks:
        for h in heads:
            tuples.add((h,))
            for a in attrs:
                tuples.add((h, a))

    # --- link chunks through the material between them ---------------------
    for ci in range(len(chunks)):
        heads_l, _, _, end_l = chunks[ci]
        nxt_start = chunks[ci + 1][2] if ci + 1 < len(chunks) else n
        gap = list(range(end_l, nxt_start))
        gap_tags = [tags[k] for k in gap]

        all_verbs = [k for k in gap if tags[k] == "V"]
        copula = any(tags[k] == "B" for k in gap)

        # copula + adjective: "the music is loud" -> (music, loud)
        if copula:
            for k in gap:
                if tags[k] == "J":
                    for h in heads_l:
                        tuples.add((h, lemma(words[k], "J")))

        # A conjunction in the gap is a clause boundary: verbs before the
        # last C are intransitive on the left head ("people are talking and
        # a door slams" must NOT yield (person, talk, door)); only material
        # AFTER the last C can link to the right chunk ("a dog barks and
        # chases a cat" -> (dog, bark) + (dog, chase, cat): coordinated VPs
        # share the subject).
        last_c = max((k for k in gap if tags[k] == "C"), default=-1)
        for k in all_verbs:
            if k < last_c:
                for hl in heads_l:
                    tuples.add((hl, lemma(words[k], "V")))
        verbs = [k for k in all_verbs if k > last_c]
        preps = [k for k in gap if tags[k] == "P" and k > last_c]

        if ci + 1 < len(chunks):
            heads_r = chunks[ci + 1][0]
            if verbs:
                v = lemma(words[verbs[-1]], "V")
                rel = v + ("_" + words[preps[-1]]
                           if preps and preps[-1] > verbs[-1] else "")
                for hl in heads_l:
                    for hr in heads_r:
                        tuples.add((hl, rel, hr))
                # earlier coordinated verbs in the same clause are
                # intransitive: "speaks followed by laughter" keeps (_, speak)
                for k in verbs[:-1]:
                    for hl in heads_l:
                        tuples.add((hl, lemma(words[k], "V")))
            elif preps:
                for hl in heads_l:
                    for hr in heads_r:
                        tuples.add((hl, words[preps[-1]], hr))
        else:
            # trailing verb with no object: intransitive -> 2-tuple
            for k in verbs:
                for hl in heads_l:
                    tuples.add((hl, lemma(words[k], "V")))
        # leading intransitive before a preposition:
        # "a dog barks in the distance" -> (dog, bark) + (dog, in, distance)
        if ci + 1 < len(chunks) and verbs and preps and preps[-1] > verbs[-1]:
            v = lemma(words[verbs[-1]], "V")
            for hl in heads_l:
                tuples.add((hl, v))
            heads_r = chunks[ci + 1][0]
            for hl in heads_l:
                for hr in heads_r:
                    tuples.add((hl, words[preps[-1]], hr))

    return tuples


# ---------------------------------------------------------------------------
# Tuple matching + score
# ---------------------------------------------------------------------------

def _class_map(synonyms: Optional[Sequence[FrozenSet[str]]]) -> Dict[str, int]:
    cmap: Dict[str, int] = {}
    if synonyms:
        for idx, group in enumerate(synonyms):
            for w in group:
                cmap[w] = idx
    return cmap


def _slots_match(a: str, b: str, cmap: Mapping[str, int]) -> bool:
    if a == b:
        return True
    ia = cmap.get(a)
    return ia is not None and ia == cmap.get(b)


def _tuples_match(ta: Tuple[str, ...], tb: Tuple[str, ...],
                  cmap: Mapping[str, int]) -> bool:
    return len(ta) == len(tb) and all(
        _slots_match(x, y, cmap) for x, y in zip(ta, tb))


def _max_bipartite(cand: List[Tuple[str, ...]], ref: List[Tuple[str, ...]],
                   cmap: Mapping[str, int]) -> int:
    """Maximum bipartite matching size via augmenting paths.

    With disjoint synonym classes the match graph is a union of bicliques
    (tuples grouped by canonical form) and equals the canonical-multiset
    intersection — a property test pins that in tests/test_spice.py. The
    augmenting-path form is kept so the matcher stays exact if matching
    semantics ever become non-transitive (e.g. real WordNet synsets, where
    synonymy is NOT an equivalence relation)."""
    adj = [[j for j, r in enumerate(ref) if _tuples_match(c, r, cmap)]
           for c in cand]
    match_r = [-1] * len(ref)

    def try_assign(i: int, seen: List[bool]) -> bool:
        for j in adj[i]:
            if not seen[j]:
                seen[j] = True
                if match_r[j] < 0 or try_assign(match_r[j], seen):
                    match_r[j] = i
                    return True
        return False

    count = 0
    for i in range(len(cand)):
        if try_assign(i, [False] * len(ref)):
            count += 1
    return count


def spice_segment(
    ref_tokens: Sequence[Sequence[str]],
    hyp_tokens: Sequence[str],
    synonyms: Optional[Sequence[FrozenSet[str]]] = DEFAULT_SYNONYMS,
) -> float:
    """SPICE F1 for one candidate against its reference set."""
    cmap = _class_map(synonyms)
    cand = sorted(scene_graph_tuples(hyp_tokens))
    ref_set: Set[Tuple[str, ...]] = set()
    for r in ref_tokens:
        ref_set |= scene_graph_tuples(r)
    ref = sorted(ref_set)
    if not cand or not ref:
        return 0.0
    m = _max_bipartite(cand, ref, cmap)
    p = m / len(cand)
    r = m / len(ref)
    return 2 * p * r / (p + r) if (p + r) > 0 else 0.0


def spice_corpus(
    refs: Dict[str, List[List[str]]],
    hyps: Dict[str, List[str]],
    synonyms: Optional[Sequence[FrozenSet[str]]] = DEFAULT_SYNONYMS,
) -> float:
    """Mean per-caption SPICE F1 over the corpus (the jar's aggregation)."""
    if not hyps:
        return 0.0
    total = 0.0
    for key, hyp in hyps.items():
        total += spice_segment(refs[key], hyp, synonyms)
    return total / len(hyps)
