"""Tokenizer + Porter stemmer unit tests (SURVEY §5.1).

Golden pairs come from the worked examples in M.F. Porter, "An
algorithm for suffix stripping" (1980) — full-pipeline results — plus
the whitespace/case contract of the reference tokenizer
(crawler/src/api/main.go:121-129: strings.Fields -> ToLower -> stem).
"""

from collections import Counter

from rse_ray.functions.tokenizer import (
    StemCache,
    _ends_cvc,
    _measure,
    porter_stem,
    term_freqs,
    tokenize,
)

# (word, stem) — full-pipeline golden pairs
GOLDEN = [
    # step 1a
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
    # step 1b (+ cleanup)
    ("feed", "feed"),
    ("agreed", "agre"),          # eed->ee then 5a e-deletion (m=1, not *o)
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),    # ed-> +e(at) -> 5a drops e (m=2)
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    # step 1c
    ("happy", "happi"),
    ("sky", "sky"),
    # step 2 (via full pipeline)
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("digitizer", "digit"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    # step 3
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    # step 4
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("communism", "commun"),
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    # step 5
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
    # short-word guard
    ("a", "a"),
    ("is", "is"),
    ("as", "as"),    # len<=2: untouched even though ends in s
    # misc sanity
    ("running", "run"),
    ("argument", "argument"),    # m("argu")=1, step4 needs m>1
    ("arguments", "argument"),
]


def test_porter_golden():
    bad = [(w, porter_stem(w), want) for w, want in GOLDEN if porter_stem(w) != want]
    assert not bad, f"stem mismatches: {bad}"


def test_measure():
    assert _measure("") == 0
    assert _measure("tr") == 0
    assert _measure("ee") == 0
    assert _measure("tree") == 0
    assert _measure("y") == 0
    assert _measure("by") == 0
    assert _measure("trouble") == 1
    assert _measure("oats") == 1
    assert _measure("trees") == 1
    assert _measure("ivy") == 1
    assert _measure("troubles") == 2
    assert _measure("private") == 2
    assert _measure("oaten") == 2


def test_cvc():
    assert _ends_cvc("hop")
    assert _ends_cvc("fil")
    assert not _ends_cvc("snow")   # ends w
    assert not _ends_cvc("box")    # ends x
    assert not _ends_cvc("tray")   # ends y
    assert not _ends_cvc("fall")


def test_tokenize_whitespace_and_case():
    # strings.Fields semantics: any run of whitespace, no empty tokens
    assert tokenize("  The \t QUICK\n\nfox  ", stem=False) == ["the", "quick", "fox"]
    assert tokenize("", stem=False) == []
    assert tokenize(" \t\n ", stem=False) == []
    assert tokenize("Running RUNS", stem=True) == ["run", "run"]


def test_term_freqs():
    assert term_freqs("the the cat", stem=False) == Counter({"the": 2, "cat": 1})
    # stemming folds inflections together
    assert term_freqs("run running runs", stem=True) == Counter({"run": 3})


def test_stem_cache_matches():
    cache = StemCache()
    words = [w for w, _ in GOLDEN]
    assert [cache(w) for w in words] == [porter_stem(w) for w in words]
    assert [cache(w) for w in words] == [porter_stem(w) for w in words]  # warm


def test_fused_raw_cache_path_equals_plain_path():
    """The StemCache raw-token fast path must produce exactly the
    plain lower->stem path's output, including unicode case folds,
    case-variant collisions, and repeated tokens (cache hits)."""
    from rse_ray.functions.tokenizer import StemCache, tokenize

    texts = [
        "Running RUNNING running runs ran",
        "İstanbul STRASSE Straße ss SS İstanbul",
        "Mixed-CASE mixed-case MIXED-case  \t tabs\nnewlines",
        "ﬁ ﬂ ǅungla ǅUNGLA ǆungla",  # ligature / titlecase folds
        "x" * 300 + " " + "X" * 300,
        "",
        "solo",
    ]
    sc = StemCache()
    for text in texts:
        fused = tokenize(text, stem=True, _stemmer=sc)
        plain = tokenize(text, stem=True, _stemmer=None)
        assert fused == plain, text
    # second pass: all cache hits, still identical
    for text in texts:
        assert tokenize(text, stem=True, _stemmer=sc) == \
            tokenize(text, stem=True, _stemmer=None)
