"""Tokenization + classic Porter stemming.

Semantics mirror the reference's one tokenizer (`extractKeywords`,
reference: crawler/src/api/main.go:121-129):

    tokens = text.split()            # Go strings.Fields: runs of Unicode
                                     # whitespace, no empty tokens
    tokens = [t.lower() ...]         # Go strings.ToLower
    tokens = [porter(t) ...]         # reiver/go-porterstemmer = classic
                                     # Porter (M.F. Porter 1980)
    tf     = Counter(tokens)

Normative notes (SURVEY.md §7.6):
  * Python ``str.split()`` with no argument is the contract — same
    "any run of Unicode whitespace, drop empties" behavior as Go's
    ``strings.Fields``.
  * Python ``str.lower()`` is normative for case folding (Go's ToLower
    differs on a handful of code points, e.g. U+0130; fixtures stay in
    the agreeing subset).
  * The stemmer is the classic 1980 Porter algorithm implemented from
    the published description — NOT the later "Porter2/English" revision
    (no `logi`/`bli` amendments). It assumes lowercase input, as the
    reference always lowercases first.

The stemmer is pure Python; the hot path amortizes it with a per-process
word->stem cache (vocabulary is Zipfian, so hit rates are ~99%).
"""

from __future__ import annotations

from collections import Counter

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    """True if word[i] is a consonant. 'y' is a consonant at position 0
    or after a vowel; a vowel after a consonant (classic Porter rule)."""
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m(stem): the number of VC sequences in [C](VC)^m[V]."""
    form = []
    for i in range(len(stem)):
        c = _is_cons(stem, i)
        if not form or form[-1] is not c:
            form.append(c)
    m = 0
    for i in range(len(form) - 1):
        if form[i] is False and form[i + 1] is True:
            m += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends consonant-vowel-consonant where the final consonant
    is not w, x or y."""
    n = len(word)
    return (
        n >= 3
        and _is_cons(word, n - 3)
        and not _is_cons(word, n - 2)
        and _is_cons(word, n - 1)
        and word[-1] not in "wxy"
    )


# Step 2/3/4 suffix tables: (suffix, replacement); longest-match-first.
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _longest_suffix(word: str, table) -> tuple[str, str] | None:
    best = None
    for suf, rep in table:
        if word.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def porter_stem(word: str) -> str:
    """Classic Porter (1980). Expects lowercase input; words of length
    <= 2 are returned unchanged (the original algorithm's guard)."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    second_third = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            second_third = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            second_third = True
    if second_third:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    hit = _longest_suffix(w, _STEP2)
    if hit is not None:
        suf, rep = hit
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    # Step 3
    hit = _longest_suffix(w, _STEP3)
    if hit is not None:
        suf, rep = hit
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    # Step 4
    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None:
        stem = w[: len(w) - len(best)]
        if _measure(stem) > 1:
            if best == "ion":
                if stem and stem[-1] in "st":
                    w = stem
            else:
                w = stem

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w[-1] == "l":
        w = w[:-1]

    return w


class _RawStemMap(dict):
    """raw token -> stem(lower(token)), computed on miss. A dict
    subclass so the hot path is ONE C-level ``cache[tok]`` per token —
    no .lower() and no second list pass for the ~99% of tokens already
    seen (vocabulary is Zipfian). Shares stems with the lowered cache
    so query-side ``StemCache.__call__`` and build-side tokenize agree
    byte-for-byte."""

    __slots__ = ("_lower_cache",)
    _MAX = 4_000_000  # fleet guard: raw web tokens (ids, urls, numbers)
    #                   are unbounded; drop and refill past ~4M entries

    def __init__(self, lower_cache: dict) -> None:
        super().__init__()
        self._lower_cache = lower_cache

    def __missing__(self, tok: str) -> str:
        lw = tok.lower()
        c = self._lower_cache
        s = c.get(lw)
        if s is None:
            s = porter_stem(lw)
            if len(c) > self._MAX:
                c.clear()
            c[lw] = s
        if len(self) > self._MAX:
            self.clear()
        self[tok] = s
        return s


class StemCache:
    """Memoizing wrapper around porter_stem for the hot path. Vocabulary
    is Zipfian so a plain dict cache hits ~99% of tokens; one instance
    per tokenize actor/worker (actor-pool pattern, SURVEY §2.3 ST3).
    ``raw`` is the fused raw-token -> stemmed mapping tokenize's fast
    path indexes directly."""

    __slots__ = ("_cache", "raw")

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}
        self.raw = _RawStemMap(self._cache)

    def __call__(self, word: str) -> str:
        s = self._cache.get(word)
        if s is None:
            s = porter_stem(word)
            self._cache[word] = s
        return s


def tokenize(text: str, *, stem: bool = True, _stemmer=None) -> list[str]:
    """Reference tokenizer: whitespace split -> lower -> (Porter stem)."""
    if stem and type(_stemmer) is StemCache:
        rm = _stemmer.raw
        return [rm[t] for t in text.split()]
    toks = [t.lower() for t in text.split()]
    if stem:
        st = _stemmer if _stemmer is not None else porter_stem
        toks = [st(t) for t in toks]
    return toks


def term_freqs(text: str, *, stem: bool = True, _stemmer=None) -> Counter:
    """(term -> tf) for one document, mirroring extractKeywords
    (reference: crawler/src/api/main.go:121-129)."""
    return Counter(tokenize(text, stem=stem, _stemmer=_stemmer))


def expand_synonyms(query: str, synonyms: dict[str, list[str]], *,
                    stem: bool = True, _stemmer=None) -> list[str]:
    """Analyzer-level synonym expansion (Lucene SynonymFilter in its
    flattened OR form): every query-token occurrence emits itself plus
    each synonym its ANALYZED form maps to, so downstream qtf counting
    treats a synonym hit exactly like a repeated user term. Both the
    map's keys and its values pass through the same analyzer as the
    query (lower [+ Porter]), so a map written in surface forms behaves
    identically to one written in analyzed forms. Synonyms absent from
    the index simply contribute nothing (the scorer drops unknown
    terms), matching a SQL twin whose df join eliminates them."""
    ana: dict[str, list[str]] = {}
    for key, vals in synonyms.items():
        kt = tokenize(key, stem=stem, _stemmer=_stemmer)
        if len(kt) != 1:
            raise ValueError(f"synonym key must analyze to one token: {key!r}")
        out = []
        for v in vals:
            vt = tokenize(v, stem=stem, _stemmer=_stemmer)
            if len(vt) != 1:
                raise ValueError(
                    f"synonym value must analyze to one token: {v!r}")
            out.append(vt[0])
        ana[kt[0]] = out
    expanded: list[str] = []
    for tok in tokenize(query, stem=stem, _stemmer=_stemmer):
        expanded.append(tok)
        expanded.extend(ana.get(tok, ()))
    return expanded
