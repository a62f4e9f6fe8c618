"""Snowball English ("Porter2") stemmer — pure Python, no dependencies.

Reference F7: the reference stems BoW tokens for its strongest features
with NLTK's SnowballStemmer (``/root/reference/src/simple_dataset.py:110-115``,
``src/conll_dataset.py:56-62``). The sandbox has no nltk, so this is a
from-scratch implementation of the published algorithm
(snowballstem.org/algorithms/english/stemmer.html — public spec).

Spark integration: ``stem_tokens`` is an Arrow-batched pandas UDF over
``array<string>`` columns. Per-batch memoization makes the cost
O(distinct tokens), not O(tokens) — web corpora follow Zipf's law, so the
cache hit rate is extreme.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# exceptional forms (spec §"exceptional forms")
_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# invariant after step 1a (spec §"exceptional forms after step 1a")
_EXCEPTIONS_1A = frozenset(
    {"inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"}
)

_STEP2 = [  # (suffix, replacement, guard) — longest-match-wins
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
]
_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"), ("ative", ""),
    ("ness", ""), ("ful", ""),
]
_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ism",
    "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
]


def _regions(word: str) -> tuple[int, int]:
    """R1/R2 start indices (spec §"the algorithm": R1 after the first
    non-vowel following a vowel; R2 likewise within R1; gener-/commun-/
    arsen- prefixes pin R1)."""
    n = len(word)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(w: str) -> bool:
    if len(w) == 2:
        return w[0] in _VOWELS and w[1] not in _VOWELS
    if len(w) >= 3:
        c1, v, c2 = w[-3], w[-2], w[-1]
        return (
            v in _VOWELS
            and c2 not in _VOWELS
            and c2 not in "wxY"
            and c1 not in _VOWELS
        )
    return False


def porter2_stem(word: str) -> str:
    word = word.lower()
    if word.startswith("'"):
        word = word[1:]
    if len(word) <= 2:
        return word
    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word]

    # mark consonant-y as Y
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)
    r1, r2 = _regions(word)

    def in_r1(w: str, suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(w: str, suf: str) -> bool:
        return len(w) - len(suf) >= r2

    # step 0: strip apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(ch in _VOWELS for ch in word[:-2]):
            word = word[:-1]
    if word in _EXCEPTIONS_1A:
        return word

    # step 1b
    suf1b = next(
        (s for s in ("eedly", "ingly", "edly", "eed", "ing", "ed")
         if word.endswith(s)),
        None,
    )
    if suf1b in ("eed", "eedly"):
        if in_r1(word, suf1b):
            word = word[: -len(suf1b)] + "ee"
    elif suf1b is not None:
        stem_part = word[: -len(suf1b)]
        if any(ch in _VOWELS for ch in stem_part):
            word = stem_part
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif word.endswith(_DOUBLES):
                word = word[:-1]
            elif r1 >= len(word) and _ends_short_syllable(word):
                word += "e"

    # step 1c: y/Y → i after a non-vowel that is not the first letter
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    # step 2 (longest match wins; apply only if the match is in R1)
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if in_r1(word, suf):
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) > 2 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 3 (in R1; 'ative' additionally requires R2)
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if in_r1(word, suf):
                if suf == "ative":
                    if in_r2(word, suf):
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 4 (in R2; 'ion' only after s/t)
    for suf in _STEP4:
        if word.endswith(suf):
            if in_r2(word, suf):
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # step 5
    if word.endswith("e"):
        if in_r2(word, "e") or (
            in_r1(word, "e") and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("ll") and in_r2(word, "l"):
        word = word[:-1]

    return word.replace("Y", "y")


@F.pandas_udf(ArrayType(StringType()))
def _stem_tokens_udf(batches: pd.Series) -> pd.Series:
    cache: dict[str, str] = {}

    def stem_list(tokens):
        if tokens is None:
            return None
        out = []
        for t in tokens:
            s = cache.get(t)
            if s is None:
                s = porter2_stem(t)
                cache[t] = s
            out.append(s)
        return out

    return batches.map(stem_list)


def stem_tokens(c: Column) -> Column:
    """array<string> → array<string>: Porter2 stem per token (Arrow batch)."""
    return _stem_tokens_udf(c)
