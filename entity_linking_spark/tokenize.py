"""Reference-fidelity tokenization (pinned, deterministic).

Replicates the observable behavior of the reference's patched Treebank
tokenizer pipeline (/root/reference/src/parsers.py:8-38):

- the standard Treebank word-tokenizer rule set (public NLTK rules:
  punctuation split-off, comma/quote handling, parens, contractions),
- the reference's patches: extra open-quote classes ``«“‘„`` and backtick
  runs, close quotes ``»”’``, doubled ``''`` as quotes, and a final-period
  split that also peels closing brackets/quotes at end of string
  (parsers.py:10-20),
- hyphen splitting WITH delimiter retention: ``"state-of-the-art"`` →
  ``["state", "-", "of", "-", "the", "-", "art"]`` (parsers.py:29-34 —
  ``_split_token_on`` + interleave),
- sentence segmentation: the reference uses Punkt (a trained model); the
  rebuild pins a deterministic regex segmenter instead (SURVEY §2.8 F1 —
  the byte-identical contract is *ours to define*, golden-tested).

Exposed both as plain-python (golden tests) and as Arrow-batched pandas
UDFs (the engine path — never per-row Spark UDFs).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- Treebank-style rule set (public semantics), with reference patches ----

_STARTING_QUOTES = [
    (re.compile(r"([«“‘„]|[`]+)"), r" \1 "),     # reference patch, parsers.py:10,16
    (re.compile(r"('')"), r" \1 "),               # reference patch, parsers.py:12,18
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ (\[{<])(\"|\'{2})"), r"\1 `` "),
]

_PUNCTUATION = [
    # reference patch (parsers.py:14,20): split a final period plus any
    # trailing closers at end of text
    (re.compile(r"([^\.])(\.)([\]\)}>\"\'" "»”’ " r"]*)\s*$"), r"\1 \2 \3 "),
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    (re.compile(r"([^\.])(\.)([\]\)}>\"\']*)\s*$"), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_PARENS_BRACKETS = [(re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> ")]

_ENDING_QUOTES = [
    (re.compile(r"([»”’])"), r" \1 "),            # reference patch, parsers.py:11,17
    (re.compile(r"('')"), r" \1 "),               # reference patch, parsers.py:13,19
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

_CONTRACTIONS = [
    re.compile(r"(?i)\b(can)(?#X)(not)\b"),
    re.compile(r"(?i)\b(d)(?#X)('ye)\b"),
    re.compile(r"(?i)\b(gim)(?#X)(me)\b"),
    re.compile(r"(?i)\b(gon)(?#X)(na)\b"),
    re.compile(r"(?i)\b(got)(?#X)(ta)\b"),
    re.compile(r"(?i)\b(lem)(?#X)(me)\b"),
    re.compile(r"(?i)\b(mor)(?#X)('n)\b"),
    re.compile(r"(?i)\b(wan)(?#X)(na)\s"),
]


def treebank_tokenize(sentence: str) -> list[str]:
    """Treebank word tokenization with the reference's quote/punct patches."""
    text = sentence
    for rx, sub in _STARTING_QUOTES:
        text = rx.sub(sub, text)
    for rx, sub in _PUNCTUATION:
        text = rx.sub(sub, text)
    for rx, sub in _PARENS_BRACKETS:
        text = rx.sub(sub, text)
    text = " " + text + " "
    for rx, sub in _ENDING_QUOTES:
        text = rx.sub(sub, text)
    for rx in _CONTRACTIONS:
        text = rx.sub(r" \1 \2 ", text)
    return text.split()


def split_token_on(token: str, char: str) -> list[str]:
    """Hyphen split with delimiter retention (parsers.py:29-34)."""
    parts = token.split(char)
    out: list[str] = []
    for i, p in enumerate(parts):
        if p:
            out.append(p)
        if i < len(parts) - 1:
            out.append(char)
    return out


def parse_for_tokens(sentence: str) -> list[str]:
    """parsers.py:33-34: treebank tokens, then hyphen-split each."""
    return [
        piece
        for tok in treebank_tokenize(sentence)
        for piece in split_token_on(tok, "-")
    ]


_SENT_RE = re.compile(r"[^.!?]*[.!?]+[\"\'»”’\)\]]*\s*|[^.!?]+$")


def sentence_spans(text: str) -> list[tuple[int, int]]:
    """Deterministic sentence spans (start, end) — the pinned regex
    segmenter standing in for Punkt (parsers.py:23-24)."""
    spans = []
    for m in _SENT_RE.finditer(text):
        seg = m.group(0)
        if not seg.strip():
            continue
        start = m.start() + (len(seg) - len(seg.lstrip()))
        end = m.start() + len(seg.rstrip())
        spans.append((start, end))
    return spans


def parse_for_sentences(text: str) -> list[str]:
    return [text[s:e] for s, e in sentence_spans(text)]


def parse_text_for_tokens(text: str) -> list[str]:
    """parsers.py:36-38: sentences → tokens, flattened."""
    return [
        tok for sent in parse_for_sentences(text) for tok in parse_for_tokens(sent)
    ]


# --- Arrow-batched engine UDFs ---------------------------------------------

@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: parse_text_for_tokens(t or ""))


@F.pandas_udf(
    T.ArrayType(
        T.StructType(
            [
                T.StructField("start", T.IntegerType()),
                T.StructField("end", T.IntegerType()),
            ]
        )
    )
)
def sentence_spans_udf(text: pd.Series) -> pd.Series:
    return text.map(
        lambda t: [{"start": s, "end": e} for s, e in sentence_spans(t or "")]
    )
