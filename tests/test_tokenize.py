"""Tokenizer goldens (FIXTURES.md §5) — quote classes «“‘„»”’, doubled '',
hyphen splitting with retention, final-punct peel, sentence spans.

Pins the behavior contract of entity_linking_spark.tokenize, mirroring the
reference's tokenizer patches (/root/reference/src/parsers.py:8-38) and the
test style of /root/reference/test/data_transformers_test.py.
"""

from pyspark.sql import functions as F

from entity_linking_spark.tokenize import (
    parse_for_tokens,
    parse_text_for_tokens,
    sentence_spans,
    split_token_on,
    tokenize_udf,
    treebank_tokenize,
)

TOKEN_GOLDENS = [
    # quote classes the reference patches in (parsers.py:10-19)
    ("«Hello» world", ["«", "Hello", "»", "world"]),
    ("“Quoted” text", ["“", "Quoted", "”", "text"]),
    ("‘single’ and „low“", ["‘", "single", "’", "and", "„", "low", "“"]),
    # both '' get space-padded by the inserted patch rule, then the
    # space-preceded-quote rule rewrites each to `` (traced through
    # parsers.py:12,18 + the stock Treebank STARTING_QUOTES order)
    ("he said ''done''", ["he", "said", "``", "done", "``"]),
    # hyphen retention (parsers.py:29-34)
    ("state-of-the-art", ["state", "-", "of", "-", "the", "-", "art"]),
    ("well-known fact", ["well", "-", "known", "fact"]),
    # final punctuation peel incl. closers (parsers.py:14,20)
    ("It works.", ["It", "works", "."]),
    ("It works.)", ["It", "works", ".", ")"]),
    # standard treebank behavior
    ("don't stop", ["do", "n't", "stop"]),
    ("a, b; c", ["a", ",", "b", ";", "c"]),
    ("(parens)", ["(", "parens", ")"]),
]


def test_token_goldens():
    for text, want in TOKEN_GOLDENS:
        assert parse_for_tokens(text) == want, text


def test_split_token_on_retention():
    assert split_token_on("a-b-c", "-") == ["a", "-", "b", "-", "c"]
    assert split_token_on("-lead", "-") == ["-", "lead"]
    assert split_token_on("trail-", "-") == ["trail", "-"]
    assert split_token_on("none", "-") == ["none"]
    assert split_token_on("", "-") == []


SENT_GOLDENS = [
    ("One. Two! Three?", [(0, 4), (5, 9), (10, 16)]),
    ("No terminator here", [(0, 18)]),
    ('He said "Stop." Then left.', [(0, 15), (16, 26)]),
    ("", []),
]


def test_sentence_span_goldens():
    for text, want in SENT_GOLDENS:
        assert sentence_spans(text) == want, text


def test_spans_cover_sentences():
    text = "First sentence. Second one! And a third?"
    spans = sentence_spans(text)
    assert [text[s:e] for s, e in spans] == [
        "First sentence.",
        "Second one!",
        "And a third?",
    ]


def test_full_text_tokens():
    text = "Well-known «quote». Second sentence."
    assert parse_text_for_tokens(text) == [
        "Well", "-", "known", "«", "quote", "»", ".",
        "Second", "sentence", ".",
    ]


def test_udf_matches_plain(spark):
    texts = [t for t, _ in TOKEN_GOLDENS]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(tokenize_udf(F.col("text")).alias("toks")).collect()
    for (text, _), row in zip(TOKEN_GOLDENS, rows):
        assert row["toks"] == parse_text_for_tokens(text), text
