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


# --- mention-sentence recovery (reference F11) goldens, mirroring
# /root/reference/test/data_transformers_test.py:6-77 -----------------------

from entity_linking_spark.tokenize import (  # noqa: E402
    attach_mention_sentences,
    find_mention_sentence_span,
    get_mention_sentence,
    get_mention_sentence_splits,
)


def test_find_mention_sentence_span():
    spans = [(0, 3), (4, 8), (8, 12), (13, 19)]
    assert spans[find_mention_sentence_span(spans, 10)] == (8, 12)


def test_get_mention_sentence_splits():
    content = "a b c. aa bb cc"
    assert get_mention_sentence_splits(content, "bb cc", 10) == [
        ["aa", "bb", "cc"],
        ["bb", "cc"],
    ]


def test_get_mention_sentence_splits_with_merge():
    content = "a b c. aa bb cc"
    # mention straddles the sentence boundary → spans merge
    # treebank keeps non-final periods attached ("c." is one token)
    assert get_mention_sentence_splits(content, "c. aa", 4) == [
        ["a", "b", "c.", "aa"],
        ["c.", "aa", "bb", "cc"],
    ]


def test_get_mention_sentence_with_lim():
    content = "a b c. aa bb cc"
    assert get_mention_sentence(content, "bb", 10, lim=2) == ["aa", "bb"]


def test_attach_mention_sentences(spark):
    docs = spark.createDataFrame(
        [(1, "a b c. aa bb cc")], "doc_id long, text string"
    )
    mentions = spark.createDataFrame(
        [(1, "bb cc", 10), (1, "c. aa", 4)],
        "doc_id long, mention string, offset long",
    )
    rows = {
        r["mention"]: r["sentence_tokens"]
        for r in attach_mention_sentences(mentions, docs).collect()
    }
    assert rows["bb cc"] == ["aa", "bb", "cc"]
    assert rows["c. aa"] == ["a", "b", "c.", "aa", "bb", "cc"]
    # must be Arrow-batched, never per-row Python
    plan = (
        attach_mention_sentences(mentions, docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
