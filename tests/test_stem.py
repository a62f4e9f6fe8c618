"""Porter2 (Snowball English) stemmer goldens.

Vectors are full-algorithm outputs hand-derived from the published spec
(snowballstem.org); note Porter2 differs from the Porter-1 paper's
step-table intermediates (e.g. agreed→agre, not agree — step 5 drops the
final e because 'agre' does not end in a short syllable).
"""

import pytest

from entity_linking_spark.functions.stem import porter2_stem, stem_tokens

VECTORS = {
    # step 1a plurals
    "cats": "cat", "caresses": "caress", "ponies": "poni", "ties": "tie",
    "flies": "fli", "dies": "die", "gas": "gas", "this": "this", "us": "us",
    # step 1b
    "agreed": "agre", "feed": "feed", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "hopping": "hop", "hoped": "hope",
    "tanned": "tan", "falling": "fall", "hissing": "hiss", "failing": "fail",
    "filing": "file", "troubled": "troubl", "sized": "size",
    # step 1c
    "happy": "happi", "crying": "cri", "say": "say", "enjoy": "enjoy",
    # steps 2-4
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "national": "nation", "generate": "generat", "consignment": "consign",
    "communism": "communism", "adjustment": "adjust", "dependent": "depend",
    "activate": "activ", "effective": "effect",
    # exceptional forms
    "dying": "die", "lying": "lie", "sky": "sky", "news": "news",
    "atlas": "atlas", "early": "earli",
    # full vocabulary of the synthetic documents corpus — these back the
    # stemmed_bow oracle's embedded mapping (queries.py)
    "customer": "custom", "merge": "merg", "query": "queri", "table": "tabl",
    "value": "valu", "filter": "filter", "order": "order", "vector": "vector",
    "line": "line", "the": "the", "key": "key", "a": "a", "agg": "agg",
    "batch": "batch", "big": "big", "column": "column", "data": "data",
    "dup": "dup", "fast": "fast", "group": "group", "hash": "hash",
    "join": "join", "part": "part", "row": "row", "scan": "scan",
    "slow": "slow", "small": "small", "sort": "sort", "spark": "spark",
    "stream": "stream", "window": "window",
}


@pytest.mark.parametrize("word,want", sorted(VECTORS.items()))
def test_porter2_vectors(word, want):
    assert porter2_stem(word) == want


def test_stem_tokens_udf(spark):
    df = spark.createDataFrame(
        [(["running", "flies", "tables"],), (None,), ([],)],
        "tokens array<string>",
    )
    got = [r[0] for r in df.select(stem_tokens("tokens")).collect()]
    assert got == [["run", "fli", "tabl"], None, []]


def test_udf_is_arrow_batched(spark):
    df = spark.createDataFrame([(["x"],)], "tokens array<string>")
    plan = (
        df.select(stem_tokens("tokens"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
