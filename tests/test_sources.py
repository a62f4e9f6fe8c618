"""GloVe reader (S10) + libsvm qid sink/source (S15) round-trips."""

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.sources.glove import SPECIAL_TOKENS, read_glove
from entity_linking_spark.sources.libsvm import (
    read_libsvm_qid,
    write_libsvm_qid,
)

GLOVE = """the 0.1 0.2 0.3
of -0.5 0.25 1.0
data 1.5 -2.0 0.75
"""


@pytest.fixture()
def glove_path(tmp_path):
    p = tmp_path / "glove.txt"
    p.write_text(GLOVE)
    return str(p)


def test_read_glove(spark, glove_path):
    rows = {
        r["token"]: r["embedding"]
        for r in read_glove(spark, glove_path, add_special=False).collect()
    }
    assert rows == {
        "the": [pytest.approx(0.1), pytest.approx(0.2), pytest.approx(0.3)],
        "of": [pytest.approx(-0.5), pytest.approx(0.25), pytest.approx(1.0)],
        "data": [pytest.approx(1.5), pytest.approx(-2.0), pytest.approx(0.75)],
    }


def test_read_glove_special_tokens_deterministic(spark, glove_path):
    df1 = read_glove(spark, glove_path)
    df2 = read_glove(spark, glove_path)
    got1 = {r["token"]: r["embedding"] for r in df1.collect()}
    got2 = {r["token"]: r["embedding"] for r in df2.collect()}
    assert got1 == got2  # deterministic, unlike the reference's randn
    for t in SPECIAL_TOKENS:
        assert len(got1[t]) == 3
    assert got1["<PAD>"] == [0.0, 0.0, 0.0]
    assert any(v != 0.0 for v in got1["<UNK>"])


def test_libsvm_qid_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10, 0.5, 1.25), (0, 10, -0.5, 2.0), (3, 11, 0.0, 0.75)],
        "label int, qid int, f1 double, f2 double",
    )
    path = str(tmp_path / "ltr")
    write_libsvm_qid(df, path, feature_cols=["f1", "f2"])
    back = read_libsvm_qid(spark, path)
    got = sorted(
        (r["label"], r["qid"], tuple(r["features"])) for r in back.collect()
    )
    # labels binarized to {0,1} (reference convert_to_xgboost_data.py:10)
    assert got == [
        (0, 10, (-0.5, 2.0)),
        (1, 10, (0.5, 1.25)),
        (1, 11, (0.0, 0.75)),
    ]


def test_libsvm_line_format_exact(spark, tmp_path):
    df = spark.createDataFrame([(1, 5, 0.5, 2.0)], "label int, qid int, f1 double, f2 double")
    path = str(tmp_path / "fmt")
    write_libsvm_qid(df, path, feature_cols=["f1", "f2"])
    [line] = [
        r["value"] for r in spark.read.text(path).collect() if r["value"].strip()
    ]
    assert line == "1 qid:5 1:0.5 2:2.0"
