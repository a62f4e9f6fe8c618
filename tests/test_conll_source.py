"""CoNLL-style reader goldens (fixture in the spirit of
/root/reference/test/fixtures/conll + test/conll_dataset_test.py)."""

import pytest

from entity_linking_spark.sources.conll import read_documents, read_mentions

FIXTURE = """-DOCSTART- (1 EU)
EU\tB\tEU\tEuropean_Union
rejects\tO
German\tB\tGerman\tGermany
call\tO
.\tO
-DOCSTART- (2 Peter)
Peter\tB\tPeter Blackburn\tPeter_Blackburn
Blackburn\tI
lives\tO
here\tO
"""


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("conll") / "corpus.tsv"
    p.write_text(FIXTURE)
    return str(p)


def test_documents(spark, fixture_path):
    docs = {r["doc_id"]: r["text"] for r in read_documents(spark, fixture_path).collect()}
    assert docs == {
        1: "EU rejects German call .",
        2: "Peter Blackburn lives here",
    }


def test_mentions(spark, fixture_path):
    rows = read_mentions(spark, fixture_path).collect()
    got = {(r["doc_id"], r["mention"], r["entity"]) for r in rows}
    assert got == {
        (1, "EU", "European_Union"),
        (1, "German", "Germany"),
        (2, "Peter Blackburn", "Peter_Blackburn"),
    }


def test_multi_file_glob(spark, tmp_path):
    """Doc ids are globally unique and stable (file-name order) for globs."""
    (tmp_path / "a.tsv").write_text(
        "-DOCSTART- (1)\nAlpha\tO\n-DOCSTART- (2)\nBeta\tO\n"
    )
    (tmp_path / "b.tsv").write_text("-DOCSTART- (1)\nGamma\tO\n")
    docs = {
        r["doc_id"]: r["text"]
        for r in read_documents(spark, str(tmp_path)).collect()
    }
    assert docs == {1: "Alpha", 2: "Beta", 3: "Gamma"}
