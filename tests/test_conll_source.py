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


def test_normalize_mention_for_search():
    from entity_linking_spark.sources.conll import normalize_mention_for_search

    # trailing space is reference-exact: 'U.S.'.split('.') ends with ''
    assert normalize_mention_for_search("U.S.") == "U . S . "
    assert normalize_mention_for_search("Smith, Jones") == "Smith , Jones"
    # the one special-cased over-correction (reference conll_helpers.py:58)
    assert normalize_mention_for_search("Washington D.C.") == "Washington D.C. "


def test_find_mention_offsets(spark):
    from entity_linking_spark.sources.conll import find_mention_offsets

    docs = spark.createDataFrame(
        [(1, "The U . S . economy and the U . S . dollar rose")],
        "doc_id long, text string",
    )
    mentions = spark.createDataFrame(
        [(1, "U.S.", 1), (1, "U.S.", 5), (1, "missing", 9)],
        "doc_id long, mention string, line_no long",
    )
    rows = {
        r["line_no"]: (r["offset"], r["matched"])
        for r in find_mention_offsets(docs, mentions).collect()
    }
    # first U.S. at char 4 (repaired to "U . S . "), second found after
    # seek; `matched` carries the in-text form so downstream span math
    # uses the right length
    assert rows[1] == (4, "U . S . ")
    assert rows[5] == (28, "U . S . ")
    assert rows[9] == (-1, None)



def test_preamble_lines_outside_docs_are_dropped(spark, tmp_path):
    """Token lines before a file's first DOCSTART belong to no document —
    they must not merge into the previous file's last doc."""
    (tmp_path / "a.tsv").write_text("-DOCSTART- (1)\nAlpha\tO\n")
    (tmp_path / "b.tsv").write_text("Stray\tO\n-DOCSTART- (1)\nBeta\tO\n")
    docs = {
        r["doc_id"]: r["text"]
        for r in read_documents(spark, str(tmp_path)).collect()
    }
    assert docs == {1: "Alpha", 2: "Beta"}


def test_offsets_chain_into_sentences_with_misses(spark):
    """find_mention_offsets -> attach_mention_sentences end-to-end: the
    repaired `matched` form drives span math; unlocatable mentions (-1)
    yield null instead of aborting the job."""
    from entity_linking_spark.sources.conll import find_mention_offsets
    from entity_linking_spark.tokenize import attach_mention_sentences

    docs = spark.createDataFrame(
        [(1, "The U . S . economy grew. It grew fast.")],
        "doc_id long, text string",
    )
    mentions = spark.createDataFrame(
        [(1, "U.S.", 1), (1, "missing", 2)],
        "doc_id long, mention string, line_no long",
    )
    offs = find_mention_offsets(docs, mentions).withColumnRenamed(
        "mention", "annotation"
    ).withColumnRenamed("matched", "mention")
    rows = {
        r["annotation"]: r["sentence_tokens"]
        for r in attach_mention_sentences(offs, docs).collect()
    }
    assert rows["U.S."] == ["The", "U", ".", "S", ".", "economy", "grew", "."]
    assert rows["missing"] is None
