"""Extraction byte-identity goldens (BASELINE.json input_hint invariant).

The contract: ``extract_text(html)`` reproduces the ground-truth ``text``
byte-for-byte for every url. Golden files pin the behavior across versions
(spirit of /root/reference/test/data_transformers_test.py hand-built
goldens).
"""

import os

from pyspark.sql import functions as F

from entity_linking_spark.datagen import generate_pages
from entity_linking_spark.extract import extract_text_str, with_extracted_text

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def test_extract_known_golden():
    with open(os.path.join(GOLDEN_DIR, "page0.html"), "rb") as fh:
        html_s = fh.read().decode("utf-8")
    with open(os.path.join(GOLDEN_DIR, "page0.txt"), "rb") as fh:
        want = fh.read().decode("utf-8")
    assert extract_text_str(html_s) == want


def test_extract_entities_and_boilerplate():
    html_s = (
        "<html><head><title>A &amp; B</title>"
        "<script>if (1 < 2) { x(); }</script></head>"
        "<body><nav>Home</nav><p>Caf&eacute; &quot;quoted&quot;</p>"
        "<p>Second &#39;par&#39;</p>"
        "<footer>&copy; 2024</footer></body></html>"
    )
    assert extract_text_str(html_s) == 'A & B\nCafé "quoted"\nSecond \'par\''


def test_extract_empty_and_tagless():
    assert extract_text_str("") == ""
    assert extract_text_str("no tags at all") == ""
    assert extract_text_str("<p>only para</p>") == "only para"


def test_datagen_roundtrip_byte_identical():
    pages, _ = generate_pages(n_entities=10, seed=42)
    for p in pages:
        assert extract_text_str(p.html) == p.text


def test_spark_udf_matches_groundtruth(spark, tmp_path):
    from entity_linking_spark.datagen import write_parquet

    write_parquet(str(tmp_path), n_entities=8, seed=42)
    pdf = spark.read.parquet(f"{tmp_path}/pages.parquet")
    ext = with_extracted_text(
        pdf.select("url", "html"), out_col="text2"
    ).join(pdf.select("url", "text"), "url")
    assert ext.where(F.col("text2") != F.col("text")).count() == 0
