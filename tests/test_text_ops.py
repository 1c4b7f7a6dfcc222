"""Text/dedup operator unit tests.

Regression focus: every operator must honor a caller-supplied text column
name (the ops expose ``text_col=`` but ``char_shingles`` once hardcoded
the literal column name ``text``, silently shingling the wrong column for
any renamed input).
"""

import pytest
from pyspark.sql import functions as F

from filodb_spark.operators.dedup import (minhash_lsh_pairs,
                                          minhash_signatures,
                                          ngram_jaccard_pairs, simhash)
from filodb_spark.operators.text import char_shingles

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog!"),   # near-dup of 1
    (3, "pack my box with five dozen liquor jugs"),
    (4, "sphinx of black quartz judge my vow"),
]


@pytest.fixture(scope="module")
def docs_body(spark):
    """Docs with the text under a NON-default column name."""
    return spark.createDataFrame(DOCS, ["doc_id", "body"])


def test_char_shingles_uses_passed_column(spark):
    # two text-ish columns; shingles must come from the one passed in
    df = spark.createDataFrame([("abcd", "zzzz")], ["text", "body"])
    got = df.select(char_shingles(F.col("body"), 3).alias("g")).first()["g"]
    assert got == ["zzz"]
    # and n-gram length is honored
    got_t = df.select(char_shingles(F.col("text"), 2).alias("g")).first()["g"]
    assert sorted(got_t) == ["ab", "bc", "cd"]


def test_char_shingles_short_text_empty(spark):
    df = spark.createDataFrame([("ab",)], ["t"])
    got = df.select(char_shingles(F.col("t"), 3).alias("g")).first()["g"]
    assert got == []


def test_ngram_jaccard_renamed_column(spark, docs_body):
    pairs = ngram_jaccard_pairs(docs_body, threshold=0.5,
                                text_col="body").collect()
    assert [(r.d1, r.d2) for r in pairs] == [(1, 2)]
    assert pairs[0].jaccard > 0.8


def test_minhash_lsh_renamed_column(spark, docs_body):
    pairs = minhash_lsh_pairs(docs_body, threshold=0.5,
                              text_col="body").collect()
    assert [(r.d1, r.d2) for r in pairs] == [(1, 2)]


def test_minhash_signature_differs_by_column(spark):
    # if shingling ignored text_col, both signatures would be identical
    df = spark.createDataFrame(
        [(1, "the quick brown fox", "completely different words here")],
        ["doc_id", "text", "body"])
    s_text = minhash_signatures(df, text_col="text").first()["sig"]
    s_body = minhash_signatures(df, text_col="body").first()["sig"]
    assert s_text != s_body


def test_simhash_renamed_column(spark, docs_body):
    rows = simhash(docs_body, text_col="body").collect()
    assert len(rows) == 4
    by_id = {r.doc_id: r.simhash for r in rows}
    ham12 = bin(by_id[1] ^ by_id[2]).count("1")
    ham13 = bin(by_id[1] ^ by_id[3]).count("1")
    assert ham12 < ham13  # near-dups closer in Hamming space
