"""Driver queries: multimodal pipeline plumbing over documents-as-media.

The documents' text bytes stand in for opaque media content; the fake
decoder derives md5-based features, which DuckDB reproduces — so the
whole mapInPandas (Arrow-batched Python) path is oracle-checked:
schema, batching, null handling, and the deterministic transform.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from filodb_spark.operators.multimodal import image_features, sample_frames


def q_mm_image_features(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = d.select("doc_id", F.encode("text", "UTF-8").alias("content"))
    out = image_features(media)
    return out.select(
        "doc_id", "n_bytes",
        F.col("features")[0].alias("f0"), F.col("features")[1].alias("f1"),
        F.col("features")[2].alias("f2"), F.col("features")[3].alias("f3"))


def q_mm_frame_sample(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = d.select("doc_id", F.encode("text", "UTF-8").alias("content"),
                     (F.col("n_chars") * 10).cast("long").alias("duration_ms"))
    out = sample_frames(media, every_ms=1000)
    return out.select("doc_id", "frame_ms",
                      F.lower(F.hex("frame")).alias("frame_hex"))


QUERIES = {
    "mm_image_features": q_mm_image_features,
    "mm_frame_sample": q_mm_frame_sample,
}

_HEX = "CAST(CAST(('0x' || substring(h, {a}, 8)) AS BIGINT) AS DOUBLE)"

ORACLES = {
    "mm_image_features": f"""
WITH m AS (SELECT doc_id, length(text) AS n_bytes, md5(text) AS h
           FROM documents)
SELECT doc_id, n_bytes,
       {_HEX.format(a=1)} AS f0, {_HEX.format(a=9)} AS f1,
       {_HEX.format(a=17)} AS f2, {_HEX.format(a=25)} AS f3
FROM m""",
    # frame content = md5(utf8(text) || str(offset)); hex compared directly
    "mm_frame_sample": """
WITH d AS (SELECT doc_id, text, n_chars * 10 AS duration_ms FROM documents),
offs AS (
  SELECT doc_id, text,
         unnest(generate_series(0, CAST(duration_ms AS BIGINT) - 1, 1000)) AS frame_ms
  FROM d WHERE duration_ms > 0
)
SELECT doc_id, frame_ms,
       md5(text || CAST(frame_ms AS VARCHAR)) AS frame_hex
FROM offs""",
}
