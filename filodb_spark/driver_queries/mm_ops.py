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


def q_mm_y4m_frames(spark, sf_dir):
    """REAL video decode path (r3 verdict item 6): per doc a Y4M stream
    is synthesized with doc_id-derived geometry/length, parsed by the
    byte-math Y4M parser, and every 250 ms frame is extracted. The
    oracle recomputes frame index, payload size, and leading payload
    bytes from the same closed forms — so the parser's frame addressing
    is value-checked, not just row-counted."""
    import pandas as pd
    from pyspark.sql import types as T
    from filodb_spark.operators.multimodal import sample_frames, synth_y4m

    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id").where(F.col("doc_id") < 200)

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("duration_ms", T.LongType()),
    ])

    def synth(batches):
        for pdf in batches:
            rows = {"doc_id": [], "content": [], "duration_ms": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 4 + 2 * (doc_id % 3)
                h = 2 + 2 * (doc_id % 2)
                n = 3 + doc_id % 5
                rows["doc_id"].append(doc_id)
                rows["content"].append(
                    synth_y4m(w, h, n_frames=n, fps_num=8, fps_den=1))
                rows["duration_ms"].append(n * 125)
            yield pd.DataFrame(rows)

    media = d.mapInPandas(synth, schema)
    out = sample_frames(media, every_ms=250, decode_backend="real")
    byte_at = lambda i: F.conv(  # noqa: E731
        F.hex(F.substring("frame", i + 1, 1)), 16, 10).cast("long")
    return out.select(
        "doc_id", "frame_ms",
        F.length("frame").cast("long").alias("frame_len"),
        byte_at(0).alias("b0"),
        (byte_at(0) + byte_at(1) + byte_at(2) + byte_at(3)).alias("bsum4"))


QUERIES = {
    "mm_image_features": q_mm_image_features,
    "mm_frame_sample": q_mm_frame_sample,
    "mm_y4m_frames": q_mm_y4m_frames,
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
    # Y4M geometry/content closed forms mirrored from q_mm_y4m_frames'
    # synthesizer: frame f's payload byte i is (f*7 + i*13) % 256, the
    # frame covering offset t at 8 fps is t*8/1000
    "mm_y4m_frames": """
WITH d AS (
  SELECT doc_id,
         4 + 2 * (doc_id % 3) AS w,
         2 + 2 * (doc_id % 2) AS h,
         3 + doc_id % 5 AS n
  FROM documents WHERE doc_id < 200),
offs AS (
  SELECT doc_id, w, h,
         unnest(generate_series(0, n * 125 - 1, 250)) AS frame_ms
  FROM d),
f AS (
  SELECT doc_id, CAST(frame_ms AS BIGINT) AS frame_ms,
         CAST(w * h * 3 // 2 AS BIGINT) AS frame_len,
         frame_ms * 8 // 1000 AS idx
  FROM offs)
SELECT doc_id, frame_ms, frame_len,
       CAST((idx * 7) % 256 AS BIGINT) AS b0,
       CAST((idx * 7) % 256 + (idx * 7 + 13) % 256
            + (idx * 7 + 26) % 256 + (idx * 7 + 39) % 256
            AS BIGINT) AS bsum4
FROM f""",
}
