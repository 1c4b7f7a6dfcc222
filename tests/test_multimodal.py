"""Multimodal plumbing tests: schemas, batching, null handling,
deterministic fake decode; real backend raises at the plug-in point."""

import hashlib
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from filodb_spark.operators.multimodal import (image_features, resize_images,
                                               sample_frames, with_media_meta)

try:
    import PIL  # noqa: F401
    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def _make_png(w: int, h: int, value: int = 128) -> bytes:
    """Minimal valid 8-bit grayscale PNG built with stdlib only (real
    IHDR/IDAT/IEND chunks + CRCs) — decodable by any PNG library."""
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes([value]) * w for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


@pytest.fixture()
def media_df(spark):
    rows = [(i, f"image-bytes-{i}".encode()) for i in range(10)]
    rows.append((99, None))  # null content must be skipped
    return spark.createDataFrame(rows, "doc_id long, content binary")


class TestImageFeatures:
    @pytest.mark.slow
    def test_fake_decode_deterministic(self, spark, media_df):
        out = image_features(media_df).collect()
        assert len(out) == 10  # null skipped
        by_id = {r["doc_id"]: r for r in out}
        data = b"image-bytes-3"
        h = hashlib.md5(data).digest()
        expected = [float(int.from_bytes(h[4 * i:4 * i + 4], "big"))
                    for i in range(4)]
        assert list(by_id[3]["features"]) == expected
        assert by_id[3]["n_bytes"] == len(data)

    @pytest.mark.skipif(HAS_PIL, reason="pillow present: real path works")
    def test_real_backend_raises_without_pillow(self, spark, media_df):
        with pytest.raises(Exception) as e:
            image_features(media_df, decode_backend="real").collect()
        assert "NotImplementedError" in str(e.value) or \
            isinstance(e.value, NotImplementedError)

    @pytest.mark.skipif(not HAS_PIL, reason="pillow not installed")
    def test_real_decode_agrees_with_header_parse(self, spark):
        # the JVM-side header math (with_media_meta) and a true pillow
        # decode must report the same dimensions
        df = spark.createDataFrame(
            [(1, _make_png(7, 3)), (2, _make_png(32, 16))],
            "doc_id long, content binary")
        hdr = {r["doc_id"]: r["media_meta"]
               for r in with_media_meta(df).collect()}
        feats = {r["doc_id"]: list(r["features"])
                 for r in image_features(df, decode_backend="real").collect()}
        for i, (w, h) in [(1, (7, 3)), (2, (32, 16))]:
            assert (hdr[i]["width"], hdr[i]["height"]) == (w, h)
            assert feats[i][:2] == [float(w), float(h)]

    @pytest.mark.skipif(not HAS_PIL, reason="pillow not installed")
    def test_real_resize_reencodes(self, spark):
        df = spark.createDataFrame([(1, _make_png(8, 8))],
                                   "doc_id long, content binary")
        out = resize_images(df, 4, 2, decode_backend="real")
        row = with_media_meta(out.select("doc_id", "content")).first()
        # re-encoded PNG's own header carries the new dims
        assert (row["media_meta"]["width"],
                row["media_meta"]["height"]) == (4, 2)


class TestResizeAndMeta:
    def test_meta_schema(self, spark, media_df):
        out = resize_images(media_df, 224, 224)
        row = out.where(F.col("doc_id") == 1).first()
        assert row["media_meta"]["width"] == 224
        assert row["media_meta"]["mime"] == "image/png"
        assert bytes(row["content"]) == b"image-bytes-1"

    def test_with_media_meta(self, spark, media_df):
        out = with_media_meta(media_df, mime="audio/wav")
        assert out.schema["media_meta"].dataType.fieldNames() == \
            ["mime", "width", "height", "duration_ms", "sample_rate"]

    def test_header_parsing_png_wav(self, spark):
        # hand-built valid headers: the parse is pure JVM byte math
        import struct
        png = (b"\x89PNG\r\n\x1a\n"                  # signature
               + struct.pack(">I", 13) + b"IHDR"     # IHDR chunk
               + struct.pack(">II", 640, 480)        # width, height
               + b"\x08\x02\x00\x00\x00" + b"crc0")
        wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16)
               + struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16))
        other = b"not-a-container"
        df = spark.createDataFrame(
            [(1, png), (2, wav), (3, other)], "doc_id long, content binary")
        rows = {r["doc_id"]: r["media_meta"]
                for r in with_media_meta(df).collect()}
        assert rows[1]["mime"] == "image/png"
        assert (rows[1]["width"], rows[1]["height"]) == (640, 480)
        assert rows[2]["mime"] == "audio/wav"
        assert rows[2]["sample_rate"] == 44100
        assert rows[2]["width"] is None
        assert rows[3]["mime"] is None and rows[3]["width"] is None


class TestFrameSampling:
    def test_sample_offsets(self, spark):
        df = spark.createDataFrame(
            [(1, b"video-1", 2500), (2, b"video-2", 900), (3, None, 1000)],
            "doc_id long, content binary, duration_ms long")
        out = sample_frames(df, every_ms=1000).collect()
        offsets = sorted((r["doc_id"], r["frame_ms"]) for r in out)
        assert offsets == [(1, 0), (1, 1000), (1, 2000), (2, 0)]
        # frames deterministic
        f = [r for r in out if r["doc_id"] == 1 and r["frame_ms"] == 1000][0]
        assert bytes(f["frame"]) == hashlib.md5(b"video-1" + b"1000").digest()


class TestY4m:
    """Real (byte-math) video path: YUV4MPEG2 container parsing —
    the uncompressed-format twin of the PNG/WAV header parsers; only
    compressed codecs remain behind the ffmpeg plug-in point."""

    def test_parse_roundtrip(self):
        from filodb_spark.operators.multimodal import parse_y4m, synth_y4m
        raw = synth_y4m(4, 2, n_frames=5, fps_num=10, fps_den=1)
        meta = parse_y4m(raw)
        assert (meta["width"], meta["height"]) == (4, 2)
        assert (meta["fps_num"], meta["fps_den"]) == (10, 1)
        assert meta["frame_size"] == 4 * 2 * 3 // 2    # C420
        assert len(meta["frames"]) == 5
        assert meta["duration_ms"] == 500              # 5 frames @ 10fps
        # frame payloads are where the parser says they are
        off, size = meta["frames"][3]
        assert raw[off:off + size] == bytes(
            (3 * 7 + i * 13) % 256 for i in range(size))

    def test_parse_rejects_garbage_and_truncation(self):
        from filodb_spark.operators.multimodal import parse_y4m, synth_y4m
        with pytest.raises(ValueError, match="not a YUV4MPEG2"):
            parse_y4m(b"RIFFxxxxWAVE")
        raw = synth_y4m(4, 2, n_frames=2)
        with pytest.raises(ValueError, match="truncated"):
            parse_y4m(raw[:-3])

    def test_real_backend_samples_actual_frames(self, spark):
        from filodb_spark.operators.multimodal import sample_frames, synth_y4m
        # 10 fps -> frame i covers [i*100, (i+1)*100) ms; sampling every
        # 250 ms picks frames 0, 2, 5, 7 at offsets 0/250/500/750
        raw = synth_y4m(4, 2, n_frames=8, fps_num=10, fps_den=1)
        df = spark.createDataFrame([(1, raw, None)],
                                   "doc_id long, content binary, "
                                   "duration_ms long")
        out = sorted((r["frame_ms"], bytes(r["frame"])) for r in
                     sample_frames(df, every_ms=250,
                                   decode_backend="real").collect())
        assert [o for o, _ in out] == [0, 250, 500, 750]
        fsz = 4 * 2 * 3 // 2
        for off, frame in out:
            idx = off * 10 // 1000
            assert frame == bytes(
                (idx * 7 + i * 13) % 256 for i in range(fsz))

    def test_parse_fuzz_roundtrip(self):
        """Randomized (seeded) geometry/rate/chroma battery: synth ->
        parse must recover the exact parameters and frame addressing;
        random byte corruption of the header must raise, not misparse."""
        import random
        from filodb_spark.operators.multimodal import parse_y4m, synth_y4m
        rng = random.Random(11)
        for _ in range(50):
            w = 2 * rng.randint(1, 16)
            h = 2 * rng.randint(1, 16)
            n = rng.randint(1, 12)
            num, den = rng.choice([(10, 1), (25, 1), (30000, 1001), (8, 1)])
            chroma = rng.choice(["420", "420jpeg", "422", "444", "mono"])
            raw = synth_y4m(w, h, n, num, den, chroma)
            meta = parse_y4m(raw)
            assert (meta["width"], meta["height"]) == (w, h)
            assert (meta["fps_num"], meta["fps_den"]) == (num, den)
            assert len(meta["frames"]) == n
            assert meta["duration_ms"] == n * 1000 * den // num
            last_off, fsz = meta["frames"][-1]
            assert last_off + fsz == len(raw)
            # corrupt one header byte (before first newline): ValueError
            # or a changed-but-consistent parse, never a crash
            pos = rng.randrange(0, raw.index(b"\n"))
            bad = raw[:pos] + bytes([raw[pos] ^ 0x41]) + raw[pos + 1:]
            try:
                parse_y4m(bad)
            except ValueError:
                pass

    def test_real_backend_rejects_compressed(self, spark):
        from filodb_spark.operators.multimodal import sample_frames
        df = spark.createDataFrame([(1, b"\x00\x00\x00\x18ftypmp42", 1000)],
                                   "doc_id long, content binary, "
                                   "duration_ms long")
        with pytest.raises(Exception, match="ffmpeg"):
            sample_frames(df, every_ms=100, decode_backend="real").collect()


class TestSampleFramesOnError:
    def test_skip_drops_corrupt_doc_keeps_batch(self, spark):
        from filodb_spark.operators.multimodal import (sample_frames,
                                                       synth_y4m)
        good = synth_y4m(8, 8, 3, fps_num=10, fps_den=1)
        corrupt = b"YUV4MPEG2 W8"      # magic, truncated header
        df = spark.createDataFrame(
            [(1, good, None), (2, corrupt, None)],
            "doc_id long, content binary, duration_ms long")
        out = sample_frames(df, 100, decode_backend="real",
                            on_error="skip").collect()
        assert out and {r["doc_id"] for r in out} == {1}

    def test_raise_default_fails_on_corrupt(self, spark):
        import pytest
        from py4j.protocol import Py4JJavaError
        from filodb_spark.operators.multimodal import sample_frames
        df = spark.createDataFrame(
            [(2, b"YUV4MPEG2 W8", None)],
            "doc_id long, content binary, duration_ms long")
        with pytest.raises(Exception):
            sample_frames(df, 100, decode_backend="real").collect()

    def test_bad_on_error_value(self, spark):
        import pytest
        from filodb_spark.operators.multimodal import sample_frames
        df = spark.createDataFrame(
            [(1, b"x", 10)], "doc_id long, content binary, duration_ms long")
        with pytest.raises(ValueError, match="on_error"):
            sample_frames(df, 100, on_error="ignore")
