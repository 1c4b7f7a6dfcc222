"""XOR chunk codec tests: bit-level round-trips (incl. adversarial
timestamp/value patterns via hypothesis), frame CRC verification, and
the full STREAMED_XOR_CHUNKS negotiation over a real socket."""

import math
import struct
import urllib.request

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from filodb_spark.remote_read import (STREAMED_XOR_CHUNKS,
                                      encode_read_request, snappy_compress)
from filodb_spark.xor_chunks import (crc32c, decode_streamed_response,
                                     decode_xor_chunk, encode_xor_chunk,
                                     frame_message, iter_frames)


def roundtrip(samples):
    got = decode_xor_chunk(encode_xor_chunk(samples))
    assert len(got) == len(samples)
    for (t0, v0), (t1, v1) in zip(samples, got):
        assert t0 == t1
        assert (math.isnan(v0) and math.isnan(v1)) or v0 == v1


class TestXorChunk:
    def test_empty_and_single(self):
        roundtrip([])
        roundtrip([(1704067200000, 42.5)])

    def test_regular_series(self):
        roundtrip([(1704067200000 + i * 10_000, 50.0 + i) for i in range(500)])

    def test_constant_values(self):
        # delta == 0 path: single '0' bit per sample
        samples = [(i * 15_000, 7.25) for i in range(300)]
        data = encode_xor_chunk(samples)
        assert len(data) < 100           # dod=0 + xor=0 ≈ 2 bits/sample
        roundtrip(samples)

    def test_irregular_timestamps_all_dod_widths(self):
        # deltas chosen to hit the 14/17/20/64-bit dod branches
        ts, t = [], 0
        for d in [1, 10_000, 10_000, 18_000, 80_000, 600_000, 2 ** 40, 1]:
            t += d
            ts.append(t)
        roundtrip([(t, float(i)) for i, t in enumerate(ts)])

    def test_special_values(self):
        roundtrip([(i * 1000, v) for i, v in enumerate(
            [0.0, -0.0, float("inf"), float("-inf"), float("nan"),
             5e-324, 1.7976931348623157e308, 1.0, -1.0])])

    def test_descending_timestamps_rejected(self):
        with pytest.raises(ValueError):
            encode_xor_chunk([(1000, 1.0), (500, 2.0)])

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(min_value=1, max_value=2 ** 41),
                  st.floats(allow_nan=False, width=64)),
        min_size=0, max_size=120))
    def test_property_roundtrip(self, deltas_vals):
        t, samples = 0, []
        for dt, v in deltas_vals:
            t += dt
            samples.append((t, v))
        roundtrip(samples)


class TestFraming:
    def test_crc32c_known_vector(self):
        # RFC 3720 test vector: 32 zero bytes
        assert crc32c(bytes(32)) == 0x8A9136AA
        assert crc32c(b"123456789") == 0xE3069283

    def test_frame_roundtrip(self):
        msgs = [b"", b"a", b"hello" * 100]
        stream = b"".join(frame_message(m) for m in msgs)
        assert list(iter_frames(stream)) == msgs

    def test_frame_crc_mismatch(self):
        bad = bytearray(frame_message(b"payload"))
        bad[-1] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            list(iter_frames(bytes(bad)))


class TestStreamedRemoteRead:
    @pytest.fixture(scope="class")
    def engine(self, spark):
        from filodb_spark.promql import PromQLEngine
        from filodb_spark.promql.compiler import TsStore
        from filodb_spark.tsdf import events_labels_ts
        df = events_labels_ts(spark, "/root/testdata/sf0.001")
        return PromQLEngine(spark, TsStore(df))

    def test_streamed_matches_samples(self, engine):
        from filodb_spark.remote_read import (decode_read_response,
                                              run_read_request,
                                              run_read_request_streamed,
                                              snappy_decompress)
        q = [{"start_ms": 1704067200000, "end_ms": 1706486400000,
              "matchers": [("=", "__name__", "purchase"),
                           ("=~", "user", "1|3")]}]
        plain = decode_read_response(snappy_decompress(
            run_read_request(engine, snappy_compress(encode_read_request(q)))))
        streamed = decode_streamed_response(run_read_request_streamed(
            engine, snappy_compress(
                encode_read_request(q, [STREAMED_XOR_CHUNKS]))))
        assert len(streamed) == 1
        assert sorted(map(repr, streamed[0])) == sorted(map(repr, plain[0]))

    def test_http_negotiation(self, engine):
        from filodb_spark.http_server import serve
        srv = serve(engine)
        base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
        try:
            def post(accepted):
                body = snappy_compress(encode_read_request([{
                    "start_ms": 1704067200000, "end_ms": 1706486400000,
                    "matchers": [("=", "__name__", "error")]}], accepted))
                req = urllib.request.Request(
                    f"{base}/api/v1/read", data=body, method="POST",
                    headers={"Content-Type": "application/x-protobuf",
                             "Content-Encoding": "snappy"})
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.headers["Content-Type"], r.read()

            ctype, body = post([STREAMED_XOR_CHUNKS])
            assert ctype.startswith("application/x-streamed-protobuf")
            results = decode_streamed_response(body)
            assert len(results) == 1 and len(results[0]) > 0
            assert all(s[0]["__name__"] == "error" for s in results[0])
            # no accepted types -> SAMPLES fallback
            ctype2, _ = post([])
            assert ctype2 == "application/x-protobuf"
        finally:
            srv.shutdown()
