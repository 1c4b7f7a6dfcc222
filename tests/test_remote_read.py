"""Remote-read tests: protobuf/snappy codecs round-trip, snappy copy
decoding, and the full POST /api/v1/read path over a real socket."""

import urllib.request

import pytest

from filodb_spark.remote_read import (decode_read_request,
                                      decode_read_response,
                                      encode_read_request,
                                      encode_read_response, run_read_request,
                                      snappy_compress, snappy_decompress)


class TestCodecs:
    def test_snappy_roundtrip(self):
        for data in (b"", b"x", b"hello world" * 10, bytes(range(256)) * 300):
            assert snappy_decompress(snappy_compress(data)) == data

    def test_snappy_copy_elements(self):
        # hand-built stream using all three copy forms (what a real
        # client's compressor emits): "abcd" + copy1(len 4, off 4)
        # + copy2(len 4, off 8) + copy4(len 4, off 4)
        raw = bytes([16,                     # uncompressed length 16
                     (4 - 1) << 2]) + b"abcd" \
            + bytes([0b001 | ((4 - 4) << 2), 4]) \
            + bytes([0b010 | ((4 - 1) << 2), 8, 0]) \
            + bytes([0b011 | ((4 - 1) << 2), 4, 0, 0, 0])
        assert snappy_decompress(raw) == b"abcd" * 4

    def test_snappy_overlapping_copy(self):
        # RLE-style: 1-byte literal + copy with offset 1, length 7
        raw = bytes([8, 0 << 2]) + b"z" + bytes([0b001 | ((7 - 4) << 2), 1])
        assert snappy_decompress(raw) == b"z" * 8

    def test_request_roundtrip(self):
        queries = [{"start_ms": 1704067200000, "end_ms": 1706486400000,
                    "matchers": [("=", "__name__", "purchase"),
                                 ("=~", "user", "1|2"),
                                 ("!=", "dc", "eu")]}]
        assert decode_read_request(encode_read_request(queries)) == queries

    def test_response_roundtrip(self):
        results = [[({"__name__": "m", "job": "x"},
                     [(1000, 1.5), (2000, float("inf"))])],
                   []]
        assert decode_read_response(encode_read_response(results)) == results


class TestRemoteRead:
    @pytest.fixture(scope="class")
    def engine(self, spark):
        from filodb_spark.promql import PromQLEngine
        from filodb_spark.promql.compiler import TsStore
        from filodb_spark.tsdf import events_labels_ts
        df = events_labels_ts(spark, "/root/testdata/sf0.001")
        return PromQLEngine(spark, TsStore(df))

    def test_raw_samples(self, engine):
        body = snappy_compress(encode_read_request([{
            "start_ms": 1704067200000, "end_ms": 1706486400000,
            "matchers": [("=", "__name__", "purchase"), ("=", "user", "3")]}]))
        results = decode_read_response(
            snappy_decompress(run_read_request(engine, body)))
        assert len(results) == 1
        [(labels, samples)] = results[0]
        assert labels == {"__name__": "purchase", "user": "3"}
        assert len(samples) > 0
        assert samples == sorted(samples)          # in-series ts order
        assert all(1704067200000 <= ts <= 1706486400000 for ts, _ in samples)

    def test_multi_query_and_regex(self, engine):
        body = snappy_compress(encode_read_request([
            {"start_ms": 1704067200000, "end_ms": 1706486400000,
             "matchers": [("=", "__name__", "purchase"),
                          ("=~", "user", "1|3")]},
            {"start_ms": 0, "end_ms": 1,
             "matchers": [("=", "__name__", "purchase")]}]))
        results = decode_read_response(
            snappy_decompress(run_read_request(engine, body)))
        assert len(results) == 2
        assert sorted(s[0]["user"] for s in results[0]) == ["1", "3"]
        assert results[1] == []                    # empty range -> no series

    def test_http_post(self, engine):
        from filodb_spark.http_server import serve
        srv = serve(engine)
        base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
        try:
            body = snappy_compress(encode_read_request([{
                "start_ms": 1704067200000, "end_ms": 1706486400000,
                "matchers": [("=", "__name__", "error")]}]))
            req = urllib.request.Request(
                f"{base}/api/v1/read", data=body, method="POST",
                headers={"Content-Type": "application/x-protobuf",
                         "Content-Encoding": "snappy"})
            with urllib.request.urlopen(req, timeout=120) as r:
                assert r.status == 200
                assert r.headers["Content-Type"] == "application/x-protobuf"
                results = decode_read_response(snappy_decompress(r.read()))
            assert len(results) == 1 and len(results[0]) > 0
            assert all(s[0]["__name__"] == "error" for s in results[0])
        finally:
            srv.shutdown()
