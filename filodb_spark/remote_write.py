"""Prometheus remote-write ingestion (prompb WriteRequest over
snappy+protobuf) — the wire format the reference's gateway family
accepts alongside Influx line protocol (gateway/src/main/scala/filodb/
gateway/GatewayServer.scala routes decoded records into the ingestion
stream; conversion/PrometheusInputRecord.scala is the record shape).

Self-contained codecs on the same varint/length-delimited primitives as
remote_read.py — no protobuf/snappy libraries. The TimeSeries message
here is wire-identical to the read response's inner TimeSeries
(labels = field 1, samples = field 2), per prompb/remote.proto vs
types.proto.

Two ingestion shapes:
- WriteBuffer: the single-process dev/test sink behind
  POST /api/v1/write (http_server) — decode on arrival, accumulate
  rows, expose a DataFrame/TsStore. Driver-side by design; its job is
  the protocol, not the throughput.
- frames_to_records: the SCALE path — a DataFrame of raw request
  bodies (landed via Kafka/object storage, exactly how the reference
  fans the gateway out) decoded in parallel with an Arrow-batched
  mapInPandas. Python is acceptable here for the same reason as the
  multimodal codec layer: protobuf decode is byte-cursor work no SQL
  expression can express, and it rides the codec boundary, never the
  query hot path.
"""

from __future__ import annotations

import struct

from filodb_spark.remote_read import (_field, _iter_fields, _len_delim,
                                      snappy_compress, snappy_decompress,
                                      _uvarint)

__all__ = ["encode_write_request", "decode_write_request",
           "WriteBuffer", "frames_to_records", "records_to_frames",
           "RECORD_SCHEMA"]

RECORD_SCHEMA = "labels map<string,string>, ts long, value double"


def _encode_samples_py(samples) -> bytes:
    """Scalar sample encoder — the reference form the vectorized path
    must match byte-for-byte (differential-tested in
    tests/test_remote_write.py); used for short sample lists where
    numpy setup costs more than it saves."""
    out = b""
    for ts, value in samples:
        # protobuf int64: negatives go out as the 10-byte varint of
        # the 64-bit two's complement (an unmasked negative Python
        # int would loop _uvarint forever — n >>= 7 never hits 0)
        out += _len_delim(2, _field(1, 1)
                          + struct.pack("<d", float(value))
                          + _field(2, 0)
                          + _uvarint(int(ts) & (1 << 64) - 1))
    return out


_NP_MIN = 16   # below this the scalar loop wins (numpy call overhead)


def _encode_samples_np(samples) -> bytes:
    """Vectorized sample encoder (guide §4.2: per-sample byte work out
    of interpreted Python). Emits exactly the scalar layout: each
    sample is [0x12][len][0x09][8B LE double][0x10][uvarint ts] where
    len = 10 + varint_len(ts) <= 20 (always a 1-byte length varint)."""
    import numpy as np
    n = len(samples)
    mask64 = (1 << 64) - 1
    ts = np.fromiter((int(t) & mask64 for t, _ in samples),
                     dtype=np.uint64, count=n)
    vals = np.fromiter((float(v) for _, v in samples),
                       dtype=np.float64, count=n)
    # 10 little-endian 7-bit lanes per ts; varint length = index of the
    # highest non-zero lane + 1 (1 for ts == 0)
    lanes = np.empty((n, 10), dtype=np.uint8)
    tmp = ts.copy()
    for k in range(10):
        lanes[:, k] = (tmp & np.uint64(0x7F)).astype(np.uint8)
        tmp >>= np.uint64(7)
    nbytes = np.where(ts == 0, 1,
                      10 - np.argmax(lanes[:, ::-1] != 0, axis=1))
    k_idx = np.arange(10)
    lanes |= (k_idx[None, :] < (nbytes - 1)[:, None]).astype(np.uint8) << 7
    mat = np.empty((n, 22), dtype=np.uint8)
    mat[:, 0] = 0x12                                 # field 2, wire 2
    mat[:, 1] = (10 + nbytes).astype(np.uint8)       # 1-byte msg length
    mat[:, 2] = 0x09                                 # field 1, fixed64
    mat[:, 3:11] = vals.astype("<f8").view(np.uint8).reshape(n, 8)
    mat[:, 11] = 0x10                                # field 2, varint
    mat[:, 12:] = lanes
    keep = np.ones((n, 22), dtype=bool)
    keep[:, 12:] = k_idx[None, :] < nbytes[:, None]
    return mat[keep].tobytes()                       # row-major: in order


def encode_write_request(series: list[tuple[dict, list]]) -> bytes:
    """series: [(labels dict, [(ts_ms, value), ...]), ...] -> raw
    (uncompressed) WriteRequest bytes. Callers POST
    snappy_compress(encode_write_request(...)) like a real Prometheus."""
    parts = []
    for labels, samples in series:
        ts_msg = b""
        for name in sorted(labels):
            ts_msg += _len_delim(1, _len_delim(1, name.encode())
                                 + _len_delim(2, str(labels[name]).encode()))
        ts_msg += (_encode_samples_np(samples)
                   if len(samples) >= _NP_MIN
                   else _encode_samples_py(samples))
        parts.append(_len_delim(1, ts_msg))
    return b"".join(parts)


def _decode_series_fast(buf: bytes):
    """Vectorized decoder for the CANONICAL TimeSeries layout (what
    encode_write_request and real Prometheus senders emit): a leading
    run of Label submessages (key 0x0A, 1-byte lengths), then a run of
    Sample submessages each exactly [0x12][len][0x09][8B LE double]
    [0x10][uvarint ts]. Returns None on ANY deviation — the caller
    falls back to the strict field-by-field parser, so this path only
    accepts byte sequences the strict parser would decode to the same
    value (the lane-structure checks below reject every varint whose
    strict parse would end at a different byte). Guide §4.2: the
    per-sample byte-cursor work moves from interpreted Python to numpy.
    """
    import numpy as np
    n = len(buf)
    labels = {}
    i = 0
    while i < n and buf[i] == 0x0A:          # Label, field 1 wire 2
        if i + 1 >= n:
            return None
        ln = buf[i + 1]
        if ln >= 0x80 or i + 2 + ln > n:     # multi-byte length: punt
            return None
        name = value = ""
        for fn, fw, fv in _iter_fields(buf[i + 2:i + 2 + ln]):
            if fn in (1, 2) and fw != 2:
                return None                  # strict path raises; let it
            if fn == 1:
                name = fv.decode()
            elif fn == 2:
                value = fv.decode()
        labels[name] = value
        i += 2 + ln
    starts = []
    j = i
    while j < n and buf[j] == 0x12:          # Sample, field 2 wire 2
        if j + 1 >= n:
            return None
        ln = buf[j + 1]
        # canonical sample: 1+8 (value) + 1 + varint(1..10) = 11..20
        if ln < 11 or ln > 20 or j + 2 + ln > n:
            return None
        starts.append(j)
        j += 2 + ln
    if j != n:                               # trailing/interleaved field
        return None
    if not starts:
        return labels, []
    b = np.frombuffer(buf, dtype=np.uint8)
    st = np.asarray(starts, dtype=np.int64)
    nb = b[st + 1].astype(np.int64) - 10     # ts varint byte count 1..10
    if (b[st + 2] != 0x09).any() or (b[st + 11] != 0x10).any():
        return None
    vals = b[(st + 3)[:, None] + np.arange(8)].copy().view("<f8").ravel()
    lanes = b[np.minimum((st + 12)[:, None] + np.arange(10),
                         np.int64(n - 1))]
    k = np.arange(10)
    inside = k[None, :] < (nb - 1)[:, None]  # non-final varint bytes
    last = k[None, :] == (nb - 1)[:, None]
    cont = (lanes & 0x80) != 0
    # a strict parse must END exactly at the record end: every non-final
    # byte carries the continuation bit, the final byte does not
    if not ((cont | ~inside).all() and ((~cont) | ~last).all()):
        return None
    m = k[None, :] < nb[:, None]
    u = ((lanes & 0x7F).astype(np.uint64)
         << (7 * k).astype(np.uint64)[None, :])
    u = np.where(m, u, np.uint64(0)).sum(axis=1, dtype=np.uint64)
    ts = u.view(np.int64)    # reinterpret == the strict sign-extension
    return labels, list(zip(ts.tolist(), vals.tolist()))


def decode_write_request(raw: bytes) -> list[tuple[dict, list]]:
    """Raw (uncompressed) WriteRequest bytes ->
    [(labels dict, [(ts_ms, value), ...]), ...]."""
    out = []
    for num, wire, val in _iter_fields(raw):
        if num != 1:
            continue
        if wire != 2:   # a TimeSeries is length-delimited, nothing else
            raise ValueError(f"WriteRequest.timeseries has wire {wire}")
        try:
            fast = _decode_series_fast(val)
        except ValueError:       # any malformed inner byte: the strict
            fast = None          # parser below reproduces the error
        if fast is not None:
            out.append(fast)
            continue
        labels, samples = {}, []
        for tn, tw, tv in _iter_fields(val):
            if tn in (1, 2) and tw != 2:
                raise ValueError(f"TimeSeries field {tn} has wire {tw}")
            if tn == 1:
                name = value = ""
                for ln, lw, lv in _iter_fields(tv):
                    if ln in (1, 2) and lw != 2:
                        raise ValueError(f"Label field {ln} has "
                                         f"wire {lw}")
                    if ln == 1:
                        name = lv.decode()
                    elif ln == 2:
                        value = lv.decode()
                labels[name] = value
            elif tn == 2:
                v, ts = 0.0, 0
                for sn, sw, sv in _iter_fields(tv):
                    if sn == 1:
                        if sw != 1:
                            raise ValueError("Sample.value must be "
                                             f"fixed64, got wire {sw}")
                        v = struct.unpack("<d",
                                          sv.to_bytes(8, "little"))[0]
                    elif sn == 2:
                        if sw != 0:
                            raise ValueError("Sample.timestamp must be "
                                             f"varint, got wire {sw}")
                        # sign-extend: a real prompb negative int64
                        # arrives as a 10-byte two's-complement varint
                        ts = sv - (1 << 64) if sv >= 1 << 63 else sv
                samples.append((ts, v))
        out.append((labels, samples))
    return out


def _body_to_rows(body: bytes) -> list[tuple[dict, int, float]]:
    """One snappy-compressed WriteRequest -> flat (labels, ts, value)
    rows — the record shape every TsStore ingests."""
    rows = []
    for labels, samples in decode_write_request(snappy_decompress(body)):
        for ts, value in samples:
            rows.append((labels, int(ts), float(value)))
    return rows


class WriteBuffer:
    """Dev/test remote-write sink: accumulates decoded samples and
    exposes them as a DataFrame (or TsStore) for querying. Single
    process on purpose — production ingest lands request bodies in
    Kafka/object storage and decodes them with frames_to_records."""

    def __init__(self, spark, max_rows: int = 10_000_000):
        import threading
        self._spark = spark
        self._rows: list[tuple[dict, int, float]] = []
        self._max_rows = max_rows
        # the HTTP server is ThreadingHTTPServer: concurrent /write
        # requests append from different threads, and the capacity
        # check + extend must be one atomic step or racing writers can
        # overshoot max_rows (the cap exists to bound driver memory)
        self._lock = threading.Lock()

    def append(self, body: bytes) -> int:
        """Ingest one snappy-compressed WriteRequest; returns the
        number of samples accepted. Raises once the buffer would exceed
        max_rows — repeated writes must not exhaust driver memory (the
        scale path is frames_to_records, not this sink)."""
        rows = _body_to_rows(body)
        with self._lock:
            if len(self._rows) + len(rows) > self._max_rows:
                raise ValueError(
                    f"WriteBuffer full ({len(self._rows)} rows, max "
                    f"{self._max_rows}); drain it or use frames_to_records")
            self._rows.extend(rows)
        return len(rows)

    @property
    def n_samples(self) -> int:
        return len(self._rows)

    def to_df(self):
        return self._spark.createDataFrame(self._rows or [], RECORD_SCHEMA)

    def to_store(self):
        from filodb_spark.promql.compiler import TsStore
        return TsStore(self.to_df())


def frames_to_records(frames):
    """DataFrame['body': binary] of snappy-compressed WriteRequests ->
    DataFrame(labels, ts, value). Arrow-batched mapInPandas: each
    partition decodes its own request bodies, so ingest parallelism ==
    the partitioning of the landed frames (Kafka partitions / object
    keys) — no driver involvement, no shuffle."""
    import pandas as pd

    def decode(batches):
        for pdf in batches:
            out = {"labels": [], "ts": [], "value": []}
            for body in pdf["body"]:
                for labels, ts, value in _body_to_rows(bytes(body)):
                    out["labels"].append(labels)
                    out["ts"].append(ts)
                    out["value"].append(value)
            yield pd.DataFrame(out)

    return frames.mapInPandas(decode, RECORD_SCHEMA)


def records_to_frames(records):
    """Inverse of frames_to_records: DataFrame(labels, ts, value) ->
    DataFrame['body': binary] with one snappy-compressed WriteRequest
    per Arrow batch — the shape a remote-write EXPORTER (or a
    replication/backfill job) emits. Series grouping is per batch;
    a consumer that needs whole series per frame repartitions by a
    series key first."""
    import pandas as pd

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            series: dict = {}
            for labels, ts, value in zip(pdf["labels"], pdf["ts"],
                                         pdf["value"]):
                key = tuple(sorted(labels.items()))
                series.setdefault(key, []).append((int(ts), float(value)))
            body = snappy_compress(encode_write_request(
                [(dict(k), v) for k, v in sorted(series.items())]))
            yield pd.DataFrame({"body": [body]})

    return records.mapInPandas(encode, "body binary")
