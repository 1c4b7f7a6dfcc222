"""Prometheus remote-read endpoint support.

Reference: `POST /api/v1/read` returning snappy-compressed protobuf
(http/src/main/scala/filodb/http/PrometheusApiRoute.scala:130;
doc/http_api.md remote-read section). A ReadRequest carries one or more
Query messages (time range + label matchers); the response returns the
RAW samples of every matching series — no step grid, no functions.

Both wire formats are implemented from their public specs, since the
container has neither `protobuf` nor `snappy`:

- protobuf: varint / length-delimited encoding per the protobuf wire
  format, with the message/field numbers of the public
  prometheus/prompb/remote.proto + types.proto:
    ReadRequest{ repeated Query queries=1 }
    Query{ int64 start_timestamp_ms=1; int64 end_timestamp_ms=2;
           repeated LabelMatcher matchers=3 }
    LabelMatcher{ enum type=1 (EQ=0,NEQ=1,RE=2,NRE=3);
                  string name=2; string value=3 }
    ReadResponse{ repeated QueryResult results=1 }
    QueryResult{ repeated TimeSeries timeseries=1 }
    TimeSeries{ repeated Label labels=1; repeated Sample samples=2 }
    Label{ string name=1; string value=2 }
    Sample{ double value=1; int64 timestamp=2 }
- snappy: the block format. The compressor emits literal-only elements
  (valid per the format spec — copies are optional for a compressor);
  the decompressor handles the full element set (literals + all three
  copy forms) so real Prometheus clients' requests decode.
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------------
# varint / protobuf primitives
# --------------------------------------------------------------------------


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: bytes, i: int) -> tuple[int, int]:
    """Strict uvarint: raises ValueError on truncation (continuation
    bit set at end of buffer) and on encodings longer than the 10
    bytes a 64-bit value can need — a malformed field must fail
    cleanly, never mis-parse or scan past the message (fuzz battery:
    tests/test_remote_write_fuzz.py)."""
    shift = 0
    val = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint")
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            # take the low 64 bits like every conformant protobuf
            # decoder: a 10th byte with garbage high bits must not
            # overflow downstream to_bytes(8) calls
            return val & (1 << 64) - 1, i
        shift += 7
        if shift > 63:
            raise ValueError("over-long varint (>10 bytes)")


def _field(num: int, wire: int) -> bytes:
    return _uvarint(num << 3 | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _uvarint(len(payload)) + payload


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message body.
    value: int for varint(0)/fixed64(1, raw little-endian int),
    bytes for length-delimited(2).

    Strict: field number 0 is illegal in protobuf, and a fixed-width
    or length-delimited payload that runs past the buffer raises
    instead of silently truncating (a Python slice would hand back a
    SHORT value — a mis-parse, not an error)."""
    i = 0
    while i < len(buf):
        key, i = _read_uvarint(buf, i)
        num, wire = key >> 3, key & 7
        if num == 0:
            raise ValueError("illegal field number 0")
        if wire == 0:
            val, i = _read_uvarint(buf, i)
        elif wire == 1:
            if i + 8 > len(buf):
                raise ValueError("truncated fixed64")
            val = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wire == 2:
            ln, i = _read_uvarint(buf, i)
            if ln > len(buf) - i:
                raise ValueError(
                    f"length-delimited field claims {ln} bytes, "
                    f"{len(buf) - i} remain")
            val = buf[i:i + ln]
            i += ln
        elif wire == 5:
            if i + 4 > len(buf):
                raise ValueError("truncated fixed32")
            val = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield num, wire, val


# --------------------------------------------------------------------------
# snappy block format
# --------------------------------------------------------------------------


def snappy_compress(data: bytes) -> bytes:
    """Literal-only snappy block encoding (spec-valid, compression
    ratio 1.0 — fine for a dev/test serving path)."""
    out = bytearray(_uvarint(len(data)))
    i = 0
    while i < len(data):
        chunk = data[i:i + 65536]
        n = len(chunk) - 1
        if n < 60:
            out.append(n << 2)
        elif n < 1 << 8:
            out.append(60 << 2)
            out += n.to_bytes(1, "little")
        elif n < 1 << 16:
            out.append(61 << 2)
            out += n.to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += n.to_bytes(3, "little")
        out += chunk
        i += len(chunk)
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    total, i = _read_uvarint(data, 0)
    out = bytearray()
    while i < len(data):
        tag = data[i]
        i += 1
        kind = tag & 3
        if kind == 0:                     # literal
            n = tag >> 2
            if n >= 60:                   # 60/61/62/63 → 1/2/3/4 length bytes
                nbytes = n - 59
                if i + nbytes > len(data):
                    raise ValueError("snappy: truncated literal length")
                n = int.from_bytes(data[i:i + nbytes], "little")
                i += nbytes
            n += 1
            if i + n > len(data):
                raise ValueError("snappy: truncated literal body")
            out += data[i:i + n]
            i += n
        else:                             # copy
            if kind == 1:
                nbytes = 1
            elif kind == 2:
                nbytes = 2
            else:
                nbytes = 4
            if i + nbytes > len(data):
                raise ValueError("snappy: truncated copy offset")
            if kind == 1:
                n = ((tag >> 2) & 7) + 4
                off = ((tag >> 5) << 8) | data[i]
            elif kind == 2:
                n = (tag >> 2) + 1
                off = int.from_bytes(data[i:i + 2], "little")
            else:
                n = (tag >> 2) + 1
                off = int.from_bytes(data[i:i + 4], "little")
            i += nbytes
            if off == 0 or off > len(out):
                raise ValueError(f"snappy: copy offset {off} outside "
                                 f"the {len(out)} decoded bytes")
            for _ in range(n):            # byte-wise: offsets may overlap
                out.append(out[-off])
    if len(out) != total:
        raise ValueError(f"snappy: length mismatch {len(out)} != {total}")
    return bytes(out)


# --------------------------------------------------------------------------
# prompb messages
# --------------------------------------------------------------------------

_MATCHER_OPS = {0: "=", 1: "!=", 2: "=~", 3: "!~"}
_MATCHER_TYPES = {v: k for k, v in _MATCHER_OPS.items()}


SAMPLES = 0                  # prompb ReadRequest.ResponseType
STREAMED_XOR_CHUNKS = 1


def decode_accepted_types(raw: bytes) -> list[int]:
    """ReadRequest.accepted_response_types (field 2, packed or unpacked
    varints). Empty means the client only understands SAMPLES."""
    out: list[int] = []
    for num, wire, val in _iter_fields(raw):
        if num != 2:
            continue
        if wire == 0:
            out.append(val)
        elif wire == 2:                 # packed
            i = 0
            while i < len(val):
                v, i = _read_uvarint(val, i)
                out.append(v)
    return out


def decode_read_request(raw: bytes) -> list[dict]:
    """ReadRequest -> [{"start_ms", "end_ms", "matchers": [(op, name, value)]}]."""
    queries = []
    for num, _, val in _iter_fields(raw):
        if num != 1:
            continue
        q = {"start_ms": 0, "end_ms": 0, "matchers": []}
        for qn, _, qv in _iter_fields(val):
            if qn == 1:
                q["start_ms"] = qv
            elif qn == 2:
                q["end_ms"] = qv
            elif qn == 3:
                mtype, name, value = 0, "", ""
                for mn, _, mv in _iter_fields(qv):
                    if mn == 1:
                        mtype = mv
                    elif mn == 2:
                        name = mv.decode()
                    elif mn == 3:
                        value = mv.decode()
                q["matchers"].append((_MATCHER_OPS[mtype], name, value))
        queries.append(q)
    return queries


def encode_read_request(queries: list[dict],
                        accepted_types: list[int] = ()) -> bytes:
    """Inverse of decode_read_request (used by tests / as a client)."""
    out = b""
    for q in queries:
        body = _field(1, 0) + _uvarint(q["start_ms"]) \
             + _field(2, 0) + _uvarint(q["end_ms"])
        for op, name, value in q["matchers"]:
            m = _field(1, 0) + _uvarint(_MATCHER_TYPES[op]) \
              + _len_delim(2, name.encode()) + _len_delim(3, value.encode())
            body += _len_delim(3, m)
        out += _len_delim(1, body)
    if accepted_types:
        out += _len_delim(2, b"".join(_uvarint(t) for t in accepted_types))
    return out


def encode_read_response(results: list[list[tuple[dict, list]]]) -> bytes:
    """results: one entry per query — a list of
    (labels dict, [(ts_ms, value), ...]) series."""
    out = b""
    for series_list in results:
        qr = b""
        for labels, samples in series_list:
            ts_msg = b""
            for name in sorted(labels):
                ts_msg += _len_delim(1, _len_delim(1, name.encode())
                                     + _len_delim(2, str(labels[name]).encode()))
            for ts, value in samples:
                ts_msg += _len_delim(2, _field(1, 1)
                                     + struct.pack("<d", float(value))
                                     + _field(2, 0) + _uvarint(int(ts)))
            qr += _len_delim(1, ts_msg)
        out += _len_delim(1, qr)
    return out


def decode_read_response(raw: bytes) -> list[list[tuple[dict, list]]]:
    """Inverse of encode_read_response (used by tests / as a client)."""
    results = []
    for num, _, val in _iter_fields(raw):
        if num != 1:
            continue
        series_list = []
        for qn, _, qv in _iter_fields(val):
            if qn != 1:
                continue
            labels, samples = {}, []
            for tn, _, tv in _iter_fields(qv):
                if tn == 1:
                    name = value = ""
                    for ln, _, lv in _iter_fields(tv):
                        if ln == 1:
                            name = lv.decode()
                        elif ln == 2:
                            value = lv.decode()
                    labels[name] = value
                elif tn == 2:
                    v, ts = 0.0, 0
                    for sn, wire, sv in _iter_fields(tv):
                        if sn == 1:
                            v = struct.unpack("<d", sv.to_bytes(8, "little"))[0]
                        elif sn == 2:
                            ts = sv
                    samples.append((ts, v))
            series_list.append((labels, samples))
        results.append(series_list)
    return results


# --------------------------------------------------------------------------
# engine glue
# --------------------------------------------------------------------------


def _query_series(engine, q: dict) -> list[tuple[dict, list]]:
    """One ReadRequest Query -> sorted [(labels, [(ts, value)])]. Series
    grouping + in-series ordering happen in one Spark aggregation
    (sort_array over collected structs), so the scan parallelizes and
    only final series rows are collected."""
    from pyspark.sql import functions as F

    from filodb_spark.promql import ast as A

    metric = None
    matchers = []
    for op, name, value in q["matchers"]:
        if name == "__name__" and op == "=" and metric is None:
            metric = value
        else:
            matchers.append(A.LabelMatcher(name, op, value))
    sel = A.VectorSelector(metric, tuple(matchers))
    df = (engine.store.select(sel)
          .where(F.col("ts").between(q["start_ms"], q["end_ms"]))
          .where(~F.isnan("value")))
    rows = (df.groupBy("labels")
              .agg(F.sort_array(F.collect_list(F.struct("ts", "value")))
                    .alias("samples"))
              .collect())
    series = [(dict(r["labels"]),
               [(s["ts"], s["value"]) for s in r["samples"]])
              for r in rows]
    series.sort(key=lambda kv: sorted(kv[0].items()))
    return series


def run_read_request(engine, body: bytes) -> bytes:
    """snappy(ReadRequest) -> snappy(ReadResponse) against the engine's
    store. Raw samples per series (SAMPLES response type)."""
    results = [_query_series(engine, q)
               for q in decode_read_request(snappy_decompress(body))]
    return snappy_compress(encode_read_response(results))


def run_read_request_streamed(engine, body: bytes) -> bytes:
    """snappy(ReadRequest) -> framed STREAMED_XOR_CHUNKS stream (NOT
    snappy-compressed — the chunk encoding already compresses; framing
    per filodb_spark.xor_chunks). One frame per series."""
    from filodb_spark import xor_chunks as xc

    out = bytearray()
    for qi, q in enumerate(decode_read_request(snappy_decompress(body))):
        for series in _query_series(engine, q):
            msg = xc.encode_chunked_read_response([series], qi)
            out += xc.frame_message(msg)
    return bytes(out)
