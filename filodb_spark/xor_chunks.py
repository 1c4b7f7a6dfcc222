"""Gorilla/XOR chunk codec + streamed remote-read support.

The reference stores series as compressed columnar chunks — delta-delta
timestamps and XOR-style doubles (core/src/main/scala/filodb.memory/
format/vectors/DeltaDeltaVector.scala:14-27, DoubleVector.scala). Our
store keeps Parquet (SURVEY §1.1), but the *wire* chunk format matters
for remote-read interop: Prometheus negotiates a STREAMED_XOR_CHUNKS
response type whose payload is the public Gorilla-derived XOR chunk
encoding (Facebook Gorilla paper §4.1; Prometheus tsdb chunkenc "xor"
format). Everything here is implemented from those public specs:

- XOR chunk: 2-byte BE sample count; first sample = zigzag-varint ts +
  raw 64-bit value; second = uvarint ts-delta + XOR-coded value;
  rest = delta-of-delta with prefix codes {0, 10+14b, 110+17b,
  1110+20b, 1111+64b} + XOR-coded value (leading/trailing-zero window
  reuse, 5-bit leading + 6-bit sigbits block header, sigbits 64
  encoded as 0).
- Stream framing: uvarint(length) + 4-byte BE CRC32-Castagnoli(data) +
  data, one frame per ChunkedReadResponse protobuf message.
- prompb: ChunkedReadResponse{chunked_series=1, query_index=2},
  ChunkedSeries{labels=1, chunks=2}, Chunk{min_time_ms=1,
  max_time_ms=2, type=3 (XOR=1), data=4}.

Samples-per-chunk defaults to 120 (the tsdb head-chunk target).
"""

from __future__ import annotations

import struct

from filodb_spark.remote_read import (_field, _iter_fields, _len_delim,
                                      _read_uvarint, _uvarint)

XOR_ENCODING = 1          # prompb Chunk.Encoding.XOR
SAMPLES_PER_CHUNK = 120

# --------------------------------------------------------------------------
# bit stream (MSB-first, matching the tsdb bstream)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self._out = bytearray()
        self._nbits = 0          # bits used in the last byte

    def write_bit(self, bit: int) -> None:
        if self._nbits == 0:
            self._out.append(0)
            self._nbits = 8
        self._nbits -= 1
        if bit:
            self._out[-1] |= 1 << self._nbits

    def write_bits(self, value: int, nbits: int) -> None:
        value &= (1 << nbits) - 1
        for i in range(nbits - 1, -1, -1):
            self.write_bit((value >> i) & 1)

    def write_byte(self, b: int) -> None:
        self.write_bits(b, 8)

    def write_uvarint(self, n: int) -> None:
        for b in _uvarint(n):
            self.write_byte(b)

    def write_varint(self, n: int) -> None:
        # zigzag (Go binary.PutVarint)
        self.write_uvarint((n << 1) ^ (n >> 63) if n >= 0
                           else ((-n) << 1) - 1)

    def bytes(self) -> bytes:
        return bytes(self._out)


class _BitReader:
    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0            # bit position

    def read_bit(self) -> int:
        byte = self._data[self._pos >> 3]
        bit = (byte >> (7 - (self._pos & 7))) & 1
        self._pos += 1
        return bit

    def read_bits(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v

    def read_byte(self) -> int:
        return self.read_bits(8)

    def read_uvarint(self) -> int:
        shift = val = 0
        while True:
            b = self.read_byte()
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val
            shift += 7

    def read_varint(self) -> int:
        u = self.read_uvarint()
        return (u >> 1) ^ -(u & 1)


# --------------------------------------------------------------------------
# XOR chunk encode/decode
# --------------------------------------------------------------------------


def _f2b(v: float) -> int:
    return struct.unpack(">Q", struct.pack(">d", v))[0]


def _b2f(b: int) -> float:
    return struct.unpack(">d", struct.pack(">Q", b))[0]


def _bit_range(x: int, nbits: int) -> bool:
    return -((1 << (nbits - 1)) - 1) <= x <= 1 << (nbits - 1)


def encode_xor_chunk(samples: list[tuple[int, float]]) -> bytes:
    """samples: [(ts_ms, value)] ascending by ts. Returns chunk data
    (the prompb Chunk.data payload, including the 2-byte count)."""
    if len(samples) > 0xFFFF:
        raise ValueError("XOR chunk overflow: > 65535 samples")
    w = _BitWriter()
    w.write_byte(len(samples) >> 8)
    w.write_byte(len(samples) & 0xFF)
    prev_t = prev_tdelta = 0
    prev_vbits = 0
    leading, trailing = 0xFF, 0
    for i, (t, v) in enumerate(samples):
        t = int(t)
        vbits = _f2b(float(v))
        if i == 0:
            w.write_varint(t)
            w.write_bits(vbits, 64)
        else:
            tdelta = t - prev_t
            if tdelta < 0:
                raise ValueError("XOR chunk requires ascending timestamps")
            if i == 1:
                w.write_uvarint(tdelta)
            else:
                dod = tdelta - prev_tdelta
                if dod == 0:
                    w.write_bit(0)
                elif _bit_range(dod, 14):
                    w.write_bits(0b10, 2)
                    w.write_bits(dod, 14)
                elif _bit_range(dod, 17):
                    w.write_bits(0b110, 3)
                    w.write_bits(dod, 17)
                elif _bit_range(dod, 20):
                    w.write_bits(0b1110, 4)
                    w.write_bits(dod, 20)
                else:
                    w.write_bits(0b1111, 4)
                    w.write_bits(dod, 64)
            prev_tdelta = tdelta
            # value: XOR against previous
            delta = vbits ^ prev_vbits
            if delta == 0:
                w.write_bit(0)
            else:
                w.write_bit(1)
                new_leading = 64 - delta.bit_length()
                new_trailing = (delta & -delta).bit_length() - 1
                if new_leading >= 32:
                    new_leading = 31
                if leading != 0xFF and new_leading >= leading \
                        and new_trailing >= trailing:
                    w.write_bit(0)
                    w.write_bits(delta >> trailing, 64 - leading - trailing)
                else:
                    leading, trailing = new_leading, new_trailing
                    w.write_bit(1)
                    w.write_bits(new_leading, 5)
                    sigbits = 64 - new_leading - new_trailing
                    w.write_bits(sigbits, 6)   # 64 wraps to 0 by design
                    w.write_bits(delta >> new_trailing, sigbits)
        prev_t, prev_vbits = t, vbits
    return w.bytes()


def decode_xor_chunk(data: bytes) -> list[tuple[int, float]]:
    r = _BitReader(data)
    num = (r.read_byte() << 8) | r.read_byte()
    out: list[tuple[int, float]] = []
    t = tdelta = 0
    vbits = 0
    leading = trailing = 0
    for i in range(num):
        if i == 0:
            t = r.read_varint()
            vbits = r.read_bits(64)
        else:
            if i == 1:
                tdelta = r.read_uvarint()
            else:
                d = 0
                for _ in range(4):
                    d <<= 1
                    if not r.read_bit():
                        break
                    d |= 1
                if d == 0b0:
                    dod = 0
                elif d == 0b1111:
                    bits = r.read_bits(64)
                    dod = bits - (1 << 64) if bits >> 63 else bits
                else:
                    sz = {0b10: 14, 0b110: 17, 0b1110: 20}[d]
                    bits = r.read_bits(sz)
                    dod = bits - (1 << sz) if bits > (1 << (sz - 1)) else bits
                tdelta += dod
            t += tdelta
            if r.read_bit():
                if r.read_bit():
                    leading = r.read_bits(5)
                    mbits = r.read_bits(6)
                    if mbits == 0:
                        mbits = 64
                    trailing = 64 - leading - mbits
                mbits = 64 - leading - trailing
                vbits ^= r.read_bits(mbits) << trailing
        out.append((t, _b2f(vbits)))
    return out


# --------------------------------------------------------------------------
# CRC32-Castagnoli + stream framing
# --------------------------------------------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = (c >> 8) ^ _CRC_TABLE[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


def frame_message(msg: bytes) -> bytes:
    """uvarint(len) + BE crc32c + payload (the chunked stream framing)."""
    return _uvarint(len(msg)) + struct.pack(">I", crc32c(msg)) + msg


def iter_frames(stream: bytes):
    """Yield payloads of a framed stream, verifying checksums."""
    i = 0
    while i < len(stream):
        ln, i = _read_uvarint(stream, i)
        crc = struct.unpack(">I", stream[i:i + 4])[0]
        i += 4
        msg = stream[i:i + ln]
        i += ln
        if crc32c(msg) != crc:
            raise ValueError("chunked stream: CRC mismatch")
        yield msg


# --------------------------------------------------------------------------
# prompb chunked messages
# --------------------------------------------------------------------------


def encode_chunked_read_response(series_list, query_index: int) -> bytes:
    """series_list: [(labels dict, [(ts_ms, value), ...])]. Splits each
    series into XOR chunks of SAMPLES_PER_CHUNK."""
    body = b""
    for labels, samples in series_list:
        s = b""
        for name in sorted(labels):
            s += _len_delim(1, _len_delim(1, name.encode())
                            + _len_delim(2, str(labels[name]).encode()))
        for off in range(0, len(samples), SAMPLES_PER_CHUNK):
            part = samples[off:off + SAMPLES_PER_CHUNK]
            chunk = (_field(1, 0) + _uvarint(int(part[0][0]))
                     + _field(2, 0) + _uvarint(int(part[-1][0]))
                     + _field(3, 0) + _uvarint(XOR_ENCODING)
                     + _len_delim(4, encode_xor_chunk(part)))
            s += _len_delim(2, chunk)
        body += _len_delim(1, s)
    return body + _field(2, 0) + _uvarint(query_index)


def decode_chunked_read_response(raw: bytes):
    """-> (series_list, query_index) with chunks decoded back to samples."""
    series_list = []
    query_index = 0
    for num, _, val in _iter_fields(raw):
        if num == 2:
            query_index = val
            continue
        if num != 1:
            continue
        labels, samples = {}, []
        for sn, _, sv in _iter_fields(val):
            if sn == 1:
                name = value = ""
                for ln, _, lv in _iter_fields(sv):
                    if ln == 1:
                        name = lv.decode()
                    elif ln == 2:
                        value = lv.decode()
                labels[name] = value
            elif sn == 2:
                enc, data = 0, b""
                for cn, _, cv in _iter_fields(sv):
                    if cn == 3:
                        enc = cv
                    elif cn == 4:
                        data = cv
                if enc != XOR_ENCODING:
                    raise ValueError(f"unsupported chunk encoding {enc}")
                samples.extend(decode_xor_chunk(data))
        series_list.append((labels, samples))
    return series_list, query_index


def decode_streamed_response(stream: bytes):
    """Full framed stream -> [[(labels, samples)] per query_index]."""
    by_query: dict[int, list] = {}
    for msg in iter_frames(stream):
        series_list, qi = decode_chunked_read_response(msg)
        by_query.setdefault(qi, []).extend(series_list)
    return [by_query.get(i, []) for i in range(max(by_query, default=-1) + 1)]
