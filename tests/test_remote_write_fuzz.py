"""Malformed-input battery for the remote-write wire decoders (r4
verdict item 6) — the same treatment the Y4M and PromQL parsers got.

Contract under test: every malformed body RAISES ValueError (cleanly)
or decodes to a strict prefix-free result — it must never mis-parse
(silently return wrong labels/samples) or escape with IndexError/
OverflowError/infinite loop. Well-formed bodies must keep round-
tripping unchanged after the hardening.
"""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from filodb_spark.remote_read import (_field, _iter_fields, _len_delim,
                                      _read_uvarint, _uvarint,
                                      snappy_compress, snappy_decompress)
from filodb_spark.remote_write import (decode_write_request,
                                       encode_write_request)

SERIES = [({"__name__": "m", "job": "j"}, [(1000, 1.5), (-2000, -2.5)])]


class TestUvarint:
    def test_truncated_raises(self):
        # continuation bit set on the final byte — more bytes promised
        for body in (b"\x80", b"\xff\xff", b"\x80" * 5):
            with pytest.raises(ValueError, match="truncated varint"):
                _read_uvarint(body, 0)

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="truncated varint"):
            _read_uvarint(b"", 0)

    def test_overlong_raises(self):
        # 11+ bytes of continuation — no 64-bit value needs them
        with pytest.raises(ValueError, match="over-long"):
            _read_uvarint(b"\x80" * 10 + b"\x01", 0)

    def test_ten_byte_high_bits_masked_not_overflow(self):
        # a 10th byte with garbage high bits: conformant decoders take
        # the low 64 bits; previously this overflowed to_bytes(8)
        val, i = _read_uvarint(b"\xff" * 9 + b"\x7f", 0)
        assert i == 10 and 0 <= val < 1 << 64

    @given(st.integers(min_value=0, max_value=(1 << 64) - 1))
    def test_roundtrip(self, n):
        enc = _uvarint(n)
        val, i = _read_uvarint(enc, 0)
        assert (val, i) == (n, len(enc))


class TestIterFields:
    def test_truncated_length_delimited_raises(self):
        # field 1, wire 2, claims 100 bytes, provides 3
        body = _field(1, 2) + _uvarint(100) + b"abc"
        with pytest.raises(ValueError, match="claims 100 bytes"):
            list(_iter_fields(body))

    def test_truncated_fixed64_raises(self):
        body = _field(1, 1) + b"\x01\x02\x03"   # 3 of 8 bytes
        with pytest.raises(ValueError, match="truncated fixed64"):
            list(_iter_fields(body))

    def test_truncated_fixed32_raises(self):
        body = _field(1, 5) + b"\x01"
        with pytest.raises(ValueError, match="truncated fixed32"):
            list(_iter_fields(body))

    def test_bad_wire_types_raise(self):
        for wire in (3, 4, 6, 7):   # start/end group + reserved
            with pytest.raises(ValueError, match="wire type"):
                list(_iter_fields(_field(1, wire) + b"\x00"))

    def test_field_number_zero_raises(self):
        with pytest.raises(ValueError, match="field number 0"):
            list(_iter_fields(_field(0, 0) + b"\x01"))

    def test_wellformed_still_parses(self):
        body = (_field(1, 0) + _uvarint(7)
                + _len_delim(2, b"hi")
                + _field(3, 1) + struct.pack("<d", 1.25))
        got = list(_iter_fields(body))
        assert got[0] == (1, 0, 7)
        assert got[1] == (2, 2, b"hi")
        assert struct.unpack("<d", got[2][2].to_bytes(8, "little"))[0] == 1.25


class TestDecodeWriteRequest:
    def test_roundtrip_unchanged_after_hardening(self):
        assert decode_write_request(encode_write_request(SERIES)) == SERIES

    def test_every_truncation_raises_or_prefix_parses(self):
        """Chop a valid request at every byte boundary: each prefix
        must either raise ValueError or decode to a subset of the
        original series — never garbage labels/samples."""
        raw = encode_write_request(SERIES)
        full = decode_write_request(raw)
        flat_samples = {s for _, ss in full for s in ss}
        flat_labels = [lbl for lbl, _ in full]
        for cut in range(len(raw)):
            try:
                got = decode_write_request(raw[:cut])
            except ValueError:
                continue
            for labels, samples in got:
                assert set(labels.items()) <= set(
                    flat_labels[0].items() if flat_labels else set())
                assert set(samples) <= flat_samples

    def test_bitflip_never_escapes_valueerror(self):
        """Flip every bit of a valid request: decode must produce a
        list or raise ValueError — no IndexError/OverflowError/
        UnicodeDecodeError escapes, no hang."""
        raw = bytearray(encode_write_request(SERIES))
        for pos in range(len(raw)):
            for bit in range(8):
                mutated = bytearray(raw)
                mutated[pos] ^= 1 << bit
                try:
                    out = decode_write_request(bytes(mutated))
                    assert isinstance(out, list)
                except (ValueError, UnicodeDecodeError):
                    pass    # clean rejection (label bytes may be bad UTF-8)

    @given(st.binary(max_size=300))
    @settings(max_examples=300, deadline=None)
    def test_random_bytes_never_escape(self, blob):
        try:
            out = decode_write_request(blob)
            assert isinstance(out, list)
        except (ValueError, UnicodeDecodeError):
            pass


class TestSnappyFuzz:
    def test_copy_offset_outside_output_raises(self):
        # preamble: total 4; copy tag kind=1 with len 4, offset 1 but
        # zero decoded bytes so far
        bad = _uvarint(4) + bytes([0b001]) + b"\x01"
        with pytest.raises(ValueError, match="copy offset"):
            snappy_decompress(bad)

    def test_truncated_literal_caught(self):
        good = snappy_compress(b"abcdef")
        with pytest.raises(ValueError):
            snappy_decompress(good[:-2])

    @given(st.binary(max_size=200))
    @settings(max_examples=300, deadline=None)
    def test_random_bytes_never_escape(self, blob):
        try:
            out = snappy_decompress(blob)
            assert isinstance(out, bytes)
        except ValueError:
            pass

    @given(st.binary(max_size=500))
    @settings(max_examples=100, deadline=None)
    def test_roundtrip(self, blob):
        assert snappy_decompress(snappy_compress(blob)) == blob
