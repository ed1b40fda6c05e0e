"""LZMA2 integration tests, modeled on the reference's tests/lzma2.rs."""

import lzma as liblzma

import pytest

import lzma_rs_tpu
from lzma_rs_tpu.utils.errors import LzmaError

from conftest import read_ref


def round_trip(x: bytes):
    compressed = lzma_rs_tpu.lzma2_compress(x)
    assert lzma_rs_tpu.lzma2_decompress(compressed) == x


class TestRoundTrip:
    def test_empty(self):
        round_trip(b"")

    def test_hello(self):
        round_trip(b"Hello world")

    def test_null_1mb(self):
        round_trip(bytes(0x0010_0000))

    def test_0xff_1mb(self):
        round_trip(b"\xff" * 0x0010_0000)

    def test_foo_file(self):
        round_trip(read_ref("foo.txt"))


class TestInterop:
    """Our LZMA2 decoder against liblzma-produced raw LZMA2 streams
    (compressed chunks with real matches, multiple reset modes)."""

    @pytest.mark.parametrize("preset", [0, 6])
    def test_decode_liblzma_raw_lzma2(self, preset):
        data = read_ref("foo.txt")
        filters = [{"id": liblzma.FILTER_LZMA2, "preset": preset}]
        c = liblzma.compress(data, format=liblzma.FORMAT_RAW, filters=filters)
        assert lzma_rs_tpu.lzma2_decompress(c) == data

    def test_decode_liblzma_binary(self):
        data = bytes(range(256)) * 4096
        filters = [{"id": liblzma.FILTER_LZMA2, "preset": 6}]
        c = liblzma.compress(data, format=liblzma.FORMAT_RAW, filters=filters)
        assert lzma_rs_tpu.lzma2_decompress(c) == data


class TestErrors:
    def test_invalid_status(self):
        with pytest.raises(LzmaError) as e:
            lzma_rs_tpu.lzma2_decompress(b"\x03rest")
        assert "LZMA2 invalid status 3, must be 0, 1, 2 or >= 128" in str(e.value)

    def test_truncated_status(self):
        with pytest.raises(LzmaError) as e:
            lzma_rs_tpu.lzma2_decompress(b"")
        assert "LZMA2 expected new status" in str(e.value)

    def test_truncated_uncompressed(self):
        with pytest.raises(LzmaError) as e:
            lzma_rs_tpu.lzma2_decompress(b"\x01\x00\x10abc")
        assert "uncompressed bytes" in str(e.value)
