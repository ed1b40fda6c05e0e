"""`.xz` integration tests, modeled on the reference's tests/xz.rs:
round-trips, the XZ Utils good-1-lzma2-{1..4} corpus, CRC checks and a
corruption case with exact error-string assertion."""

import lzma as liblzma

import pytest

import lzma_rs_tpu
from lzma_rs_tpu.utils.errors import XzError

from conftest import read_ref


def round_trip(x: bytes):
    compressed = lzma_rs_tpu.xz_compress(x)
    assert lzma_rs_tpu.xz_decompress(compressed) == x
    # our container output must be readable by liblzma too
    assert liblzma.decompress(compressed, format=liblzma.FORMAT_XZ) == x


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


class TestGoldenDecode:
    def test_foo_xz(self):
        assert lzma_rs_tpu.xz_decompress(read_ref("foo.txt.xz")) == read_ref(
            "foo.txt"
        )

    def test_empty_xz(self):
        assert lzma_rs_tpu.xz_decompress(read_ref("empty.txt.xz")) == b""

    def test_hello_xz(self):
        assert lzma_rs_tpu.xz_decompress(read_ref("hello.txt.xz")) == read_ref(
            "hello.txt"
        )

    @pytest.mark.parametrize("n", [1, 2, 3, 4])
    def test_good_1_lzma2(self, n):
        # XZ Utils' own LZMA2 feature-coverage corpus (reset combinations).
        assert lzma_rs_tpu.xz_decompress(
            read_ref(f"good-1-lzma2-{n}.xz")
        ) == read_ref(f"good-1-lzma2-{n}")

    def test_block_check_crc32(self):
        assert lzma_rs_tpu.xz_decompress(
            read_ref("block-check-crc32.txt.xz")
        ) == read_ref("block-check-crc32.txt")


class TestCorruption:
    def test_corrupt_block_check(self):
        # Flip a byte inside the block-check field (tests/xz.rs:123-146).
        data = bytearray(read_ref("block-check-crc32.txt.xz"))
        # find the CRC32 check field: after block payload. The reference test
        # mangles bytes near the end of the block; we flip one byte in the
        # stored check by searching for the known CRC of the content.
        import zlib

        content = read_ref("block-check-crc32.txt")
        crc = zlib.crc32(content).to_bytes(4, "little")
        idx = bytes(data).find(crc)
        assert idx > 0
        data[idx] ^= 0xFF
        with pytest.raises(XzError) as e:
            lzma_rs_tpu.xz_decompress(bytes(data))
        assert "Invalid block CRC32" in str(e.value)

    def test_bad_magic(self):
        with pytest.raises(XzError) as e:
            lzma_rs_tpu.xz_decompress(b"\xfd7zXY\x00junkjunkjunk")
        assert "Invalid XZ magic" in str(e.value)


class TestInterop:
    """Decode liblzma/xz-produced archives across presets and checks."""

    @pytest.mark.parametrize("check", ["crc32", "crc64", "none"])
    def test_decode_liblzma_xz_checks(self, check):
        data = read_ref("foo.txt")
        checks = {
            "crc32": liblzma.CHECK_CRC32,
            "crc64": liblzma.CHECK_CRC64,
            "none": liblzma.CHECK_NONE,
        }
        c = liblzma.compress(data, format=liblzma.FORMAT_XZ, check=checks[check])
        assert lzma_rs_tpu.xz_decompress(c) == data

    def test_decode_multiblock(self):
        # Multi-block archives are the parallel axis; make one via liblzma.
        data = read_ref("foo.txt") * 3
        filters = [{"id": liblzma.FILTER_LZMA2, "preset": 6, "dict_size": 1 << 16}]
        blocks = []
        # liblzma python API doesn't expose block size; build a multi-block
        # file by concatenating streams instead (also legal to decode one by
        # one) — here we just check our multi-block writer round-trips.
        c = lzma_rs_tpu.xz_compress(data, block_size=1 << 17)
        assert liblzma.decompress(c) == data
        assert lzma_rs_tpu.xz_decompress(c) == data
