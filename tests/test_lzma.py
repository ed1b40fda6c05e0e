"""Raw LZMA integration tests, modeled on the reference's tests/lzma.rs:

- round-trips (compress then decompress) for the standard payload set,
- golden decodes of committed corpus files (bit-exact),
- differential oracle vs liblzma (Python stdlib ``lzma``),
- options matrix for the three UnpackedSize read modes x write modes,
- memlimit behavior.
"""

import lzma as liblzma
import os

import pytest

import lzma_rs_tpu
from lzma_rs_tpu import Options, UnpackedSize, CompressOptions, WriteUnpackedSize
from lzma_rs_tpu.utils.errors import HeaderTooShort, LzmaError

from conftest import read_ref


def round_trip(x: bytes):
    compressed = lzma_rs_tpu.lzma_compress(x)
    # decode with our decoder
    decomp = lzma_rs_tpu.lzma_decompress(compressed)
    assert decomp == x
    # differential oracle: liblzma must agree on our compressed stream
    oracle = liblzma.LZMADecompressor(format=liblzma.FORMAT_ALONE)
    assert oracle.decompress(compressed) == x


def round_trip_file(name: str):
    round_trip(read_ref(name))


def assert_decomp_eq(compressed: bytes, expected: bytes, compare_to_liblzma=True):
    assert lzma_rs_tpu.lzma_decompress(compressed) == expected
    if compare_to_liblzma:
        oracle = liblzma.LZMADecompressor(format=liblzma.FORMAT_ALONE)
        assert oracle.decompress(compressed) == expected


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
        round_trip_file("foo.txt")

    @pytest.mark.slow
    def test_range_coder_edge_case_file(self):
        round_trip_file("range-coder-edge-case")


class TestGoldenDecode:
    def test_decompress_short_header(self):
        # A 5-byte input is only a partial header (tests/lzma.rs:136-143).
        with pytest.raises(HeaderTooShort):
            lzma_rs_tpu.lzma_decompress(b"\x5d\x00\x00\x80")

    def test_empty_world(self):
        assert_decomp_eq(
            bytes.fromhex("5d00008000ffffffffffffffff0083fffbffffc0000000"),
            b"",
        )

    def test_hello_world(self):
        assert_decomp_eq(
            bytes.fromhex(
                "5d00008000ffffffffffffffff00241949986f1019c6d731eb3650b29848fffea5b000"
            ),
            b"Hello world\x0a",
        )

    def test_huge_dict(self):
        # dict size 0x7F7F7F7F, known to break some liblzma builds
        # (tests/lzma.rs:224-234) — no oracle comparison.
        assert_decomp_eq(
            bytes.fromhex(
                "5d7f7f7f7fffffffffffffffff00241949986f1019c6d731eb3650b29848fffea5b000"
            ),
            b"Hello world\x0a",
            compare_to_liblzma=False,
        )

    def test_decompress_foo_golden(self):
        assert lzma_rs_tpu.lzma_decompress(read_ref("foo.txt.lzma")) == read_ref(
            "foo.txt"
        )

    def test_decompress_empty_golden(self):
        assert lzma_rs_tpu.lzma_decompress(read_ref("empty.txt.lzma")) == b""

    def test_decompress_hello_golden(self):
        assert lzma_rs_tpu.lzma_decompress(read_ref("hello.txt.lzma")) == read_ref(
            "hello.txt"
        )

    def test_decompress_hugedict_golden(self):
        # hugedict.txt.lzma exercises dict_size >> output size.
        assert lzma_rs_tpu.lzma_decompress(
            read_ref("hugedict.txt.lzma")
        ) == read_ref("foo.txt")

    @pytest.mark.slow
    def test_decompress_range_coder_edge_case_golden(self):
        # Exercises code == range during decode (tests/files/README.md:6-18).
        assert lzma_rs_tpu.lzma_decompress(
            read_ref("range-coder-edge-case.lzma")
        ) == read_ref("range-coder-edge-case")


class TestOptionsMatrix:
    """Encode-side WriteToHeader(Some|None)/Skip x decode-side read modes
    (tests/lzma.rs:237-303)."""

    payload = b"Some data to compress and decompress with options"

    def _compress(self, mode) -> bytes:
        return lzma_rs_tpu.lzma_compress_with_options(
            self.payload, CompressOptions(unpacked_size=mode)
        )

    def test_write_some_read_header(self):
        c = self._compress(WriteUnpackedSize.write_to_header(len(self.payload)))
        assert lzma_rs_tpu.lzma_decompress(c) == self.payload

    def test_write_none_read_header(self):
        c = self._compress(WriteUnpackedSize.write_to_header(None))
        assert lzma_rs_tpu.lzma_decompress(c) == self.payload

    def test_write_some_read_but_use_provided(self):
        c = self._compress(WriteUnpackedSize.write_to_header(len(self.payload)))
        out = lzma_rs_tpu.lzma_decompress_with_options(
            c,
            Options(
                unpacked_size=UnpackedSize.read_header_but_use_provided(
                    len(self.payload)
                )
            ),
        )
        assert out == self.payload

    def test_skip_use_provided(self):
        c = self._compress(WriteUnpackedSize.skip_writing_to_header())
        out = lzma_rs_tpu.lzma_decompress_with_options(
            c,
            Options(unpacked_size=UnpackedSize.use_provided(len(self.payload))),
        )
        assert out == self.payload

    def test_skip_use_provided_none_eos(self):
        # Unknown size + no header field: EOS marker terminates.
        c = self._compress(WriteUnpackedSize.skip_writing_to_header())
        out = lzma_rs_tpu.lzma_decompress_with_options(
            c, Options(unpacked_size=UnpackedSize.use_provided(None))
        )
        assert out == self.payload

    def test_wrong_provided_size_errors(self):
        # Asking for more bytes than the stream encodes runs the decoder off
        # the end of the input: an io error, as in the reference.
        from lzma_rs_tpu.utils.errors import LzmaRsError

        c = self._compress(WriteUnpackedSize.write_to_header(len(self.payload)))
        with pytest.raises(LzmaRsError):
            lzma_rs_tpu.lzma_decompress_with_options(
                c,
                Options(
                    unpacked_size=UnpackedSize.read_header_but_use_provided(
                        len(self.payload) + 7
                    )
                ),
            )


class TestMemlimit:
    def test_memlimit_zero_fails(self):
        c = lzma_rs_tpu.lzma_compress(b"Some data to compress")
        with pytest.raises(LzmaError) as exc_info:
            lzma_rs_tpu.lzma_decompress_with_options(c, Options(memlimit=0))
        assert "exceeded memory limit of 0" in str(exc_info.value)

    def test_big_memlimit_ok(self):
        c = lzma_rs_tpu.lzma_compress(b"Some data to compress")
        out = lzma_rs_tpu.lzma_decompress_with_options(
            c, Options(memlimit=1 << 24)
        )
        assert out == b"Some data to compress"


class TestInterop:
    """Cross-validation with liblzma-produced streams."""

    @pytest.mark.parametrize("preset", [0, 6, 9])
    def test_decode_liblzma_alone_format(self, preset):
        data = read_ref("foo.txt")
        c = liblzma.compress(data, format=liblzma.FORMAT_ALONE, preset=preset)
        assert lzma_rs_tpu.lzma_decompress(c) == data

    def test_decode_liblzma_binary(self):
        data = bytes(range(256)) * 1000
        c = liblzma.compress(data, format=liblzma.FORMAT_ALONE)
        assert lzma_rs_tpu.lzma_decompress(c) == data
