"""Streaming (push-style) decoder tests, mirroring the reference's
src/decode/stream.rs test module and tests/lzma.rs streaming cases."""

import pytest

import lzma_rs_tpu
from lzma_rs_tpu import Options
from lzma_rs_tpu.stream import Stream, MAX_HEADER_LEN, START_BYTES
from lzma_rs_tpu.utils.errors import LzmaError, LzmaRsError

from conftest import read_ref

EMPTY_STREAM = bytes.fromhex("5d00008000ffffffffffffffff0083fffbffffc0000000")


def test_stream_noop():
    stream = Stream()
    assert stream.get_output() == b""
    assert stream.finish() == b""


def test_stream_zero_writes():
    stream = Stream()
    stream.write(b"")
    stream.write(b"")
    assert stream.finish() == b""


def test_bad_header():
    stream = Stream()
    with pytest.raises(LzmaError) as e:
        stream.write(b"\xff" * 32)
    assert "LZMA header invalid properties: 255 must be < 225" in str(e.value)


def test_stream_incomplete_header():
    # Not enough bytes to read header + range coder init -> buffered;
    # finish() fails with "failed to read header" (stream.rs:392-414).
    for end in range(1, MAX_HEADER_LEN + START_BYTES):
        stream = Stream()
        stream.write(EMPTY_STREAM[:end])
        with pytest.raises(LzmaError) as e:
            stream.finish()
        assert "failed to read header" in str(e.value)


def test_stream_incomplete_data():
    # Enough for the header but truncated data -> EOF error at finish
    # (stream.rs:416-431).
    for end in range(MAX_HEADER_LEN + START_BYTES, len(EMPTY_STREAM)):
        stream = Stream()
        stream.write(EMPTY_STREAM[:end])
        with pytest.raises(LzmaRsError) as e:
            stream.finish()
        assert "failed to fill whole buffer" in str(e.value)


def test_stream_chunked_all_sizes():
    # Whole-stream output must be identical for every chunk size
    # (stream.rs:434-459, tests/lzma.rs:116-132).
    small = read_ref("small.txt")
    compressed = lzma_rs_tpu.lzma_compress(small)
    cases = [(EMPTY_STREAM, b""), (compressed, small)]
    for input_, expected in cases:
        for chunk in range(1, len(input_)):
            stream = Stream()
            consumed = 0
            while consumed < len(input_):
                end = min(consumed + chunk, len(input_))
                stream.write(input_[consumed:end])
                consumed = end
            assert stream.finish() == expected, f"chunk size {chunk}"


def test_stream_chunked_pow2_sizes_big():
    data = read_ref("foo.txt")
    compressed = lzma_rs_tpu.lzma_compress(data)
    for chunk in [1, 2, 3, 4, 5, 6, 7, 8, 16, 32, 64, 128, 256, 512, 1024]:
        stream = Stream()
        consumed = 0
        while consumed < len(compressed):
            end = min(consumed + chunk, len(compressed))
            stream.write(compressed[consumed:end])
            consumed = end
        assert stream.finish() == data


def test_stream_corrupted():
    stream = Stream()
    with pytest.raises(LzmaRsError) as e:
        stream.write(b"corrupted bytes here corrupted bytes here")
    assert "beyond output size" in str(e.value)
    with pytest.raises(LzmaError) as e:
        stream.finish()
    assert "can't finish stream because of previous write error" in str(e.value)


def test_allow_incomplete():
    data = read_ref("small.txt")
    compressed = lzma_rs_tpu.lzma_compress(data)
    half = compressed[: len(compressed) // 2]

    stream = Stream()
    stream.write(half)
    with pytest.raises(LzmaRsError):
        stream.finish()

    stream = Stream(options=Options(allow_incomplete=True))
    stream.write(half)
    out = stream.finish()
    assert out == data[: len(out)]
    assert len(out) > 0


def test_stream_memlimit():
    # tests/lzma.rs:306-356: memlimit 0 fails mid-write with the exact
    # message, then finish() refuses.
    compressed = lzma_rs_tpu.lzma_compress(b"Some data to compress")
    stream = Stream(options=Options(memlimit=0))
    with pytest.raises(LzmaRsError) as e:
        stream.write(compressed)
        stream.finish()
    assert "exceeded memory limit of 0" in str(e.value)


def test_stream_sink():
    import io

    data = read_ref("small.txt")
    compressed = lzma_rs_tpu.lzma_compress(data)
    sink = io.BytesIO()
    stream = Stream(output=sink)
    stream.write(compressed)
    stream.finish()
    assert sink.getvalue() == data


def test_stream_spec_engine_parity(monkeypatch):
    # Force the pure-Python engine and confirm identical behavior.
    monkeypatch.setenv("LZMA_RS_TPU_NO_NATIVE", "1")
    import lzma_rs_tpu.native.loader as loader

    monkeypatch.setattr(loader, "_tried", True)
    monkeypatch.setattr(loader, "_cached", None)
    data = read_ref("small.txt")
    compressed = lzma_rs_tpu.lzma_compress(data)
    for chunk in [1, 7, 13, len(compressed)]:
        stream = Stream()
        consumed = 0
        while consumed < len(compressed):
            end = min(consumed + chunk, len(compressed))
            stream.write(compressed[consumed:end])
            consumed = end
        assert stream.finish() == data


class TestWriteZeroEdge:
    """The reference's WriteZero edge (tests/lzma.rs:71-88): size encoded
    as unknown (EOS marker present) but provided at decode time — the
    decoder stops at the provided size with the marker unread, so write()
    stops consuming input instead of erroring, and finish() succeeds."""

    def _compressed_unknown_size(self, payload):
        from lzma_rs_tpu import CompressOptions, WriteUnpackedSize

        return lzma_rs_tpu.lzma_compress_with_options(
            payload,
            CompressOptions(
                unpacked_size=WriteUnpackedSize.write_to_header(None)
            ),
        )

    @pytest.mark.parametrize("use_spec", [False, True])
    def test_partial_consume_then_zero(self, monkeypatch, use_spec):
        if use_spec:
            from lzma_rs_tpu.native import loader

            monkeypatch.setattr(loader, "load", lambda: None)
        from lzma_rs_tpu import UnpackedSize

        payload = read_ref("foo.txt")[:5000]
        c = self._compressed_unknown_size(payload)
        opts = Options(
            unpacked_size=UnpackedSize.read_header_but_use_provided(
                len(payload)
            )
        )
        stream = Stream(options=opts)
        consumed = stream.write(c)
        # the 5-6 byte EOS marker must be left unread
        assert consumed < len(c)
        # a retry with the remainder consumes nothing (WriteZero analog)
        assert stream.write(c[consumed:]) == 0
        # ...and does NOT poison the stream
        assert stream.finish() == payload

    def test_fully_consumed_when_size_read_from_header(self):
        payload = read_ref("foo.txt")[:5000]
        c = self._compressed_unknown_size(payload)
        stream = Stream()
        assert stream.write(c) == len(c)
        assert stream.finish() == payload
