"""Container corner cases with reference-parity error strings
(decode/xz.rs error paths)."""

import lzma as liblzma

import pytest

import lzma_rs_tpu
from lzma_rs_tpu.utils.errors import XzError

from conftest import read_ref


def make_xz(data=b"hello world", **kw):
    return bytearray(lzma_rs_tpu.xz_compress(data, **kw))


class TestHeaderFooter:
    def test_bad_magic(self):
        c = make_xz()
        c[0] ^= 1
        with pytest.raises(XzError) as e:
            lzma_rs_tpu.xz_decompress(bytes(c))
        assert "Invalid XZ magic" in str(e.value)

    def test_bad_header_crc(self):
        c = make_xz()
        c[8] ^= 1  # CRC32 of stream flags
        with pytest.raises(XzError) as e:
            lzma_rs_tpu.xz_decompress(bytes(c))
        assert "Invalid header CRC32" in str(e.value)

    def test_bad_check_method(self):
        c = make_xz()
        c[7] = 0x03  # invalid check id
        # fix the CRC so the flags parse is reached
        import zlib

        c[8:12] = zlib.crc32(bytes(c[6:8])).to_bytes(4, "little")
        with pytest.raises(XzError) as e:
            lzma_rs_tpu.xz_decompress(bytes(c))
        assert "Invalid check method" in str(e.value)

    def test_bad_footer_magic(self):
        c = make_xz()
        c[-1] ^= 0xFF
        with pytest.raises(XzError) as e:
            lzma_rs_tpu.xz_decompress(bytes(c))
        assert "Invalid footer magic" in str(e.value)

    def test_trailing_garbage(self):
        c = make_xz() + b"extra"
        with pytest.raises(XzError) as e:
            lzma_rs_tpu.xz_decompress(bytes(c))
        assert "Unexpected data after last XZ block" in str(e.value)

    def test_footer_flags_mismatch(self):
        import zlib

        c = make_xz()
        # footer layout: crc32 (4) + backward_size (4) + flags (2) + "YZ"
        flags_off = len(c) - 4
        c[flags_off + 1] = 0x01  # claim CRC32 in footer (header says None)
        body = bytes(c[len(c) - 8 : len(c) - 2])
        c[len(c) - 12 : len(c) - 8] = zlib.crc32(body).to_bytes(4, "little")
        with pytest.raises(XzError) as e:
            lzma_rs_tpu.xz_decompress(bytes(c))
        assert "does not match footer" in str(e.value)


class TestBlockHeader:
    def test_reserved_flag_bits(self):
        import zlib

        c = make_xz()
        # block header starts at 12; size byte then flags
        hs = c[12]
        c[13] |= 0x04  # reserved bit
        body = bytes(c[12 : 12 + (hs << 2) - 4])
        c[12 + (hs << 2) - 4 : 12 + (hs << 2)] = zlib.crc32(body[1:]).to_bytes(
            4, "little"
        )
        with pytest.raises(XzError) as e:
            lzma_rs_tpu.xz_decompress(bytes(c))
        # reaches either the reserved-bits error or the CRC error depending
        # on CRC recomputation; both are reference behaviors
        assert "reserved bits" in str(e.value) or "Invalid header CRC32" in str(
            e.value
        )

    def test_block_header_crc(self):
        c = make_xz()
        # flip the LZMA2 props byte (offset 16: size,flags,filter-id,
        # props-size,props) — body still parses, CRC must catch it
        c[16] ^= 0x01
        with pytest.raises(XzError) as e:
            lzma_rs_tpu.xz_decompress(bytes(c))
        assert "Invalid header CRC32" in str(e.value)

    def test_unknown_filter_id(self):
        c = make_xz()
        # flags byte 0 -> 1 claims two filters; the parser hits an unknown
        # filter id before the CRC check, matching the reference's order
        # (read_block_header runs inside the digest wrapper).
        c[13] ^= 0x01
        with pytest.raises(XzError) as e:
            lzma_rs_tpu.xz_decompress(bytes(c))
        assert "Unknown filter id" in str(e.value)


class TestIndex:
    def test_index_record_size_mismatch(self):
        c = make_xz(b"x" * 100)
        # find index: it starts with 0x00 after the block; flip an index
        # varint to corrupt the unpacked size; easier: flip a byte in the
        # index region (before footer CRC region) and expect either index
        # CRC error or record mismatch
        # locate footer (last 12 bytes); index is before it
        idx_region = slice(len(c) - 20, len(c) - 12)
        c[idx_region.start] ^= 0x01
        with pytest.raises(XzError):
            lzma_rs_tpu.xz_decompress(bytes(c))


class TestInteropCorners:
    def test_empty_stream_liblzma(self):
        c = liblzma.compress(b"", format=liblzma.FORMAT_XZ)
        assert lzma_rs_tpu.xz_decompress(c) == b""

    def test_concatenated_padding_ok(self):
        # stream padding after footer is technically allowed by the spec,
        # but the reference rejects it ("Unexpected data after last XZ
        # block") — we mirror the reference.
        c = make_xz() + b"\x00\x00\x00\x00"
        with pytest.raises(XzError):
            lzma_rs_tpu.xz_decompress(bytes(c))

    def test_good_corpus_parity_both_engines(self, monkeypatch):
        for n in (1, 2, 3, 4):
            x = read_ref(f"good-1-lzma2-{n}.xz")
            want = read_ref(f"good-1-lzma2-{n}")
            monkeypatch.setenv("LZMA_RS_TPU_BACKEND", "native")
            assert lzma_rs_tpu.xz_decompress(x) == want
            monkeypatch.setenv("LZMA_RS_TPU_BACKEND", "spec")
            assert lzma_rs_tpu.xz_decompress(x) == want
            monkeypatch.delenv("LZMA_RS_TPU_BACKEND")
