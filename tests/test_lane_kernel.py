"""Lane-parallel kernel correctness: bit-exact vs the host engines on real
liblzma-produced streams (compressed chunks, every reset combination, all
symbol types) and the reference corpus. Runs on CPU."""

import lzma as liblzma

import pytest

from lzma_rs_tpu.parallel import runtime

from conftest import read_ref


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    yield


def _rawlzma2(data: bytes, preset: int = 6, dict_size=None) -> bytes:
    filt = {"id": liblzma.FILTER_LZMA2, "preset": preset}
    if dict_size:
        filt["dict_size"] = dict_size
    return liblzma.compress(data, format=liblzma.FORMAT_RAW, filters=[filt])


class TestLzma2Kernel:
    def test_small(self):
        data = read_ref("small.txt")
        assert runtime.lzma2_decode(_rawlzma2(data)) == data

    def test_text_medium(self):
        data = read_ref("foo.txt")[:20000]
        assert runtime.lzma2_decode(_rawlzma2(data)) == data

    def test_binary(self):
        data = bytes(range(256)) * 64
        assert runtime.lzma2_decode(_rawlzma2(data)) == data

    def test_runs(self):
        # long runs force rep-matches and large lens
        data = b"\x00" * 30000 + b"ab" * 5000 + b"\xff" * 10000
        assert runtime.lzma2_decode(_rawlzma2(data)) == data

    def test_preset0(self):
        data = read_ref("small.txt") * 20
        assert runtime.lzma2_decode(_rawlzma2(data, preset=0)) == data

    def test_uncompressed_chunks(self):
        # our own encoder -> pure prefill path
        import lzma_rs_tpu

        data = read_ref("foo.txt")[:5000]
        c = lzma_rs_tpu.lzma2_compress(data)
        assert runtime.lzma2_decode(c) == data

    def test_high_entropy_mixed(self):
        import random

        random.seed(7)
        rnd = bytes(random.randrange(256) for _ in range(4096))
        data = rnd + read_ref("small.txt") * 10 + rnd
        assert runtime.lzma2_decode(_rawlzma2(data)) == data


class TestXzKernel:
    def test_foo_xz(self):
        assert runtime.xz_decode(read_ref("foo.txt.xz")) == read_ref("foo.txt")

    @pytest.mark.parametrize("n", [1, 2, 3, 4])
    def test_good_corpus(self, n):
        # XZ Utils reset-combination coverage files
        assert runtime.xz_decode(
            read_ref(f"good-1-lzma2-{n}.xz")
        ) == read_ref(f"good-1-lzma2-{n}")

    def test_block_check_crc32(self):
        assert runtime.xz_decode(
            read_ref("block-check-crc32.txt.xz")
        ) == read_ref("block-check-crc32.txt")

    def test_multiblock(self):
        import lzma_rs_tpu

        data = read_ref("foo.txt")[:40000]
        c = lzma_rs_tpu.xz_compress(data, block_size=4096)
        assert runtime.xz_decode(c) == data

    def test_multiblock_liblzma_parallel_shape(self):
        # multi-segment parallel decode: several independent xz streams'
        # worth of blocks in one archive via CLI-style block splitting
        data = (read_ref("small.txt") * 50)[:2000]
        c = liblzma.compress(data, format=liblzma.FORMAT_XZ, preset=6)
        assert runtime.xz_decode(c) == data

    def test_corrupt_falls_back_with_reference_error(self):
        from lzma_rs_tpu.utils.errors import LzmaRsError

        data = read_ref("foo.txt")[:10000]
        c = bytearray(_rawlzma2(data))
        c[len(c) // 2] ^= 0xFF
        with pytest.raises(LzmaRsError):
            runtime.lzma2_decode(bytes(c))
