"""VMEM Pallas kernel correctness (interpret mode on CPU).

Bit-exactness of ``ops/vmem_decoder.py`` against liblzma-produced streams
and the host engines, across the symbol/reset surface: literals (plain and
matched), matches with all distance classes reachable in a small window,
rep matches, short reps, multi-chunk segments (state reset and pure
continuation), stored chunks inside a segment (prefill + window reads into
prefilled bytes), multi-segment streams, corrupt streams, and the
eligibility gate. One small KernelConfig is shared so the jitted kernel
compiles once per session.
"""

import lzma as liblzma

import pytest

from lzma_rs_tpu.formats import lzma2 as lzma2_fmt
from lzma_rs_tpu.ops.vmem_decoder import KernelConfig
from lzma_rs_tpu.parallel import runtime
from lzma_rs_tpu.utils.cursor import ByteCursor

from conftest import read_ref

CFG = KernelConfig(L=8, W=4096, W_IN=4096, NLIT=8, K=4)


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    yield


def _rawlzma2(data: bytes, preset: int = 6, **filt_kw) -> bytes:
    filt = {"id": liblzma.FILTER_LZMA2, "preset": preset, **filt_kw}
    return liblzma.compress(data, format=liblzma.FORMAT_RAW, filters=[filt])


def _decode_vmem(stream: bytes) -> bytes:
    plan, _ = runtime.plan_lzma2_stream(stream, 0, 0)
    return runtime.execute_plan_vmem(stream, [plan], config=CFG,
                                     interpret=True)


def _own_lzma2(data: bytes, chunk_size: int = 1024) -> bytes:
    """Multi-chunk single-segment stream from our native encoder: the
    dictionary AND probability model carry across chunks (reset_mode 0
    continuation), so one lane decodes several chunks in sequence."""
    import lzma_rs_tpu.encode.lzma2_enc as enc

    return enc.lzma2_compress(data, level=6, chunk_size=chunk_size)


class TestVmemKernel:
    def test_single_chunk_text(self):
        data = read_ref("foo.txt")[:3000]
        assert _decode_vmem(_rawlzma2(data)) == data

    def test_runs_and_reps(self):
        data = (b"\x00" * 700 + b"abcabcabc" * 60 + b"\xff" * 500) * 2
        assert _decode_vmem(_rawlzma2(data)) == data

    def test_binary_patterns(self):
        data = bytes(range(256)) * 12
        assert _decode_vmem(_rawlzma2(data)) == data

    def test_lp_pb_variants(self):
        # exercise lp/pb context bits (lc+lp <= 3 for the NLIT=8 bucket)
        data = read_ref("foo.txt")[:2500]
        s = _rawlzma2(data, lc=1, lp=2, pb=1)
        assert _decode_vmem(s) == data

    def test_lc0(self):
        data = read_ref("foo.txt")[:2500]
        assert _decode_vmem(_rawlzma2(data, lc=0, lp=0, pb=0)) == data

    def test_multi_segment(self):
        # two dict-reset segments -> two independent lanes
        d1 = read_ref("foo.txt")[:2000]
        d2 = read_ref("small.txt") * 8
        d2 = d2[:2000]
        s1 = _rawlzma2(d1)
        s2 = _rawlzma2(d2)
        stream = s1[:-1] + s2  # drop terminator, keep chunk2's dict reset
        assert _decode_vmem(stream) == d1 + d2

    def test_multi_chunk_one_segment(self):
        # probability + dictionary continuation across chunk boundaries:
        # one lane, three chunks (reset_mode 0 after the first)
        data = read_ref("foo.txt")[:3000]
        stream = _own_lzma2(data, chunk_size=1024)
        plan, _ = runtime.plan_lzma2_stream(stream, 0, 0)
        assert len(plan.lanes) == 1
        assert len(plan.lanes[0].in_start) >= 2
        assert _decode_vmem(stream) == data

    def test_stored_chunk_inside_segment(self):
        # compressible + incompressible + compressible: stored chunks
        # prefill the window mid-segment, and the spec-required state
        # reset on the next compressed chunk is exercised
        import random

        random.seed(3)
        rnd = bytes(random.randrange(256) for _ in range(1024))
        # chunk-aligned layout so the middle chunk is pure noise -> stored
        data = read_ref("foo.txt")[:1024] + rnd + read_ref("foo.txt")[:1024]
        stream = _own_lzma2(data, chunk_size=1024)
        plan, _ = runtime.plan_lzma2_stream(stream, 0, 0)
        assert plan.prefill, "expected stored chunks in the stream"
        assert _decode_vmem(stream) == data

    def test_vs_host_engine(self):
        data = read_ref("foo.txt")[:3500]
        s = _rawlzma2(data)
        assert _decode_vmem(s) == runtime.lzma2_decode(s, engine="native")

    def test_corrupt_stream_flags_error(self):
        data = read_ref("foo.txt")[:2000]
        s = bytearray(_rawlzma2(data))
        s[len(s) // 2] ^= 0xFF
        plan, _ = runtime.plan_lzma2_stream(bytes(s), 0, 0)
        try:
            out = runtime.execute_plan_vmem(
                bytes(s), [plan], config=CFG, interpret=True
            )
        except runtime._KernelError:
            return  # flagged; dispatcher replays on host for exact error
        # a bit flip can decode to the right length by luck; the output
        # must then differ (container CRC layers catch it upstream)
        assert out != data

    def test_ineligible_large_segment(self):
        data = read_ref("foo.txt")[: CFG.W + 1000]  # > W when decoded
        s = _rawlzma2(data)
        plan, _ = runtime.plan_lzma2_stream(s, 0, 0)
        with pytest.raises(runtime.VmemIneligible):
            runtime.execute_plan_vmem(s, [plan], config=CFG, interpret=True)

    def test_engine_dispatch(self):
        # the "tpu-vmem" engine decodes eligible streams and falls back
        # (host) for ineligible/corrupt ones, staying correct either way
        small = read_ref("foo.txt")[:2000]
        s = _rawlzma2(small)
        assert runtime.lzma2_decode(s, engine="tpu-vmem") == small

    def test_own_encoder_stream(self):
        import lzma_rs_tpu

        data = read_ref("foo.txt")[:3000]
        c = lzma_rs_tpu.lzma2_compress(data, level=6)
        assert _decode_vmem(c) == data


class TestVmemXz:
    def test_multiblock_xz(self, monkeypatch):
        import lzma_rs_tpu

        data = read_ref("foo.txt")[:7000]
        c = lzma_rs_tpu.xz_compress(data, block_size=2048)
        # route the engine through the small test config
        orig = runtime.execute_plan_vmem
        monkeypatch.setattr(
            runtime,
            "execute_plan_vmem",
            lambda d, p, config=None, interpret=None: orig(
                d, p, config=CFG, interpret=True
            ),
        )
        assert runtime._xz_decode_parallel(c, "tpu-vmem") == data
