"""Gen-2 VMEM Pallas kernel correctness (interpret mode on CPU).

Bit-exactness of ``ops/vmem2_decoder.py`` (2-D lane tiles + state-in-refs)
against liblzma-produced streams and the host engines, mirroring the gen-1
suite (``test_vmem_kernel.py``) plus the ring-window mode and the NLIT=1
tpu_profile auto-config, which are the gen-2 production defaults.
"""

import dataclasses
import lzma as liblzma

import pytest

from lzma_rs_tpu.ops.vmem2_decoder import KernelConfig2
from lzma_rs_tpu.parallel import runtime

from conftest import read_ref

CFG = KernelConfig2(L=8, W=4096, W_IN=4096, NLIT=8, K=4)
# ring-window bucket: tpu_profile shape (lc=0 -> NLIT=1, capped distances)
CFG_RING = KernelConfig2(
    L=8, W=4096, W_IN=4096, NLIT=1, K=4, RING=1024, NPS=4
)


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    yield


def _rawlzma2(data: bytes, preset: int = 6, **filt_kw) -> bytes:
    filt = {"id": liblzma.FILTER_LZMA2, "preset": preset, **filt_kw}
    return liblzma.compress(data, format=liblzma.FORMAT_RAW, filters=[filt])


def _decode(stream: bytes, cfg=CFG) -> bytes:
    plan, _ = runtime.plan_lzma2_stream(stream, 0, 0)
    return runtime.execute_plan_vmem(stream, [plan], config=cfg,
                                     interpret=True)


def _own_lzma2(data: bytes, chunk_size: int = 1024, **kw) -> bytes:
    import lzma_rs_tpu.encode.lzma2_enc as enc

    return enc.lzma2_compress(data, level=6, chunk_size=chunk_size, **kw)


class TestVmem2Kernel:
    def test_single_chunk_text(self):
        data = read_ref("foo.txt")[:3000]
        assert _decode(_rawlzma2(data)) == data

    def test_runs_and_reps(self):
        data = (b"\x00" * 700 + b"abcabcabc" * 60 + b"\xff" * 500) * 2
        assert _decode(_rawlzma2(data)) == data

    def test_binary_patterns(self):
        data = bytes(range(256)) * 12
        assert _decode(_rawlzma2(data)) == data

    def test_lp_pb_variants(self):
        data = read_ref("foo.txt")[:2500]
        s = _rawlzma2(data, lc=1, lp=2, pb=1)
        assert _decode(s) == data

    def test_lc0(self):
        data = read_ref("foo.txt")[:2500]
        assert _decode(_rawlzma2(data, lc=0, lp=0, pb=0)) == data

    def test_multi_segment(self):
        d1 = read_ref("foo.txt")[:2000]
        d2 = (read_ref("small.txt") * 8)[:2000]
        s1 = _rawlzma2(d1)
        s2 = _rawlzma2(d2)
        stream = s1[:-1] + s2  # drop terminator, keep chunk2's dict reset
        assert _decode(stream) == d1 + d2

    def test_multi_chunk_one_segment(self):
        data = read_ref("foo.txt")[:3000]
        stream = _own_lzma2(data, chunk_size=1024)
        plan, _ = runtime.plan_lzma2_stream(stream, 0, 0)
        assert len(plan.lanes) == 1
        assert len(plan.lanes[0].in_start) >= 2
        assert _decode(stream) == data

    def test_stored_chunk_inside_segment(self):
        import random

        random.seed(3)
        rnd = bytes(random.randrange(256) for _ in range(1024))
        data = read_ref("foo.txt")[:1024] + rnd + read_ref("foo.txt")[:1024]
        stream = _own_lzma2(data, chunk_size=1024)
        plan, _ = runtime.plan_lzma2_stream(stream, 0, 0)
        assert plan.prefill, "expected stored chunks in the stream"
        assert _decode(stream) == data

    def test_vs_host_engine(self):
        data = read_ref("foo.txt")[:3500]
        s = _rawlzma2(data)
        assert _decode(s) == runtime.lzma2_decode(s, engine="native")

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
            return
        assert out != data

    def test_ineligible_large_segment(self):
        data = read_ref("foo.txt")[: CFG.W + 1000]
        s = _rawlzma2(data)
        plan, _ = runtime.plan_lzma2_stream(s, 0, 0)
        with pytest.raises(runtime.VmemIneligible):
            runtime.execute_plan_vmem(s, [plan], config=CFG, interpret=True)

    def test_many_lanes_fold(self):
        # L > 128-multiple fold is TPU-only; here exercise several lanes
        # sharing one batch (L=8 tile) with ragged segment sizes
        datas = [read_ref("foo.txt")[i * 400:(i + 1) * 400 + 37]
                 for i in range(5)]
        streams = [_rawlzma2(d) for d in datas]
        stream = b"".join(s[:-1] for s in streams[:-1]) + streams[-1]
        plan, _ = runtime.plan_lzma2_stream(stream, 0, 0)
        assert len(plan.lanes) == 5
        assert _decode(stream) == b"".join(datas)


class TestVmem2Ring:
    def test_ring_tpu_profile(self):
        # tpu_profile archives cap match distances; the ring path stays hit
        data = read_ref("foo.txt")[:3000]
        stream = _own_lzma2(data, chunk_size=1024, props=0, dist_cap=1024)
        assert _decode(stream, CFG_RING) == data

    def test_ring_miss_retries_full_window(self):
        # distances beyond RING flag ERR_RING; the dispatcher must retry
        # on the full-window kernel and still be bit-exact
        data = read_ref("foo.txt")[:3000]
        s = _rawlzma2(data, lc=0, lp=0, pb=0)  # stock distances, lc=0
        assert _decode(s, CFG_RING) == data

    def test_ring_runs(self):
        data = (b"\x00" * 500 + b"ababab" * 80 + b"\xff" * 300) * 3
        stream = _own_lzma2(data, chunk_size=2048, props=0, dist_cap=1024)
        assert _decode(stream, CFG_RING) == data


class TestVmem2Dispatch:
    def test_choose_config_is_gen2(self, monkeypatch):
        monkeypatch.delenv("LZMA_RS_TPU_VMEM_GEN", raising=False)
        monkeypatch.delenv("LZMA_RS_TPU_VMEM_L", raising=False)
        data = read_ref("foo.txt")[:2000]
        s = _rawlzma2(data)
        plan, _ = runtime.plan_lzma2_stream(s, 0, 0)
        cfg = runtime.choose_vmem_config([plan])
        assert isinstance(cfg, KernelConfig2)
        # production lane counts are TPU-only; CPU (interpret) stays small
        assert cfg.L == 8

    def test_gen1_env_override(self, monkeypatch):
        from lzma_rs_tpu.ops.vmem_decoder import KernelConfig

        monkeypatch.setenv("LZMA_RS_TPU_VMEM_GEN", "1")
        data = read_ref("foo.txt")[:2000]
        s = _rawlzma2(data)
        plan, _ = runtime.plan_lzma2_stream(s, 0, 0)
        cfg = runtime.choose_vmem_config([plan])
        assert type(cfg) is KernelConfig

    def test_ring_retry_keeps_gen2(self):
        cfg = dataclasses.replace(CFG_RING, RING=0)
        assert isinstance(cfg, KernelConfig2)

    def test_xz_multiblock(self, monkeypatch):
        import lzma_rs_tpu

        data = read_ref("foo.txt")[:7000]
        c = lzma_rs_tpu.xz_compress(data, block_size=2048)
        orig = runtime.execute_plan_vmem
        monkeypatch.setattr(
            runtime,
            "execute_plan_vmem",
            lambda d, p, config=None, interpret=None: orig(
                d, p, config=CFG, interpret=True
            ),
        )
        assert runtime._xz_decode_parallel(c, "tpu-vmem") == data


# Two tree-bits per step (TB=2): the step loop decodes a second bit for
# lanes inside multi-bit tree walks. Full bit-exactness re-run over the
# state-heavy scenarios.
CFG_TB2 = dataclasses.replace(CFG, TB=2, TILE=384)
CFG_RING_TB2 = dataclasses.replace(CFG_RING, TB=2, TILE=384)


class TestVmem2TwoBits:
    def test_text(self):
        data = read_ref("foo.txt")[:3000]
        assert _decode(_rawlzma2(data), CFG_TB2) == data

    def test_runs_and_reps(self):
        data = (b"\x00" * 700 + b"abcabcabc" * 60 + b"\xff" * 500) * 2
        assert _decode(_rawlzma2(data), CFG_TB2) == data

    def test_binary_patterns(self):
        data = bytes(range(256)) * 12
        assert _decode(_rawlzma2(data), CFG_TB2) == data

    def test_lp_pb_variants(self):
        data = read_ref("foo.txt")[:2500]
        assert _decode(_rawlzma2(data, lc=1, lp=2, pb=1), CFG_TB2) == data

    def test_lc0(self):
        data = read_ref("foo.txt")[:2500]
        assert _decode(_rawlzma2(data, lc=0, lp=0, pb=0), CFG_TB2) == data

    def test_matched_literals_random(self):
        # random-ish data maximizes matched-literal (LITM) traffic and
        # mismatch drops mid-tree — the trickiest TB=2 path
        import random

        random.seed(11)
        base = bytes(random.randrange(256) for _ in range(800))
        data = base + base[:500] + bytes(
            random.randrange(256) for _ in range(700)
        ) + base[100:600]
        assert _decode(_rawlzma2(data), CFG_TB2) == data

    def test_multi_chunk_one_segment(self):
        data = read_ref("foo.txt")[:3000]
        stream = _own_lzma2(data, chunk_size=1024)
        assert _decode(stream, CFG_TB2) == data

    def test_stored_chunk_inside_segment(self):
        import random

        random.seed(3)
        rnd = bytes(random.randrange(256) for _ in range(1024))
        data = read_ref("foo.txt")[:1024] + rnd + read_ref("foo.txt")[:1024]
        stream = _own_lzma2(data, chunk_size=1024)
        assert _decode(stream, CFG_TB2) == data

    def test_multi_segment(self):
        d1 = read_ref("foo.txt")[:2000]
        d2 = (read_ref("small.txt") * 8)[:2000]
        stream = _rawlzma2(d1)[:-1] + _rawlzma2(d2)
        assert _decode(stream, CFG_TB2) == d1 + d2

    def test_ring_tpu_profile(self):
        data = read_ref("foo.txt")[:3000]
        stream = _own_lzma2(data, chunk_size=1024, props=0, dist_cap=1024)
        assert _decode(stream, CFG_RING_TB2) == data

    def test_ring_miss_retries_full_window(self):
        data = read_ref("foo.txt")[:3000]
        s = _rawlzma2(data, lc=0, lp=0, pb=0)
        assert _decode(s, CFG_RING_TB2) == data

    def test_corrupt_stream_flags_error(self):
        data = read_ref("foo.txt")[:2000]
        s = bytearray(_rawlzma2(data))
        s[len(s) // 2] ^= 0xFF
        plan, _ = runtime.plan_lzma2_stream(bytes(s), 0, 0)
        try:
            out = runtime.execute_plan_vmem(
                bytes(s), [plan], config=CFG_TB2, interpret=True
            )
        except runtime._KernelError:
            return
        assert out != data

    def test_truncated_stream_flags_eof(self):
        data = read_ref("foo.txt")[:2000]
        s = _rawlzma2(data)
        plan, _ = runtime.plan_lzma2_stream(s, 0, 0)
        # cut compressed payload mid-chunk: the kernel must flag an error
        # (EOF mid-symbol), never hang or fabricate output
        lane = plan.lanes[0]
        lane.in_end[-1] -= 40
        with pytest.raises(runtime._KernelError):
            runtime.execute_plan_vmem(s, [plan], config=CFG_TB2,
                                      interpret=True)

    def test_vs_tb1_identical(self):
        data = (read_ref("small.txt") * 30)[:3500]
        s = _rawlzma2(data)
        assert _decode(s, CFG_TB2) == _decode(s, CFG)

    def test_config_validation(self):
        with pytest.raises(AssertionError, match="TILE"):
            dataclasses.replace(CFG, TB=2)  # TILE=256 too small


@pytest.mark.slow
class TestVmem2FoldWide:
    def test_multi_sublane_fold(self):
        """L=256 folds into [S=2, M=128] lane tiles; populate > 128 lanes
        so both sublane rows carry live segments (VERDICT r2 weak #8:
        production-shape folding was exercised only by hand-run tools).
        Interpret mode, so segments are kept tiny."""
        datas = [
            read_ref("foo.txt")[i * 37 : i * 37 + 70 + (i % 11)] * 3
            for i in range(140)
        ]
        streams = [_rawlzma2(d, preset=1) for d in datas]
        stream = b"".join(s[:-1] for s in streams[:-1]) + streams[-1]
        plan, _ = runtime.plan_lzma2_stream(stream, 0, 0)
        # every tripled slice must compress (LZMA chunk -> its own lane)
        assert len(plan.lanes) >= 130
        cfg = KernelConfig2(L=256, W=2048, W_IN=2048, NLIT=8, K=4)
        out = runtime.execute_plan_vmem(stream, [plan], config=cfg,
                                        interpret=True)
        assert out == b"".join(datas)
