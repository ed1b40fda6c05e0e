"""Ring-window VMEM kernel correctness (interpret mode on CPU).

The ring mode (``KernelConfig.RING``) keeps only the last RING bytes of
history resident for window reads and bulk-flushes to the full output
window each maintenance period (ops/vmem_decoder.py). Covered here:
bit-exact decode of dist-capped archives, flush idempotence across long
outputs (many maintenance periods), dist<4 overlap torture, ERR_RING
fallback to the full-window kernel, and the gap-free eligibility gate.
One small KernelConfig shared so the kernel compiles once per session.
"""

import pytest

import lzma_rs_tpu
from lzma_rs_tpu.ops.vmem_decoder import KernelConfig
from lzma_rs_tpu.parallel import runtime
from lzma_rs_tpu.utils import stats as stats_mod

from conftest import read_ref

# RING=512 >= 4*MAINT+4; W a multiple of RING.
CFG = KernelConfig(L=4, W=4096, W_IN=4096, NLIT=1, K=8, RING=512)


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    yield


def _archive(data: bytes, dist_cap: int = 512, block: int = 4096) -> bytes:
    return lzma_rs_tpu.xz_compress(
        data, tpu_profile=True, block_size=block, dist_cap=dist_cap
    )


def _decode_ring(arch: bytes) -> bytes:
    plans, *_ = runtime.plan_xz(arch)
    return runtime.execute_plan_vmem(arch, plans, config=CFG, interpret=True)


class TestRingKernel:
    def test_text_multiblock(self):
        data = read_ref("foo.txt")[:12000]
        assert _decode_ring(_archive(data)) == data

    def test_long_lane_many_flush_periods(self):
        # one 4096-byte segment decodes across ~16+ maintenance periods;
        # every byte must survive the idempotent re-flushes
        data = (read_ref("foo.txt")[:977] * 9)[:4096]
        assert _decode_ring(_archive(data)) == data

    def test_overlap_torture_small_distances(self):
        pieces = []
        for period in (1, 2, 3, 4, 5):
            for align in range(4):
                pieces.append(b"q" * align)
                pieces.append(bytes(range(65, 65 + period)) * (83 // period))
        data = (b"".join(pieces) * 4)[:8000]
        assert _decode_ring(_archive(data)) == data

    def test_runs(self):
        data = b"\x00" * 3000 + b"ab" * 700 + b"\xff" * 2000
        assert _decode_ring(_archive(data)) == data

    def test_dist_at_ring_edge(self):
        # repeated 512-byte page forces matches at exactly dist == RING
        page = bytes((i * 37 + 11) & 0xFF for i in range(512))
        data = page * 8  # 4096 bytes
        assert _decode_ring(_archive(data)) == data

    def test_ring_miss_falls_back_full_window(self):
        # uncapped lc=0 archive: distances beyond RING flag ERR_RING and
        # the runtime retries on the full-window kernel
        data = read_ref("foo.txt")[:4000]
        arch = lzma_rs_tpu.xz_compress(
            data, block_size=4096, level=6, props=0 + 9 * (0 + 5 * 2)
        )
        plans, *_ = runtime.plan_xz(arch)
        with stats_mod.collect() as st:
            out = runtime.execute_plan_vmem(
                arch, plans, config=CFG, interpret=True
            )
        assert out == data
        assert any("ring miss" in f for f in st.fallbacks) or not st.fallbacks

    def test_gap_segment_ineligible(self):
        # mid-segment stored chunk => prefill gap => ring mode refuses
        import random

        random.seed(7)
        rnd = bytes(random.randrange(256) for _ in range(1024))
        data = read_ref("foo.txt")[:1024] + rnd + read_ref("foo.txt")[:1024]
        from lzma_rs_tpu.encode.lzma2_enc import lzma2_compress as enc

        stream = enc(data, level=6, chunk_size=1024, dist_cap=512,
                     props=0 + 9 * (0 + 5 * 2))
        plan, _ = runtime.plan_lzma2_stream(stream, 0, 0)
        if not plan.prefill:
            pytest.skip("encoder compressed the noise chunk")
        with pytest.raises(runtime.VmemIneligible, match="gap-free"):
            runtime.execute_plan_vmem(stream, [plan], config=CFG,
                                      interpret=True)

    def test_auto_config_selects_ring(self):
        data = read_ref("foo.txt")[:12000]
        arch = lzma_rs_tpu.xz_compress(data, tpu_profile=True)
        plans, *_ = runtime.plan_xz(arch)
        cfg = runtime.choose_vmem_config(plans)
        assert cfg.RING == 2048
        assert cfg.NLIT == 1

    def test_auto_config_no_ring_for_lc3(self):
        data = read_ref("foo.txt")[:12000]
        arch = lzma_rs_tpu.xz_compress(data, block_size=8192, level=6)
        plans, *_ = runtime.plan_xz(arch)
        cfg = runtime.choose_vmem_config(plans)
        assert cfg.RING == 0


# --- gen-2 ring kernel (round 4): register-resident output word -------
#
# The gen-2 ring path keeps the output word under construction in lane
# registers and publishes only COMPLETED words to the ring, so a ring
# slot keeps serving its RING-bytes-back content until the aliasing new
# word is done. The round-4 regression (bench ring-miss): an early
# full-replace publish zeroed a boundary word's top bytes, corrupting
# copies at dist close to RING (docs/KERNEL_r04.md).

from lzma_rs_tpu.ops.vmem2_decoder import KernelConfig2

CFG2 = KernelConfig2(L=4, W=4096, W_IN=4096, NLIT=1, K=8, RING=512,
                     TB=2, TILE=384, MAINT=64)


def _decode_ring2(arch: bytes) -> bytes:
    plans, *_ = runtime.plan_xz(arch)
    return runtime.execute_plan_vmem(arch, plans, config=CFG2,
                                     interpret=True)


class TestRingKernelGen2:
    def test_dist_at_ring_edge(self):
        page = bytes((i * 37 + 11) & 0xFF for i in range(512))
        data = page * 8
        assert _decode_ring2(_archive(data)) == data

    def test_dist_at_ring_edge_misaligned(self):
        # shift the page phase so dist == RING copies start at every
        # byte-in-word offset: the source's boundary word then has its
        # top bytes exactly RING back while the aliasing output word is
        # only partially built (the round-4 failure shape)
        for shift in (1, 2, 3, 5):
            page = bytes((i * 73 + shift) & 0xFF for i in range(512))
            data = (b"x" * shift + page * 7)[:3800]
            assert _decode_ring2(_archive(data)) == data, shift

    def test_text_ring2(self):
        data = read_ref("foo.txt")[:6000]
        assert _decode_ring2(_archive(data)) == data

    def test_small_distance_overlaps_ring2(self):
        data = (b"ab" * 900 + b"\x00" * 700 + b"cdcdcd" * 150)[:3600]
        assert _decode_ring2(_archive(data)) == data

    def test_production_maint_tile_boundary(self):
        # the production config fills TILE's refill budget exactly
        # (TILE-128 == TB*MAINT+16 at MAINT=120/TILE=384); cover that
        # boundary arithmetic on CPU with the production code path
        # rather than hardware-only (VERDICT r3 item 8)
        cfg = KernelConfig2(L=4, W=4096, W_IN=4096, NLIT=1, K=8,
                            RING=512, TB=2, TILE=384, MAINT=120)
        data = read_ref("foo.txt")[:6000]
        plans, *_ = runtime.plan_xz(_archive(data))
        out = runtime.execute_plan_vmem(_archive(data), plans,
                                        config=cfg, interpret=True)
        assert out == data

    def test_8byte_copy_steps_aligned_distances(self):
        # long matches at word-multiple distances with every destination
        # alignment: the m8 fast path (two completed output words per
        # step) must hand both words through the parity publish slots
        # bit-exactly, including the step after m8 stops firing
        for period in (4, 8, 12, 64, 512):
            page = bytes((i * 29 + period) & 0xFF for i in range(period))
            for shift in (0, 1, 2, 3, 5):
                data = (b"Z" * shift + page * (3000 // period))[:2900]
                assert _decode_ring2(_archive(data)) == data, (period, shift)

    def test_8byte_copy_steps_rle(self):
        # dist 1/2 long runs ride m8 via the replication group; dist 3
        # must stay on the 4-byte path (period does not divide 4)
        for pat in (b"\x00", b"\xa7", b"ab", b"xyz"):
            data = (b"lead" + pat * 4000)[:3900]
            assert _decode_ring2(_archive(data)) == data, pat

    def test_8byte_copy_length_edges(self):
        # match lengths straddling the m8 threshold (fires only at
        # length > 8) and the tail handoff back to the 4-byte path
        chunks = []
        for n in (8, 9, 10, 15, 16, 17, 24, 33):
            chunks.append(bytes(range(1, 13)) * 4)  # seed dist-12 source
            chunks.append(b"." * n)
        data = (b"".join(chunks) * 6)[:3800]
        assert _decode_ring2(_archive(data)) == data

    def test_8byte_copy_gapfree_fullwindow(self):
        # same shapes through the GAPFREE full-window mode (wwi + pub2
        # dual publish into the parity halves)
        cfg = KernelConfig2(L=4, W=4096, W_IN=4096, NLIT=1, K=8,
                            RING=0, GAPFREE=1, TB=2, TILE=384, MAINT=64)
        page = bytes((i * 29 + 3) & 0xFF for i in range(64))
        for shift in (0, 1, 3):
            data = (b"Q" * shift + page * 60 + b"ab" * 300)[:3800]
            plans, *_ = runtime.plan_xz(_archive(data))
            out = runtime.execute_plan_vmem(
                _archive(data), plans, config=cfg, interpret=True
            )
            assert out == data, shift

    def test_gapfree_fullwindow_stock_geometry(self):
        # the stock-64KiB production shape class on CPU: full window
        # (no ring), GAPFREE register-resident output word, sublane
        # fold F=4 (L=256 -> S=2, M=128), lc=3 literal tables
        import lzma as liblzma

        cfg = KernelConfig2(L=256, W=4096, W_IN=4096, NLIT=8, K=8,
                            RING=0, GAPFREE=1, TB=2, TILE=384, MAINT=120)
        # small payload: interpret cost scales with L (256 padded lanes)
        data = read_ref("foo.txt")[:1400]
        stream = liblzma.compress(
            data, format=liblzma.FORMAT_RAW,
            filters=[{"id": liblzma.FILTER_LZMA2, "preset": 6}],
        )
        plan, _ = runtime.plan_lzma2_stream(stream, 0, 0)
        assert runtime._plans_gap_free([plan])
        out = runtime.execute_plan_vmem(stream, [plan], config=cfg,
                                        interpret=True)
        assert out == data
