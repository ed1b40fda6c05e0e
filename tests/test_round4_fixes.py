"""Round-4 fixes (VERDICT round-3 items 3-4; ADVICE medium):

- the ``auto`` engine has a throughput model: it never routes to a
  modeled-slower engine, so eligible-but-slow device decodes (stock
  64 KiB-block archives, slow links) stay on the host;
- explicit ``engine="tpu"`` falls back to the host engine when the VMEM
  kernel is ineligible or no TPU exists; the ~0.3 MB/s XLA lane kernel
  is reachable only by naming ``engine="tpu-lane"``;
- multihost scan_blocks surfaces deferred chunk-header errors via the
  sequential replay path instead of silently truncating output.
"""

import lzma as liblzma

import pytest

import lzma_rs_tpu
from lzma_rs_tpu.formats import xz as xz_fmt
from lzma_rs_tpu.parallel import multihost, runtime
from lzma_rs_tpu.utils import stats as stats_mod
from lzma_rs_tpu.utils.errors import LzmaError

from conftest import read_ref


def _big_tpu_archive(mb=2):
    seed = read_ref("foo.txt")
    data = (seed * (mb * 1_000_000 // len(seed) + 1))[: mb * 1_000_000]
    return data, lzma_rs_tpu.xz_compress(
        data, block_size=8192, tpu_profile=True
    )


class TestAutoThroughputModel:
    def test_auto_native_when_device_modeled_slower(self, monkeypatch):
        # default calibration: tunnel-class link (25 MB/s) makes the
        # device e2e slower than the host engine even for the flagship
        # tpu_profile shape -> auto must stay native
        data, arch = _big_tpu_archive()
        monkeypatch.setattr(runtime, "_on_tpu", lambda: True)
        with stats_mod.collect() as st:
            out = runtime.xz_decode(arch, engine="auto")
        assert out == data
        assert st.engine == "native"
        assert any("modeled device" in f for f in st.fallbacks), st.fallbacks

    def test_auto_device_when_model_favors_it(self, monkeypatch):
        # PCIe-class link + slow host -> the model favors the device
        # (the executor is stubbed: no real device on CPU CI).
        data, arch = _big_tpu_archive()
        monkeypatch.setattr(runtime, "_on_tpu", lambda: True)
        monkeypatch.setenv("LZMA_RS_TPU_CAL_LINK_MBS", "8000")
        monkeypatch.setenv("LZMA_RS_TPU_CAL_NATIVE_MBS", "0.001")
        called = {}

        def fake_vmem(d, plans, config=None, interpret=None):
            called["vmem"] = True
            return runtime.execute_plan_native(d, plans)

        monkeypatch.setattr(runtime, "execute_plan_vmem", fake_vmem)
        out = runtime.xz_decode(arch, engine="auto")
        assert out == data
        assert called.get("vmem")

    def test_stock_64k_archive_routes_native_even_on_tpu(self, monkeypatch):
        # A stock --block-size=64KiB-shaped archive is VMEM-eligible
        # (W=64 KiB bucket) but decodes ~1.4 MB/s/chip: the model must
        # route it to the host even with a fast link (VERDICT round-3
        # item 3). 122 lanes / 8 MB clears the minimum-work gate.
        seed = read_ref("foo.txt")
        data = (seed * 48)[: 8 << 20]
        arch = lzma_rs_tpu.xz_compress(data, block_size=65536, level=1)
        monkeypatch.setattr(runtime, "_on_tpu", lambda: True)
        monkeypatch.setenv("LZMA_RS_TPU_CAL_LINK_MBS", "8000")

        def boom(*a, **kw):  # the device path must not be reached
            raise AssertionError("device executor reached")

        monkeypatch.setattr(runtime, "execute_plan_vmem", boom)
        with stats_mod.collect() as st:
            out = runtime.xz_decode(arch, engine="auto")
        assert out == data
        assert st.engine == "native"
        assert any("modeled device" in f for f in st.fallbacks), st.fallbacks

    def test_model_scales_with_devices(self):
        data, arch = _big_tpu_archive()
        plans = runtime.plan_xz(arch)[0]
        cfg = runtime.choose_vmem_config(plans, for_eligibility=True)
        d1, n1 = runtime._estimate_engine_seconds(plans, cfg, 1)
        d4, n4 = runtime._estimate_engine_seconds(plans, cfg, 4)
        assert n1 == n4
        assert d4 < d1  # kernel time shards across chips


class TestLaneKernelQuarantine:
    def test_explicit_tpu_off_tpu_goes_native(self, monkeypatch):
        data, arch = _big_tpu_archive(1)

        def boom(*a, **kw):
            raise AssertionError("XLA lane kernel reached")

        monkeypatch.setattr(runtime, "execute_plan", boom)
        with stats_mod.collect() as st:
            out = runtime.xz_decode(arch, engine="tpu")
        assert out == data
        assert any("tpu->native" in f for f in st.fallbacks)

    def test_vmem_ineligible_tpu_goes_native_not_lane(self, monkeypatch):
        # 1 MiB blocks exceed every VMEM window bucket -> VmemIneligible;
        # the fallback must be the host engine, never the lane kernel
        seed = read_ref("foo.txt")
        data = (seed * 20)[: 3 << 20]
        arch = lzma_rs_tpu.xz_compress(data, block_size=1 << 20, level=1)
        monkeypatch.setattr(runtime, "_on_tpu", lambda: True)

        def boom(*a, **kw):
            raise AssertionError("XLA lane kernel reached")

        monkeypatch.setattr(runtime, "execute_plan", boom)
        with stats_mod.collect() as st:
            out = runtime.xz_decode(arch, engine="tpu")
        assert out == data
        assert any("vmem-ineligible" in f for f in st.fallbacks)

    def test_lzma2_explicit_tpu_ineligible_goes_native(self, monkeypatch):
        data = read_ref("foo.txt")[:200_000]  # > 64 KiB single segment
        stream = liblzma.compress(
            data, format=liblzma.FORMAT_RAW,
            filters=[{"id": liblzma.FILTER_LZMA2, "preset": 6}],
        )
        monkeypatch.setattr(runtime, "_on_tpu", lambda: True)

        def boom(*a, **kw):
            raise AssertionError("XLA lane kernel reached")

        monkeypatch.setattr(runtime, "execute_plan", boom)
        out = runtime.lzma2_decode(stream, engine="tpu")
        assert out == data

    def test_tpu_lane_engine_still_reachable(self, monkeypatch):
        data, arch = _big_tpu_archive(1)
        called = {}
        real = runtime.execute_plan

        def spy(d, plans):
            called["lane"] = True
            return real(d, plans)

        monkeypatch.setattr(runtime, "execute_plan", spy)
        out = runtime.xz_decode(arch, engine="tpu-lane")
        assert out == data
        assert called.get("lane")


class TestMultihostPendingError:
    def test_scan_blocks_raises_on_deferred_header_error(self, monkeypatch):
        # splice the bad payload into a real archive via the encoder's
        # block writer
        data = b"deferred-error-payload " * 300
        good = liblzma.compress(
            data, format=liblzma.FORMAT_RAW,
            filters=[{"id": liblzma.FILTER_LZMA2, "preset": 6}],
        )
        assert good[-1] == 0
        bad_payload = good[:-1] + bytes([0x7F, 0x00])
        arch = _wrap_payload(bad_payload, data)
        with pytest.raises(runtime.UnparallelizableStream):
            multihost.scan_blocks(arch)
        # the multihost entry falls back to the sequential decode and
        # surfaces the reference error (prefix decodes fine, then the
        # invalid status)
        monkeypatch.setattr("jax.process_count", lambda: 2)
        monkeypatch.setattr("jax.process_index", lambda: 0)
        with pytest.raises(LzmaError) as e:
            multihost.xz_decode_multihost(arch)
        assert "invalid status" in str(e.value)


def _wrap_payload(payload: bytes, raw: bytes) -> bytes:
    """Minimal one-block .xz around an arbitrary LZMA2 payload, using
    the format-level writers the encoder itself uses."""
    from lzma_rs_tpu.utils.cursor import ByteWriter

    flags = xz_fmt.StreamFlags(check_method=xz_fmt.CHECK_NONE)
    w = ByteWriter()
    xz_fmt.write_stream_header(w, flags)
    rec = xz_fmt.write_block(w, payload, raw)
    index_size = xz_fmt.write_index(w, [rec])
    xz_fmt.write_footer(w, flags, index_size)
    return w.getvalue()
