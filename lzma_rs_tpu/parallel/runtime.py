"""Parallel decode runtime: segments -> lanes -> devices.

Host-side scheduler for the lane-parallel kernel (``ops/lane_decoder.py``):

1. parse the container (`.xz` blocks / LZMA2 chunk stream) on the host —
   tiny, sequential, cheap (headers carry all sizes:
   ``/root/reference/src/decode/lzma2.rs:128-136``, ``decode/xz.rs:109-136``),
2. split chunks into **segments** at dict-reset boundaries (the format's
   natural parallel axis; window + probability state never cross a reset,
   ``decode/lzma2.rs:104-126,147-149``),
3. pre-fill uncompressed chunks straight into the flat output (they are
   known without decoding and become part of the LZ window),
4. launch every segment as one lane of the jitted micro-op kernel,
5. verify block checks / index / footer, with reference-parity errors.

Shapes are bucketed (powers of two) so repeated calls hit the jit cache.
If the kernel flags any lane error, the stream is re-decoded with the host
engine to reproduce the reference's exact error message (corrupt inputs are
the rare path).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import numpy as np

from lzma_rs_tpu.formats import lzma2 as lzma2_fmt
from lzma_rs_tpu.formats import xz as xz_fmt
from lzma_rs_tpu.formats.lzma_header import LzmaParams, LzmaProperties
from lzma_rs_tpu.utils.cursor import ByteCursor
from lzma_rs_tpu.utils.errors import LzmaError, XzError
from lzma_rs_tpu.utils import logging as log


@dataclasses.dataclass
class LanePlan:
    """One lane = one dict-reset segment (or one raw-LZMA stream)."""

    in_start: List[int]
    in_end: List[int]
    out_start: List[int]
    out_end: List[int]
    reset_state: List[int]
    lc: List[int]
    lp: List[int]
    pb: List[int]
    seg_base: int
    size_known: int
    dict_size: int


@dataclasses.dataclass
class DecodePlan:
    lanes: List[LanePlan]
    prefill: List[Tuple[int, int, int]]  # (src_off, dst_off, length)
    total_out: int
    # Chunk-header error deferred by the scanner (formats/lzma2.py): the
    # reference's sequential loop decodes the recorded prefix before
    # reaching the broken header, so plan executors must not surface
    # this ahead of prefix decode errors — they replay sequentially.
    pending_error: Optional[Exception] = None


class UnparallelizableStream(Exception):
    """The stream carries probability state across a dict-reset boundary
    (legal per the reference: an uncompressed dict-reset chunk does not
    touch the probability model, decode/lzma2.rs:195-228, and a following
    reset_mode-0 chunk continues it). Segments are then not independent
    and the stream must decode sequentially."""


def plan_lzma2_stream(
    data: bytes, start: int, out_base: int
) -> Tuple[DecodePlan, int]:
    """Plan one LZMA2 chunk stream; returns (plan, consumed_bytes).

    Output offsets are absolute (``out_base`` + position in this stream).

    Raises :class:`UnparallelizableStream` when a non-initial segment's
    first LZMA chunk does not reset the probability model — parallel
    engines fall back to the sequential host decoder for exactness.
    """
    cursor = ByteCursor(data, start)
    table = lzma2_fmt.scan(cursor)

    lanes: List[LanePlan] = []
    prefill: List[Tuple[int, int, int]] = []
    lane: Optional[LanePlan] = None

    # Props inheritance: LZMA2 starts from lc=0, lp=0, pb=0
    # (decode/lzma2.rs:23-34).
    lc, lp, pb = 0, 0, 0
    abs_out = out_base

    for chunk in table.chunks:
        if chunk.reset_dict or lane is None:
            lane = LanePlan(
                in_start=[], in_end=[], out_start=[], out_end=[],
                reset_state=[], lc=[], lp=[], pb=[],
                seg_base=abs_out, size_known=1,
                dict_size=0xFFFFFFFF,  # LZMA2 has no distance cap per se
            )
            lanes.append(lane)
        if (
            chunk.kind == lzma2_fmt.KIND_LZMA
            and not chunk.reset_state
            and not lane.in_start
            and len(lanes) > 1
        ):
            # first LZMA chunk of a later segment continues the previous
            # segment's probability model: segments are not independent
            raise UnparallelizableStream()
        if chunk.kind == lzma2_fmt.KIND_UNCOMPRESSED:
            prefill.append((chunk.data_off, abs_out, chunk.unpacked_size))
        else:
            if chunk.reset_props:
                lc, lp, pb = chunk.props.lc, chunk.props.lp, chunk.props.pb
            lane.in_start.append(chunk.data_off)
            lane.in_end.append(chunk.data_off + chunk.packed_size)
            lane.out_start.append(abs_out)
            lane.out_end.append(abs_out + chunk.unpacked_size)
            lane.reset_state.append(1 if chunk.reset_state else 0)
            lane.lc.append(lc)
            lane.lp.append(lp)
            lane.pb.append(pb)
        abs_out += chunk.unpacked_size

    plan = DecodePlan(
        lanes=[l for l in lanes if l.in_start],  # drop all-uncompressed lanes
        prefill=prefill,
        total_out=abs_out - out_base,
        pending_error=table.pending_error,
    )
    return plan, table.end_off - start


def _next_pow2(n: int, lo: int = 1) -> int:
    n = max(n, lo)
    return 1 << (n - 1).bit_length()


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: TPU compiles of the micro-op kernel
    are minutes over the remote-compile tunnel; cache them on disk."""
    import os

    import jax

    cache_dir = os.environ.get(
        "LZMA_RS_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/lzma_rs_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@functools.lru_cache(maxsize=8)
def _jitted_decoder():
    import jax

    from lzma_rs_tpu.ops.lane_decoder import decode_lanes

    _enable_compile_cache()
    return jax.jit(decode_lanes, static_argnames=("max_iters", "unroll"))


def execute_plan(data: bytes, plans: List[DecodePlan]) -> bytes:
    """Run one or more stream plans through the lane kernel; returns the
    concatenated decompressed bytes (plans laid out in order)."""
    import jax.numpy as jnp

    from lzma_rs_tpu.ops import lane_decoder as ld

    total_out = sum(p.total_out for p in plans)
    lanes: List[LanePlan] = []
    prefill: List[Tuple[int, int, int]] = []
    for p in plans:
        lanes.extend(p.lanes)
        prefill.extend(p.prefill)

    out = np.zeros(total_out + 1, dtype=np.uint8)  # +1 dump slot
    src = np.frombuffer(data, dtype=np.uint8)
    for src_off, dst_off, n in prefill:
        out[dst_off : dst_off + n] = src[src_off : src_off + n]

    if not lanes:
        return out[:total_out].tobytes()

    L = _next_pow2(len(lanes))
    K = _next_pow2(max(len(l.in_start) for l in lanes))

    def mk(fill, get, dtype=np.int32):
        arr = np.full((L, K), fill, dtype=dtype)
        for i, l in enumerate(lanes):
            v = get(l)
            arr[i, : len(v)] = v
        return arr

    in_start = mk(0, lambda l: l.in_start)
    in_end = mk(0, lambda l: l.in_end)
    out_start = mk(0, lambda l: l.out_start)
    out_end = mk(0, lambda l: l.out_end)
    reset_state = mk(0, lambda l: l.reset_state)
    lcs = mk(0, lambda l: l.lc)
    lps = mk(0, lambda l: l.lp)
    pbs = mk(0, lambda l: l.pb)
    nchunks = np.zeros(L, dtype=np.int32)
    seg_base = np.zeros(L, dtype=np.int32)
    size_known = np.ones(L, dtype=np.int32)
    dict_size = np.full(L, 0xFFFFFFFF, dtype=np.uint32)
    for i, l in enumerate(lanes):
        nchunks[i] = len(l.in_start)
        seg_base[i] = l.seg_base
        size_known[i] = l.size_known
        dict_size[i] = min(l.dict_size, 0xFFFFFFFF)

    inb = np.zeros(_next_pow2(len(data)), dtype=np.uint8)
    inb[: len(data)] = src
    # Pad the output buffer; the kernel treats the LAST element as the dump
    # slot for masked-off scatters, anything in (total_out, end) is slack.
    out_init = np.zeros(_next_pow2(total_out + 1), dtype=np.uint8)
    out_init[: total_out + 1] = out

    from lzma_rs_tpu.utils import stats as stats_mod

    st = stats_mod.current()
    if st is not None:
        st.engine = "tpu"
        st.lanes += len(lanes)
        st.chunks += int(nchunks.sum())
        st.prefill_bytes += sum(n for _, _, n in prefill)
        st.packed_bytes += len(data)
        st.unpacked_bytes += total_out

    import jax

    # Unrolling amortizes loop-boundary stalls on TPU (~2x, measured on
    # v5e) but multiplies compile time; CPU (tests) keeps the small body.
    unroll = 8 if jax.default_backend() == "tpu" else 1
    fn = _jitted_decoder()
    with stats_mod.launch_timer(st):
        out_dev, err, outp, iters = fn(
            jnp.asarray(inb), jnp.asarray(out_init),
            jnp.asarray(in_start), jnp.asarray(in_end),
            jnp.asarray(out_start), jnp.asarray(out_end),
            jnp.asarray(reset_state), jnp.asarray(lcs), jnp.asarray(lps),
            jnp.asarray(pbs), jnp.asarray(nchunks), jnp.asarray(seg_base),
            jnp.asarray(size_known), jnp.asarray(dict_size),
            unroll=unroll,
        )
        err_np = np.asarray(err)
    if st is not None:
        st.kernel_iters += int(iters)
    if err_np[: len(lanes)].any():
        lane_idx = int(np.nonzero(err_np[: len(lanes)])[0][0])
        raise _KernelError(lane_idx, int(err_np[lane_idx]))
    return np.asarray(out_dev)[:total_out].tobytes()


def execute_plan_native(
    data: bytes, plans: List[DecodePlan], threads: Optional[int] = None
) -> bytes:
    """Segment-parallel decode on the host: a thread pool drives the native
    C++ flat decoder, one call per dict-reset segment, all writing disjoint
    ranges of one shared output buffer (ctypes releases the GIL, so threads
    scale across cores). This is the CPU twin of the TPU lane kernel."""
    import ctypes
    import os
    from concurrent.futures import ThreadPoolExecutor

    from lzma_rs_tpu.native import loader

    lib = loader.load()
    if lib is None:
        raise RuntimeError("native library unavailable")

    total_out = sum(p.total_out for p in plans)
    lanes: List[LanePlan] = []
    prefill: List[Tuple[int, int, int]] = []
    for p in plans:
        lanes.extend(p.lanes)
        prefill.extend(p.prefill)

    out = bytearray(total_out)
    src = np.frombuffer(data, dtype=np.uint8)
    outv = np.frombuffer(out, dtype=np.uint8)
    for src_off, dst_off, n in prefill:
        outv[dst_off : dst_off + n] = src[src_off : src_off + n]

    from lzma_rs_tpu.utils import stats as stats_mod

    st = stats_mod.current()
    if st is not None:
        st.engine = "native"
        st.lanes += len(lanes)
        st.chunks += sum(len(l.in_start) for l in lanes)
        st.prefill_bytes += sum(n for _, _, n in prefill)
        st.packed_bytes += len(data)
        st.unpacked_bytes += total_out

    if not lanes:
        return bytes(out)

    base_addr = ctypes.addressof(ctypes.c_char.from_buffer(out))

    def run(lane: LanePlan):
        seg_cap = lane.out_end[-1] - lane.seg_base
        chunks = [
            (
                lane.in_start[i],
                lane.in_end[i],
                lane.out_start[i] - lane.seg_base,
                lane.out_end[i] - lane.seg_base,
                lane.reset_state[i],
                lane.lc[i],
                lane.lp[i],
                lane.pb[i],
            )
            for i in range(len(lane.in_start))
        ]
        lib.lzma2_decode_segment(
            data, chunks, base_addr + lane.seg_base, seg_cap
        )

    nthreads = threads or min(32, (os.cpu_count() or 1))
    with stats_mod.launch_timer(st):
        if nthreads <= 1 or len(lanes) == 1:
            for lane in lanes:
                run(lane)
        else:
            with ThreadPoolExecutor(max_workers=nthreads) as pool:
                for f in [pool.submit(run, lane) for lane in lanes]:
                    f.result()
    return bytes(out)


def _execute_native_blockwise(
    data: bytes,
    plans: List[DecodePlan],
    block_spans: List[Tuple[int, int, int, int]],
    header_flags,
) -> bytes:
    """Decode + verify per block in one fused task pipeline."""
    import ctypes
    import os
    from concurrent.futures import ThreadPoolExecutor

    from lzma_rs_tpu.native import loader
    from lzma_rs_tpu.utils import stats as stats_mod

    lib = loader.load()
    if lib is None:
        raise RuntimeError("native library unavailable")

    total_out = sum(p.total_out for p in plans)
    out = bytearray(total_out)
    outv_np = np.frombuffer(out, dtype=np.uint8)
    src = np.frombuffer(data, dtype=np.uint8)
    for p in plans:
        for src_off, dst_off, n in p.prefill:
            outv_np[dst_off : dst_off + n] = src[src_off : src_off + n]

    base_addr = ctypes.addressof(ctypes.c_char.from_buffer(out))
    outv = memoryview(out)

    st = stats_mod.current()
    if st is not None:
        st.engine = "native"
        st.lanes += sum(len(p.lanes) for p in plans)
        st.chunks += sum(len(l.in_start) for p in plans for l in p.lanes)
        st.prefill_bytes += sum(n for p in plans for _, _, n in p.prefill)
        st.packed_bytes += len(data)
        st.unpacked_bytes += total_out

    def run_block(plan: DecodePlan, span):
        _, check_off, out0, outn = span
        for lane in plan.lanes:
            seg_cap = lane.out_end[-1] - lane.seg_base
            chunks = [
                (
                    lane.in_start[i], lane.in_end[i],
                    lane.out_start[i] - lane.seg_base,
                    lane.out_end[i] - lane.seg_base,
                    lane.reset_state[i], lane.lc[i], lane.lp[i], lane.pb[i],
                )
                for i in range(len(lane.in_start))
            ]
            lib.lzma2_decode_segment(
                data, chunks, base_addr + lane.seg_base, seg_cap
            )
        xz_fmt.validate_block_check(
            ByteCursor(data, check_off),
            outv[out0 : out0 + outn],
            header_flags.check_method,
        )

    nthreads = min(32, os.cpu_count() or 1)
    with stats_mod.launch_timer(st):
        if nthreads <= 1 or len(plans) == 1:
            for plan, span in zip(plans, block_spans):
                run_block(plan, span)
        else:
            with ThreadPoolExecutor(max_workers=nthreads) as pool:
                futures = [
                    pool.submit(run_block, plan, span)
                    for plan, span in zip(plans, block_spans)
                ]
                for f in futures:  # stream order: first error wins
                    f.result()
    return bytes(out)


class VmemIneligible(Exception):
    """The plan does not fit the VMEM kernel's static budget (segment or
    staged input larger than the window bucket, too many chunks per
    segment, or literal contexts beyond the table size). Carries the
    specific reason; runtimes record it in stats so fallbacks are never
    silent."""

    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def _record_fallback(reason: str) -> None:
    from lzma_rs_tpu.utils import stats as stats_mod

    st = stats_mod.current()
    if st is not None:
        st.fallbacks.append(reason)
    log.debug("fallback: %s", reason)


def choose_vmem_config(plans: List[DecodePlan], for_eligibility: bool = False):
    """Pick the VMEM kernel shape bucket for a set of plans.

    ``for_eligibility=True`` skips the jax backend probe (lane count is
    irrelevant to the budget checks), so the ``auto`` router can reject
    ineligible archives without paying jax/device initialization.

    Smallest window bucket that fits every segment — one-hot window passes
    are O(W), so a 4 KiB-block archive decodes ~4x faster in the 4 KiB
    bucket than in the 16 KiB one. The literal-table bucket follows the
    archive's lc+lp (probability passes are O(NLIT * 768): a tpu_profile
    archive with lc=0 pays for a 768-entry table, not 6144)."""
    need_w = 1
    need_in = 1
    max_lclp = 0
    max_pb = 0
    for p in plans:
        for lane in p.lanes:
            need_w = max(need_w, lane.out_end[-1] - lane.seg_base)
            need_in = max(
                need_in,
                sum(e - s for s, e in zip(lane.in_start, lane.in_end)),
            )
            for lc, lp in zip(lane.lc, lane.lp):
                max_lclp = max(max_lclp, lc + lp)
            max_pb = max(max_pb, max(lane.pb, default=0))
    # Window buckets up to 64 KiB: a stock `xz -6 --block-size=64KiB`
    # archive (64 MiB declared dict, but <= 64 KiB of real history per
    # block) decodes on-device in the largest bucket. The window bucket
    # tracks output (window) size only; input coverage is guaranteed by
    # the separate input bucket + the packed>W_IN eligibility gate, so a
    # poorly-compressible archive (packed > unpacked) does not inflate W
    # and its O(W) per-step window passes.
    bucket = 2048
    while bucket < need_w and bucket < 65536:
        bucket *= 2
    nlit = 1 << min(max_lclp, 3)
    # Ring-window mode: per-step window passes drop from O(W/4) to
    # O(RING/4) rows. Selected for tpu_profile-shaped archives (lc=0 is
    # the profile's fingerprint; its encoder caps distances at 2048) with
    # gap-free segments; a foreign lc=0 archive with longer distances
    # costs one ERR_RING retry on the full-window kernel.
    ring = 0
    gap_free = _plans_gap_free(plans)
    if nlit == 1 and bucket >= 4096 and gap_free:
        ring = 2048
    # deeper unroll amortizes while-loop overhead and more lanes amortize
    # per-step op-issue overhead; both bounded by the 16 MB scoped-VMEM
    # stack (temporaries scale with UNROLL and L)
    # lane count scales down with the window so VMEM stays within budget
    L = 256 if bucket <= 8192 else (128 if bucket <= 16384 else 32)
    # Per-device lane-count override: smaller slabs spread few-segment
    # archives across more chips (and keep CPU dryruns/test runs small).
    import os

    env_l = os.environ.get("LZMA_RS_TPU_VMEM_L")
    if env_l:
        L = max(1, int(env_l))
    # pb <= 2 (every standard preset) packs the pos-state tables 4-wide,
    # shrinking the hot probability table ~30%
    nps = 4 if max_pb <= 2 else 16
    if os.environ.get("LZMA_RS_TPU_VMEM_GEN") == "1":
        from lzma_rs_tpu.ops import vmem_decoder as vd

        # gen-1 shares one bucket for window and staged input
        bucket1 = bucket
        while bucket1 < need_in and bucket1 < 65536:
            bucket1 *= 2
        return vd.KernelConfig(
            L=L, W=bucket1, W_IN=bucket1, NLIT=nlit, UNROLL=2, RING=ring,
            NPS=nps,
        )
    # Gen-2 (2-D lane tiles + state-in-refs, ops/vmem2_decoder.py) runs
    # many more lanes per step at near-constant step cost: lanes fold
    # into [L/128, 128] vreg tiles, so L scales with VMEM, not with
    # while-carry register pressure. Larger windows scale L down to
    # keep window + input + tables within the 100 MB VMEM budget.
    if not env_l:
        if for_eligibility:
            # L does not affect the eligibility budgets, but the auto
            # router's throughput model needs the PRODUCTION lane count
            # (what a real device launch would use), so take the on-TPU
            # branch below without paying a jax import.
            on_tpu = True
        else:
            try:
                import jax

                on_tpu = jax.default_backend() == "tpu"
            except Exception:  # pragma: no cover - jax is always present
                on_tpu = False
        if not on_tpu:
            # interpret-mode (CPU tests / dryruns) pays per-lane Python
            # cost; production lane counts would take minutes per batch
            L = 8
        elif bucket <= 8192:
            # S=16 lane tiles: +20% over L=1024 on v5e (7.99 us/step at
            # 2048 lanes = 75.3 MB/s/chip, docs/DESIGN.md round-3 table)
            L = 2048
        elif bucket <= 16384:
            L = 512
        else:
            # 32-64 KiB windows: 256 lanes. Per-lane step cost scales
            # with the lane-tile count, so larger L buys nothing for
            # throughput (measured: L=512 doubles us/step exactly) and
            # loses on partially-filled batches; the HBM window mode
            # (ops/vmem2_decoder.py HBM_WIN) keeps VMEM headroom anyway.
            L = 256
    # Independent (usually smaller) input bucket: compressed payloads are
    # ~2-5x smaller than the window, and the staged-input H2D transfer
    # scales with W_IN (the axon tunnel moves ~25-30 MB/s, so transfer
    # size is the end-to-end bottleneck on this host).
    bucket_in = 2048
    while bucket_in < need_in and bucket_in < 65536:
        bucket_in *= 2
    # TB=2: tree nodes decode two bits per step (second prob pass +
    # renorm), amortizing every other per-step pass over 2 bits — a
    # literal costs ~5 steps instead of 9. The input-lookahead tile
    # grows to cover the doubled worst-case consumption per period.
    tb = int(os.environ.get("LZMA_RS_TPU_VMEM_TB", "2"))
    unroll = int(os.environ.get("LZMA_RS_TPU_VMEM_UNROLL", "2"))
    # LIT4 (round 5): two extra lit-only bit slots per step whose reads
    # traverse only the literal region. Interpret-verified and ~-19%
    # steps, but a MEASURED DEAD END on v5e: Mosaic's one-hot select
    # cost is fixed-dominated (~1.1 us/select regardless of region
    # size), so the extra region passes cost 5.78 -> 10.2 us/step and
    # the net is 119 -> 79 MB/s/chip (docs/KERNEL_r05.md). Default OFF;
    # kept behind the env for geometries with cheaper selects.
    lit4 = (
        1 if tb == 2
        and os.environ.get("LZMA_RS_TPU_VMEM_LIT4", "0") == "1" else 0
    )
    # MAINT=120 measured fastest in the round-4/5 sweeps (vs 88/104/184).
    maint = int(os.environ.get("LZMA_RS_TPU_VMEM_MAINT", "120"))
    tile_default = 384 if tb == 2 else 256
    # TILE must cover one maintenance period's worst-case input pull
    # (KernelConfig2.__post_init__): 128 + bytes/step*MAINT + 16,
    # rounded up to the vreg minor width (4 bytes/step under LIT4)
    tile_min = 128 + (4 if lit4 else tb) * maint + 16
    while tile_default < tile_min:
        tile_default += 128
    tile = int(os.environ.get("LZMA_RS_TPU_VMEM_TILE", str(tile_default)))
    if for_eligibility:
        # lightweight view with the budget fields only: constructing a
        # real KernelConfig2 imports the pallas kernel module (and jax),
        # which the auto router must not pay just to say "native"
        from types import SimpleNamespace

        return SimpleNamespace(
            L=L, W=bucket, W_IN=bucket_in, NLIT=nlit, K=8, UNROLL=unroll,
            RING=ring, NPS=nps, TB=tb, TILE=tile, MAINT=maint,
            GAPFREE=1 if gap_free else 0, LIT4=lit4,
        )
    from lzma_rs_tpu.ops import vmem2_decoder as vd2

    # GAPFREE lets the full-window path keep the output word register-
    # resident (drops the O(W/4) old-word traversal); sound exactly when
    # every lane's chunks are output-contiguous, which the planner just
    # proved. Ring mode requires gap-free anyway, so a ring-miss retry
    # (RING=0 replace) inherits a valid GAPFREE=1.
    return vd2.KernelConfig2(
        L=L, W=bucket, W_IN=bucket_in, NLIT=nlit, UNROLL=unroll, RING=ring,
        NPS=nps, TB=tb, TILE=tile, MAINT=maint,
        GAPFREE=1 if gap_free else 0, LIT4=lit4,
    )


def _lane_gap_free(lane: LanePlan) -> bool:
    """True when the lane's chunks are output-contiguous from seg_base —
    no mid-segment stored chunks (prefill) the ring would never learn."""
    pos = lane.seg_base
    for s, e in zip(lane.out_start, lane.out_end):
        if s != pos:
            return False
        pos = e
    return True


def _plans_gap_free(plans: List[DecodePlan]) -> bool:
    return all(
        _lane_gap_free(lane) for p in plans for lane in p.lanes
    )


def _decode_segments_fn(config):
    """Kernel generation dispatch: KernelConfig2 -> gen-2 (2-D lane tiles,
    state-in-refs), plain KernelConfig -> gen-1."""
    from lzma_rs_tpu.ops import vmem2_decoder as vd2

    if isinstance(config, vd2.KernelConfig2):
        return vd2.decode_segments_vmem2
    from lzma_rs_tpu.ops.vmem_decoder import decode_segments_vmem

    return decode_segments_vmem


@functools.lru_cache(maxsize=4)
def _jitted_vmem_decoder(gen2: bool):
    import jax

    from lzma_rs_tpu.ops import vmem2_decoder as vd2
    from lzma_rs_tpu.ops.vmem_decoder import decode_segments_vmem

    _enable_compile_cache()
    return jax.jit(
        vd2.decode_segments_vmem2 if gen2 else decode_segments_vmem,
        static_argnames=("config", "max_iters", "interpret"),
    )


def _n_local_devices() -> int:
    """Local devices available to the decode runtime (capped by the
    LZMA_RS_TPU_DEVICES env var)."""
    import os

    import jax

    n = len(jax.devices())
    cap = os.environ.get("LZMA_RS_TPU_DEVICES")
    if cap:
        n = min(n, max(1, int(cap)))
    return n


@functools.lru_cache(maxsize=16)
def _sharded_vmem_decoder(n_dev: int, config, max_iters: int,
                          interpret: bool):
    """The production multi-chip decode step: the VMEM kernel shard_map'd
    over a 1-D ``dp`` mesh of local devices (``MeshConfig.make_mesh``).

    Lanes (= independent dict-reset segments) are the codec's data-parallel
    axis (SURVEY.md §2.3); every kernel operand carries lanes on the minor
    axis, so sharding is a pure split — no collectives are needed, and
    reassembly offsets are known before decode from the chunk table."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from lzma_rs_tpu.parallel.mesh import MeshConfig

    decode_fn = _decode_segments_fn(config)
    _enable_compile_cache()
    mesh = MeshConfig(n_devices=n_dev).make_mesh()
    spec = P(None, "dp")

    def inner(*args):
        return decode_fn(
            *args, config=config, max_iters=max_iters, interpret=interpret
        )

    # check_vma=False: the kernel's while-loop carry mixes device-varying
    # lane state with replicated scalars (step counter); the outputs are
    # all lane-sharded so the skipped check cannot hide a real mismatch.
    return jax.jit(
        shard_map(
            inner,
            mesh=mesh,
            in_specs=(spec,) * 7,
            out_specs=(spec,) * 4,
            check_vma=False,
        )
    )


def check_vmem_eligibility(lanes: List[LanePlan], cfg) -> None:
    """Raise :class:`VmemIneligible` if any lane exceeds the VMEM kernel's
    static budget under ``cfg``. Shared by the staging path and the
    ``auto`` engine router (which must know eligibility before committing
    to a device launch)."""
    import math

    max_lclp = int(math.log2(cfg.NLIT))
    for lane in lanes:
        seg_len = lane.out_end[-1] - lane.seg_base
        packed = sum(e - s for s, e in zip(lane.in_start, lane.in_end))
        if seg_len > cfg.W:
            raise VmemIneligible(
                f"segment {seg_len} B > window bucket {cfg.W} B"
            )
        if packed > cfg.W_IN:
            raise VmemIneligible(
                f"segment packed input {packed} B > input bucket {cfg.W_IN} B"
            )
        if len(lane.in_start) > cfg.K:
            raise VmemIneligible(
                f"segment has {len(lane.in_start)} chunks > K={cfg.K}"
            )
        for lc, lp in zip(lane.lc, lane.lp):
            if lc + lp > max_lclp:
                raise VmemIneligible(
                    f"lc+lp={lc + lp} > literal-table budget {max_lclp} "
                    f"(NLIT={cfg.NLIT})"
                )
        for pb in lane.pb:
            if (1 << pb) > cfg.NPS:
                raise VmemIneligible(
                    f"pb={pb} exceeds the pos-state table width NPS="
                    f"{cfg.NPS}"
                )
        if cfg.RING and not _lane_gap_free(lane):
            raise VmemIneligible(
                "ring mode needs gap-free segments (mid-segment stored "
                "chunks present)"
            )


class _RingMiss(Exception):
    """A lane hit a match distance beyond the ring (ERR_RING): retry the
    batch on the full-window kernel."""


def execute_plan_vmem(
    data: bytes,
    plans: List[DecodePlan],
    config=None,
    interpret: Optional[bool] = None,
) -> bytes:
    """Run stream plans through the VMEM Pallas kernel
    (``ops/vmem_decoder.py``). Each lane's window lives entirely in VMEM,
    so every segment must fit the config's window bucket; raises
    :class:`VmemIneligible` otherwise (callers fall back to the XLA lane
    kernel or the host engine). Ring-window configs retry once on the
    full-window kernel if a match distance exceeds the ring."""
    user_config = config is not None
    if config is None:
        try:
            config = choose_vmem_config(plans)
        except AssertionError as e:
            # KernelConfig2.__post_init__ enforces budgets the cheap
            # eligibility view (SimpleNamespace) does not re-derive; a
            # drifted default or env override must demote to the host
            # engine, not crash the decode
            raise VmemIneligible(f"kernel config rejected: {e}") from None
    try:
        return _execute_plan_vmem(
            data, plans, config, interpret, user_config=user_config
        )
    except _RingMiss:
        _record_fallback(
            f"ring miss: match distance beyond RING={config.RING}; "
            "retrying on the full-window kernel"
        )
        return _execute_plan_vmem(
            data, plans, dataclasses.replace(config, RING=0), interpret,
            user_config=user_config,
        )


def _execute_plan_vmem(
    data: bytes,
    plans: List[DecodePlan],
    config,
    interpret: Optional[bool] = None,
    user_config: bool = False,
) -> bytes:
    import jax
    import jax.numpy as jnp

    from lzma_rs_tpu.ops import vmem_decoder as vd

    cfg = config

    total_out = sum(p.total_out for p in plans)
    lanes: List[LanePlan] = []
    prefill: List[Tuple[int, int, int]] = []
    for p in plans:
        lanes.extend(p.lanes)
        prefill.extend(p.prefill)

    # Eligibility gate before any staging work. Reasons are explicit so
    # callers can record why the fast path was skipped (stats.fallbacks).
    check_vmem_eligibility(lanes, cfg)

    # Balance device/batch load: biggest segments first, so each batch
    # (whose wall time is its slowest lane) holds similar-size work.
    lanes.sort(
        key=lambda l: sum(e - s for s, e in zip(l.in_start, l.in_end)),
        reverse=True,
    )

    out = np.zeros(total_out, dtype=np.uint8)
    src = np.frombuffer(data, dtype=np.uint8)
    for src_off, dst_off, n in prefill:
        out[dst_off : dst_off + n] = src[src_off : src_off + n]
    if not lanes:
        return out.tobytes()

    from lzma_rs_tpu.utils import stats as stats_mod

    st = stats_mod.current()
    if st is not None:
        st.engine = "tpu-vmem"
        st.lanes += len(lanes)
        st.chunks += sum(len(l.in_start) for l in lanes)
        st.prefill_bytes += sum(n for _, _, n in prefill)
        st.packed_bytes += len(data)
        st.unpacked_bytes += total_out

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Transfer/compute pipelining: a workload that would fit 1-3 launches
    # splits into >= 4 smaller-L launches so H2D(n+1) overlaps kernel(n)
    # and D2H(n-1) (jax dispatch is async; per-lane kernel cost is
    # L-invariant — pass cost scales with the lane-tile count). Only on
    # real hardware, single-device, and when neither an explicit caller
    # config nor the L env override pinned the kernel shape (a pinned
    # shape means the caller wants THAT graph, not a resized one with a
    # fresh multi-minute compile).
    import os as _os

    if (
        not interpret
        and not user_config
        and len(lanes) >= 512
        and -(-len(lanes) // cfg.L) < 4
        and not _os.environ.get("LZMA_RS_TPU_VMEM_L")
        and _os.environ.get("LZMA_RS_TPU_PIPE", "1") != "0"
        and _n_local_devices() == 1
    ):
        target = max(256, _next_pow2(-(-len(lanes) // 4)))
        if target < cfg.L:
            cfg = dataclasses.replace(cfg, L=target)
            # stripe the (biggest-first) lanes across the split
            # launches: contiguous slicing would put ALL the longest
            # segments in launch 0 (profiled: 72 ms vs 45-54 for the
            # rest — tools/profile_pipeline.py), and each launch runs as
            # long as its slowest lane
            nb = -(-len(lanes) // target)
            lanes = [
                lanes[k] for j in range(nb)
                for k in range(j, len(lanes), nb)
            ]

    # Iteration cap: <= 8 bits per staged input byte, one step per output
    # byte (copies), chunk setups, refill waits, and up to ~2 maintenance
    # periods of reset-parking per chunk (vmem_decoder Stage E).
    max_iters = 8 * cfg.W_IN + 2 * cfg.W + cfg.MAINT * (3 * cfg.K + 4) + 1024

    # Shard lane batches over the local device mesh: each device runs the
    # kernel on its own cfg.L-lane slab (pure dp split along the minor
    # axis). A batch smaller than one slab stays single-device.
    n_dev = _n_local_devices()
    if n_dev > 1:
        n_dev = min(n_dev, max(1, -(-len(lanes) // cfg.L)))
    if n_dev > 1:
        sharded = _sharded_vmem_decoder(n_dev, cfg, max_iters, interpret)

        def call(*arrays):
            return sharded(*arrays)
    else:
        from lzma_rs_tpu.ops import vmem2_decoder as vd2

        fn0 = _jitted_vmem_decoder(isinstance(cfg, vd2.KernelConfig2))

        def call(*arrays):
            return fn0(
                *arrays, config=cfg, max_iters=max_iters,
                interpret=interpret,
            )

    if st is not None:
        st.devices = max(st.devices, n_dev)

    # Prefill intervals (stored-chunk bytes already placed in `out`): a
    # lane needs a window H2D transfer only if its segment overlaps one.
    # Interval intersection beats scanning the staged L x W buffer per
    # batch (win_init.any() read ~8 MB/batch just to skip a transfer).
    if prefill:
        _pre = sorted((d, d + n) for _, d, n in prefill if n > 0)
        _pre_starts = np.array([p[0] for p in _pre], dtype=np.int64)
        _pre_ends_cummax = np.maximum.accumulate(
            np.array([p[1] for p in _pre], dtype=np.int64)
        )
    else:
        _pre_starts = None

    def _lane_prefilled(lane, seg_len: int) -> bool:
        if _pre_starts is None:
            return False
        a, b = lane.seg_base, lane.seg_base + seg_len
        idx = int(np.searchsorted(_pre_starts, b))
        return idx > 0 and _pre_ends_cummax[idx - 1] > a

    L, K = cfg.L * n_dev, cfg.K
    with stats_mod.launch_timer(st):
        # Dispatch every batch before touching any result: jax dispatch
        # is async, so batch N+1's host-side packing overlaps batch N's
        # device time.
        pending_batches = []
        for base in range(0, len(lanes), L):
            batch = lanes[base : base + L]
            inbuf = np.zeros((L, cfg.W_IN), dtype=np.uint8)
            win_init = None  # allocated only if a lane carries prefill
            in_start = np.zeros((L, K), dtype=np.int32)
            in_end = np.zeros((L, K), dtype=np.int32)
            out_start = np.zeros((L, K), dtype=np.int32)
            out_end = np.zeros((L, K), dtype=np.int32)
            reset_state = np.zeros((L, K), dtype=np.int32)
            lcs = np.zeros((L, K), dtype=np.int32)
            lps = np.zeros((L, K), dtype=np.int32)
            pbs = np.zeros((L, K), dtype=np.int32)
            valid = np.zeros((L, K), dtype=np.int32)
            seg_lens = []
            for i, lane in enumerate(batch):
                seg_len = lane.out_end[-1] - lane.seg_base
                seg_lens.append(seg_len)
                if _lane_prefilled(lane, seg_len):
                    if win_init is None:
                        win_init = np.zeros((L, cfg.W), dtype=np.uint8)
                    win_init[i, :seg_len] = out[
                        lane.seg_base : lane.seg_base + seg_len
                    ]
                cum = 0
                for j in range(len(lane.in_start)):
                    s, e = lane.in_start[j], lane.in_end[j]
                    inbuf[i, cum : cum + (e - s)] = src[s:e]
                    in_start[i, j] = cum
                    cum += e - s
                    in_end[i, j] = cum
                    out_start[i, j] = lane.out_start[j] - lane.seg_base
                    out_end[i, j] = lane.out_end[j] - lane.seg_base
                    reset_state[i, j] = lane.reset_state[j]
                    lcs[i, j] = lane.lc[j]
                    lps[i, j] = lane.lp[j]
                    pbs[i, j] = lane.pb[j]
                valid[i, : len(lane.in_start)] = 1
            chunk_meta = vd.pack_chunk_meta(reset_state, lcs, lps, pbs,
                                            valid)

            # pack bytes as little-endian i32 words and transpose to the
            # kernel's [W, L] layout (lanes on the minor axis: 4x fewer
            # one-hot elements from packing, no lane->sublane relayouts)
            inbuf_w = np.ascontiguousarray(inbuf).view("<i4").T
            if win_init is not None:
                win_dev = jnp.asarray(
                    np.ascontiguousarray(win_init).view("<i4").T
                )
            elif getattr(cfg, "GAPFREE", 0) and not cfg.RING:
                # HBM_WIN kernels (full-window GAPFREE) never read
                # win_init — a 1-row dummy skips allocating W*L zeros
                win_dev = jnp.zeros((1, L), jnp.int32)
            else:
                # no prefilled (stored-chunk) bytes in this batch: build
                # the zero window ON DEVICE — skips a W*L-byte H2D
                # transfer (the axon tunnel moves ~25-30 MB/s; transfers,
                # not kernel time, bound end-to-end TPU decode here)
                win_dev = jnp.zeros((cfg.W // 4, L), jnp.int32)
            win, err, outp, iters = call(
                jnp.asarray(inbuf_w), win_dev,
                jnp.asarray(in_start.T), jnp.asarray(in_end.T),
                jnp.asarray(out_start.T), jnp.asarray(out_end.T),
                jnp.asarray(chunk_meta.T),
            )
            # D2H shrink: fetch only rows covering the longest segment and
            # only the populated lanes (the final batch is mostly padding)
            rows_used = (max(seg_lens) + 3) // 4
            n_act = len(batch)
            win = win[:rows_used, :n_act]
            # start the D2H copy as soon as the kernel finishes, off the
            # critical path (later launches keep the device busy while
            # earlier results stream back)
            for arr in (win, err, outp, iters):
                if hasattr(arr, "copy_to_host_async"):
                    arr.copy_to_host_async()
            pending_batches.append(
                (base, batch, seg_lens, win, err, outp, iters)
            )

        for base, batch, seg_lens, win, err, outp, iters in pending_batches:
            err_np = np.asarray(err)[0]
            outp_np = np.asarray(outp)[0]
            if st is not None:
                st.kernel_iters += int(np.asarray(iters)[0, 0])
            rows_used = (max(seg_lens) + 3) // 4
            win_np = (
                np.ascontiguousarray(np.asarray(win).T)
                .view(np.uint8)
                .reshape(len(batch), rows_used * 4)
            )
            for i, lane in enumerate(batch):
                if err_np[i] == vd.ERR_RING:
                    raise _RingMiss()
                if err_np[i]:
                    raise _KernelError(base + i, int(err_np[i]))
                if outp_np[i] != seg_lens[i]:
                    # iteration cap hit or a stuck lane: treat as corrupt
                    raise _KernelError(base + i, 1)
                out[lane.seg_base : lane.seg_base + seg_lens[i]] = win_np[
                    i, : seg_lens[i]
                ]
    return out.tobytes()


class _KernelError(Exception):
    """Internal: a lane flagged an error; host replay produces the exact
    reference error."""

    def __init__(self, lane: int, code: int):
        super().__init__(f"lane {lane} error code {code}")
        self.lane = lane
        self.code = code


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def _host_lzma2(data: bytes) -> bytes:
    from lzma_rs_tpu.native import loader

    lib = loader.load()
    if lib is not None:
        return lib.lzma2_decode(data)
    from lzma_rs_tpu.models.codecs import Lzma2Decoder

    return Lzma2Decoder().decompress(ByteCursor(data))


# --- auto-router throughput model -------------------------------------
#
# "auto picks the best available engine" must mean best END-TO-END: a
# VMEM-eligible archive can still decode 10-100x faster on the host
# (e.g. stock 64 KiB-block archives: ~1.4 MB/s/chip device vs >100 MB/s
# native). The router therefore models both engines' wall time from the
# plan alone and never routes to a modeled-slower engine.
#
# Calibration constants are measured on v5e (docs/KERNEL_r03/r04.md) and
# overridable via env (a bench run can export refreshed values):
#   LZMA_RS_TPU_CAL_NATIVE_MBS  host engine throughput (MB/s)
#   LZMA_RS_TPU_CAL_LINK_MBS    host<->device link bandwidth (MB/s)
#   LZMA_RS_TPU_CAL_STEP_A/B    us/step = A + B * port_rows, where
#                               port_rows = (RING or W)/4 is the length
#                               of the per-step window traversals (two
#                               v5e measurements fix the line: 8.0 us at
#                               512 rows ring, 80.6 us at 16384 rows)
#   LZMA_RS_TPU_CAL_STEPS_PER_B decoded steps per output byte (~3.2 on
#                               text, tools/probe_sym_stats.py)


_CAL_KEYS = (
    # (key, env var, v5e default from docs/KERNEL_r03/r04.md)
    ("native_mbs", "LZMA_RS_TPU_CAL_NATIVE_MBS", 120.0),
    ("link_mbs", "LZMA_RS_TPU_CAL_LINK_MBS", 25.0),
    # kernel fit: 5.49 us at 512 ring rows, 8.52 us at 16384
    # full-window rows (sublane-folded)
    ("step_a", "LZMA_RS_TPU_CAL_STEP_A", 5.4),
    ("step_b", "LZMA_RS_TPU_CAL_STEP_B", 0.000191),
    ("steps_per_byte", "LZMA_RS_TPU_CAL_STEPS_PER_B", 3.2),
)


def calibration_path() -> str:
    """Measured-calibration file location (host-specific cache;
    LZMA_RS_TPU_CAL_FILE overrides)."""
    import os

    return os.environ.get(
        "LZMA_RS_TPU_CAL_FILE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "lzma_rs_tpu",
            "calibration.json",
        ),
    )


def write_calibration(**vals) -> str:
    """Merge measured constants into the calibration file (bench.py and
    tools/calibrate.py call this so the auto-router's model reflects
    THIS host, not the v5e defaults)."""
    import json
    import os

    path = calibration_path()
    data = {}
    try:
        with open(path) as f:
            data = json.load(f)
    except Exception:
        pass
    data.update({k: float(v) for k, v in vals.items() if v is not None})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1)
    os.replace(tmp, path)
    return path


def _auto_calibration() -> dict:
    """Auto-router model constants. Precedence per key: env var >
    measured calibration file (``calibration_path()``) > built-in v5e
    default — so a bench/calibrate run fixes the model for this host
    while explicit env pins still win."""
    import json
    import os

    file_vals = {}
    try:
        with open(calibration_path()) as f:
            file_vals = json.load(f)
    except Exception:
        pass
    out = {}
    for key, env, default in _CAL_KEYS:
        if env in os.environ:
            out[key] = float(os.environ[env])
        elif key in file_vals:
            out[key] = float(file_vals[key])
        else:
            out[key] = default
    return out


def _estimate_engine_seconds(
    plans: List[DecodePlan], cfg, n_devices: int
) -> Tuple[float, float]:
    """(device_seconds, native_seconds) modeled from the plan.

    Device = kernel steps + H2D/D2H transfers. Each batch of cfg.L lanes
    runs until its longest lane finishes; batches pack lanes in plan
    order (like the executor), so the per-batch step count is driven by
    the batch's longest segment. Lane batches shard across chips with no
    collectives, so kernel time divides by ``n_devices``; transfers are
    modeled un-sharded (single host link, the conservative case)."""
    cal = _auto_calibration()
    lanes = [lane for p in plans for lane in p.lanes]
    # batch like the executor does: biggest segments first, so modeled
    # per-batch maxima match the real (balanced) launches
    lanes = sorted(
        lanes,
        key=lambda l: sum(e - s for s, e in zip(l.in_start, l.in_end)),
        reverse=True,
    )
    total_out = sum(p.total_out for p in plans)
    port_rows = (cfg.RING if cfg.RING else cfg.W) / 4
    us_per_step = cal["step_a"] + cal["step_b"] * port_rows
    kernel_us = 0.0
    for i in range(0, len(lanes), cfg.L):
        batch = lanes[i : i + cfg.L]
        max_out = max(
            lane.out_end[-1] - lane.seg_base for lane in batch
        )
        kernel_us += max_out * cal["steps_per_byte"] * us_per_step
    n_batches = -(-len(lanes) // cfg.L)
    # staging: inbuf (W_IN) + win_init (W) up, window (W) down, per lane
    transfer_bytes = n_batches * cfg.L * (cfg.W_IN + 2 * cfg.W)
    device_s = (
        kernel_us * 1e-6 / max(1, n_devices)
        + transfer_bytes / (cal["link_mbs"] * 1e6)
    )
    native_s = total_out / (cal["native_mbs"] * 1e6)
    return device_s, native_s


def _resolve_auto_engine(plans: List[DecodePlan]) -> str:
    """The ``auto`` engine: tpu-vmem when the default backend is a real
    TPU, every segment fits the VMEM kernel budget, AND the throughput
    model favors the device end-to-end; the host native engine
    otherwise. Eligibility is decided from the chunk table alone (no
    staging), so the check is cheap relative to decode."""
    # eligibility first: rejecting an ineligible archive must not pay
    # jax/device initialization (host decodes of stock archives would
    # otherwise stall seconds on the first call probing the backend)
    lanes = [lane for p in plans for lane in p.lanes]
    # Minimum-work gate: the device wins through lane parallelism
    # (thousands of independent segments amortizing the fixed per-step
    # cost) and a launch can pay a one-time multi-minute remote compile.
    # Small archives decode in microseconds..milliseconds on the host —
    # never worth a device trip, let alone a cold compile.
    import os

    min_lanes = int(os.environ.get("LZMA_RS_TPU_AUTO_MIN_LANES", "64"))
    min_out = int(os.environ.get("LZMA_RS_TPU_AUTO_MIN_OUT", str(1 << 20)))
    total_out = sum(p.total_out for p in plans)
    if len(lanes) < min_lanes or total_out < min_out:
        _record_fallback(
            f"auto->native: small workload ({len(lanes)} lanes, "
            f"{total_out} B out)"
        )
        return "native"
    cfg = choose_vmem_config(plans, for_eligibility=True)
    try:
        check_vmem_eligibility(lanes, cfg)
    except VmemIneligible as e:
        _record_fallback(f"auto->native: {e.reason}")
        return "native"
    if not _on_tpu():
        return "native"
    import jax

    device_s, native_s = _estimate_engine_seconds(
        plans, cfg, jax.device_count()
    )
    # Route to the device only on a clear modeled win: the model's
    # constants are coarse, so demand 10% headroom before leaving the
    # host path the user can always measure.
    if device_s < native_s * 0.9:
        return "tpu-vmem"
    _record_fallback(
        f"auto->native: modeled device {device_s * 1e3:.1f} ms "
        f"vs native {native_s * 1e3:.1f} ms"
    )
    return "native"


def lzma2_decode(data: bytes, engine: str = "tpu") -> bytes:
    """Parallel LZMA2 decode of a full chunk stream."""
    data = bytes(data)
    try:
        plan, consumed = plan_lzma2_stream(data, 0, 0)
    except UnparallelizableStream:
        _record_fallback("host: stream carries prob state across dict reset")
        return _host_lzma2(data)
    if plan.pending_error is not None:
        # A chunk-header error behind decodable chunks: only a sequential
        # decode reproduces the reference's error ordering (the prefix's
        # own decode errors come first). _host_lzma2 is the native
        # sequential chunk loop.
        _record_fallback("host replay: chunk-header error after prefix")
        return _host_lzma2(data)
    if engine == "auto":
        engine = _resolve_auto_engine([plan])
    if engine == "tpu":
        # Public device engine name: the VMEM kernel when a TPU backend
        # exists, the host engine otherwise. The ~0.3 MB/s/chip XLA lane
        # kernel is an experiment, reachable only as explicit "tpu-lane".
        if _on_tpu():
            engine = "tpu-vmem"
        else:
            _record_fallback("tpu->native: no TPU backend")
            engine = "native"
    if engine == "native":
        try:
            return execute_plan_native(data, [plan])
        except Exception:
            # exact reference-parity error (or output) via sequential host
            return _host_lzma2(data)
    if engine == "tpu-vmem":
        try:
            return execute_plan_vmem(data, [plan])
        except VmemIneligible as e:
            _record_fallback(f"vmem-ineligible: {e.reason}")
            # valid-but-ineligible archives deserve the parallel host
            # engine (reuse the plan already built; no re-scan)
            try:
                return execute_plan_native(data, [plan])
            except Exception:
                return _host_lzma2(data)
        except _KernelError as e:
            _record_fallback(f"host replay: lane error code {e.code}")
            return _host_lzma2(data)
    try:
        return execute_plan(data, [plan])  # engine == "tpu-lane"
    except _KernelError as e:
        # Corrupt stream: replay on host for the reference-parity error.
        _record_fallback(f"host replay: lane error code {e.code}")
        return _host_lzma2(data)


def lzma_raw_decode_device(data: bytes, payload_off: int, params) -> bytes:
    """Raw LZMA decode on the device kernel (one lane, one chunk).

    Requires a known unpacked size (the flat output must be preallocated);
    unknown-size streams go through the host engines. ``lc+lp`` beyond the
    lane layout's 4 bits also falls back (raw LZMA allows lc<=8).

    VMEM-eligible payloads (<= 64 KiB output, lc+lp <= 3) run on the fast
    VMEM kernel; anything larger falls back to the host engine with the
    fallback recorded — the XLA lane kernel (~0.3 MB/s/chip) is never the
    default for raw streams.
    """
    p = params.properties
    if params.unpacked_size is None or p.lc + p.lp > 4:
        raise ValueError("device path needs known size and lc+lp <= 4")
    total_out = int(params.unpacked_size)
    lane = LanePlan(
        in_start=[payload_off],
        in_end=[len(data)],
        out_start=[0],
        out_end=[total_out],
        reset_state=[1],
        lc=[p.lc], lp=[p.lp], pb=[p.pb],
        seg_base=0,
        size_known=1,
        dict_size=min(params.dict_size, 0xFFFFFFFF),
    )
    plan = DecodePlan(lanes=[lane], prefill=[], total_out=total_out)

    def _host_replay() -> bytes:
        # exact reference error strings / output via the host engines
        from lzma_rs_tpu.native import loader

        lib = loader.load()
        if lib is not None:
            res = lib.lzma_decode(data, payload_off, params, None)
            if res is not None:
                return res
        from lzma_rs_tpu.models.codecs import LzmaDecoder

        cursor = ByteCursor(data, payload_off)
        return LzmaDecoder(params, None).decompress(cursor)

    if params.dict_size < total_out:
        # The VMEM kernel has no dictionary-size distance cap (LZMA2 never
        # needs one); a raw stream whose window is smaller than its output
        # must keep the reference's "beyond dictionary size" semantics.
        _record_fallback(
            "raw-lzma vmem-ineligible: dict_size < unpacked size "
            "(distance-cap semantics)"
        )
        return _host_replay()
    try:
        return execute_plan_vmem(data, [plan])
    except VmemIneligible as e:
        _record_fallback(f"raw-lzma vmem-ineligible: {e.reason}")
        return _host_replay()
    except _KernelError as e:
        _record_fallback(f"host replay: lane error code {e.code}")
        return _host_replay()


def xz_decode(data: bytes, engine: str = "tpu") -> bytes:
    """Parallel `.xz` decode: all blocks' segments in one launch.

    ``engine``: "tpu" = lane kernel on the default JAX device;
    "native" = thread-pool over the C++ flat decoder.
    """
    data = bytes(data)
    try:
        return _xz_decode_parallel(data, engine)
    except UnparallelizableStream:
        _record_fallback("host: stream carries prob state across dict reset")
        return _sequential_xz_replay(data)


def plan_xz(data: bytes, stop_on_error: bool = False):
    """Pass 1 of `.xz` decode: walk the container (headers + chunk tables,
    no payload decoding) and return
    ``(plans, block_spans, header_flags, records, cursor)`` with the
    cursor parked at the index. Each block's plan carries absolute output
    offsets, so placement is known before any decode.

    ``stop_on_error`` (the bounded corrupt-archive path): block-scope
    errors — a malformed block header, size mismatches, or a deferred
    chunk-header error behind decodable chunks — stop the walk instead
    of raising, and a SIXTH element carries the deferred exception. The
    returned plans then cover exactly what the reference's sequential
    decoder would decode before hitting the error (complete prefix
    blocks, plus the erroring block's decodable chunk prefix whose span
    has check_off=None); the caller decodes/verifies that prefix and
    re-raises. An adversarial input no longer costs a full sequential
    replay unless the prefix itself fails (VERDICT r4 weak #8)."""
    from lzma_rs_tpu.utils.errors import IoError

    cursor = ByteCursor(data)
    header_flags = xz_fmt.parse_stream_header(cursor)

    plans: List[DecodePlan] = []
    block_spans: List[Tuple[int, int, int, int]] = []  # start, payload, out0, outn
    records: List[xz_fmt.Record] = []
    out_base = 0
    deferred: Optional[Exception] = None

    while True:
        block_start = cursor.pos
        try:
            info = xz_fmt.read_block_header_at(cursor)
            if info is None:
                break
            filt = info.header.filters[0]
            if len(filt.props) != 1:
                raise XzError("Invalid properties for filter Lzma2")
            payload_start = cursor.pos
            plan, consumed = plan_lzma2_stream(data, payload_start, out_base)
            if plan.pending_error is not None:
                # A chunk-header error behind decodable chunks: the
                # reference surfaces prefix decode errors (then this
                # error) before any container-level size validation.
                if not stop_on_error:
                    raise UnparallelizableStream()
                deferred = plan.pending_error
                if plan.lanes or plan.prefill:
                    plans.append(plan)
                    block_spans.append(
                        (block_start, None, out_base, plan.total_out)
                    )
                break
            cursor.pos = payload_start + consumed
            if (
                info.header.packed_size is not None
                and consumed != info.header.packed_size
            ):
                raise XzError(
                    f"Invalid compressed size: expected "
                    f"{info.header.packed_size} but got {consumed}"
                )
            if (
                info.header.unpacked_size is not None
                and plan.total_out != info.header.unpacked_size
            ):
                raise XzError(
                    f"Invalid decompressed size: expected "
                    f"{info.header.unpacked_size} but got {plan.total_out}"
                )
            count = cursor.pos - block_start
            pad = xz_fmt.padding_size(count)
            xz_fmt.read_padding(cursor, pad, "block")
            check_off = cursor.pos
            cursor.skip(xz_fmt.check_size(header_flags.check_method))
        except UnparallelizableStream:
            raise
        except (LzmaError, XzError, IoError) as e:
            if not stop_on_error:
                raise
            deferred = e
            break
        plans.append(plan)
        block_spans.append((block_start, check_off, out_base, plan.total_out))
        records.append(
            xz_fmt.Record(
                unpadded_size=cursor.pos - block_start - pad,
                unpacked_size=plan.total_out,
            )
        )
        out_base += plan.total_out

    if stop_on_error:
        return plans, block_spans, header_flags, records, cursor, deferred
    return plans, block_spans, header_flags, records, cursor


def _sequential_xz_replay(data: bytes) -> bytes:
    """Reference-ordered sequential `.xz` decode for error replay.

    Uses the spec container walk (exact reference errors) with the
    NATIVE sequential LZMA2 chunk loop as the payload decoder when
    available — pure-Python payload decode is ~0.1 MB/s, which made
    replaying a large corrupt archive take minutes."""
    from lzma_rs_tpu.models.codecs import xz_decode_stream
    from lzma_rs_tpu.native import loader

    lib = loader.load()
    hook = None
    if lib is not None:
        buf = data

        def hook(cursor):
            out, consumed = lib.lzma2_decode_at(buf, cursor.pos)
            cursor.pos += consumed
            return out

    return xz_decode_stream(ByteCursor(data), decode_lzma2=hook)


def _bounded_error_replay(
    data: bytes, plans, block_spans, header_flags, deferred: Exception
) -> bytes:
    """Bounded corrupt-archive path: the planner stopped at a block-scope
    error with a clean prefix plan. Decode the prefix with the parallel
    NATIVE engine and verify its checks in stream order; if everything
    is clean the reference's first error IS the deferred one — raise it
    without replaying the archive sequentially. Any prefix failure falls
    back to the full sequential replay (exact reference ordering)."""
    try:
        if plans:
            out = execute_plan_native(data, plans)
            outv = memoryview(out)
            for block_start, check_off, out0, outn in block_spans:
                if check_off is None:
                    continue  # the erroring block never reaches its check
                xz_fmt.validate_block_check(
                    ByteCursor(data, check_off), outv[out0 : out0 + outn],
                    header_flags.check_method,
                )
    except (LzmaError, XzError) as e:
        # a prefix error surfaces before the deferred one — but only the
        # sequential decoder guarantees the reference's exact ordering
        # for multi-error prefixes
        _record_fallback(
            f"host replay: prefix error before deferred ({e})"
        )
        return _sequential_xz_replay(data)
    except Exception:
        _record_fallback("host replay: prefix decode failed (bounded path)")
        return _sequential_xz_replay(data)
    _record_fallback("bounded replay: clean prefix, raising deferred error")
    raise deferred


def _xz_decode_parallel(data: bytes, engine: str) -> bytes:
    from lzma_rs_tpu.utils.errors import IoError

    try:
        (plans, block_spans, header_flags, records, cursor,
         deferred) = plan_xz(data, stop_on_error=True)
        if deferred is not None:
            # Malformed archive with a decodable prefix: the reference
            # interleaves block decode with the walk, so the prefix must
            # decode (and check) cleanly before this error surfaces.
            # Bounded work: parallel prefix decode + one error raise
            # instead of a whole-archive sequential replay.
            return _bounded_error_replay(
                data, plans, block_spans, header_flags, deferred
            )
        index_size = xz_fmt.check_index(cursor, records)
    except UnparallelizableStream:
        raise
    except (LzmaError, XzError, IoError):
        # Stream-header or index-level error: blocks all planned clean,
        # but the reference decodes them (with checks) before reaching
        # the index/footer. The sequential decoder reproduces the
        # ordering exactly (and re-raises this error when it is first).
        _record_fallback("host replay: container error during planning")
        return _sequential_xz_replay(data)

    if engine == "auto":
        engine = _resolve_auto_engine(plans)
    if engine == "tpu":
        # Public device engine name (see lzma2_decode): VMEM kernel on a
        # real TPU, host engine otherwise; the XLA lane kernel is only
        # reachable as explicit "tpu-lane".
        if _on_tpu():
            engine = "tpu-vmem"
        else:
            _record_fallback("tpu->native: no TPU backend")
            engine = "native"

    # Pass 2: decode all blocks in one parallel launch. The native engine
    # pipelines: each block's task decodes its segments then verifies its
    # check immediately, so hashing overlaps the decode of later blocks
    # (errors still surface in stream order).
    if engine == "native":
        try:
            out = _execute_native_blockwise(
                data, plans, block_spans, header_flags
            )
        except Exception:
            return _sequential_xz_replay(data)
        xz_fmt.check_footer(cursor, header_flags, index_size)
        return out
    else:
        out = None
        if engine == "tpu-vmem":
            try:
                out = execute_plan_vmem(data, plans)
            except VmemIneligible as e:
                _record_fallback(f"vmem-ineligible: {e.reason}")
                # valid-but-ineligible archives deserve the parallel
                # host engine — reuse the plans already built (no
                # container re-scan) via the same native block path
                try:
                    out = _execute_native_blockwise(
                        data, plans, block_spans, header_flags
                    )
                except Exception:
                    return _sequential_xz_replay(data)
                xz_fmt.check_footer(cursor, header_flags, index_size)
                return out
            except _KernelError as e:
                _record_fallback(f"host replay: lane error code {e.code}")
                return _sequential_xz_replay(data)
        if out is None:
            try:
                out = execute_plan(data, plans)  # engine == "tpu-lane"
            except _KernelError as e:
                _record_fallback(f"host replay: lane error code {e.code}")
                return _sequential_xz_replay(data)

    # Pass 3: verify block checks. Stream order for error determinism; the
    # hashing itself fans out across a small thread pool (zlib / native
    # crc64 release the GIL). On the TPU engine, large CRC blocks are
    # hashed on-device (ops/crc_device.py).
    outv = memoryview(out)

    def check_one(span):
        block_start, check_off, out0, outn = span
        chk = ByteCursor(data, check_off)
        block_out = outv[out0 : out0 + outn]
        import os as _os

        # Device CRC (ops/crc_device.py, MXU GF(2) matmul) is the default
        # on the tpu engine for large blocks. The round-1 TPU miscompile is
        # RESOLVED (the kernel returns the parity matrix and the host packs;
        # verified bit-exact on v5e: crc32 51 MB/s, crc64 42 MB/s warm).
        # Opt out with LZMA_RS_TPU_DEVICE_CRC=0; small blocks stay on host
        # zlib (launch latency dominates under ~1 MiB).
        if (
            engine == "tpu"
            and _os.environ.get("LZMA_RS_TPU_DEVICE_CRC", "1") != "0"
            and (_on_tpu() or _os.environ.get("LZMA_RS_TPU_DEVICE_CRC"))
            and outn >= (1 << 20)
            and header_flags.check_method
            in (xz_fmt.CHECK_CRC32, xz_fmt.CHECK_CRC64)
        ):
            import time as _time

            from lzma_rs_tpu.ops import crc_device
            from lzma_rs_tpu.utils import stats as stats_mod

            st = stats_mod.current()
            t0 = _time.perf_counter()
            if header_flags.check_method == xz_fmt.CHECK_CRC32:
                expected = chk.read_u32_le()
                digest = crc_device.crc32_device(bytes(block_out))
                if expected != digest:
                    raise XzError(
                        f"Invalid block CRC32, expected 0x{expected:08x} "
                        f"but got 0x{digest:08x}"
                    )
            else:
                expected = int.from_bytes(chk.read_exact(8), "little")
                digest = crc_device.crc64_device(bytes(block_out))
                if expected != digest:
                    raise XzError(
                        f"Invalid block CRC64, expected 0x{expected:016x} "
                        f"but got 0x{digest:016x}"
                    )
            if st is not None:
                st.device_crc_seconds += _time.perf_counter() - t0
                st.device_crc_bytes += outn
        else:
            xz_fmt.validate_block_check(
                chk, block_out, header_flags.check_method
            )

    if len(block_spans) > 1 and engine != "tpu":
        import os
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as pool:
            futures = [pool.submit(check_one, s) for s in block_spans]
            for f in futures:  # stream order preserved for first error
                f.result()
    else:
        for span in block_spans:
            check_one(span)

    xz_fmt.check_footer(cursor, header_flags, index_size)
    return out
