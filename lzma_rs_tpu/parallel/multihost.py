"""Multi-host block-parallel `.xz` decode (DP over DCN).

The reference is single-process (SURVEY.md §2.3); multi-host scaling is a
new capability derived from `.xz` block independence
(``/root/reference/src/decode/xz.rs:196-290``): every block carries its own
filter chain, window, and check, and the stream index records per-block
sizes, so

1. every host parses the (tiny) container and computes the same block
   table and absolute output offsets — no communication,
2. blocks are assigned greedily by packed size (static, deterministic),
3. each host decodes its blocks locally (lane kernels or native engine),
4. outputs are exchanged with one ``process_allgather`` over DCN and
   stitched by the precomputed offsets — placement is known *before*
   decode, so the gather is the only collective and ordering is
   deterministic.

Initialize with ``jax.distributed.initialize()`` before calling
:func:`xz_decode_multihost`. Single-process invocation degrades to local
decode (the gather is the identity), which is how the unit tests exercise
the path; multi-process CPU JAX stands in for a real slice.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from lzma_rs_tpu.formats import xz as xz_fmt
from lzma_rs_tpu.utils.cursor import ByteCursor


@dataclasses.dataclass(frozen=True)
class BlockSpan:
    header_off: int
    payload_start: int
    payload_len: int
    check_off: int
    out_base: int
    out_len: int


def scan_blocks(data: bytes) -> Tuple[xz_fmt.StreamFlags, List[BlockSpan], int]:
    """Walk the container once; every host derives the identical table."""
    from lzma_rs_tpu.parallel import runtime as rt

    cursor = ByteCursor(data)
    flags = xz_fmt.parse_stream_header(cursor)
    spans: List[BlockSpan] = []
    out_base = 0
    while True:
        header_off = cursor.pos
        info = xz_fmt.read_block_header_at(cursor)
        if info is None:
            break
        payload_start = cursor.pos
        plan, consumed = rt.plan_lzma2_stream(data, payload_start, 0)
        cursor.pos = payload_start + consumed
        pad = xz_fmt.padding_size(cursor.pos - header_off)
        cursor.skip(pad)
        check_off = cursor.pos
        cursor.skip(xz_fmt.check_size(flags.check_method))
        spans.append(
            BlockSpan(
                header_off=header_off,
                payload_start=payload_start,
                payload_len=consumed,
                check_off=check_off,
                out_base=out_base,
                out_len=plan.total_out,
            )
        )
        out_base += plan.total_out
    return flags, spans, out_base


def assign_blocks(spans: List[BlockSpan], n_hosts: int) -> List[int]:
    """Greedy size-balanced, deterministic owner per block."""
    loads = [0] * n_hosts
    owner = []
    for s in spans:
        h = min(range(n_hosts), key=lambda i: (loads[i], i))
        owner.append(h)
        loads[h] += s.payload_len
    return owner


def xz_decode_multihost(data: bytes, engine: str = "native") -> bytes:
    """Decode `.xz` with blocks sharded across JAX processes.

    Every process must call this with identical ``data``; every process
    returns the full decompressed bytes.
    """
    import jax

    data = bytes(data)
    n_hosts = jax.process_count()
    host = jax.process_index()

    from lzma_rs_tpu.parallel import runtime as rt

    if n_hosts == 1:
        return rt.xz_decode(data, engine=engine)

    flags, spans, total_out = scan_blocks(data)
    owner = assign_blocks(spans, n_hosts)

    # Each host packs its owned blocks densely (in stream order); the
    # all-gather then moves ~total bytes over DCN instead of
    # n_hosts x total zero-padded buffers. Placement is derived from the
    # shared plan, so reassembly needs no extra metadata exchange.
    import os

    threads = max(1, (os.cpu_count() or 1) // n_hosts) if n_hosts > 1 else None
    owned = [s for s, o in zip(spans, owner) if o == host]
    owned_len = sum(s.out_len for s in owned)
    max_owned = max(
        (sum(s.out_len for s, o in zip(spans, owner) if o == h) for h in range(n_hosts)),
        default=0,
    )
    local = np.zeros(max_owned, dtype=np.uint8)
    off = 0
    for s in owned:
        plan, _ = rt.plan_lzma2_stream(data, s.payload_start, 0)
        if engine == "native":
            out = rt.execute_plan_native(data, [plan], threads=threads)
        else:
            out = rt.execute_plan(data, [plan])
        local[off : off + s.out_len] = np.frombuffer(out, dtype=np.uint8)
        off += s.out_len
    assert off == owned_len

    from jax.experimental import multihost_utils

    gathered = np.asarray(multihost_utils.process_allgather(local)).reshape(
        n_hosts, -1
    )

    # Stitch: walk spans in stream order, consuming each owner's dense
    # buffer sequentially (assignment order == stream order per owner).
    full = np.zeros(total_out, dtype=np.uint8)
    cursors = [0] * n_hosts
    for s, own in zip(spans, owner):
        c = cursors[own]
        full[s.out_base : s.out_base + s.out_len] = gathered[
            own, c : c + s.out_len
        ]
        cursors[own] = c + s.out_len

    # Every host verifies checks + index + footer on the assembled result.
    for s in spans:
        chk = ByteCursor(data, s.check_off)
        xz_fmt.validate_block_check(
            chk, bytes(full[s.out_base : s.out_base + s.out_len]),
            flags.check_method,
        )
    records = [
        xz_fmt.Record(
            unpadded_size=(
                s.check_off
                + xz_fmt.check_size(flags.check_method)
                - s.header_off
                - xz_fmt.padding_size(s.payload_start + s.payload_len - s.header_off)
            ),
            unpacked_size=s.out_len,
        )
        for s in spans
    ]
    cursor = ByteCursor(data)
    if spans:
        cursor.pos = (
            spans[-1].check_off + xz_fmt.check_size(flags.check_method)
        )
    else:
        xz_fmt.parse_stream_header(cursor)
    index_size = xz_fmt.check_index(cursor, records)
    xz_fmt.check_footer(cursor, flags, index_size)
    return bytes(full)
