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

    # Decode the local subset into the (zeroed) full-size buffer.
    local = np.zeros(total_out, dtype=np.uint8)
    for s, own in zip(spans, owner):
        if own != host:
            continue
        plan, _ = rt.plan_lzma2_stream(data, s.payload_start, 0)
        if engine == "native":
            out = rt.execute_plan_native(data, [plan])
        else:
            out = rt.execute_plan(data, [plan])
        local[s.out_base : s.out_base + s.out_len] = np.frombuffer(
            out, dtype=np.uint8
        )

    # One all-gather over DCN; each host's buffer is zero outside its own
    # blocks, so an elementwise max reconstructs the full stream in order.
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(local)
    full = np.max(gathered.reshape(n_hosts, -1), axis=0).astype(np.uint8)

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
