"""Decode-backend selection.

Three engines implement the same decode semantics:

- ``spec``: the pure-Python executable specification (oracle),
- ``native``: the C++ scalar runtime (fast host path, streaming engine),
- ``tpu``: the lane-parallel JAX/Pallas runtime (bulk path; shards
  independent LZMA2 segments / .xz blocks across vector lanes and devices).

``auto`` routes per stream: when the default JAX backend is a real TPU
and every dict-reset segment fits the VMEM kernel's static budget
(``runtime.check_vmem_eligibility``), the stream decodes on the TPU
runtime (engine ``tpu-vmem``); otherwise the native host engine if
built; otherwise spec. Raw single-stream LZMA always prefers the host
(one stream = one lane = no parallelism for the TPU to exploit). All
engines are cross-validated bit-for-bit in the test suite.
"""

from __future__ import annotations

import os
from typing import Optional

from lzma_rs_tpu.models.codecs import Lzma2Decoder, LzmaDecoder, xz_decode_stream
from lzma_rs_tpu.formats.lzma_header import read_header
from lzma_rs_tpu.utils.cursor import ByteCursor
from lzma_rs_tpu.utils.options import Options


def _backend() -> str:
    return os.environ.get("LZMA_RS_TPU_BACKEND", "auto")


def _native():
    try:
        from lzma_rs_tpu.native import loader

        return loader.load()
    except Exception:
        return None


def lzma_decode(data: bytes, options: Options) -> bytes:
    """Raw-LZMA decode via the selected backend (LZMA_RS_TPU_BACKEND)."""
    cursor = ByteCursor(data)
    params = read_header(cursor, options)
    backend = _backend()
    if backend == "tpu":
        p = params.properties
        if (
            params.unpacked_size is not None
            and p.lc + p.lp <= 4
            and options.memlimit is None
        ):
            from lzma_rs_tpu.parallel import runtime

            return runtime.lzma_raw_decode_device(data, cursor.pos, params)
        # unknown size / big literal context / memlimit: host engines below
    if backend in ("auto", "native"):
        lib = _native()
        if lib is not None:
            res = lib.lzma_decode(data, cursor.pos, params, options.memlimit)
            if res is not None:
                return res
            if backend == "native":
                raise RuntimeError("native backend failed to decode")
    decoder = LzmaDecoder(params, options.memlimit)
    return decoder.decompress(cursor)


def lzma2_decode(data: bytes) -> bytes:
    """LZMA2 chunk-stream decode via the selected backend."""
    backend = _backend()
    if backend == "auto":
        from lzma_rs_tpu.parallel import runtime

        if _native() is not None or runtime._on_tpu():
            return runtime.lzma2_decode(data, engine="auto")
    elif backend == "native":
        lib = _native()
        if lib is not None:
            from lzma_rs_tpu.parallel import runtime

            return runtime.lzma2_decode(data, engine="native")
    elif backend == "tpu":
        from lzma_rs_tpu.parallel import runtime

        return runtime.lzma2_decode(data, engine="tpu")
    return Lzma2Decoder().decompress(ByteCursor(data))


def xz_decode(data: bytes) -> bytes:
    """.xz container decode via the selected backend."""
    backend = _backend()
    if backend == "tpu":
        from lzma_rs_tpu.parallel import runtime

        return runtime.xz_decode(data, engine="tpu")
    if backend == "auto":
        from lzma_rs_tpu.parallel import runtime

        if _native() is not None or runtime._on_tpu():
            # TPU when eligible, else block/segment-parallel host cores
            return runtime.xz_decode(data, engine="auto")
    elif backend == "native":
        lib = _native()
        if lib is not None:
            # segment/block-parallel across host cores via the flat decoder
            from lzma_rs_tpu.parallel import runtime

            return runtime.xz_decode(data, engine="native")
    return xz_decode_stream(ByteCursor(data))


def _native_lzma2_cursor(lib, cursor: ByteCursor) -> bytes:
    out, consumed = lib.lzma2_decode_at(bytes(cursor.buf), cursor.pos)
    cursor.pos += consumed
    return out
