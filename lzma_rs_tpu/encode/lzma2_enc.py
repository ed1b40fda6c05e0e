"""LZMA2 encoder: uncompressed chunks.

Capability mirror of ``/root/reference/src/encode/lzma2.rs:4-26``: the input
is cut into <=64 KiB chunks, each written as control byte ``0x01``
(uncompressed + dict reset) + ``(n-1)`` as u16 BE + raw bytes, terminated by
``0x00``. Because every chunk resets the dictionary, the output is embar-
rassingly parallel to both produce and decode.
"""

from __future__ import annotations

CHUNK = 0x10000


def lzma2_compress(data: bytes) -> bytes:
    out = bytearray()
    for off in range(0, len(data), CHUNK):
        piece = data[off : off + CHUNK]
        out.append(1)  # uncompressed, reset dict
        out += (len(piece) - 1).to_bytes(2, "big")
        out += piece
    out.append(0)
    return bytes(out)
