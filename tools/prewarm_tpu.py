#!/usr/bin/env python3
"""Pre-warm the persistent XLA compile cache with the VMEM kernel's
production shape buckets (cold Mosaic compiles of the TB=2 graph take
25-60 min over the axon remote-compile tunnel; the cache at
~/.cache/lzma_rs_tpu_xla makes later runs instant).

Buckets warmed (runtime.choose_vmem_config on each corpus shape):
  1. tpu_profile (block 8 KiB, lc=0, ring): L=2048, W=8192 — the
     flagship decode shape (bench tpu lane).
  2. stock xz -6 --block-size=64KiB (lc=3, full window): L=256,
     W=65536 — the foreign-archive lane.
  3. optional extra block sizes via argv (e.g. 16384 32768).

Usage: python tools/prewarm_tpu.py [extra_block_sizes...]
"""
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lzma_rs_tpu
from lzma_rs_tpu.parallel import runtime


def warm(tag, archive, expected):
    t0 = time.time()
    out = runtime.xz_decode(archive, engine="tpu-vmem")
    assert out == expected, f"{tag}: decode mismatch"
    print(f"{tag}: warmed in {time.time() - t0:.0f}s", flush=True)


def main():
    seed = open("/root/reference/tests/files/foo.txt", "rb").read()
    data = (seed * 200)[: 32 << 20]

    # 1. tpu_profile flagship shapes: both the pipelined sub-batch
    # variant (the e2e default splits single-launch workloads into
    # smaller-L launches) and the plain full-L bucket (PIPE=0, used by
    # devbench / explicit overrides) need warm caches.
    d1 = data[: 17 << 20]
    a1 = lzma_rs_tpu.xz_compress(d1, tpu_profile=True, check_method=1)
    warm("tpu_profile pipelined (sub-batch L)", a1, d1)
    os.environ["LZMA_RS_TPU_PIPE"] = "0"
    try:
        warm("tpu_profile L=2048 W=8192 (plain)", a1, d1)
    finally:
        del os.environ["LZMA_RS_TPU_PIPE"]

    # 2. stock 64 KiB blocks (lc=3 tables, full VMEM window)
    d2 = data[: 17 << 20]
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(d2)
        path = f.name
    try:
        subprocess.run(
            ["xz", "-6", "-T1", "--block-size=65536", "-k", "-f", path],
            check=True,
        )
        arch = open(path + ".xz", "rb").read()
        os.remove(path + ".xz")
    finally:
        os.remove(path)
    warm("stock64k L=256 W=65536", arch, d2)

    # 3. extra block sizes on request
    for bs in map(int, sys.argv[1:]):
        d = data[: max(4 << 20, bs * 300)]
        warm(f"tpu_profile block={bs}",
             lzma_rs_tpu.xz_compress(d, block_size=bs, tpu_profile=True,
                                     check_method=1), d)


if __name__ == "__main__":
    main()
