#!/usr/bin/env python3
"""Pre-warm the persistent XLA compile cache with the lane-kernel shape
buckets a typical multi-block archive hits on TPU (cold compiles over the
axon tunnel take minutes; the cache makes later runs instant)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["LZMA_RS_TPU_BACKEND"] = "tpu"
import lzma_rs_tpu

SIZES = [1 << 20, 4 << 20]      # archive sizes to cover shape buckets
for size in SIZES:
    data = (open("/root/reference/tests/files/foo.txt", "rb").read() * 64)[:size]
    c = lzma_rs_tpu.xz_compress(data, block_size=1 << 17, level=6)
    t0 = time.time()
    out = lzma_rs_tpu.xz_decompress(c)
    assert out == data
    print(f"bucket for {size >> 20} MiB archive warmed in {time.time()-t0:.0f}s",
          flush=True)
