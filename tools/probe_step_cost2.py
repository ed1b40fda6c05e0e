#!/usr/bin/env python3
"""Per-component step-cost breakdown of the GEN-2 VMEM kernel on real TPU.

Same idea as probe_step_cost.py (spin mode + LZMA_RS_TPU_ABLATE), but for
ops/vmem2_decoder.py and with CHAINED timing: each call feeds its win
output back as win_init, forcing real sequential execution (the axon
tunnel reports same-input repeat calls as ready in ~0.1 ms, which is not
a real execution time).

Usage: python tools/probe_step_cost2.py [L] [W] [RING] [NLIT] [NPS] [UNROLL]
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time, json
sys.path.insert(0, %(here)r)
import numpy as np

cfg_kw = json.loads(sys.argv[1])
iters = int(sys.argv[2])

from lzma_rs_tpu.ops import vmem_decoder as vd
from lzma_rs_tpu.ops import vmem2_decoder as vd2
from lzma_rs_tpu.parallel import runtime as rt
import jax, jax.numpy as jnp

cfg = vd2.KernelConfig2(**cfg_kw)
L, K, W = cfg.L, cfg.K, cfg.W

import lzma_rs_tpu
seed = open("/root/reference/tests/files/foo.txt", "rb").read()
data = (seed * (L * W // len(seed) + 1))[: L * (W // 2)]
arch = lzma_rs_tpu.xz_compress(data, block_size=W // 2, tpu_profile=True)
plans, *_ = rt.plan_xz(arch)

fn = rt._jitted_vmem_decoder(True)
lanes = [l for p in plans for l in p.lanes][:L]
inbuf = np.zeros((L, cfg.W_IN), np.uint8)
win = np.zeros((L, cfg.W), np.uint8)
is_ = np.zeros((L, K), np.int32); ie = np.zeros((L, K), np.int32)
os_ = np.zeros((L, K), np.int32); oe = np.zeros((L, K), np.int32)
rs = np.zeros((L, K), np.int32); lcs = np.zeros((L, K), np.int32)
lps = np.zeros((L, K), np.int32); pbs = np.zeros((L, K), np.int32)
va = np.zeros((L, K), np.int32)
src = np.frombuffer(arch, np.uint8)
for i, lane in enumerate(lanes):
    cum = 0
    for j in range(len(lane.in_start)):
        s, e = lane.in_start[j], lane.in_end[j]
        inbuf[i, cum:cum + e - s] = src[s:e]
        is_[i, j] = cum; cum += e - s; ie[i, j] = cum
        os_[i, j] = lane.out_start[j] - lane.seg_base
        oe[i, j] = lane.out_end[j] - lane.seg_base
        rs[i, j] = lane.reset_state[j]
        lcs[i, j] = lane.lc[j]; lps[i, j] = lane.lp[j]
        pbs[i, j] = lane.pb[j]
    va[i, :len(lane.in_start)] = 1
meta = vd.pack_chunk_meta(rs, lcs, lps, pbs, va)
args = [jnp.asarray(np.ascontiguousarray(inbuf).view('<i4').T),
        jnp.asarray(np.ascontiguousarray(win).view('<i4').T),
        jnp.asarray(is_.T), jnp.asarray(ie.T), jnp.asarray(os_.T),
        jnp.asarray(oe.T), jnp.asarray(meta.T)]

w, err, outp, it = fn(*args, config=cfg, max_iters=iters, interpret=False)
jax.block_until_ready(w)  # compile + warm
n = int(np.asarray(it)[0, 0])
N = 8
t0 = time.perf_counter()
for _ in range(N):
    w, err, outp, it = fn(args[0], w, *args[2:], config=cfg,
                          max_iters=iters, interpret=False)
jax.block_until_ready(w)
per = (time.perf_counter() - t0) / N
print(f"RESULT {os.environ.get('LZMA_RS_TPU_ABLATE','-')} "
      f"{per/n*1e6:.3f} us/step ({n} steps, {per*1e3:.1f} ms/call)",
      flush=True)
"""


def main():
    argv = sys.argv[1:]
    cfg = {
        "L": int(argv[0]) if len(argv) > 0 else 1024,
        "W": int(argv[1]) if len(argv) > 1 else 8192,
        "RING": int(argv[2]) if len(argv) > 2 else 2048,
        "NLIT": int(argv[3]) if len(argv) > 3 else 1,
        "NPS": int(argv[4]) if len(argv) > 4 else 4,
        "UNROLL": int(argv[5]) if len(argv) > 5 else 2,
    }
    cfg["W_IN"] = cfg["W"]
    iters = 4096
    cases = [
        "spin",
        "spin,probread",
        "spin,probread,probwrite",
        "spin,port",
        "spin,winwrite",
        "spin,refill",
        "spin,flush",
        "spin,probread,probwrite,port,winwrite,refill,flush",
    ]
    script = WORKER % {"here": HERE}
    for case in cases:
        env = dict(os.environ, LZMA_RS_TPU_ABLATE=case)
        r = subprocess.run(
            [sys.executable, "-c", script, json.dumps(cfg), str(iters)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
                break
        else:
            print(f"RESULT {case} FAILED: {r.stderr[-300:]}", flush=True)


if __name__ == "__main__":
    main()
