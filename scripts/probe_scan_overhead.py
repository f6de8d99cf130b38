"""Probe: how much of the bench wall-vs-device-busy gap is per-call overhead?

BASELINE.md records 6.81 ms/step wall (bench.py scan path, scan_len=100) vs
6.03 ms/step device-busy (profile table) — a 0.78 ms/step gap. Hypothesis:
the gap is dominated by per-CALL costs (tunnel round trip of the synced
scalar fetch + enqueue) that amortize as 1/scan_len, not per-STEP device
idle. Test: measure steps/s at several scan lengths; a fixed-per-call
overhead model predicts wall(L) = busy + C/L.

Also probes whether the persistent XLA compile cache
(jax_compilation_cache_dir) serves the tunneled axon backend: if it does,
bench.py should enable it so driver runs don't pay the 3-25 min remote
compile every round.

Usage: python -u scripts/probe_scan_overhead.py [--lens 100,200,300]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="100,200,300")
    ap.add_argument("--n-calls", type=int, default=4)
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="model.compute_dtype — defaults to bfloat16, the "
                         "bench production program this probe exists to "
                         "characterize (bench.py); float32 probes the "
                         "parity path")
    args = ap.parse_args()

    import jax

    if not args.no_cache:
        from gemm_gan_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()

    import bench

    print(f"backend={jax.default_backend()}", flush=True)
    for L in [int(x) for x in args.lens.split(",")]:
        t0 = time.monotonic()
        sps = bench.jax_steps_per_sec(scan_len=L, n_calls=args.n_calls,
                                      reuse=True, dtype=args.dtype)
        total = time.monotonic() - t0
        print(f"scan_len={L}: {sps:.2f} steps/s "
              f"({1000.0 / sps:.3f} ms/step wall; call total {total:.1f}s "
              f"incl. compile+upload)", flush=True)


if __name__ == "__main__":
    main()
