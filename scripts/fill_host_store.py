"""Fill the host full-precision tier for BASELINE config 4.

The 100M-row synthetic corpus is generated ON DEVICE (the relay is too
slow to upload 77 GB, so ``run_config4.py`` builds from device-resident
blocks).  The host exact-rerank tier (``engine/host_store.py``) needs the
same rows host-side — this script regenerates each block with the shared
generator and downloads it through the relay into a bf16 memmap, row-
aligned with the device index's original row numbering (block-major).

bf16 (not f16) on the host so rerank scores are computed from the exact
bits the device's ground-truth scan saw — same-cluster score gaps here
are ~0.002, and an f16 recast would re-blur what the rerank exists to
resolve.

Relay throughput is request-RTT-bound: a single large stream crawls at
~1.5 MB/s (64 KB frames x ~30 ms RTT) and 4 requests in flight measured
only 3.3 MB/s — it takes ~16-32 concurrent ~3 MB requests to sustain
35-38 MB/s (measured on this rig), hence the 3 MB sub-slice pool with a
24-thread default.  Resumable: progress = the store's persisted row
count; re-running continues at the next block.

Usage:
  python scripts/fill_host_store.py [--blocks 96] [--threads 4] \
      [--out /tmp/archi_host_store/config4.bf16]
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=96)
    ap.add_argument("--threads", type=int, default=24)
    ap.add_argument("--sub-rows", type=int, default=4096,
                    help="rows per relay request (must divide the block). "
                         "3 MB requests x 24 threads won on the multi-core "
                         "r3 rig; on a 1-core host Python per-request "
                         "overhead dominates and 48 MB x 8 threads "
                         "measured ~21 MB/s vs ~18 for the default")
    ap.add_argument("--out", default="/tmp/archi_host_store/config4.bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/archi_tpu_jax_cache")

    from archi_tpu.benchmarking.synth_corpus import (BLOCK_ROWS, D,
                                                     make_block_fn)
    from archi_tpu.engine.host_store import HostVectorStore

    n_total = args.blocks * BLOCK_ROWS
    store = HostVectorStore(D, path=args.out, capacity=n_total,
                            dtype=ml_dtypes.bfloat16)
    start_block = len(store) // BLOCK_ROWS
    if len(store) % BLOCK_ROWS:
        print(f"store row count {len(store)} is not block-aligned; "
              f"refusing to resume", file=sys.stderr)
        sys.exit(1)
    print(f"filling blocks {start_block}..{args.blocks - 1} "
          f"({(args.blocks - start_block) * BLOCK_ROWS * D * 2 / 1e9:.0f} GB "
          f"to download)", flush=True)

    block_fn = make_block_fn(jax.random.PRNGKey(0), args.blocks)
    nt = max(1, args.threads)
    # per-request size matters more than parallelism on this relay:
    # single large streams measured ~1.5 MB/s (64 KB-frame RTT-bound),
    # while many ~3 MB requests in flight sustained tens of MB/s — so
    # the block is cut into fixed ~3 MB sub-slices drained by the pool,
    # not into nt equal shares.
    sub_rows = args.sub_rows              # 4096 x 384 bf16 = 3 MB
    assert BLOCK_ROWS % sub_rows == 0
    n_sub = BLOCK_ROWS // sub_rows

    # ONE compiled program for every sub-slice: the offset must be a
    # traced argument — a python slice per offset would bake 256 distinct
    # constants and trigger 256 remote compiles per block.
    @jax.jit
    def get_slice(b, s):
        return jax.lax.dynamic_slice_in_dim(b, s * sub_rows, sub_rows)

    t_start = time.time()
    for i in range(start_block, args.blocks):
        t0 = time.time()
        blk = block_fn(i)
        # device-side slice copies so each request downloads an
        # independent buffer (range requests through the relay)
        slices = [get_slice(blk, jnp.asarray(s, jnp.int32))
                  for s in range(n_sub)]
        jax.block_until_ready(slices)
        with cf.ThreadPoolExecutor(nt) as ex:
            parts = list(ex.map(np.asarray, slices))
        # stream parts straight into the memmap in bf16 — no concatenate
        # (805 MB of fresh pages) and no f32 round-trip: first-touch
        # faults on this host can degrade to MB/s, so the per-block path
        # must not allocate block-sized buffers
        assert sum(p.shape[0] for p in parts) == BLOCK_ROWS \
            and all(p.dtype == store.dtype for p in parts)
        for p in parts:
            store.add(p)
        store.flush()
        dt = time.time() - t0
        done = i - start_block + 1
        rate = done / (time.time() - t_start)
        eta = (args.blocks - 1 - i) / max(rate, 1e-9) / 60
        print(f"block {i}: {dt:.1f}s "
              f"({BLOCK_ROWS * D * 2 / 1e6 / dt:.0f} MB/s), "
              f"eta {eta:.0f} min", flush=True)
    print(f"done: {len(store)} rows in {args.out}", flush=True)


if __name__ == "__main__":
    main()
