"""Out-of-process ANN snapshot builder (VERDICT r2 weak #8).

On a single chip, a background in-process IVF/IVF-PQ rebuild contends
with serving for non-preemptible device/compile stretches (documented in
commit 18171f5).  The production shape: the serving process exports its
corpus (``AnnFlatIndex.export_corpus``), THIS process builds the
snapshot — on another chip, or on the CPU backend with ``--platform
cpu`` — and writes the standard sidecar; the serving process calls
``adopt_snapshot`` to swap it in (epoch-checked so a compaction since
export refuses the stale row numbering).

Usage:
  python scripts/ann_builder.py --corpus /path/prefix \
      [--kind ivf|ivfpq] [--nlist 1024] [--platform cpu] \
      [--pq-m 48] [--pq-refine-m 48]

Writes ``<prefix>.ann.npz`` + ``<prefix>.ann.json`` next to the export.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Script-mode sys.path[0] is scripts/; make archi_tpu importable without
# relying on the parent process's PYTHONPATH.
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="prefix written by AnnFlatIndex.export_corpus")
    ap.add_argument("--kind", default=None, choices=[None, "ivf", "ivfpq"])
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--pq-m", type=int, default=48)
    ap.add_argument("--pq-refine-m", type=int, default=48)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu) — build away "
                         "from the serving chip")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    with open(args.corpus + ".export.json") as f:
        exp = json.load(f)
    kind = args.kind or exp.get("kind", "ivf")
    z = np.load(args.corpus, allow_pickle=False)
    n = int(exp["n_rows"])
    x = jnp.asarray(z["emb"][:n], jnp.float32)
    print(f"building {kind} snapshot: {n} rows x {x.shape[1]}d "
          f"on {jax.devices()[0].platform}", flush=True)
    t0 = time.time()
    nlist = max(1, min(args.nlist, n))
    if kind == "ivfpq":
        from archi_tpu.engine.ivfpq_index import IVFPQIndex

        ivf = IVFPQIndex.build_device(x, nlist=nlist, block=512,
                                      m=args.pq_m,
                                      refine_m=args.pq_refine_m)
    else:
        from archi_tpu.engine.ivf_index import IVFIndex

        ivf = IVFIndex.build_device(x, nlist=nlist, block=512)
    ivf.save(args.corpus + ".ann.npz")
    with open(args.corpus + ".ann.json", "w") as f:
        json.dump({"n_snap": n, "kind": kind}, f)
    print(f"snapshot built in {time.time() - t0:.1f}s -> "
          f"{args.corpus}.ann.npz", flush=True)


if __name__ == "__main__":
    sys.exit(main())
