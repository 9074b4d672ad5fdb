#!/usr/bin/env python
"""Write a driver-shaped documents corpus with realistic token diversity.

The ×64-replication stress protocol (BASELINE.md) reuses the driver's
31-word-vocabulary text 64 times, which flatters the extractor's
per-actor token cache. This job writes the same row count with
~100k zipfian word types (sources/corpus.py varied generator) so the
throughput stress pays real-world cache-miss and unique-token-gemm
costs:

    python jobs/gen_varied_corpus.py --rows 640000 --out /tmp/varied_docs

then stress with

    python jobs/run_flagship.py --input /tmp/varied_docs --output ... --repeat 1
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=640_000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=43)
    ap.add_argument("--vocab-size", type=int, default=100_000)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)

    from antnre_ray.sources.corpus import synthesize_varied_documents

    t0 = time.time()
    ds = synthesize_varied_documents(args.rows, seed=args.seed, vocab_size=args.vocab_size)
    ds.write_parquet(args.out)
    print(f"wrote {args.rows} docs to {args.out} in {time.time() - t0:.1f}s")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
