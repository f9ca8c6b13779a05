#!/usr/bin/env python
"""spark-submit entry point for the COMPLETE continuous-dedup loop:

    spark-submit --master <cluster> --py-files lshdedup.zip \
        jobs/continuous_dedup.py --in /data/landing \
        --store /data/intake --clusters /data/clusters

One catch-up cycle per invocation (run it from a scheduler for a
continuously-landing corpus; every stage is independently resumable, so
a crash anywhere re-runs to the same state):

1. INGEST: drain everything currently under --in through the Structured
   Streaming intake (streaming/incremental.py `incremental_signatures`:
   readStream -> foreachBatch BatchIngestor, trigger availableNow,
   checkpointed under <store>/_checkpoint) -- per-batch committed
   signature/fingerprint/anchor/energy/keyed tables, idempotent replay,
   auto-compacted manifest.  Files already ingested in earlier cycles
   are skipped by the stream checkpoint.
2. MAINTAIN: fold every not-yet-processed committed batch into the
   standing cluster assignment via jobs/maintain_clusters.py's main()
   (one combined pending pass: incremental blocking over the four
   detectors, full text_ok screen + audio star/near edges,
   merge-on-read ClusterStore fold under --clusters).

Exit code 0 iff both stages committed.  The current assignment is
`maintain_clusters.read_current(spark, <clusters>)` at any time --
including between cycles and mid-crash.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description="continuous dedup: ingest + fold")
    ap.add_argument("--in", dest="in_dir", required=True,
                    help="landing dir of clips parquet files (stream source)")
    ap.add_argument("--store", required=True,
                    help="intake store dir (committed feature tables)")
    ap.add_argument("--clusters", required=True,
                    help="cluster-state dir (base/mapping/delta + state.json)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--fold-budget", type=int, default=1_000_000)
    ap.add_argument("--fold", action="store_true")
    ap.add_argument("--config-json", default=None)
    args = ap.parse_args()

    import os

    from locality_sensitive_hashing_spark.config import Config
    from locality_sensitive_hashing_spark.session import get_spark
    from locality_sensitive_hashing_spark.streaming.incremental import (
        incremental_signatures,
    )

    cfg = Config(**json.loads(args.config_json)) if args.config_json else Config()
    spark = get_spark(args.master or "local[*]",
                      app_name="lsh-continuous-dedup",
                      shuffle_partitions=cfg.shuffle_partitions)

    # stage 1: drain the landing dir through the checkpointed stream
    ckpt = os.path.join(args.store, "_checkpoint")
    q = incremental_signatures(spark, args.in_dir, args.store, cfg,
                               checkpoint_dir=ckpt)
    q.awaitTermination()

    # stage 2: fold pending batches (maintain_clusters.main is the tested
    # resumable job; invoked in-process with its own argv).  Under
    # spark-submit the primary script's own directory (jobs/) is what
    # lands on sys.path, so the sibling imports flat there; from the
    # repo root (tests, ad-hoc runs) it imports as a package module.
    try:
        import jobs.maintain_clusters as MJ
    except ModuleNotFoundError:
        import maintain_clusters as MJ

    argv = ["maintain_clusters", "--store", args.store,
            "--workdir", args.clusters,
            "--fold-budget", str(args.fold_budget)]
    if args.fold:
        argv.append("--fold")
    if args.config_json:
        argv += ["--config-json", args.config_json]
    if args.master:
        argv += ["--master", args.master]
    old = sys.argv
    sys.argv = argv
    try:
        return MJ.main()
    finally:
        sys.argv = old


if __name__ == "__main__":
    sys.exit(main())
