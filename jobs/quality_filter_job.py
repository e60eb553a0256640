"""Submittable driver for the CC quality-filter pipeline.

This is the script the north rule's ``ray job submit`` runs on a real
cluster:

    ray job submit --working-dir . -- \
        python jobs/quality_filter_job.py \
        --input  s3://bucket/cc_pages/   \
        --output s3://bucket/filtered/   \
        --num-partitions 4096

On the fixed-size cluster Ray is already running, so ``ray.init()`` with
no address connects to it (``RAY_ADDRESS`` is set by the job runtime); in
the sandbox the same script runs standalone against local parquet.  The
pipeline is `pipelines/quality_filter.run_to_parquet`: streaming
map_batches end-to-end (no shuffle), per-partition parquet + manifest
with input lineage, resume-by-default (a re-submitted job skips
partitions whose lineage matches), keep/drop/scrub counters in the
manifests and in the final JSON printed to stdout.

Sizing guidance for multi-node runs: ``--num-partitions`` should be
several × total cores (work stealing + small resume units); actor-pool
sizing comes from the cluster via ``quality_concurrency`` auto-scaling
inside quality_filter.  Output partitioning is by ``hash(url)`` — stable
across runs and input order.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# the job's working-dir is the repo root (ray job submit --working-dir .);
# make the package importable when invoked as `python jobs/..._job.py` too
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True,
                    help="parquet directory/file of CC-shaped pages "
                         "(url, warc_ts, html, text, lang)")
    ap.add_argument("--output", required=True,
                    help="output directory (partitioned parquet + "
                         "manifests)")
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--no-resume", action="store_true",
                    help="recompute every partition even if a matching "
                         "manifest exists")
    ap.add_argument("--no-ppl", action="store_true",
                    help="skip the perplexity stage")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():  # the job runtime may have connected us
        ray.init()  # address from RAY_ADDRESS (cluster) or local fallback

    import ray.data

    from gruut_ray.pipelines.quality_filter import run_to_parquet

    ds = ray.data.read_parquet(args.input)
    stats = run_to_parquet(ds, args.output,
                           num_partitions=args.num_partitions,
                           resume=not args.no_resume,
                           use_ppl=not args.no_ppl)
    print(json.dumps({
        "rows_in": stats["rows"],
        "rows_kept": stats["kept"],
        "partitions": len(stats["partitions"]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
