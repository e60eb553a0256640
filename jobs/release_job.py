"""Submittable driver for the training-data RELEASE pipeline.

The `ray job submit` counterpart of `jobs/quality_filter_job.py` for
the release side (pipelines/release.build_training_shards):

    ray job submit --working-dir . -- \
        python jobs/release_job.py \
        --input  s3://bucket/documents/ \
        --bench  s3://bucket/benchmarks/ \
        --output s3://bucket/shards/ \
        --rates '{"web": 1.0, "forums": 0.5}'

Runs quality filter → exact dedup → benchmark decontamination →
mixture sampling → packing stats → WebDataset shard export, and prints
the stage-by-stage survivor accounting as one JSON line.  On a cluster
``ray.init()`` with no address attaches to the running cluster
(``RAY_ADDRESS`` set by the job runtime); in the sandbox the script
runs standalone against local parquet.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True,
                    help="parquet of documents "
                         "(doc_id, text, lang, source)")
    ap.add_argument("--bench", required=True,
                    help="parquet of benchmark docs to decontaminate "
                         "against (needs a text column)")
    ap.add_argument("--output", required=True,
                    help="WebDataset shard output directory")
    ap.add_argument("--rates", default="{}",
                    help="JSON {source: rate} mixture weights")
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--max-hit-frac", type=float, default=0.5)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--rows-per-shard", type=int, default=10_000)
    ap.add_argument("--use-ppl", action="store_true")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():  # job runtime or standalone sandbox
        ray.init(ignore_reinit_error=True,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    from gruut_ray.pipelines.release import build_training_shards

    docs = ray.data.read_parquet(args.input)
    bench = ray.data.read_parquet(args.bench)
    summary = build_training_shards(
        docs, bench, json.loads(args.rates), args.output,
        default_rate=args.default_rate,
        max_hit_frac=args.max_hit_frac,
        seq_len=args.seq_len,
        rows_per_shard=args.rows_per_shard,
        use_ppl=args.use_ppl,
    )
    print(json.dumps(summary.iloc[0].to_dict()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
