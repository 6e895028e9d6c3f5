"""Flagship pipeline entry point, `ray job submit`-shaped.

Runs the full checkpointed extraction + ordered output over a
transcript Parquet directory (north_rule lifecycle: per-partition
manifests with lineage + extraction-count metrics, resumable, one
ordering shuffle, range-ordered output files).

Usage (local):
    python tools/run_flagship.py --input /tmp/transcripts --out /tmp/run1
    python tools/run_flagship.py ... --resume        # skip finished parts

On a real cluster the same file is the job entry:
    ray job submit --working-dir . -- python tools/run_flagship.py \
        --input s3://bucket/transcripts --out s3://bucket/run1

The script owns its Ray session (guarded init) per the driver contract;
`__ray_entry__.py` never initializes Ray.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="directory of transcript parquet files")
    ap.add_argument("--out", required=True, help="output/checkpoint dir")
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore existing manifest (fresh run)")
    ap.add_argument("--no-order", action="store_true",
                    help="skip the final (conv_id, turn_idx) ordering pass")
    ap.add_argument("--files-per-partition", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "0")) or None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    from unfurl_ray.engine.pipeline import run_pipeline

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        raise SystemExit(f"no parquet files under {args.input}")

    t0 = time.time()
    manifest = run_pipeline(
        files,
        args.out,
        files_per_partition=args.files_per_partition,
        batch_size=args.batch_size,
        resume=not args.no_resume,
        order=not args.no_order,
    )
    rows = sum(p["rows"] for p in manifest["partitions"].values())
    print(json.dumps({
        "partitions": len(manifest["partitions"]),
        "rows": rows,
        "seconds": round(time.time() - t0, 2),
        "rows_per_sec": round(rows / max(time.time() - t0, 1e-9), 1),
        "out": args.out,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
