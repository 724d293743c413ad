"""spark-submit entry point (SURVEY.md §7.1).

Cluster usage (north_rule: ``spark-submit --py-files`` on a
multi-executor cluster)::

    spark-submit --py-files tap_github_search_spark.zip \
        -m tap_github_search_spark.cli replay \
        --log-dir /data/wal/transcripts --table /lake/transcripts \
        --buckets 512

    spark-submit ... stream --log-dir ... --table ... \
        --checkpoint /lake/_ckpt/transcripts --follow

Modes:
  replay  — batch-replay the whole WAL into the table (multi-epoch).
  stream  — Structured Streaming tail with checkpointed exactly-once
            MERGE per microbatch (availableNow by default; --follow
            keeps tailing new files).
  gen     — write a deterministic synthetic changelog (testing/bench).

On a local checkout the same commands run without spark-submit:
``python -m tap_github_search_spark.cli replay ...`` — the session is
created with ``SparkSession.builder.getOrCreate()`` so an externally
provided session/master (from spark-submit) wins.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tap_github_search_spark")
    sub = p.add_subparsers(dest="mode", required=True)

    rp = sub.add_parser("replay", help="batch-replay WAL into the lake table")
    st = sub.add_parser("stream", help="tail WAL via Structured Streaming")
    gn = sub.add_parser("gen", help="generate a synthetic changelog")

    for q in (rp, st):
        q.add_argument("--log-dir", action="append", required=True,
                       help="WAL directory (repeatable)")
        q.add_argument("--table", required=True, help="lake table path")
        q.add_argument("--buckets", type=int, default=64,
                       help="bucket(N, conv_id) partition count")
    rp.add_argument("--epochs", type=int, default=1,
                    help="split the replay into N commit epochs")
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--max-files-per-trigger", type=int, default=2)
    st.add_argument("--follow", action="store_true",
                    help="keep tailing instead of availableNow")

    gn.add_argument("--out", required=True)
    gn.add_argument("--convs", type=int, default=1000)
    gn.add_argument("--files", type=int, default=8)
    gn.add_argument("--seed", type=int, default=42)
    gn.add_argument("--evolved", action="store_true")

    for q in (rp, st, gn):
        q.add_argument("--cores", type=int, default=None,
                       help="local[N] when no external master is set")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)

    from .session import get_spark

    spark = get_spark(cores=args.cores)

    if args.mode == "gen":
        from .sources.generator import write_changelog

        out = write_changelog(
            spark, args.out, args.convs, n_files=args.files,
            seed=args.seed, evolved=args.evolved,
        )
        print(json.dumps({"written": out}))
        return 0

    if args.mode == "replay":
        from .streaming.job import replay

        table, results = replay(
            spark, args.log_dir, args.table,
            n_buckets=args.buckets, n_epochs=args.epochs,
        )
        for r in results:
            print(json.dumps({
                "epoch": r.epoch, "skipped": r.skipped,
                "events_in": r.events_in, "rows_applied": r.rows_applied,
                "rows_deleted": r.rows_deleted, "merge_ms": r.merge_ms,
            }))
        return 0

    from .streaming.job import stream

    table = stream(
        spark, args.log_dir, args.table, args.checkpoint,
        n_buckets=args.buckets,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.follow,
    )
    print(json.dumps({
        "last_committed_epoch": table.last_committed_epoch,
        "metrics": table.manifest["metrics"][-3:],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
