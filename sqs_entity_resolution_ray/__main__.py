"""Job entry point: ``python -m sqs_entity_resolution_ray <cmd> ...``.

The ``ray job submit`` surface (north rule): one driver script that runs
the stages in program order — the reference's ECS/EventBridge
orchestration ("queue empty → run exporter",
``tofu/modules/system/alarms.tf:25-93``) collapses into sequential
stages here (SURVEY.md §3 "Orchestration above the processes").

Commands:
  resolve  --input <pages parquet/dir> --checkpoints <dir> [--export <dir>]
           [--mode full|delta] [--tracker <file>] [--threshold ...]
  records  --input <records jsonl/parquet> --out <dir>

Owns the Ray session (scripts init; the driver-contract module never
does).
"""

from __future__ import annotations

import argparse
import datetime as _dt
import json
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def _run_id() -> str:
    # timestamped like the reference's build_output_filename
    # (exporter.py:69-78)
    return _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%dT%H%M%S-UTC")


def cmd_resolve(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import pandas as pd

    from .config import MatchConfig
    from .pipelines.resolve_checkpointed import resolve_with_checkpoints
    from .pipelines.export import delta_export, full_export, record_affected
    from .state.tracker import Tracker

    mc = MatchConfig(threshold=args.threshold) if args.threshold else MatchConfig()
    result = resolve_with_checkpoints(args.input, args.checkpoints, match_cfg=mc)
    clusters = result["clusters"]
    print(json.dumps({"stage": "resolve", "cached": result["cached"],
                      "rows": clusters.count()}))

    if args.export:
        run_id = _run_id()
        if args.mode == "full":
            out = full_export(clusters, args.export, run_id)
        else:
            tracker = Tracker(args.tracker or f"{args.checkpoints}/tracker.parquet")
            prev = None
            if args.prev_clusters:
                import ray.data as rd

                prev = rd.read_parquet(args.prev_clusters).to_pandas()
            new_df = clusters.to_pandas()
            affected, deleted = record_affected(tracker, prev, new_df)
            out, exported, skipped = delta_export(
                clusters, tracker, args.export, run_id
            )
            print(json.dumps({"stage": "delta", "affected": len(affected),
                              "deleted": len(deleted),
                              "exported": len(exported),
                              "skipped": len(skipped)}))
        print(json.dumps({"stage": "export", "out": out}))
    import ray

    ray.shutdown()
    return 0


def cmd_records(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.records import load_jsonl_records, resolve_records

    if args.input.endswith(".jsonl") or args.input.endswith(".json"):
        records = load_jsonl_records(args.input)
    else:
        import ray.data as rd

        records = rd.read_parquet(args.input)
    art = resolve_records(records)
    art["clusters"].write_parquet(args.out)
    print(json.dumps({"stage": "records", "rows": art["clusters"].count(),
                      "out": args.out}))
    import ray

    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sqs_entity_resolution_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("resolve", help="pages → entity clusters (+export)")
    r.add_argument("--input", required=True)
    r.add_argument("--checkpoints", required=True)
    r.add_argument("--export")
    r.add_argument("--mode", choices=["full", "delta"], default="full")
    r.add_argument("--tracker")
    r.add_argument("--prev-clusters")
    r.add_argument("--threshold", type=float)
    r.add_argument("--num-cpus", type=int)
    r.set_defaults(fn=cmd_resolve)

    p = sub.add_parser("records", help="flat records → entity clusters")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num-cpus", type=int)
    p.set_defaults(fn=cmd_records)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
