"""CLI entry point — the engine as a runnable app.

Parity with the reference's spark-submit CLIs (``Ex02DataIngestion.
parseArgs``, ``ml_pipeline.py --test-month``) collapsed into one
module-level command:

    python -m nyc_taxi_bigdata_pipeline_spark ingest    --raw R --silver S --year Y --month M
    python -m nyc_taxi_bigdata_pipeline_spark run-month --raw R --zones Z --silver S --gold G --year Y --month M
    python -m nyc_taxi_bigdata_pipeline_spark ml        --silver S --registry DIR --year Y --month M
    python -m nyc_taxi_bigdata_pipeline_spark analytics --gold G --query kpis [--from D] [--to D]

Each subcommand prints a single JSON result line (machine-readable, like
the reference's report JSONs).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from .session import get_spark

    return get_spark(app_name="nyc-taxi-cli")


def cmd_ingest(args) -> dict:
    from . import ingest

    spark = _spark()
    raw = spark.read.parquet(args.raw)
    counts = ingest.ingest_month(spark, raw, args.silver, args.year, args.month)
    return {"ok": True, **counts}


def cmd_run_month(args) -> dict:
    from . import pipeline
    from .sources.csv import read_zone_lookup

    spark = _spark()
    raw = spark.read.parquet(args.raw)
    zones = read_zone_lookup(spark, args.zones)
    res = pipeline.run_month(
        spark, raw, zones, args.silver, args.gold, args.year, args.month
    )
    return {
        "ok": res.ok,
        "counts": res.counts,
        "checks": [{"name": c.name, "status": c.status, "detail": c.detail} for c in res.checks],
    }


def cmd_ml(args) -> dict:
    from . import pipeline

    spark = _spark()
    result, decision, checks = pipeline.run_ml_month(
        spark, args.silver, args.registry, args.year, args.month
    )
    out = {
        "ok": result is not None,
        "decision": decision,
        "checks": [{"name": c.name, "status": c.status, "detail": c.detail} for c in checks],
    }
    if result is not None:
        out["metrics"] = result.metrics
        out["train_rows"] = result.train_rows
        out["test_rows"] = result.test_rows
        out["train_seconds"] = round(result.train_seconds, 2)
    return out


def cmd_analytics(args) -> dict:
    from . import sql_interface

    spark = _spark()
    sql_interface.register_star(spark, args.gold)
    df = sql_interface.dashboard_query(
        spark, args.query, args.date_from, args.date_to, args.k
    )
    rows = [r.asDict(recursive=True) for r in df.limit(args.limit).collect()]
    return {"ok": True, "query": args.query, "rows": rows}


def _parse_range_spec(spec: str) -> tuple[str, tuple[float, float]]:
    """COL:LO:HI — split from the RIGHT so column names may contain ':'."""
    parts = spec.rsplit(":", 2)
    if len(parts) != 3:
        raise ValueError(f"--range expects COL:LO:HI, got {spec!r}")
    c, lo, hi = parts
    try:
        return c, (float(lo), float(hi))
    except ValueError:
        raise ValueError(f"--range bounds must be numeric in {spec!r}") from None


def _parse_accepted_spec(spec: str) -> tuple[str, list[str]]:
    """COL:v1,v2,… — split from the RIGHT so column names may contain ':'."""
    parts = spec.rsplit(":", 1)
    if len(parts) != 2 or not parts[0]:
        raise ValueError(f"--accepted expects COL:v1,v2,..., got {spec!r}")
    return parts[0], parts[1].split(",")


def cmd_dq(args) -> dict:
    from .quality import expectation_report

    spark = _spark()
    df = spark.read.parquet(args.table)
    rep = expectation_report(
        df,
        not_null=args.not_null or [],
        unique=args.unique or [],
        ranges=dict(_parse_range_spec(r) for r in args.range or []),
        accepted=dict(_parse_accepted_spec(a) for a in args.accepted or []),
        min_rows=args.min_rows,
    )
    checks = [r.asDict() for r in rep.collect()]
    return {"ok": all(c["passed"] for c in checks), "checks": checks}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="nyc_taxi_bigdata_pipeline_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("ingest", help="bronze→silver one month (ex02)")
    p.add_argument("--raw", required=True)
    p.add_argument("--silver", required=True)
    p.add_argument("--year", type=int, required=True)
    p.add_argument("--month", type=int, required=True)
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("run-month", help="full monthly pipeline (ex01→ex03+gates)")
    for flag in ("--raw", "--zones", "--silver", "--gold"):
        p.add_argument(flag, required=True)
    p.add_argument("--year", type=int, required=True)
    p.add_argument("--month", type=int, required=True)
    p.set_defaults(fn=cmd_run_month)

    p = sub.add_parser("ml", help="sliding-window train+promote (ex05)")
    p.add_argument("--silver", required=True)
    p.add_argument("--registry", required=True)
    p.add_argument("--year", type=int, required=True)
    p.add_argument("--month", type=int, required=True)
    p.set_defaults(fn=cmd_ml)

    p = sub.add_parser(
        "dq", help="data-quality expectation report over a parquet table"
    )
    p.add_argument("--table", required=True, help="parquet path")
    p.add_argument("--not-null", nargs="*", dest="not_null", metavar="COL")
    p.add_argument("--unique", nargs="*", metavar="COL")
    p.add_argument("--range", nargs="*", metavar="COL:LO:HI")
    p.add_argument("--accepted", nargs="*", metavar="COL:V1,V2")
    p.add_argument("--min-rows", type=int, dest="min_rows")
    p.set_defaults(fn=cmd_dq)

    p = sub.add_parser("analytics", help="dashboard query over gold (ex04)")
    p.add_argument("--gold", required=True)
    p.add_argument("--query", required=True, choices=["kpis", "daily_trips",
                   "hourly_trips", "payment_breakdown", "top_zones"])
    p.add_argument("--from", dest="date_from", default="0001-01-01")
    p.add_argument("--to", dest="date_to", default="9999-12-31")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--limit", type=int, default=100)
    p.set_defaults(fn=cmd_analytics)

    args = ap.parse_args(argv)
    if args.fn is cmd_dq:
        # fail with a usage message BEFORE a SparkSession spins up
        try:
            for r in args.range or []:
                _parse_range_spec(r)
            for a in args.accepted or []:
                _parse_accepted_spec(a)
        except ValueError as exc:
            ap.error(str(exc))
    out = args.fn(args)
    print(json.dumps(out, default=str))
    return 0 if out.get("ok") else 1


if __name__ == "__main__":
    sys.exit(main())
