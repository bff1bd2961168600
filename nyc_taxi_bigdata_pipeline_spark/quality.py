"""Data-quality gates (ex06 parity, SURVEY §2.12).

The Airflow DAG's verification tasks become composable library checks so
``pipeline.run_month`` owns its own quality layer:
Q2 retention thresholds, Q3 min-rowcount gates, Q4 ML eligibility,
plus the schema validation of ``validation.py:16-93``.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .schema import ML_REQUIRED_INFER, ML_REQUIRED_TRAIN

RETENTION_FAIL = 0.80  # full_pipeline_dag.py:59-60
RETENTION_WARN = 0.90
MIN_ROWCOUNT = 1000  # full_pipeline_dag.py:392-411
ML_MIN_TRAIN_MONTHS = 2  # ml_pipeline.py:296-310
ML_WINDOW_MONTHS = 3


@dataclass(frozen=True)
class CheckResult:
    name: str
    status: str  # PASS | WARN | FAIL
    detail: str

    @property
    def ok(self) -> bool:
        return self.status != "FAIL"


def retention_check(rows_in: int, rows_out: int, stage: str = "ingest") -> CheckResult:
    """Q2: stage-to-stage row retention (<80% FAIL, <90% WARN —
    full_pipeline_dag.py:130-181)."""
    ratio = (rows_out / rows_in) if rows_in else 0.0
    if ratio < RETENTION_FAIL:
        status = "FAIL"
    elif ratio < RETENTION_WARN:
        status = "WARN"
    else:
        status = "PASS"
    return CheckResult(
        f"retention:{stage}", status, f"{rows_out}/{rows_in} = {ratio:.3f}"
    )


def min_rowcount_check(n: int, table: str, minimum: int = MIN_ROWCOUNT) -> CheckResult:
    """Q3: table must carry at least ``minimum`` rows
    (full_pipeline_dag.py:392-411,504-524)."""
    status = "PASS" if n >= minimum else "FAIL"
    return CheckResult(f"min_rowcount:{table}", status, f"{n} rows (min {minimum})")


def ml_eligibility_check(available_train_months: int) -> CheckResult:
    """Q4: run ML only with enough history (≥2 of the 3-month window —
    full_pipeline_dag.py:236-256, ml_pipeline.py:296-310)."""
    status = "PASS" if available_train_months >= ML_MIN_TRAIN_MONTHS else "FAIL"
    return CheckResult(
        "ml_eligibility", status,
        f"{available_train_months} train months (min {ML_MIN_TRAIN_MONTHS})",
    )


def schema_check(df: DataFrame, mode: str = "train") -> CheckResult:
    """Required-column presence, train vs inference modes
    (validation.py:16-28,62-93)."""
    required = ML_REQUIRED_TRAIN if mode == "train" else ML_REQUIRED_INFER
    missing = [c for c in required if c not in df.columns]
    status = "PASS" if not missing else "FAIL"
    return CheckResult(f"schema:{mode}", status, f"missing={missing}")


def run_gates(*results: CheckResult) -> tuple[bool, list[CheckResult]]:
    """True iff no FAIL among the given checks."""
    return all(r.ok for r in results), list(results)


def expectation_report(
    df: DataFrame,
    *,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
    ranges: Mapping[str, tuple[float, float]] | None = None,
    accepted: Mapping[str, Sequence[str]] | None = None,
    min_rows: int | None = None,
) -> DataFrame:
    """Declarative data-quality expectation suite evaluated in ONE pass
    (a Deequ-style constraint report, extending the reference's scalar
    gates Q2/Q3 to column-level contracts).

    Every check compiles into the SAME aggregate: violation counters are
    conditional SUMs (map-side combined), uniqueness is COUNT(DISTINCT)
    beside them (Catalyst plans multi-distinct via one Expand — still a
    single scan of the input). The 1-row aggregate is then unpivoted to
    one row per check: (check, passed, observed) — observed = violation
    count (or distinct shortfall / row deficit), so 0 always means
    clean. At 100 TB this is the difference between one table scan and
    one scan PER RULE.
    """
    ranges = dict(ranges or {})
    accepted = dict(accepted or {})
    aggs: list[F.Column] = [F.count("*").cast("bigint").alias("__n")]
    checks: list[tuple[str, str]] = []  # (check name, observed expr over agg row)

    for c in not_null:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint").alias(f"__nn_{c}")
        )
        checks.append((f"not_null:{c}", f"__nn_{c}"))
    for c in unique:
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"__u_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0))
            .cast("bigint").alias(f"__un_{c}")
        )
        checks.append((f"unique:{c}", f"__un_{c} - __u_{c}"))
    for c, (lo, hi) in ranges.items():
        aggs.append(
            F.sum(
                F.when(F.col(c).isNotNull() & ~F.col(c).between(lo, hi), 1).otherwise(0)
            ).cast("bigint").alias(f"__r_{c}")
        )
        checks.append((f"in_range:{c}", f"__r_{c}"))
    for c, vals in accepted.items():
        aggs.append(
            F.sum(
                F.when(F.col(c).isNotNull() & ~F.col(c).isin(list(vals)), 1).otherwise(0)
            ).cast("bigint").alias(f"__a_{c}")
        )
        checks.append((f"accepted_values:{c}", f"__a_{c}"))
    if min_rows is not None:
        checks.append((f"min_rows:{min_rows}", f"GREATEST(CAST({min_rows} AS BIGINT) - __n, CAST(0 AS BIGINT))"))

    if not checks:
        raise ValueError(
            "no expectations specified: pass at least one of "
            "not_null/unique/ranges/accepted/min_rows"
        )
    agg_row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', CAST({obs} AS BIGINT)" for name, obs in checks
    )
    return agg_row.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (check, observed)"
    ).selectExpr("check", "observed = 0 AS passed", "observed")


def tag_violations(
    df: DataFrame,
    *,
    not_null: Sequence[str] = (),
    ranges: Mapping[str, tuple[float, float]] | None = None,
    accepted: Mapping[str, Sequence[str]] | None = None,
    tag_col: str = "dq_violations",
) -> DataFrame:
    """Row-level rule tagging: adds ``tag_col`` (array<string>) holding
    the name of every ROW-ATTRIBUTABLE rule the row violates, in fixed
    rule order (empty array = clean). Table-level rules (unique,
    min_rows) have no single offending row and stay in
    :func:`expectation_report`.

    Pure conditional column expressions — whole-stage-codegen'd, no
    shuffle, no extra scan; the tagging cost rides the scan the caller
    was already doing."""
    ranges = dict(ranges or {})
    accepted = dict(accepted or {})
    whens: list[F.Column] = []
    for c in not_null:
        whens.append(F.when(F.col(c).isNull(), F.lit(f"not_null:{c}")))
    for c, (lo, hi) in ranges.items():
        whens.append(
            F.when(
                F.col(c).isNotNull() & ~F.col(c).between(lo, hi),
                F.lit(f"in_range:{c}"),
            )
        )
    for c, vals in accepted.items():
        whens.append(
            F.when(
                F.col(c).isNotNull() & ~F.col(c).isin(list(vals)),
                F.lit(f"accepted_values:{c}"),
            )
        )
    if not whens:
        raise ValueError(
            "no row-level expectations specified: pass at least one of "
            "not_null/ranges/accepted"
        )
    return df.withColumn(tag_col, F.array_compact(F.array(*whens)))


def quarantine_split(
    df: DataFrame,
    path: str,
    *,
    not_null: Sequence[str] = (),
    ranges: Mapping[str, tuple[float, float]] | None = None,
    accepted: Mapping[str, Sequence[str]] | None = None,
    status_col: str = "dq_status",
    tag_col: str = "dq_violations",
) -> dict:
    """Quarantine sink: ONE pass routes clean and failing rows to the
    same parquet root, partitioned by ``status_col`` ∈ {clean,
    quarantined}; quarantined rows carry their rule tags. The single
    partitioned write IS the "two outputs, no double scan" shape —
    consumers read ``path/dq_status=clean`` (partition-pruned, tag
    column dropped at read) while the quarantine side keeps full rows +
    tags for triage/replay. Row counts come from ``Observation`` on the
    same job — zero extra actions.

    Extends the reference's corrupt-record quarantine (which exists
    only at the JSONL parse boundary, sources/jsonl.py) to declarative
    rule-based routing on any table."""
    from pyspark.sql import Observation

    tagged = tag_violations(
        df, not_null=not_null, ranges=ranges, accepted=accepted, tag_col=tag_col
    )
    obs = Observation()
    out = tagged.withColumn(
        status_col,
        F.when(F.size(tag_col) > 0, F.lit("quarantined")).otherwise(F.lit("clean")),
    ).observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum((F.size(tag_col) > 0).cast("bigint")).alias("quarantined"),
    )
    out.write.mode("overwrite").partitionBy(status_col).parquet(path)
    stats = obs.get
    quarantined = int(stats["quarantined"] or 0)
    return {
        "rows": int(stats["rows"]),
        "quarantined": quarantined,
        "clean": int(stats["rows"]) - quarantined,
        "clean_path": f"{path.rstrip('/')}/{status_col}=clean",
        "quarantine_path": f"{path.rstrip('/')}/{status_col}=quarantined",
    }
