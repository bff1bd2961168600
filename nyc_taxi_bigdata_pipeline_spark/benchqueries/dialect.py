"""Tiny dual-dialect SQL renderer for Spark-SQL vs DuckDB.

Most queries share fragments verbatim (functions/compat.py); the
text/dedup/similarity operators additionally need a handful of functions
whose *names* differ while semantics match. A query renders once per
engine from the same template, so both sides stay structurally identical.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"


def split_ws(expr: str, engine: str) -> str:
    """Whitespace-ish tokenization on single spaces (testdata is
    space-joined synthetic vocab)."""
    return f"string_split({expr}, ' ')" if engine == DUCK else f"split({expr}, ' ')"


def alen(expr: str, engine: str) -> str:
    return f"len({expr})" if engine == DUCK else f"size({expr})"


def re_replace_all(expr: str, pattern: str, rep: str, engine: str) -> str:
    """Replace-all: DuckDB needs the 'g' flag, Spark is global by default.

    Pass the regex with *single* backslashes (r"\\s+"); Spark SQL string
    literals eat one level of backslash escaping, DuckDB does not.
    """
    if engine == DUCK:
        return f"regexp_replace({expr}, '{pattern}', '{rep}', 'g')"
    pat = pattern.replace("\\", "\\\\")
    return f"regexp_replace({expr}, '{pat}', '{rep}')"


def re_extract_all(expr: str, pattern: str, engine: str) -> str:
    """All non-overlapping matches as an array (explicit group 0 — Spark
    defaults idx to 1 and raises without a capture group). Same backslash
    rule as re_replace_all: pass single-backslash patterns."""
    if engine == DUCK:
        return f"regexp_extract_all({expr}, '{pattern}', 0)"
    pat = pattern.replace("\\", "\\\\")
    return f"regexp_extract_all({expr}, '{pat}', 0)"


def re_matches(expr: str, pattern: str, engine: str) -> str:
    """Boolean regex containment (DuckDB regexp_matches is unanchored,
    Spark RLIKE likewise). Same single-backslash input rule as
    re_replace_all."""
    if engine == DUCK:
        return f"regexp_matches({expr}, '{pattern}')"
    pat = pattern.replace("\\", "\\\\")
    return f"({expr} RLIKE '{pat}')"


def arr_lit(items: list[str], engine: str) -> str:
    """Array literal of strings."""
    quoted = ", ".join(f"'{x}'" for x in items)
    return f"[{quoted}]" if engine == DUCK else f"array({quoted})"


def at(arr: str, idx: str, engine: str) -> str:
    """1-based array indexing. Out-of-bounds → NULL in DuckDB, but Spark
    runs ANSI mode by default where element_at RAISES — callers must
    guarantee the index is in range (clamp/filter the index sequence)
    or use try_at."""
    return f"{arr}[{idx}]" if engine == DUCK else f"element_at({arr}, {idx})"


def try_at(arr: str, idx: str, engine: str) -> str:
    """1-based array indexing, out-of-bounds → NULL in BOTH engines
    (Spark try_element_at sidesteps ANSI ARRAY_INDEX_OUT_OF_BOUNDS)."""
    return f"{arr}[{idx}]" if engine == DUCK else f"try_element_at({arr}, {idx})"


def iseq(start: str, stop: str, engine: str) -> str:
    """Ascending integer sequence. Spark's sequence() flips to descending
    when start > stop, so callers must clamp stop with GREATEST."""
    return f"generate_series({start}, {stop})" if engine == DUCK else f"sequence({start}, {stop})"


def unnest_col(arr: str, engine: str) -> str:
    """Array → rows in a select list (one generator per SELECT)."""
    return f"unnest({arr})" if engine == DUCK else f"explode({arr})"


def transform(arr: str, lam: str, engine: str) -> str:
    return f"list_transform({arr}, {lam})" if engine == DUCK else f"transform({arr}, {lam})"


def arr_filter(arr: str, lam: str, engine: str) -> str:
    return f"list_filter({arr}, {lam})" if engine == DUCK else f"filter({arr}, {lam})"


def arr_distinct(arr: str, engine: str) -> str:
    return f"list_distinct({arr})" if engine == DUCK else f"array_distinct({arr})"


def arr_intersect(a: str, b: str, engine: str) -> str:
    return f"list_intersect({a}, {b})" if engine == DUCK else f"array_intersect({a}, {b})"


def bigram_positions(arr: str, engine: str) -> str:
    """Position generator for word-bigram extraction over array ``arr``:
    emits ``__i``-style 1-based indices with i+1 <= len(arr). Packages
    two pitfalls in one place: Spark's sequence() flips descending when
    start > stop (GREATEST clamp) and ANSI element_at raises out of
    bounds (the filter guarantees i+1 stays in range). Callers pair it
    with ``at(arr, '__i')`` / ``at(arr, '__i + 1')``."""
    alen_ = alen(arr, engine)
    seq = iseq("1", f"greatest({alen_} - 1, 1)", engine)
    return unnest_col(
        arr_filter(seq, f"i -> i + 1 <= {alen_}", engine), engine
    )


def arr_contains(arr: str, x: str, engine: str) -> str:
    return (f"list_contains({arr}, {x})" if engine == DUCK
            else f"array_contains({arr}, {x})")


def arr_min(arr: str, engine: str) -> str:
    return f"list_min({arr})" if engine == DUCK else f"array_min({arr})"


def arr_slice(arr: str, start: str, length: str, engine: str) -> str:
    """1-based, length-bounded subarray. DuckDB list_slice takes an
    INCLUSIVE (begin, end) and clamps end past the array; Spark slice
    takes (start, length) and likewise truncates at the end — so the two
    agree whenever start is in range and length ≥ 0."""
    if engine == DUCK:
        return f"list_slice({arr}, {start}, ({start}) + ({length}) - 1)"
    return f"slice({arr}, {start}, {length})"


def arr_join(arr: str, sep: str, engine: str) -> str:
    return (f"array_to_string({arr}, {sep})" if engine == DUCK
            else f"array_join({arr}, {sep})")


def fold_sum_double(arr: str, engine: str) -> str:
    """Sequential left-fold sum of a double array — both engines fold in
    element order, so the float accumulation is bit-identical."""
    if engine == DUCK:
        return f"list_sum({arr})"
    return f"aggregate({arr}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"


def h64(expr: str, engine: str) -> str:
    """Portable md5-based 64-bit hash (see functions/compat.py)."""
    if engine == DUCK:
        return f"CAST(CONCAT('0x', SUBSTRING(MD5({expr}), 1, 15)) AS BIGINT)"
    return f"CAST(CONV(SUBSTRING(MD5({expr}), 1, 15), 16, 10) AS BIGINT)"


def seeded_h64(expr: str, seed: int, engine: str) -> str:
    return h64(f"CONCAT('{seed}#', {expr})", engine)


def hex15_to_int(expr: str, engine: str) -> str:
    """15-hex-char string expression → int64 (both engines, exact)."""
    if engine == DUCK:
        return f"CAST(CONCAT('0x', {expr}) AS BIGINT)"
    return f"CAST(CONV({expr}, 16, 10) AS BIGINT)"


def bit_xor(a: str, b: str, engine: str) -> str:
    """Bitwise xor: DuckDB's ^ is exponentiation, use xor()."""
    return f"xor({a}, {b})" if engine == DUCK else f"({a} ^ {b})"


def idiv(a: str, b: str, engine: str) -> str:
    """Integer division (truncating). Spark spells it DIV, DuckDB //;
    both truncate toward zero, so keep operands non-negative when the
    downstream math assumes floor semantics."""
    return f"({a} // {b})" if engine == DUCK else f"({a} DIV {b})"


def shr(a: str, n: str, engine: str) -> str:
    """Bitwise right shift (integer halving per step — the exact-integer
    decay primitive). Spark's shiftright wants an INT shift amount AND
    masks it mod 64 (Java semantics) while DuckDB's >> does not, so a
    shift of 64+ would wrap in Spark but zero in DuckDB: clamp to 63 in
    BOTH dialects (a 63-step halving of any BIGINT is already 0/-1)."""
    n63 = f"LEAST({n}, 63)"
    if engine == DUCK:
        return f"({a} >> ({n63}))"
    return f"shiftright({a}, CAST({n63} AS INT))"


def shl(a: str, n: str, engine: str) -> str:
    """Bitwise left shift on BIGINT. Same Java mod-64 masking caveat as
    :func:`shr` — callers must keep ``n`` < 64 themselves (the sketch
    code's shift amounts are structurally ≤ 52)."""
    if engine == DUCK:
        return f"(CAST({a} AS BIGINT) << ({n}))"
    return f"shiftleft(CAST({a} AS BIGINT), CAST({n} AS INT))"


def epoch_us(ts: str, engine: str) -> str:
    """Timestamp → exact epoch microseconds (the portable event-time key;
    sidesteps the ns/µs parquet precision skew documented in
    sources/tables.load_table)."""
    return f"epoch_us({ts})" if engine == DUCK else f"unix_micros({ts})"


def epoch_day(ts: str, engine: str) -> str:
    """Timestamp/date → integer days since 1970-01-01. Goes through a
    DATE cast so it works on TIMESTAMP_NTZ parquet columns that
    ``unix_micros`` rejects (the ns/µs drift pitfall's cousin)."""
    if engine == DUCK:
        return f"(CAST({ts} AS DATE) - DATE '1970-01-01')"
    return f"unix_date(CAST({ts} AS DATE))"
