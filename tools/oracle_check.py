#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each entry in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet at <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB with the sf tables registered as views
  - compare row count, column-name set, and (column-name-sorted,
    row-sorted) values exactly
  - THEN emulate the driver's pandas materialization: both sides via
    .df(), fail on dtype mismatch or unhashable (list/ndarray) cells.
    The driver compares pandas frames, where DuckDB HUGEINT becomes
    float64 while Spark parquet reads back int64 — equal VALUES can
    still hash-mismatch, and an array-typed column crashes its row
    sort outright. Round 7 lost three green rows to exactly this, so
    the value compare alone is *more permissive* than the real gate.
  - also lint the oracle result types up front: any HUGEINT (an
    un-CAST DuckDB sum) or LIST/STRUCT/MAP column is an error even if
    today's values happen to compare equal.
Dev-only tool; the driver runs its own equivalent.
"""
import duckdb, json, math, sys
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB logical types that survive pandas materialization with a stable,
# hashable dtype. Anything else (HUGEINT, LIST, STRUCT, MAP, ...) either
# shifts dtype (HUGEINT -> float64) or breaks the driver's row sort.
OK_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
            "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "TIMESTAMP_NS",
            "TIMESTAMP WITH TIME ZONE"}


def canon(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, Decimal):
        return ("d", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, (int,)):
        return ("i", v)
    return (type(v).__name__, str(v))


def rows_of(rel):
    cols = [c.lower() for c in rel.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    return sorted(cols), sorted(data)


def type_lint(rel):
    """Oracle-side result-type lint (pre-compare): un-CAST aggregates and
    nested types are gate bugs regardless of today's values."""
    bad = []
    for c, t in zip(rel.columns, rel.types):
        ts = str(t)
        if ts not in OK_TYPES or "[" in ts:
            bad.append(f"{c.lower()}:{ts}")
    return bad


def dtype_check(got_df, exp_df):
    """Driver-parity pass: the driver canonicalizes via pandas, so equal
    values with different dtypes (or unhashable cells) still fail there."""
    import numpy as np
    errs = []
    g = {c.lower(): got_df[c] for c in got_df.columns}
    e = {c.lower(): exp_df[c] for c in exp_df.columns}
    for c in sorted(set(g) & set(e)):
        if str(g[c].dtype) != str(e[c].dtype):
            errs.append(f"{c}: spark dtype {g[c].dtype} != oracle dtype {e[c].dtype}")
        for side, s in (("spark", g[c]), ("oracle", e[c])):
            # full-column scan, not a head() sample: an array column that
            # is null for its first rows would slip a sample and still
            # crash the driver's row sort
            if s.dtype == object and any(
                    isinstance(v, (list, tuple, dict, np.ndarray)) for v in s):
                errs.append(f"{c}: {side} column holds unhashable cells "
                            f"(list/ndarray) — driver row sort would crash")
    return errs


def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        # Fresh connection per query: a single DuckDB INTERNAL error poisons
        # the whole database, which would cascade `err` into every query after
        # it (this exact failure blocked 41/69 queries in rounds 4-5).
        con = None
        try:
            con = duckdb.connect()
            for t in TABLES:
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
            spark_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            got_cols, got = rows_of(con.sql(spark_sql))
            exp_rel = con.sql(oracle[name])
            # type_lint reads relation metadata only (no execution); the
            # same relation then executes ONCE for rows_of
            lint = type_lint(exp_rel)
            exp_cols, exp = rows_of(exp_rel)
            # the dtype pass re-executes both sides via .df(); only worth
            # it once the value compare is going to pass
            dt_errs = [] if (lint or got_cols != exp_cols or got != exp) else \
                dtype_check(con.sql(spark_sql).df(), con.sql(oracle[name]).df())
        except Exception as e:
            print(f"ERROR {name}: {str(e)[:300]}")
            continue
        finally:
            # close on the error path too, or each failing query leaks its
            # connection (and parquet view handles) for the rest of the run
            if con is not None:
                con.close()
        if lint:
            print(f"ORACLE-TYPE-LINT {name}: disallowed oracle result types {lint}")
        elif got_cols != exp_cols:
            print(f"SCHEMA-MISMATCH {name}: spark={got_cols} oracle={exp_cols}")
        elif len(got) != len(exp):
            print(f"ROWS-MISMATCH {name}: spark={len(got)} oracle={len(exp)}")
        elif got != exp:
            bad = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            print(f"HASH-MISMATCH {name}: {len([1 for g,e in zip(got,exp) if g!=e])} differing rows; first: {bad}")
        elif dt_errs:
            print(f"DTYPE-MISMATCH {name}: {dt_errs}")
        else:
            print(f"MATCH {name} ({len(got)} rows)")
            n_ok += 1
    print(f"-- {n_ok}/{len(oracle)} MATCH --")
    return 0 if n_ok == len(oracle) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
