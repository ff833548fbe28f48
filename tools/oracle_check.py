#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each entry in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet at <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB with the sf tables registered as views
  - compare row count, column-name set, and (column-name-sorted,
    row-sorted) values exactly.
Dev-only tool; the driver runs its own equivalent.
"""
import duckdb, json, math, sys
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


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
            got_cols, got = rows_of(
                con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
            exp_cols, exp = rows_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"ERROR {name}: {str(e)[:300]}")
            continue
        finally:
            # close on the error path too, or each failing query leaks its
            # connection (and parquet view handles) for the rest of the run
            if con is not None:
                con.close()
        if got_cols != exp_cols:
            print(f"SCHEMA-MISMATCH {name}: spark={got_cols} oracle={exp_cols}")
        elif len(got) != len(exp):
            print(f"ROWS-MISMATCH {name}: spark={len(got)} oracle={len(exp)}")
        elif got != exp:
            bad = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            print(f"HASH-MISMATCH {name}: {len([1 for g,e in zip(got,exp) if g!=e])} differing rows; first: {bad}")
        else:
            print(f"MATCH {name} ({len(got)} rows)")
            n_ok += 1
    print(f"-- {n_ok}/{len(oracle)} MATCH --")
    return 0 if n_ok == len(oracle) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
