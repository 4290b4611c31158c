"""Local oracle-differential checker — mirrors the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column-name set, and order-insensitive values (columns sorted
by name, rows sorted, cell-wise exact equality on the normalized form).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def normalize_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries round explicitly; format defensively to kill ULP noise
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def rows_to_canonical(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(normalize_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from training_etl_demo_2_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for tbl in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE OR REPLACE VIEW {tbl} AS "
            f"SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        # Error-isolated (round-3 lesson: one broken query killed the
        # whole sweep exactly when the rest of the report mattered most).
        try:
            sdf = fn(spark, sf_dir)
            # Materialize BOTH engines through pandas, like the driver
            # gate. Symmetry matters: a nullable BIGINT (e.g. CUBE rollup
            # keys) degrades to float64 on BOTH sides and still matches,
            # while a one-sided promotion (DuckDB HUGEINT from an uncast
            # sum) only degrades the oracle side and correctly fails.
            spdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001 — sweep must survive
            print(f"  {name:32s} ERROR {type(exc).__name__}: "
                  f"{str(exc)[:200]}")
            failures.append(name)
            continue
        srows = list(spdf.itertuples(index=False, name=None))
        scols = list(spdf.columns)
        if name not in oracles:
            print(f"  {name:32s} rows={len(srows):6d}  (no oracle: rows-only)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"  {name:32s} ORACLE-ERROR {type(exc).__name__}: "
                  f"{str(exc)[:200]}")
            failures.append(name)
            continue
        ocols = list(odf.columns)
        orows = list(odf.itertuples(index=False, name=None))
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        else:
            a = rows_to_canonical(scols, [tuple(r) for r in srows])
            b = rows_to_canonical(ocols, orows)
            if a != b:
                diff = next(
                    (i for i, (x, y) in enumerate(zip(a, b)) if x != y), None
                )
                problems.append(
                    f"values differ (first at sorted-row {diff}):\n"
                    f"    spark={a[diff] if diff is not None else a[:2]}\n"
                    f"    duck ={b[diff] if diff is not None else b[:2]}"
                )
        status = "OK " if not problems else "FAIL"
        print(f"  {name:32s} rows={len(srows):6d}  {status}")
        for p in problems:
            print(f"    !! {p}")
        if problems:
            failures.append(name)

    print()
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
