#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify output against the DuckDB oracle: for each query,
loads outDir/<name>/ parquet (Spark result) and executes
oracle_sql.json[<name>] in DuckDB with views over the sf parquet
tables, then compares (columns sorted by name, rows sorted, exact
values; floats compared to 1e-9 rel tolerance with a warning if not
bit-exact).

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = float(v)
            elif hasattr(v, "timestamp"):  # datetime
                v = str(v)
            elif isinstance(v, (list, tuple)):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    key = lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)
    return sorted(out, key=key), [cols[i] for i in order]


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12)
    if type(a) is not type(b):
        # Type-strict: the driver hashes typed values, so a DuckDB HUGEINT
        # vs Spark BIGINT mismatch must FAIL here even when str-equal.
        return False
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures, passed, no_oracle = [], 0, 0
    import glob
    import os
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_rows, s_cols = canon(spark_rel.fetchall(), spark_rel.columns)
        if name not in oracles:
            no_oracle += 1
            print(f"  [rows-only] {name}: {len(s_rows)} rows "
                  f"{'OK' if len(s_rows) > 0 else 'EMPTY!'}")
            continue
        try:
            o_rel = con.sql(oracles[name])
            o_rows, o_cols = canon(o_rel.fetchall(), o_rel.columns)
        except Exception as e:
            failures.append((name, f"oracle sql error: {e}"))
            continue
        if s_cols != o_cols:
            failures.append((name, f"columns differ: spark={s_cols} oracle={o_cols}"))
            continue
        # Type-strict schema compare (sorted by column name, like canon):
        # fetchall() converts HUGEINT→int so value compare can't see it.
        # sort by NAME only: DuckDBPyType has no ordering, so a name tie
        # (duplicate columns) must not fall through to comparing types
        s_types = [str(t) for _, t in sorted(zip(spark_rel.columns,
                                                 spark_rel.types),
                                             key=lambda p: p[0])]
        o_types = [str(t) for _, t in sorted(zip(o_rel.columns, o_rel.types),
                                             key=lambda p: p[0])]
        if s_types != o_types:
            failures.append(
                (name, f"column types differ: spark={s_types} oracle={o_types}"))
            continue
        if len(s_rows) != len(o_rows):
            failures.append((name, f"row count: spark={len(s_rows)} oracle={len(o_rows)}"))
            continue
        bad = exact = 0
        first_diff = None
        for sr, orow in zip(s_rows, o_rows):
            if sr == orow:
                exact += 1
                continue
            if all(values_equal(a, b) for a, b in zip(sr, orow)):
                continue  # tolerance match
            bad += 1
            if first_diff is None:
                first_diff = (sr, orow)
        if bad:
            failures.append(
                (name, f"{bad}/{len(s_rows)} rows differ; first: "
                       f"spark={first_diff[0]} oracle={first_diff[1]}"))
        else:
            passed += 1
            tol = len(s_rows) - exact
            extra = f" ({tol} tolerance-only rows!)" if tol else ""
            print(f"  [PASS] {name}: {len(s_rows)} rows{extra}")

    print(f"\n{passed} passed, {len(failures)} failed, {no_oracle} rows-only")
    for name, why in failures:
        print(f"  [FAIL] {name}: {why}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
