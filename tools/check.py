#!/usr/bin/env python3
"""Local pre-check of the driver's t2 oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [keys...]

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB over views of the sfDir
tables, and compares: columns sorted by name, row order as produced, values
exactly (NaN==NaN), dtypes loosely (warn on mismatch).
"""
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if np.isnan(a) and np.isnan(b):
            return True
        # the driver hashes value representations, which distinguish
        # -0.0 from 0.0 (CORRECTNESS_r01 llm_kmeans_step: DuckDB round()
        # yields -0.0 on tiny negatives, Spark's BigDecimal round +0.0);
        # plain == hides that, so compare the sign bit too.
        if a == 0.0 and b == 0.0:
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    return a == b


def compare(name, spark_df, duck_df):
    s, d = norm(spark_df), norm(duck_df)
    problems = []
    # The DRIVER's checker canonicalizes row order with a pandas sort,
    # which crashes on list/ndarray cells (CORRECTNESS_r02
    # fn_array_extra: "unhashable type: numpy.ndarray"). Our compare
    # walks rows in produced order so it would silently pass — flag raw
    # array columns as hard failures so the local gate matches the
    # driver: render arrays as joined strings / JSON in the op instead.
    for c in s.columns:
        col = s[c]
        if col.dtype == object:
            probe = col.dropna().head(5)
            if any(isinstance(v, (list, np.ndarray)) for v in probe):
                problems.append(
                    f"col {c}: raw list/array cells (driver's sort cannot hash these; "
                    "emit array_join/to_json strings instead)")
                return problems
    if list(s.columns) != list(d.columns):
        problems.append(f"columns spark={list(s.columns)} duck={list(d.columns)}")
        return problems
    if len(s) != len(d):
        problems.append(f"rowcount spark={len(s)} duck={len(d)}")
        return problems
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        st, dt = str(s[c].dtype), str(d[c].dtype)
        # dtype mismatch is a warning (driver behavior unknown) unless values differ
        bad = [i for i in range(len(sv)) if not cell_eq(sv[i], dv[i])]
        if bad:
            i = bad[0]
            problems.append(
                f"col {c}: {len(bad)}/{len(sv)} mismatched, first at row {i}: "
                f"spark={sv[i]!r} duck={dv[i]!r} (dtypes {st} vs {dt})")
        elif st != dt:
            sk = st.replace("32", "").replace("64", "")
            dk = dt.replace("32", "").replace("64", "")
            sev = "DTYPE-WARN-MINOR" if sk == dk else "DTYPE-WARN"
            problems.append(f"{sev} col {c}: spark dtype {st} vs duck {dt} (values equal)")
    return problems


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_ok = n_fail = n_warn = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, duck_df)
        hard = [p for p in problems if not p.startswith("DTYPE-WARN")]
        if hard:
            print(f"FAIL {name} ({len(spark_df)} rows):")
            for p in problems[:6]:
                print(f"    {p}")
            n_fail += 1
        elif problems:
            print(f"WARN {name} ({len(spark_df)} rows):")
            for p in problems[:6]:
                print(f"    {p}")
            n_warn += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_warn} warn, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
