#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (dev tool only — the
Scala library has no Python dependency).

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB against the
fixture parquet tables, loads the corresponding Spark parquet result, and
compares schema (column names sorted), row count, and a value hash that is
row-order-insensitive after sorting by all columns.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # sort columns by name, then rows by all columns; stringify values
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def dtype_kinds(df):
    # collapse dtypes to comparison classes: int-like, float, bool, other.
    # The driver's hash stringifies raw values, so a DuckDB HUGEINT/DECIMAL
    # that pandas materializes as float64 ("908.0") mismatches a Spark
    # BIGINT ("908") even when numerically identical — surface that class
    # of divergence locally instead of masking it with %.6g.
    def kind(dt):
        k = dt.kind
        if k in "iu":
            return "int"
        if k == "f":
            return "float"
        return k
    return {c: kind(df[c].dtype) for c in df.columns}


def frame_sig(df):
    rows = []
    for t in df.itertuples(index=False):
        rows.append("|".join(norm_cell(v) for v in t))
    return rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = canon(con.execute(sql).fetchdf())
            got = canon(duckdb.query(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").to_df())
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        ocols, gcols = list(oracle.columns), list(got.columns)
        if ocols != gcols:
            print(f"FAIL {name}: columns oracle={ocols} got={gcols}")
            n_fail += 1
            continue
        if len(oracle) != len(got):
            print(f"FAIL {name}: rows oracle={len(oracle)} got={len(got)}")
            n_fail += 1
            continue
        okinds, gkinds = dtype_kinds(oracle), dtype_kinds(got)
        if okinds != gkinds:
            diff = {c: (okinds[c], gkinds[c])
                    for c in okinds if okinds[c] != gkinds[c]}
            print(f"FAIL {name}: dtype kinds differ (oracle, got): {diff}")
            n_fail += 1
            continue
        osig, gsig = frame_sig(oracle), frame_sig(got)
        if osig != gsig:
            bad = [i for i, (a, b) in enumerate(zip(osig, gsig)) if a != b]
            print(f"FAIL {name}: {len(bad)}/{len(osig)} rows differ; "
                  f"first: oracle={osig[bad[0]]!r} got={gsig[bad[0]]!r}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
