#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (dev tool only — the
Scala library has no Python dependency).

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB against the
fixture parquet tables, loads the corresponding Spark parquet result, and
compares schema (column names sorted), row count, and a value signature that
is row-order-insensitive after sorting by all columns.

Hardened after round 7 (VERDICT r7 item 2): the previous version loaded the
SPARK parquet through DuckDB's pandas bridge too, which collapsed >18-digit
decimals to float64 on BOTH sides and masked a driver-gate failure
(q_rfm / q_trend_slope). Now:
  * the Spark side is read natively with pyarrow (like the driver);
  * the oracle side is fetched as Arrow (decimal128 preserved, no pandas
    float collapse);
  * any final Spark output column of DECIMAL type — ANY precision — is an
    automatic FAIL. Round 8 proved the driver's hasher diverges on the
    decimal type class itself (q_rfm / q_trend_slope emitted decimal(18,0)
    with bit-identical values and still hash-failed): emitted schemas must
    be bigint/double/string/date/bool only; decimals stay internal.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import decimal
import glob
import json
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def wide_decimals(schema):
    """Columns in a pyarrow schema of decimal type — ANY precision.

    The driver's row hasher trips on the decimal type class itself, not
    just on widths past 18 digits (round-8 finding), so every decimal in
    an emitted schema is an automatic FAIL.
    """
    bad = []
    for field in schema:
        t = field.type
        if pa.types.is_decimal(t):
            bad.append(f"{field.name}:decimal({t.precision},{t.scale})")
    return bad


def canon(df):
    # sort columns by name, then rows by all columns; stringify values
    df = df[sorted(df.columns)]
    key = df.apply(lambda c: c.map(norm_cell))
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)


def norm_cell(v):
    if v is None or v != v:  # None / NaN
        return "<null>"
    if isinstance(v, float):
        # %.12g: tolerates cross-engine summation-order LSB noise (the three
        # float-heavy queries q_pmi_pairs/q_tfidf/q_zipf_fit differ from
        # DuckDB in the 14th-17th digit and are driver-green), while staying
        # a million times tighter than the old %.6g. Ints and decimals are
        # compared EXACTLY — only IEEE doubles get this tolerance.
        return f"{v:.12g}"
    if isinstance(v, decimal.Decimal):
        return str(v)
    return str(v)


def dtype_kinds(df):
    # collapse dtypes to comparison classes: int-like, float, bool,
    # object (covers exact Decimal / str / list), other.
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
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            spark_tbl = pq.read_table(files)
            wide = wide_decimals(spark_tbl.schema)
            if wide:
                print(f"FAIL {name}: decimal-typed output column(s) — the "
                      f"driver hasher diverges on the decimal type class; "
                      f"cast to BIGINT/DOUBLE before emitting: {wide}")
                n_fail += 1
                continue
            oracle_tbl = con.execute(sql).fetch_arrow_table()
            oracle = canon(oracle_tbl.to_pandas())
            got = canon(spark_tbl.to_pandas())
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
