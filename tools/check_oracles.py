"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf, compare
row-count + column names + order-insensitive values."""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry_mod
from edspdf_spark import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(val):
    import decimal

    if isinstance(val, decimal.Decimal):
        val = float(val)
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.12g}"
    if isinstance(val, bool):
        return str(bool(val))
    return str(val)


def table_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon_rows = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return sorted_cols, canon_rows


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    ok, bad = [], []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            bad.append((name, f"SPARK ERROR: {type(e).__name__}: {str(e)[:300]}"))
            continue
        if name not in oracles:
            ok.append((name, f"rows-only: {len(srows)}"))
            continue
        try:
            res = con.execute(oracles[name]).fetchall()
            dcols = [d[0] for d in con.description]
        except Exception as e:
            bad.append((name, f"DUCKDB ERROR: {type(e).__name__}: {str(e)[:300]}"))
            continue
        sc, sr = table_sig(scols, [tuple(r) for r in srows])
        dc, dr = table_sig(dcols, res)
        if sc != dc:
            bad.append((name, f"SCHEMA: spark={sc} duck={dc}"))
        elif len(sr) != len(dr):
            bad.append((name, f"ROWCOUNT: spark={len(sr)} duck={len(dr)}"))
        elif sr != dr:
            n_diff = sum(1 for a, b in zip(sr, dr) if a != b)
            example = next((a, b) for a, b in zip(sr, dr) if a != b)
            bad.append((name, f"VALUES: {n_diff}/{len(sr)} differ; e.g. {example}"))
        else:
            ok.append((name, f"match: {len(sr)} rows"))

    print("\n=== OK ===")
    for n, m in ok:
        print(f"  {n}: {m}")
    print("=== FAIL ===" if bad else "=== ALL PASS ===")
    for n, m in bad:
        print(f"  {n}: {m}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
