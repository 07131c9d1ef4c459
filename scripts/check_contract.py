"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB at the given scale factor; compare row count, column
names, and an order-insensitive value hash.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def value_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from krawler_spark.session import get_spark

    spark = get_spark("contract-check", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"{name:28s} SPARK-ERROR {type(e).__name__}: {str(e)[:160]}")
            failures.append(name)
            continue
        spark_sec = time.time() - t0

        sql = oracles.get(name)
        if sql is None:
            print(f"{name:28s} rows-only   n={len(rows):6d}  {spark_sec:5.1f}s")
            if len(rows) == 0 and name != "frontier_age_delete":
                print(f"  !! zero rows from {name}")
            continue
        try:
            rel = con.sql(sql)
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:
            print(f"{name:28s} ORACLE-ERROR {type(e).__name__}: {str(e)[:160]}")
            failures.append(name)
            continue

        ok_n = len(rows) == len(orows)
        ok_c = sorted(c.lower() for c in cols) == sorted(c.lower() for c in ocols)
        ok_h = value_hash(rows, cols) == value_hash(orows, ocols)
        status = "OK" if (ok_n and ok_c and ok_h) else "MISMATCH"
        print(
            f"{name:28s} {status:9s} n={len(rows)}/{len(orows)} "
            f"cols={'=' if ok_c else sorted(cols)!r:}{'' if ok_c else sorted(ocols)} "
            f"hash={'=' if ok_h else '!'}  {spark_sec:5.1f}s"
        )
        if status != "OK":
            failures.append(name)
            if ok_c and not ok_h:
                srt = sorted(range(len(cols)), key=lambda i: cols[i])
                osrt = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = {"|".join(_norm_cell(r[i]) for i in srt) for r in rows}
                oset = {"|".join(_norm_cell(r[i]) for i in osrt) for r in orows}
                for x in list(sset - oset)[:3]:
                    print("   spark-only:", x[:160])
                for x in list(oset - sset)[:3]:
                    print("   oracle-only:", x[:160])

    print("\nFAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
