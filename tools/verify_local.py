"""Local replica of the driver's correctness gate.

Runs every registry query on Spark AND its oracle SQL on DuckDB over the
same parquet tables, canonicalizes (columns sorted by name, rows sorted,
floats rounded), and diffs.  Use while iterating:

    python tools/verify_local.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

from map_reduce485_spark import get_spark
from map_reduce485_spark.catalog import TABLES, table_path
from map_reduce485_spark.queries import REGISTRY, _load_all


def canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Column-name-sorted, row-sorted, float-rounded canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 6)
        if isinstance(v, int):
            return v
        return str(v) if v is not None else None

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    _load_all()
    names = args.names or list(REGISTRY)

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(args.sf, t)}')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: ORACLE ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        if len(cs) != len(co):
            print(f"FAIL  {name}: rowcount spark={len(cs)} oracle={len(co)}")
            n_fail += 1
            continue
        if cs != co:
            bad = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(cs)} rows ({time.time()-t0:.1f}s)")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
