"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its oracle on DuckDB at the given
sf, compare row count + sorted-column value multisets exactly.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from gelos_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    """pandas -> sorted list of canonical row tuples (columns sorted by name)."""
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, (list, np.ndarray)):
                row.append(tuple(float(x) for x in v))
            elif isinstance(v, float):
                row.append(v)
            else:
                row.append(v)
        rows.append(tuple(row))
    rows.sort(key=repr)
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            print(f"FAIL  {name}: columns {scols} vs {ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if repr(a) != repr(b)]
        if bad:
            print(f"FAIL  {name}: {len(bad)}/{len(srows)} rows differ; first: {bad[0]}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
