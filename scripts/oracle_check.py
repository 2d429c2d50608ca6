#!/usr/bin/env python3
"""Oracle-parity spot check at an arbitrary sf dir (the pytest harness
pins sf0.01; optimization-round restructures are additionally checked at
sf0.1/sf1.0 with this).  Usage: oracle_check.py SF_DIR [names...]"""
from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402
from cdx_writer_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, bool):
                v = bool(v)
            elif isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "nan"
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    names = names or sorted(set(qs) & set(os_))
    spark = get_spark(app_name="oracle-check", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    bad = 0
    for name in names:
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(os_[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        ok = (sorted(sdf.columns) == sorted(ocols)
              and len(srows) == len(orows)
              and normalize(srows, sdf.columns) == normalize(orows, ocols))
        print(f"{name}: {'OK' if ok else 'MISMATCH'} "
              f"({len(srows)} vs {len(orows)} rows)")
        bad += 0 if ok else 1
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
