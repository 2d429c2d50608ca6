"""Driver-contract rehearsal: run every __spark_entry__ query on Spark AND
its oracle SQL on DuckDB at sf0.01; row counts, column names and
order-insensitive values must match (this is what CORRECTNESS_r{N}.json
grades).  Queries without an oracle get a rows-run smoke check."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ALL_QUERIES = entry_mod.queries()
ALL_ORACLES = entry_mod.oracle_sql()


def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def normalize(rows, cols):
    """Sort columns by name, canonicalize values, sort rows."""
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


@pytest.mark.parametrize("name", sorted(ALL_ORACLES), ids=str)
def test_query_matches_oracle(spark, name):
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duck()
    res = con.execute(ALL_ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch {scols} vs {ocols}")
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs {len(orows)}")
    sn, on = normalize(srows, scols), normalize(orows, ocols)
    mism = [(a, b) for a, b in zip(sn, on) if a != b][:3]
    assert sn == on, f"{name}: first value mismatches: {mism}"


@pytest.mark.parametrize("name",
                         sorted(set(ALL_QUERIES) - set(ALL_ORACLES)), ids=str)
def test_rows_only_query_runs(spark, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["urlkey", "host", "doc_id", "n_tokens",
                          "rank_in_host"]
