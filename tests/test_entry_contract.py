"""Driver-contract smoke: entry() + queries()/oracle_sql() consistency.

The full oracle cross-check runs via scripts/check_oracles.py (and in
CI-equivalent form by the driver at sf0.01); here we verify the
contract shape and the flagship result cheaply at sf0.001.
"""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from scripts.check_oracles import TABLES, compare

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"subj", "pred", "obj", "n"}


def test_every_oracle_has_a_query():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


@pytest.mark.parametrize("name", ["kg_extract_canonicalize", "cc_components", "j1_index_lookup"])
def test_key_oracles_match_at_sf0001(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    df = entry_mod.queries()[name](spark, SF)
    res = con.execute(entry_mod.oracle_sql()[name])
    rows, cols = res.fetchall(), [d[0] for d in res.description]
    assert compare(name, df, rows, cols) == []
