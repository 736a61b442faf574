"""Session-scoped Ray fixture — ONE ray.init per pytest session."""
from __future__ import annotations

import duckdb
import pytest
import ray

SF_UNIT = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with the testdata tables registered as views
    (mirrors the driver's correctness harness)."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(df):
    """Driver-style compare normalization: sort columns by name, then rows."""
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    df = result.to_pandas()  # ray Dataset
    if df.shape[1] == 0:
        # Ray quirk: to_pandas() of a 0-row Dataset drops the columns even
        # though the schema is known — rebuild the typed empty frame
        schema = result.schema()
        if schema is not None and schema.names:
            df = pa.schema(list(zip(schema.names, schema.types))) \
                .empty_table().to_pandas()
    return df


def assert_query_matches_oracle(name: str, sf_dir: str = SF_ORACLE,
                                *, sql_transform=None):
    """Run queries()[name] and oracle_sql()[name] and compare exactly.
    ``sql_transform`` rewrites the oracle SQL before execution (the
    cross-scale sweep uses it to repoint image-corpus paths that a static
    SQL string pins to the sf0.01 corpus)."""
    import pandas as pd
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e
    q = e.queries()[name]
    sql = e.oracle_sql()[name]
    if sql_transform is not None:
        sql = sql_transform(sql)
    got = normalize(to_pandas(q(sf_dir)))
    con = duck_con(sf_dir)  # keep alive until .df() finishes
    exp = normalize(con.sql(sql).df())
    assert list(got.columns) == list(exp.columns), (list(got.columns), list(exp.columns))
    assert len(got) == len(exp), (len(got), len(exp))
    # driver's value hash is dtype-sensitive (int64 23 != float64 23.0):
    # require matching numpy dtype KIND per column (int vs float vs bool);
    # tolerate object/string spellings and datetime unit differences
    for c in got.columns:
        gk, ek = got[c].dtype.kind, exp[c].dtype.kind
        assert gk == ek or {gk, ek} <= {"O", "U", "S"}, \
            (name, c, got[c].dtype, exp[c].dtype)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
