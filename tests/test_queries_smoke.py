"""Fast regression smoke over a few graded queries at sf0.001 vs their
DuckDB oracles (the full gate is tools/check_correctness.py)."""

import duckdb
import pandas as pd
import pytest

from nifi_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF = "/root/testdata/sf0.001"
NAMES = [
    "lww_upsert",
    "route_events",
    "split_text_words",
    "topk_users",
    "tokenize",
    "pack_sequences",
    "deterministic_shuffle",
    "source_mix",
    "decontaminate",
    "el_pipeline3",
    "stratified_sample",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(ray_session, con, name):
    res = QUERIES[name](SF)
    got = _normalize(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _normalize(con.execute(ORACLE_SQL[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        if got[c].dtype.kind == "f":
            assert (got[c] - want[c].astype(float)).abs().max() < 1e-9
        else:
            assert got[c].astype(str).tolist() == want[c].astype(str).tolist()


def test_oracle_builder_failure_is_loud_and_isolated(monkeypatch, capsys):
    """A raising oracle builder must (a) print the failure to stderr and
    (b) leave every OTHER builder's oracles intact — a single cold/broken
    fixture can never silently un-grade an unrelated query block."""
    from nifi_ray.pipelines import queries as Q

    def boom(out, sf_tag):
        raise RuntimeError("forced fixture failure")

    monkeypatch.setattr(
        Q, "_ORACLE_BUILDERS",
        [("cdc", boom)] + [b for b in Q._ORACLE_BUILDERS if b[0] != "cdc"],
    )
    out = Q.oracle_sql_dict()
    err = capsys.readouterr().err
    assert "ORACLE BUILDER 'cdc' FAILED" in err
    assert "forced fixture failure" in err
    # cdc-group oracles dropped...
    assert "cdc_replay" not in out and "crash_resume" not in out
    # ...but static SQL and the other builders' oracles survive
    assert "lww_upsert" in out
    assert "quarantine" in out          # quarantine builder still ran
    assert "asof_enrich" in out         # rates builder still ran
