"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in nifi_ray) calls ray.init()/ray.shutdown().

- entry(): flagship CDC replay on sf0.001 (read base → replay change
  events → return final lake state summary).
- queries(): one entry per implemented operator/pipeline (SURVEY.md §2
  and the training-data extensions) — see nifi_ray/pipelines/queries.py.
- oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query
  (same column names; float aggregates rounded on both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from nifi_ray.pipelines.queries import QUERIES, oracle_sql_dict
from nifi_ray.util.io import silence_mixed_schema_warnings

# Ray's hash-shuffle aggregate/join emits EMPTY hash partitions as
# schema-less blocks; drop_schemaless_empties strips them one operator
# later, but the executor logs the boundary first. Expected + handled —
# filter that one message class in driver runs too (bench.py already does).
silence_mixed_schema_warnings()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return QUERIES["cdc_replay"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """Static SQL over the registered views, plus dynamically-built
    oracles (flagship CDC replay as SQL over deterministically-written
    parquet; sequential dual-implementation expected tables for the
    non-SQL-expressible queries — nifi_ray/oracle_expected.py)."""
    return oracle_sql_dict()
