import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nifi_ray.gen import GenConfig, base_table, events_table, write_events
from nifi_ray.schema import BASE_SCHEMA, EVENT_SCHEMA


CFG = GenConfig(seed=7, n_docs=200, n_events=1000)


def test_base_schema_and_invariant():
    t = base_table(CFG)
    assert t.schema.equals(BASE_SCHEMA)
    assert t.num_rows == 200
    lens = pc.list_value_length(t["tokens"])
    assert pc.all(pc.equal(lens.cast(pa.int32()), t["n_tok"])).as_py()


def test_chunk_independence():
    whole = events_table(CFG)
    parts = pa.concat_tables(
        [events_table(CFG, 0, 137), events_table(CFG, 137, 612), events_table(CFG, 612, 1000)]
    )
    assert whole.equals(parts)
    wb = base_table(CFG)
    pb = pa.concat_tables([base_table(CFG, 0, 13), base_table(CFG, 13, 200)])
    assert wb.equals(pb)


def test_event_semantics():
    t = events_table(CFG)
    assert t.schema.equals(EVENT_SCHEMA)
    lsn = t["lsn"].to_numpy()
    assert (np.diff(lsn) > 0).all()  # strictly increasing
    ops = set(pc.unique(t["op"]).to_pylist())
    assert ops == {"I", "U", "D"}
    # deletes carry null payloads; upserts carry full images
    dels = t.filter(pc.equal(t["op"], "D"))
    assert dels["tokens"].null_count == dels.num_rows
    ups = t.filter(pc.not_equal(t["op"], "D"))
    assert ups["tokens"].null_count == 0
    # skew: most-frequent doc carries >2% of events
    vc = pc.value_counts(t["doc_id"])
    top = max(c["counts"].as_py() for c in vc)
    assert top > 0.02 * t.num_rows


def test_evolution_fixture():
    cfg = GenConfig(seed=7, n_docs=50, n_events=400, evolve_after=200)
    t = events_table(cfg)
    assert "lang" in t.schema.names
    early = t.filter(pc.less_equal(t["lsn"], 200))
    assert early["lang"].null_count == early.num_rows
    late_ups = t.filter(
        pc.and_(pc.greater(t["lsn"], 200), pc.not_equal(t["op"], "D"))
    )
    assert late_ups["lang"].null_count == 0


def test_write_events_deterministic(tmp_path):
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    p1 = write_events(CFG, str(d1), shards=3)
    p2 = write_events(CFG, str(d2), shards=3)
    import pyarrow.parquet as pq

    t1 = pa.concat_tables([pq.read_table(p) for p in p1])
    t2 = pa.concat_tables([pq.read_table(p) for p in p2])
    assert t1.equals(t2)
    assert t1.equals(events_table(CFG))
