"""Log-segment consumer (ConsumeKafka analog): per-partition offsets,
commit-after-session ordering, crash-window idempotence, footer-stat
segment pruning, and final-state equivalence with direct lsn replay."""

import os

import pytest

from nifi_ray.gen import GenConfig, events_table, write_base, write_events
from nifi_ray.pipelines.cdc import CDCLake
from nifi_ray.sources.segments import SegmentConsumer, consume_into_lake, write_topic

CFG = GenConfig(seed=41, n_docs=120, n_events=700)
N_TOPIC_PARTS = 3


@pytest.fixture()
def topic(ray_session, tmp_path):
    base_dir = str(tmp_path / "base")
    write_base(CFG, base_dir, shards=1)
    topic_dir = str(tmp_path / "topic")
    write_topic(events_table(CFG), topic_dir, N_TOPIC_PARTS, segment_rows=100)
    return base_dir, topic_dir, tmp_path


def _fresh_lake(base_dir, path):
    lake = CDCLake(path)
    lake.init_from(base_dir, num_partitions=4)
    return lake


def test_consume_matches_direct_replay(topic, tmp_path):
    base_dir, topic_dir, tp = topic
    # reference lake: replay the original lsn-ordered events directly
    ev_dir = str(tp / "ev")
    write_events(CFG, ev_dir, shards=2)
    ref = _fresh_lake(base_dir, str(tp / "ref_lake"))
    ref.replay(ev_dir)

    lake = _fresh_lake(base_dir, str(tp / "lake"))
    consumer = SegmentConsumer(topic_dir, str(tp / "group.json"))
    st = consume_into_lake(consumer, lake, str(tp / "spool"))
    assert st is not None and st.events_applied == CFG.n_events

    got, want = lake.read_table(), ref.read_table()
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["tokens"].to_pylist() == want["tokens"].to_pylist()

    # fully caught up: next poll is empty, next consume a no-op
    ds, high = consumer.poll()
    assert ds is None and high == {}
    assert consume_into_lake(consumer, lake, str(tp / "spool")) is None


def test_offsets_committed_after_apply_and_crash_window(topic, tmp_path):
    base_dir, topic_dir, tp = topic
    lake = _fresh_lake(base_dir, str(tp / "lake"))
    consumer = SegmentConsumer(topic_dir, str(tp / "group.json"))

    # simulate crash AFTER apply, BEFORE offset commit: replay the
    # polled records but never commit offsets
    ds, high = consumer.poll()
    spool = str(tp / "spool_crash")
    from nifi_ray.sources.segments import offsets_to_lsn

    def to_events(t):
        lsn = offsets_to_lsn(t["offset"], t["partition"], N_TOPIC_PARTS)
        return t.append_column("lsn", lsn).drop_columns(["offset", "partition"])

    os.makedirs(spool)
    ds.map_batches(to_events, batch_format="pyarrow").write_parquet(spool)
    st1 = lake.replay(spool, from_lsn=0)
    assert st1.events_applied == CFG.n_events
    assert consumer.committed() == {}  # offsets never committed
    state_after_crash = lake.read_table()

    # recovery: the consumer re-polls EVERYTHING and re-applies it;
    # identical images under LWW → state unchanged (at-least-once
    # delivery, effectively-once state), offsets now land
    st2 = consume_into_lake(consumer, lake, str(tp / "spool2"))
    assert st2.events_applied == CFG.n_events
    assert lake.read_table().equals(state_after_crash)
    assert consumer.committed() == high


def test_incremental_segments_and_footer_prune(topic, tmp_path):
    base_dir, topic_dir, tp = topic
    lake = _fresh_lake(base_dir, str(tp / "lake"))
    consumer = SegmentConsumer(topic_dir, str(tp / "group.json"))
    consume_into_lake(consumer, lake, str(tp / "spool"))

    # all segments now fully consumed → footer prune keeps zero files
    files, high, need_exact = consumer.poll_files()
    assert files == [] and need_exact == set()

    # a late segment on one partition: only IT is polled
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    lo = consumer.committed()[1]
    late = pa.table(
        {
            "op": ["U"],
            "doc_id": ["doc_late"],
            "tokens": [[7, 8, 9]],
            "n_tok": pa.array([3], pa.int32()),
            "source": ["web"],
            "offset": pa.array([lo + 1], pa.int64()),
        }
    )
    pq.write_table(late, os.path.join(topic_dir, "partition=1", "segment-99999.parquet"))
    files, _high, _ = consumer.poll_files()
    assert [p for p, _f in files] == [1] and len(files) == 1
    st = consume_into_lake(consumer, lake, str(tp / "spool3"))
    assert st.events_applied == 1
    assert "doc_late" in lake.read_table()["doc_id"].to_pylist()
    assert consumer.committed()[1] == lo + 1
