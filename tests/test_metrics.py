from nifi_ray.gen import GenConfig, write_base, write_events
from nifi_ray.pipelines.cdc import CDCLake
from nifi_ray.state.metrics import lag_report, read_metrics

CFG = GenConfig(seed=21, n_docs=100, n_events=600)


def test_metrics_and_lag(ray_session, tmp_path):
    base_dir, ev_dir, lake_dir = (str(tmp_path / d) for d in ("b", "e", "l"))
    write_base(CFG, base_dir, shards=1)
    write_events(CFG, ev_dir, shards=2)
    lake = CDCLake(lake_dir)
    lake.init_from(base_dir, num_partitions=4)
    lake.replay(ev_dir, lsn_hi=300)
    recs = read_metrics(lake_dir)
    assert len(recs) == 1
    assert recs[0]["events_applied"] == 300
    assert recs[0]["lsn_range"] == [0, 300]
    assert sum(p["events"] for p in recs[0]["partitions"].values()) == 300
    rep = lag_report(lake_dir, log_head_lsn=600)
    assert rep["lag"] == 300
    lake.replay(ev_dir)
    rep2 = lag_report(lake_dir, log_head_lsn=600)
    assert rep2["lag"] == 0
    assert len(read_metrics(lake_dir)) == 2
