"""End-to-end pipeline integration: pings in, SEIR trajectory out."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from epiteam_network_etl_functions_spark.functions.hexgrid import _fallback_cell
from epiteam_network_etl_functions_spark.plans.full_pipeline import (
    PipelineConfig,
    run_pipeline,
)
from epiteam_network_etl_functions_spark.plans.mobility import cells_to_regions_dim


def test_full_pipeline_end_to_end(spark, tmp_path):
    # two "neighbourhoods": cluster P around (19.05,-99.05), Q around (19.61,-99.61)
    rows = []
    base = dt.datetime(2020, 1, 14, 23, 0)
    for d, (lat, lon) in enumerate([(19.05, -99.05), (19.61, -99.61)]):
        for i in range(4):  # 4 devices per cluster
            for m in range(6):  # 6 night pings each, co-located
                rows.append(
                    Row(
                        caid=f"dev{d}{i}",
                        cdmx_datetime=base + dt.timedelta(minutes=7 * m),
                        latitude=lat,
                        longitude=lon,
                        horizontal_accuracy=150.0,
                    )
                )
    pings = spark.createDataFrame(rows)
    dim = cells_to_regions_dim(
        spark.createDataFrame(
            [
                Row(cells=[_fallback_cell(19.05, -99.05, 15)], cve_geo="0901200010010"),
                Row(cells=[_fallback_cell(19.61, -99.61, 15)], cve_geo="1502100020020"),
            ]
        )
    )
    cfg = PipelineConfig(
        day="2020-01-14",
        network_nodes=40,
        checkpoint_dir=str(tmp_path / "ck"),
        seir=dict(beta=0.9, sigma=0.9, gamma=0.5),
    )
    res = run_pipeline(spark, pings, dim, cfg)

    assert res.pings_located.where("cve_geo IS NULL").count() == 0
    assert res.homes.count() == 8  # one home per device
    # interactions only within a cluster (different cells never co-locate)
    inter = res.interactions.collect()
    assert len(inter) > 0
    for r in inter:
        assert r["a_caid"][3] == r["b_caid"][3]  # same cluster digit
    probs = {(r["a_home_ageb"], r["b_home_ageb"]): r["prob"] for r in res.contact_probs.collect()}
    # intra-block contact certain, cross-block zero
    assert probs[("0901200010010", "1502100020020")] == 0.0
    assert probs[("0901200010010", "0901200010010")] > 0
    # network respects blocks: only intra-block edges (cross prob = 0)
    for r in res.sbm_edge_list.collect():
        assert r["a_block"] == r["b_block"]
    traj = res.seir_trajectory.collect()
    n = 40
    assert all(r["S"] + r["E"] + r["I"] + r["R"] == n for r in traj)
    assert traj[0]["I"] == 1
