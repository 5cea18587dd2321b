"""Home-location pipeline parity properties (reference semantics from
HomeAgebGenerator / IndexingHomeAgebs / home_ageb_imputers), on synthetic
pings built in-test."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from epiteam_network_etl_functions_spark.constants import SENTINEL_AGEB_13
from epiteam_network_etl_functions_spark.plans.mobility import (
    attach_home,
    cells_to_regions_dim,
    daily_home_winners,
    extract_day,
    global_home_winner,
    impute_kring,
    impute_neighbour_frequency,
    locate_pings,
    night_presence_scores,
    with_cells,
)


def _ts(day, hour, minute=0):
    return dt.datetime(2020, 1, day, hour, minute)


@pytest.fixture(scope="module")
def pings(spark):
    rows = []
    # device A: 10 night pings at (19.05, -99.05), 2 day pings elsewhere
    for i in range(10):
        rows.append(Row(caid="A", cdmx_datetime=_ts(14, 23, i * 5), latitude=19.05,
                        longitude=-99.05, horizontal_accuracy=150.0))
    rows.append(Row(caid="A", cdmx_datetime=_ts(14, 12), latitude=19.9,
                    longitude=-99.9, horizontal_accuracy=150.0))
    rows.append(Row(caid="A", cdmx_datetime=_ts(14, 13), latitude=19.9,
                    longitude=-99.9, horizontal_accuracy=150.0))
    # device B: night pings split between two cells, more at (19.31, -99.31)
    for i in range(6):
        rows.append(Row(caid="B", cdmx_datetime=_ts(14, 2, i * 11), latitude=19.31,
                        longitude=-99.31, horizontal_accuracy=120.0))
    for i in range(3):
        rows.append(Row(caid="B", cdmx_datetime=_ts(14, 4, i * 11), latitude=19.61,
                        longitude=-99.61, horizontal_accuracy=120.0))
    # device C: low accuracy only -> dropped by extract
    rows.append(Row(caid="C", cdmx_datetime=_ts(14, 23), latitude=19.05,
                    longitude=-99.05, horizontal_accuracy=10.0))
    return spark.createDataFrame(rows)


def test_extract_day_filters(spark, pings):
    out = extract_day(pings, "2020-01-14")
    assert out.where(F.col("horizontal_accuracy") < 100).count() == 0
    assert out.select("caid").distinct().count() == 2  # C dropped


def test_night_scores_and_winner(spark, pings):
    good = extract_day(pings, "2020-01-14")
    cells = with_cells(good, res=12, out_col="cell")
    scores = night_presence_scores(cells, cell_col="cell")
    # A's day pings (hour 12/13) must not contribute
    a = scores.where(F.col("caid") == "A").collect()
    # 10 pings at 5-min steps span 5 distinct 600s buckets
    assert len(a) == 1 and a[0]["score"] == 5
    winners = daily_home_winners(scores, cell_col="cell")
    w = {r["caid"]: r for r in winners.collect()}
    assert set(w) == {"A", "B"}
    # B's winner is the 6-ping cell
    b_cell = with_cells(
        spark.createDataFrame([Row(latitude=19.31, longitude=-99.31)]), res=12,
        out_col="cell",
    ).collect()[0]["cell"]
    assert w["B"]["home_cell"] == b_cell
    assert {r["confidence"] for r in winners.collect()} <= {"high", "low"}


def test_global_winner_prefers_nonsentinel_then_score(spark):
    repo = spark.createDataFrame(
        [
            Row(caid="X", home_ageb=SENTINEL_AGEB_13, score=100),
            Row(caid="X", home_ageb="0901200010010", score=3),
            Row(caid="X", home_ageb="0901200010020", score=7),
            Row(caid="Y", home_ageb=SENTINEL_AGEB_13, score=5),
        ]
    )
    out = {r["caid"]: r["home_ageb"] for r in global_home_winner(repo).collect()}
    # sentinel has same 13-char length, so score wins among equal length:
    # the reference orders len DESC then score DESC — sentinel(100) wins X.
    assert out["X"] == SENTINEL_AGEB_13
    assert out["Y"] == SENTINEL_AGEB_13

    repo2 = spark.createDataFrame(
        [
            Row(caid="Z", home_ageb="090120001001", score=2),   # 12 chars
            Row(caid="Z", home_ageb="0901200010020", score=1),  # 13 chars
        ]
    )
    out2 = {r["caid"]: r["home_ageb"] for r in global_home_winner(repo2).collect()}
    assert out2["Z"] == "0901200010020"  # longer code wins despite lower score


def test_attach_home_sentinel(spark, pings):
    homes = spark.createDataFrame([Row(caid="A", home_ageb="0901200010010")])
    out = attach_home(extract_day(pings, "2020-01-14"), homes)
    got = {r["caid"]: r["home_ageb"] for r in out.select("caid", "home_ageb").distinct().collect()}
    assert got["A"] == "0901200010010"
    assert got["B"] == SENTINEL_AGEB_13


def test_locate_and_kring_impute(spark):
    # dim maps cell g12:7:9 -> region R1 (fallback grid, res irrelevant)
    dim = cells_to_regions_dim(
        spark.createDataFrame([Row(cells=["g3:15:-80"], cve_geo="R1")])
    )
    homes = spark.createDataFrame(
        [
            Row(caid="A", home_cell="g3:15:-80"),   # direct hit
            Row(caid="B", home_cell="g3:16:-80"),   # 1 hop away
            Row(caid="C", home_cell="g3:99:99"),    # unreachable in k<=2
        ]
    )
    out = impute_kring(homes, dim, max_k=2)
    got = {r["caid"]: r["cve_geo"] for r in out.collect()}
    assert got == {"A": "R1", "B": "R1", "C": None}


def test_neighbour_frequency_impute(spark):
    homes = spark.createDataFrame(
        [
            Row(caid="A", home_ageb="0901200010010"),
            Row(caid="B", home_ageb="0901200010010"),
            Row(caid="C", home_ageb="1501200010020"),
            Row(caid="D", home_ageb=SENTINEL_AGEB_13),  # in comp with A,B,C
            Row(caid="E", home_ageb=SENTINEL_AGEB_13),  # isolated
        ]
    )
    comps = spark.createDataFrame([Row(connected_component=["A", "B", "C", "D"])])
    out = impute_neighbour_frequency(homes, comps, rounds=2)
    got = {r["caid"]: r["home_ageb"] for r in out.collect()}
    assert got["D"] == "0901200010010"  # majority home in component
    assert got["E"] == SENTINEL_AGEB_13  # no neighbours -> unchanged
    assert got["A"] == "0901200010010"


def test_neighbour_frequency_labels_matches_arrays(spark):
    """The long-label entry point (no component-fits-in-a-row ceiling)
    fills identically to the reference-shaped arrays form — including
    multi-round propagation through a chained component structure."""
    from epiteam_network_etl_functions_spark.operators.components import (
        components_as_arrays,
        connected_components_star,
    )
    from epiteam_network_etl_functions_spark.plans.mobility import (
        impute_neighbour_frequency_labels,
    )

    homes = spark.createDataFrame(
        [
            Row(caid="A", home_ageb="0901200010010"),
            Row(caid="B", home_ageb="0901200010010"),
            Row(caid="C", home_ageb="1501200010020"),
            Row(caid="D", home_ageb=SENTINEL_AGEB_13),
            Row(caid="E", home_ageb=SENTINEL_AGEB_13),  # isolated
            Row(caid="F", home_ageb="1501200010020"),
            Row(caid="G", home_ageb=SENTINEL_AGEB_13),
        ]
    )
    edges = spark.createDataFrame(
        [
            Row(a_id="A", b_id="B"), Row(a_id="B", b_id="C"),
            Row(a_id="C", b_id="D"), Row(a_id="F", b_id="G"),
        ]
    )
    labels = connected_components_star(edges)
    via_labels = {
        r["caid"]: r["home_ageb"]
        for r in impute_neighbour_frequency_labels(homes, labels, rounds=3).collect()
    }
    via_arrays = {
        r["caid"]: r["home_ageb"]
        for r in impute_neighbour_frequency(
            homes, components_as_arrays(labels), rounds=3
        ).collect()
    }
    assert via_labels == via_arrays
    assert via_labels["D"] == "0901200010010"
    assert via_labels["G"] == "1501200010020"
    assert via_labels["E"] == SENTINEL_AGEB_13


def test_locate_pings_broadcast_join(spark):
    dim = cells_to_regions_dim(
        spark.createDataFrame([Row(cells=["g12:x:y"], cve_geo="R9")])
    )
    pings = spark.createDataFrame(
        [Row(caid="A", h3index_15="g12:x:y"), Row(caid="B", h3index_15="g12:zz:zz")]
    )
    out = {r["caid"]: r["cve_geo"] for r in locate_pings(pings, dim).collect()}
    assert out == {"A": "R9", "B": None}


def test_fact_pings_base_joinback(spark):
    from epiteam_network_etl_functions_spark.functions.hexgrid import _fallback_cell
    from epiteam_network_etl_functions_spark.plans.mobility import fact_pings_base

    cell = _fallback_cell(19.05, -99.05, 15)
    dim = cells_to_regions_dim(
        spark.createDataFrame([Row(cells=[cell], cve_geo="0901200010010")])
    )
    pings = spark.createDataFrame(
        [
            Row(caid="A", latitude=19.05, longitude=-99.05),
            Row(caid="B", latitude=19.05, longitude=-99.05),  # same point: label computed once
            Row(caid="C", latitude=19.99, longitude=-99.99),  # unmapped
        ]
    )
    out = {r["caid"]: r for r in fact_pings_base(pings, dim).collect()}
    assert out["A"]["cve_geo"] == "0901200010010"
    assert out["B"]["cve_geo"] == "0901200010010"
    assert out["A"]["cve_mun"] == "09012"
    assert out["C"]["cve_geo"] is None
    assert out["A"]["h3index_15"] == cell


def test_hexgrid_null_inputs_yield_nulls(spark):
    from epiteam_network_etl_functions_spark.functions.hexgrid import (
        cell_of,
        grid_distance,
        k_ring,
    )

    df = spark.createDataFrame(
        [Row(lat=19.0, lon=-99.0), Row(lat=None, lon=-99.0), Row(lat=19.0, lon=None)]
    )
    out = df.select(
        cell_of("lat", "lon", 7).alias("cell")
    ).collect()
    assert out[0]["cell"] is not None
    assert out[1]["cell"] is None and out[2]["cell"] is None

    cells = spark.createDataFrame(
        [Row(a="g7:1:1", b="g7:2:2"), Row(a=None, b="g7:2:2")]
    )
    got = cells.select(
        grid_distance("a", "b").alias("d"), k_ring("a", 1).alias("ring")
    ).collect()
    assert got[0]["d"] == 1 and len(got[0]["ring"]) == 9
    assert got[1]["d"] is None and got[1]["ring"] is None
