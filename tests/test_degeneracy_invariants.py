"""Degeneracy-audit adjudications locked as tests (VERDICT r9 item 8).

The r9 registry-wide audit (tools/audit_degeneracy.py) flagged a family
of graph queries whose emptiness/collapse at specific SFs was adjudicated
LEGITIMATE (tiny-SF sparsity or dense-graph saturation), plus one real
bug (part_value_concentration's fixed fraction) that was fixed. Those
claims lived in SCALING.md narrative; this fixture pins them, so a future
edit that silently changes the shape (a threshold regression, a cap that
starts eating sf0.01 too) fails a test instead of hollowing tier
measurements again.

Fixture counts re-measured 2026-08-15 (audit run, this round):
  two_hop_reach_histogram  [9, 7, 1]   dense-graph collapse to one bucket
  two_hop_reach_capped     [9, 15, 0]  cap empties at sf0.1 density (documented)
  colocation_kcore         [0, 145, 1500]  15 users cannot form a 3-core
  two_hop_reach_sketched   [3, 1, 1]   same collapse, sketch arm
  part_value_concentration non-empty at every SF (the fixed Q11 bug)
"""

from __future__ import annotations

import pytest

SF1 = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"
SF3 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def registry():
    from epiteam_network_etl_functions_spark import workload

    workload.load_all()
    return workload.REGISTRY


def _count(registry, spark, name, sf):
    return registry[name](spark, sf).count()


def test_kcore_empty_only_at_smoke_sf(registry, spark):
    """15 users can't form the 3-core (legitimate tiny-SF emptiness);
    from sf0.01 up the core must be non-empty — if it ever empties at
    sf0.1, a threshold regressed."""
    assert _count(registry, spark, "colocation_kcore", SF1) == 0
    assert _count(registry, spark, "colocation_kcore", SF2) > 0
    assert _count(registry, spark, "colocation_kcore", SF3) > 0


def test_reach_histogram_collapses_not_empties(registry, spark):
    """Dense-graph saturation: the reach histogram SHRINKS toward one
    bucket as density grows, but never to zero — emptiness would mean
    the reach computation itself broke."""
    c1 = _count(registry, spark, "two_hop_reach_histogram", SF1)
    c2 = _count(registry, spark, "two_hop_reach_histogram", SF2)
    c3 = _count(registry, spark, "two_hop_reach_histogram", SF3)
    assert c1 >= c2 >= c3 >= 1


def test_capped_reach_empties_exactly_at_density(registry, spark):
    """The degree cap keeps sparse-SF nodes and correctly excludes the
    saturated sf0.1 graph (the r9 cap incident, now a documented
    contract: the CAPPED arm empties, the SKETCHED arm takes over)."""
    assert _count(registry, spark, "two_hop_reach_capped", SF1) > 0
    assert _count(registry, spark, "two_hop_reach_capped", SF2) > 0
    assert _count(registry, spark, "two_hop_reach_capped", SF3) == 0


def test_sketched_reach_always_produces(registry, spark):
    """The sketch arm is the production path precisely where the capped
    arm empties — it must produce at EVERY SF."""
    for sf in (SF1, SF2, SF3):
        assert _count(registry, spark, "two_hop_reach_sketched", sf) >= 1


def test_part_value_concentration_scale_free(registry, spark):
    """The one real bug the audit found (fixed fraction -> 0 rows at
    sf0.1): its scale-free replacement must stay non-empty at every SF."""
    for sf in (SF1, SF2, SF3):
        assert _count(registry, spark, "part_value_concentration", sf) > 0
