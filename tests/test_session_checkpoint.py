"""Session-scoped checkpoint registry: build-once semantics, key
isolation, and cross-consumer identity (the mechanism behind the
shared supply-pair / daily-rollup / bloom-key scaffolding)."""

from __future__ import annotations

from geostore_spark.operators.util import session_checkpoint


def test_session_checkpoint_builds_once_per_key(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(0, 5)

    a = session_checkpoint(spark, ("t_sc", "k1"), build)
    b = session_checkpoint(spark, ("t_sc", "k1"), build)
    assert calls["n"] == 1
    assert a is b  # consumers share ONE checkpointed plan object
    assert a.count() == 5

    c = session_checkpoint(spark, ("t_sc", "k2"), build)
    assert calls["n"] == 2  # distinct keys build independently
    assert c is not a


def test_shared_supply_pairs_identity_across_consumers(spark):
    from geostore_spark.operators.graph import shared_supply_pairs

    sf = "/root/testdata/sf0.001"
    p1 = shared_supply_pairs(spark, sf)
    p2 = shared_supply_pairs(spark, sf)
    assert p1 is p2
    # deduped: symmetric pair table has no duplicate rows
    assert p1.count() == p1.distinct().count()
