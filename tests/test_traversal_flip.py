"""Auto-dispatch traversal: the mid-walk flip from driver-list to
DataFrame-frontier bookkeeping (round-7 shape: the post-flip rounds
read executor-side and keep O(1) driver state) must preserve the
reference's DFS pre-order exactly."""

from __future__ import annotations

from tests.stac_fixtures import build_golden_tree


def test_auto_mode_flips_mid_walk_and_preserves_order(spark, tmp_path, monkeypatch):
    from geostore_spark.pipeline import traversal as tmod

    tree = build_golden_tree(str(tmp_path))
    # golden driver-mode order first
    want = [
        (r["url"], r["discovery_ord"])
        for r in tmod.traverse(spark, tree["root_url"], frontier_mode="driver")
        .orderBy("discovery_ord")
        .collect()
    ]

    # force the flip after the FIRST round: every link volume crosses 0
    monkeypatch.setattr(tmod, "DF_FRONTIER_THRESHOLD", 0)
    # after the flip, the driver-list reader must never run again
    calls = {"n": 0}
    orig = tmod.read_documents

    def counting(spark_, urls):
        calls["n"] += 1
        return orig(spark_, urls)

    monkeypatch.setattr(tmod, "read_documents", counting)
    got = [
        (r["url"], r["discovery_ord"])
        for r in tmod.traverse(spark, tree["root_url"], frontier_mode="auto")
        .orderBy("discovery_ord")
        .collect()
    ]
    assert got == want
    assert calls["n"] == 1  # round 1 only; rounds 2+ read executor-side
