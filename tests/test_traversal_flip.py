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


def _write_wide_tree(root: str, n_collections: int = 12, items_per: int = 4) -> str:
    """A catalog -> N collections -> M items tree with deliberate
    CROSS-LINKS (every collection also links the NEXT collection's
    first item, and the last collection links back to the first — a
    cycle), so first-discovery-keeps-least-path and the visited
    anti-join do real work beyond the 3-doc golden tree."""
    import json
    import os

    d = os.path.join(root, "wide")
    os.makedirs(d, exist_ok=True)

    def write(name, doc):
        p = os.path.join(d, name)
        with open(p, "w") as f:
            json.dump(doc, f)
        return p

    cat_links = [{"rel": "child", "href": f"./col{c}.json"} for c in range(n_collections)]
    root_path = write("catalog.json", {
        "type": "Catalog", "id": "cat", "stac_version": "1.0.0",
        "description": "wide", "links": cat_links,
    })
    for c in range(n_collections):
        links = [{"rel": "item", "href": f"./item{c}_{i}.json"} for i in range(items_per)]
        # cross-link: next collection's first item (cycle on the last)
        nxt = (c + 1) % n_collections
        links.append({"rel": "item", "href": f"./item{nxt}_0.json"})
        links.append({"rel": "child", "href": f"./col{(c + 1) % n_collections}.json"})
        write(f"col{c}.json", {
            "type": "Collection", "id": f"col{c}", "stac_version": "1.0.0",
            "description": "c", "links": links,
        })
        for i in range(items_per):
            write(f"item{c}_{i}.json", {
                "type": "Feature", "id": f"it{c}_{i}", "stac_version": "1.0.0",
                "properties": {}, "assets": {}, "links": [],
            })
    return root_path


def test_wide_cyclic_tree_modes_agree(spark, tmp_path):
    """driver / dataframe / auto(flip) modes must produce identical
    (url, discovery_ord) on a 61-doc cyclic tree with duplicate link
    targets — each URL once, DFS pre-order, least path wins."""
    from geostore_spark.pipeline import traversal as tmod

    root = _write_wide_tree(str(tmp_path))
    by_mode = {}
    for mode in ("driver", "dataframe"):
        rows = (
            tmod.traverse(spark, root, frontier_mode=mode)
            .orderBy("discovery_ord")
            .collect()
        )
        by_mode[mode] = [(r["url"], r["discovery_ord"]) for r in rows]
    assert by_mode["driver"] == by_mode["dataframe"]
    n = len(by_mode["driver"])
    assert n == 1 + 12 + 12 * 4  # every doc exactly once despite cycles
    assert [o for _, o in by_mode["driver"]] == list(range(n))
