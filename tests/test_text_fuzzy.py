"""Fuzzy edit-distance join: the two candidate strategies (PassJoin
segment equi-join vs salted block DP) must agree with each other and
with a brute-force oracle on data shaped to exercise both — dispersed
names (PassJoin territory) and constant-prefix names (block-DP
territory), plus short-string edge cases that ride the brute branch."""

from __future__ import annotations

import pytest

from geostore_spark.operators.text import FUZZY_MAX_DIST, fuzzy_edit_join


def _brute(rows):
    import itertools

    def ed(a, b):
        # classic DP, small strings only (test oracle)
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    agg = {}
    for (k1, n1, nat1), (k2, n2, nat2) in itertools.combinations(rows, 2):
        if nat1 != nat2:
            continue
        d = ed(n1, n2)
        if d <= FUZZY_MAX_DIST:
            cur = agg.setdefault(nat1, [0, 99, 0])
            cur[0] += 1
            cur[1] = min(cur[1], d)
            cur[2] += d
    return {
        nat: (c, mn, sm) for nat, (c, mn, sm) in agg.items()
    }


CASES = {
    "dispersed": [
        (i, f"{(i * 2654435761) % 10**6:06d}name{i % 7}", i % 2)
        for i in range(80)
    ]
    # seed a few true near-dups: substitutions and an insertion
    + [
        (1000, "000001nameA", 0),
        (1001, "000001nameB", 0),   # 1 substitution from 1000
        (1002, "000001nameAB", 0),  # 1 insertion from 1000
        (1003, "990001nameA", 1),   # wrong nation: must NOT pair with 1000
    ],
    "constant_prefix": [
        (i, f"Customer#{i:09d}", i % 2) for i in range(120)
    ],
    "short_strings": [
        (1, "ab", 0), (2, "b", 0), (3, "abcd", 0), (4, "xy", 1),
        (5, "xyz", 1), (6, "a" * 10, 0), (7, "ab", 1),
    ],
}


@pytest.mark.parametrize("case", sorted(CASES))
@pytest.mark.parametrize("force", ["passjoin", "block_dp", None])
def test_fuzzy_strategies_agree_with_bruteforce(spark, case, force):
    rows = CASES[case]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long"
    )
    got = {
        r["nation"]: (r["n_pairs"], r["min_dist"], r["sum_dist"])
        for r in fuzzy_edit_join(df, force=force).collect()
    }
    assert got == _brute(rows), f"{case} force={force}"
