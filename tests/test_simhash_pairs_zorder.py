"""Pigeonhole simhash pairing and Morton-key interleave: verified against
hand-computed expectations (brute-force Hamming scan; Python bit
interleave)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from geostore_spark.functions.geo import ZORDER_BITS, zorder_key
from geostore_spark.operators.dedup import simhash_pairs

FPS = [
    (1, 0b1010_1100_0011_0101_1111_0000_1010_0001),
    (2, 0b1010_1100_0011_0101_1111_0000_1010_0000),  # d(1,2)=1
    (3, 0b1010_1100_0011_0101_1111_0000_0101_0001),  # d(1,3)=4 → excluded
    (4, 0b0101_0011_1100_1010_0000_1111_0101_1110),  # far from all
    (5, 0b1010_1100_0011_0101_1111_0000_1010_0001),  # identical to 1
    (6, 0b1010_1100_0011_0111_1011_0000_1010_0001),  # d(1,6)=2, spans bands
]


def _brute(max_h=3):
    return {
        (a, b): bin(fa ^ fb).count("1")
        for (a, fa), (b, fb) in combinations(FPS, 2)
        if bin(fa ^ fb).count("1") <= max_h
    }


def test_simhash_pairs_match_bruteforce(spark):
    fps = spark.createDataFrame(FPS, "doc_id long, simhash32 long")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(fps, "doc_id").collect()
    }
    assert got == _brute()
    assert (1, 5) in got and got[(1, 5)] == 0
    assert (1, 3) not in got  # distance 4 exceeds the budget
    assert got[(1, 6)] == 2


def _py_interleave(x: int, y: int, bits: int = ZORDER_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_interleave(spark):
    cells = [(0, 0), (1, 0), (0, 1), (5, 9), (32767, 0), (0, 32767), (12345, 6789)]
    df = spark.createDataFrame(cells, "cx long, cy long")
    got = [
        r["z"]
        for r in df.select(zorder_key(F.col("cx"), F.col("cy")).alias("z"))
        .orderBy("cx", "cy")
        .collect()
    ]
    expect = [_py_interleave(x, y) for x, y in sorted(cells)]
    assert got == expect
