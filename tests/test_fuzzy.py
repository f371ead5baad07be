"""Deletion-neighborhood fuzzy join: losslessness vs brute force and
edit-shape coverage (substitution / insertion / deletion / equal)."""

from __future__ import annotations

import itertools

import pytest

from ingestion_pipeline_spark.operators.fuzzy import fuzzy_self_join

WORDS = [
    (1, "widget"),
    (2, "wídget"),   # substitution (multibyte char, exercises substr on unicode)
    (3, "widgets"),  # insertion at end
    (4, "idget"),    # deletion at start
    (5, "wigdet"),   # transposition = lev 2 -> must NOT match widget
    (6, "widget"),   # exact duplicate -> dist 0 pair
    (7, "gadget"),   # lev 2 from widget
    (8, "x"),        # single char; neighborhood includes ""
    (9, "y"),        # lev 1 from "x" via substitution
]


def _brute(rows, max_dist):
    def lev(s, t):
        m, n = len(s), len(t)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (s[i - 1] != t[j - 1]))
                prev = cur
        return dp[n]

    return {
        (a[0], b[0], lev(a[1], b[1]))
        for a, b in itertools.combinations(rows, 2)
        if lev(a[1], b[1]) <= max_dist
    }


@pytest.fixture(scope="module")
def words(spark):
    return spark.createDataFrame(WORDS, "wid long, w string")


def test_matches_brute_force(words):
    got = {
        (r["a_key"], r["b_key"], r["dist"])
        for r in fuzzy_self_join(words, "wid", "w").collect()
    }
    assert got == _brute(WORDS, 1)


def test_edit_shapes_present(words):
    pairs = {
        (r["a_key"], r["b_key"]): r["dist"]
        for r in fuzzy_self_join(words, "wid", "w").collect()
    }
    assert pairs[(1, 2)] == 1   # substitution
    assert pairs[(1, 3)] == 1   # insertion
    assert pairs[(1, 4)] == 1   # deletion
    assert pairs[(1, 6)] == 0   # exact dup
    assert pairs[(8, 9)] == 1   # single-char substitution via "" variant
    assert (1, 5) not in pairs  # transposition is lev 2: candidate generated
    #                             (shared deletion) but verify rejects it
    assert (1, 7) not in pairs  # lev 2, never a candidate


def test_max_dist_gt1_unimplemented(words):
    with pytest.raises(NotImplementedError):
        fuzzy_self_join(words, "wid", "w", max_dist=2)
