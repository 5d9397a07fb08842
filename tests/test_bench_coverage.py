"""Structural closure of the bench over the query inventory.

Every `queries()` entry must either be benchmarked (bench.HEADLINE) or
carry a written exclusion reason (bench.EXCLUDED) — an entry in neither
list would join the correctness inventory without ever being timed, and
an entry in both would double-claim.  No Spark session needed.
"""

from __future__ import annotations

import importlib.util
import os

from chessmate_spark.plans.queries import QUERIES

_BENCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
_spec = importlib.util.spec_from_file_location("bench", _BENCH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_headline_and_exclusions_partition_the_inventory():
    headline = set(bench.HEADLINE)
    excluded = set(bench.EXCLUDED)
    inventory = set(QUERIES)
    assert headline & excluded == set(), headline & excluded
    orphaned = inventory - headline - excluded
    assert not orphaned, f"entries neither benched nor excluded: {orphaned}"
    stale = (headline | excluded) - inventory
    assert not stale, f"bench names not in the inventory: {stale}"


def test_headline_has_no_duplicates():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_every_exclusion_has_a_reason():
    for name, reason in bench.EXCLUDED.items():
        assert isinstance(reason, str) and len(reason) > 20, name
