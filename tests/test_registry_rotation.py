"""Invariants of the driver-facing query registry rotation.

The driver records official correctness rows for only the FIRST 50
entries of ``queries()`` per round (plans/__init__.py), so ordering
bugs silently waste coverage slots: a typo in ``_DRIVER_RECORDED``
re-spends a slot on an already-recorded query, and a fresh-block query
without an ``oracle_sql`` entry burns a slot on a weaker rows-only row.
Pure-Python checks — no Spark session.
"""

from federated_gcn_spark.plans import (
    ORACLE,
    QUERIES,
    _DRIVER_RECORDED,
    _FRESH_FIRST,
    _PROMOTED,
)
from federated_gcn_spark.plans.queries import QUERIES as _RAW


def test_driver_recorded_names_are_all_declared():
    # a typo'd name here would keep a recorded query in the fresh block
    unknown = _DRIVER_RECORDED - set(_RAW)
    assert not unknown, f"_DRIVER_RECORDED names not in registry: {unknown}"


def test_promoted_names_are_declared_and_oracle_paired():
    for n in _PROMOTED:
        assert n in _RAW, f"promoted {n!r} is not a declared query"
        assert n in ORACLE, f"promoted {n!r} has no oracle twin"


def test_rotation_preserves_the_full_registry():
    assert set(QUERIES) == set(_RAW)
    assert set(ORACLE) <= set(QUERIES)


def test_first_50_slots_are_promoted_or_never_recorded_and_oracle_paired():
    names = list(QUERIES)
    first = names[: min(50, len(names))]
    for n in first:
        assert n in _PROMOTED or n not in _DRIVER_RECORDED, (
            f"slot wasted: {n!r} already has an official row and is not "
            "promoted"
        )
        assert n in ORACLE, (
            f"slot weakened: {n!r} would record rows-only (no oracle)"
        )


def test_fresh_first_names_lead_the_window():
    # round-7 verdict task 1: the bounded set-similarity front doors must
    # land at the head of the fresh block, not risk slipping past slot 50
    names = list(QUERIES)
    head = names[: len(_PROMOTED) + len(_FRESH_FIRST)]
    for n in _FRESH_FIRST:
        if n in _RAW and n not in _DRIVER_RECORDED:
            assert n in head, f"{n!r} not at the head of the fresh block"
        assert n in _RAW, f"_FRESH_FIRST {n!r} is not a declared query"


def test_no_fresh_query_sorts_after_a_recorded_one():
    names = list(QUERIES)
    seen_recorded = False
    for n in names:
        if n in _PROMOTED:
            continue
        if n in _DRIVER_RECORDED:
            seen_recorded = True
        else:
            assert not seen_recorded, (
                f"never-recorded {n!r} sorts after a recorded query — it "
                "can never reach the driver's 50-slot window"
            )
