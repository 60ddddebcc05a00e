"""The local oracle gate must be exactly as strict as the driver's hash.

Round 8 shipped a 373/373 local pass alongside an official red row
because ``tools/check_oracle.py`` normalized floats to 9 significant
digits while the driver hashes full-precision values.  These tests pin
the repr-strict contract so a future "cleanup" cannot silently weaken
the gate back below the driver's resolution.  Pure Python — no Spark.
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_oracle import normalize  # noqa: E402


def _cell(v):
    _, rows = normalize([(v,)], ["c"])
    return rows[0][0]


def test_one_ulp_apart_doubles_normalize_differently():
    # the exact class the %.9g gate was blind to: agreement in the first
    # 9 significant digits, disagreement at the last ulp
    v = 1.1600222424e15
    w = math.nextafter(v, math.inf)
    assert f"{v:.9g}" == f"{w:.9g}"  # the old gate saw no difference
    assert _cell(v) != _cell(w)  # the strict gate must


def test_roundtrip_identical_doubles_normalize_equally():
    assert _cell(0.1 + 0.2) == _cell(0.30000000000000004)


def test_nan_and_null_and_ints_are_stable():
    assert _cell(float("nan")) == "nan"
    assert _cell(None) == "NULL"
    assert _cell(7) == "7"


def test_negative_zero_is_distinct_from_zero():
    # -0.0 == 0.0 compares equal but hashes differently as a string on
    # the driver side; the gate must surface the sign, not mask it
    assert _cell(-0.0) != _cell(0.0)


def test_column_sort_matches_driver_semantics():
    cols, rows = normalize([(1, 2.5)], ["b", "a"])
    assert cols == ["a", "b"]
    assert rows == [("2.5", "1")]
