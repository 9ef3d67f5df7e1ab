"""The local oracle gate must be as strict as the driver's stringified
value hash: an int-valued float (DuckDB HUGEINT/DOUBLE -> pandas float64)
hashing as "3153.0" must NOT pass against a Spark LONG hashing as "3153".
This is the exact gap that let d34_dataprep_summary ship locally green and
driver-red in round 3."""

import numpy as np

from tests.oracle_utils import _norm_cell


def test_int_float_not_equal():
    assert _norm_cell(3153) != _norm_cell(3153.0)
    assert _norm_cell(np.int64(3153)) != _norm_cell(np.float64(3153.0))


def test_same_family_still_equal():
    assert _norm_cell(np.int64(7)) == _norm_cell(7)
    assert _norm_cell(np.float64(1.5)) == _norm_cell(1.5)
    # fp dust within the 6-place round still collapses
    assert _norm_cell(0.1 + 0.2) == _norm_cell(0.3)
    assert _norm_cell(-0.0) == _norm_cell(0.0)


def test_bool_is_not_int():
    assert _norm_cell(True) != _norm_cell(1)
    assert _norm_cell(np.bool_(False)) == _norm_cell(False)


def test_nan_matches_nan():
    assert _norm_cell(float("nan")) == _norm_cell(np.float64("nan"))
