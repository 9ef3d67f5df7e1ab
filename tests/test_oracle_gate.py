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


def test_negative_zero_is_sign_strict():
    """The driver's stringified hash sees "-0.0" != "0.0" — round 11's
    only red (d14_rolling_corr: DuckDB ROUND(tiny_negative, 4) keeps the
    sign, Spark's BigDecimal round cannot). The comparator must expose
    the divergence, and + 0.0 must be the normalization that closes it."""
    assert _norm_cell(-0.0) != _norm_cell(0.0)
    assert _norm_cell(np.float64(-0.0)) != _norm_cell(np.float64(0.0))
    # dust that ROUNDS to signed zero is also sign-strict
    assert _norm_cell(-1e-9) != _norm_cell(1e-9)
    # the in-query fix: IEEE guarantees -0.0 + 0.0 == +0.0
    assert _norm_cell(-0.0 + 0.0) == _norm_cell(0.0)


def test_negative_zero_fixture_hash_matches_after_normalization(spark, ddb):
    """End-to-end pin of the r11 fix: a fixture engineered so DuckDB's
    ROUND emits -0.0 hash-matches the Spark side once BOTH projections
    append + 0.0 (the d14_rolling_corr / d20 / d33 normalization)."""
    import duckdb  # noqa: F401  (ddb fixture provides the connection)
    from pyspark.sql import functions as F

    from tests.oracle_utils import assert_oracle_match

    sdf = spark.range(1).select(
        (F.round(F.lit(-1e-9), 4) + F.lit(0.0)).alias("v")
    )
    # sanity: WITHOUT normalization DuckDB really emits -0.0 here
    raw = ddb.execute("SELECT ROUND(-1e-9, 4) AS v").fetchdf()["v"][0]
    import math

    assert raw == 0.0 and math.copysign(1.0, raw) < 0
    assert_oracle_match(
        sdf, ddb, "SELECT ROUND(-1e-9, 4) + 0.0 AS v", "negzero_fixture"
    )


def test_bool_is_not_int():
    assert _norm_cell(True) != _norm_cell(1)
    assert _norm_cell(np.bool_(False)) == _norm_cell(False)


def test_nan_matches_nan():
    assert _norm_cell(float("nan")) == _norm_cell(np.float64("nan"))
