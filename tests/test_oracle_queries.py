"""The correctness gate, locally: every declared query with an oracle must
match DuckDB on sf0.01 (row count + schema width + values)."""

import pytest

from conceptnetwork_spark import registry
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_oracle_match

ALL = registry.queries()
ORACLES = registry.oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_query(spark, ddb, name):
    df = ALL[name](spark, SF_ORACLE)
    assert_oracle_match(df, ddb, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLES)))
def test_non_oracle_query_runs(spark, name):
    """Non-oracle ops still must run and return a stable schema."""
    df = ALL[name](spark, SF_ORACLE)
    assert df.columns
    assert df.count() >= 0
