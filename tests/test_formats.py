"""CSV/JSON staging-helper guards (sources/formats.py).

The staging helpers exist ONLY to produce bounded single-file oracle
fixtures; the row ceiling makes pointing them at a fact table an error
instead of a silent driver-side bottleneck.
"""

import os

import pytest

from conceptnetwork_spark.sources import formats
from tests.conftest import SF_ORACLE


def test_stage_ceiling_rejects_fact_table(monkeypatch, tmp_path):
    monkeypatch.setattr(formats, "_STAGE_ROW_CEILING", 5)
    monkeypatch.setattr(
        formats, "_stage_dir", lambda sf_dir, fmt: str(tmp_path / fmt)
    )
    with pytest.raises(ValueError, match="refusing to stage"):
        formats.stage_nation_csv(SF_ORACLE)  # 25 rows > patched ceiling 5
    with pytest.raises(ValueError, match="refusing to stage"):
        formats.stage_orders_json(SF_ORACLE)


def test_oracle_fixture_staged_at_import():
    # importing the module (registration time) must leave the oracle files
    # on disk — an oracle evaluated standalone reads current bytes
    assert os.path.exists(formats._ORACLE_CSV)
    assert os.path.exists(formats._ORACLE_JSON)


def test_staging_is_idempotent_and_spark_free():
    p1 = formats.stage_nation_csv(SF_ORACLE)
    p2 = formats.stage_nation_csv(SF_ORACLE)
    assert p1 == p2 == formats._ORACLE_CSV
