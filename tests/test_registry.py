"""Registry-tier invariants the driver contract depends on: the
certification window occupies the first slots IN ORDER, every window slot
carries an oracle, and every oracle-less query sorts after every
oracle-backed one (so a first-N driver window can never sample a query it
cannot hash-check)."""

from conceptnetwork_spark import registry


def test_window_is_registry_head_in_order():
    names = list(registry.queries())
    assert names[: len(registry.CERT_FIRST)] == list(registry.CERT_FIRST)


def test_every_window_slot_has_an_oracle():
    ors = registry.oracles()
    missing = [n for n in registry.CERT_FIRST if n not in ors]
    assert not missing, f"window slots without oracles: {missing}"


def test_oracle_less_queries_sort_after_all_oracle_backed():
    names = list(registry.queries())
    ors = registry.oracles()
    non = registry.non_oracle_queries()
    assert set(names) == set(ors) | set(non)
    idx = {n: i for i, n in enumerate(names)}
    assert max(idx[n] for n in ors) < min(idx[n] for n in non)


def test_oracles_resolve_to_nonempty_sql():
    for name, sql in registry.oracles().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
