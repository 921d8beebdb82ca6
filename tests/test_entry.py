from __future__ import annotations

import __spark_entry__ as e


def test_entry_smoke(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"o_orderkey", "genre", "n_items", "revenue"}


def test_contract_shapes():
    qs = e.queries()
    oracles = e.oracle_sql()
    assert "flagship" in qs
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_all_queries_run_smoke(spark):
    """Every registered query executes and returns a DataFrame at sf0.001."""
    for name, fn in e.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_driver_window_pins_parity_set():
    """r12 verdict item 1: the driver hash-checks the FIRST 50 registry
    names every round. The ordering invariant: (a) every SURVEY §2
    reference-parity query sits inside that window, (b) the remaining
    slots are the deterministic md5(f"r{round}:{name}") rotation over
    the never-driver-sampled pool, recomputable from the committed
    CORRECTNESS files alone.
    """
    import hashlib
    import json
    from pathlib import Path

    from otrrentetl_spark import registry

    # Pin the order the DRIVER sees: __spark_entry__.queries() (which
    # re-finalizes the ordering, making it robust to pytest collection
    # importing a plan module before the registry).
    names = list(e.queries())
    window = names[: registry.DRIVER_WINDOW]

    # (a) flagship + the full parity set are pinned in the window.
    assert names[0] == "flagship"
    missing = [p for p in registry.PARITY_SET if p not in window]
    assert missing == [], f"§2 parity queries outside driver window: {missing}"

    # (b) rotation slots match an independent recomputation.
    repo = Path(registry.__file__).resolve().parent.parent
    rounds = sorted(
        int(f.name.removeprefix("CORRECTNESS_r").removesuffix(".json"))
        for f in repo.glob("CORRECTNESS_r*.json")
    )
    rnd = (rounds[-1] if rounds else 0) + 1
    sampled: set[str] = set()
    for f in repo.glob("CORRECTNESS_r*.json"):
        sampled |= set(json.loads(f.read_text()).keys())

    head = ["flagship", *[p for p in registry.PARITY_SET if p in names]]
    pool = [n for n in names if n not in sampled and n not in head]
    if not pool:
        pool = [n for n in names if n not in head]
    pool.sort(key=lambda n: hashlib.md5(f"r{rnd}:{n}".encode()).hexdigest())
    expected = head + pool[: registry.DRIVER_WINDOW - len(head)]
    assert window == expected

    # The rotation exists to shrink the never-sampled pool: while any
    # pool remains, the window must introduce >=10 first-ever names
    # (or the whole remaining pool if fewer than 10 are left).
    fresh = [n for n in window if n not in sampled]
    pool_size = len([n for n in names if n not in sampled])
    assert len(fresh) >= min(10, pool_size)
