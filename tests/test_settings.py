"""Settings system (O4) + load_object (F7) — frontera Settings parity."""

import pytest

from frontera_spark.settings import DEFAULT_SETTINGS, Settings, engine_from_settings, load_object


def test_defaults_and_overrides():
    s = Settings()
    assert s.MAX_NEXT_REQUESTS == DEFAULT_SETTINGS["MAX_NEXT_REQUESTS"]
    s2 = Settings(attributes={"MAX_NEXT_REQUESTS": 1024, "BC_MIN_HOSTS": 4})
    assert s2.MAX_NEXT_REQUESTS == 1024
    assert s2.BC_MIN_HOSTS == 4
    assert "BC_MIN_HOSTS" in s2
    with pytest.raises(AttributeError):
        _ = s2.NOPE


def test_module_object_overlay():
    class MySettings:
        MAX_NEXT_REQUESTS = 99
        CRAWLING_STRATEGY = "dfs"
        lower_ignored = True

    s = Settings(module=MySettings)
    assert s.MAX_NEXT_REQUESTS == 99
    assert s.CRAWLING_STRATEGY == "dfs"
    assert s.get("lower_ignored") is None


def test_env_override(monkeypatch):
    monkeypatch.setenv("FRONTERA_SPARK_MAX_NEXT_REQUESTS", "512")
    monkeypatch.setenv("FRONTERA_SPARK_SCHEDULE_MODE", '"per_partition"')
    s = Settings(attributes={"MAX_NEXT_REQUESTS": 7})
    assert s.MAX_NEXT_REQUESTS == 512  # env wins over attributes
    assert s.SCHEDULE_MODE == "per_partition"


def test_load_object():
    obj = load_object("frontera_spark.core.strategies.STRATEGIES")
    assert "bfs" in obj
    with pytest.raises(ValueError):
        load_object("nodots")
    with pytest.raises(NameError):
        load_object("frontera_spark.core.strategies.MISSING")


def test_engine_from_settings(spark, tmp_path):
    s = Settings.from_params(
        spider_feed_partitions=2,
        crawling_strategy="lifo",
        max_depth=3,
        canonical_solver="corporate",
    )
    eng = engine_from_settings(spark, str(tmp_path / "eng"), s)
    assert eng.n_partitions == 2
    assert eng.strategy.name == "lifo"
    assert eng.max_depth == 3

    # dotted-path strategy (frontera BACKEND-style reflection)
    s2 = Settings.from_params(
        crawling_strategy="frontera_spark.core.strategies.STRATEGIES"
    )
    with pytest.raises(TypeError):
        engine_from_settings(spark, str(tmp_path / "eng2"), s2)  # dict, not Strategy


def test_loop_from_settings(spark, tmp_path):
    from frontera_spark.settings import loop_from_settings
    from frontera_spark.sources.corpus import url_of, write_corpus

    corpus = str(tmp_path / "corpus")
    write_corpus(spark, corpus, 20, 5, 42)
    s = Settings.from_params(
        max_next_requests=8,
        spider_feed_partitions=1,
        crawling_strategy="bfs",
        bc_min_hosts=2,
        check_invariant=False,
    )
    loop = loop_from_settings(spark, str(tmp_path / "eng"), corpus, s)
    assert loop.batch_size == 8
    assert loop.min_hosts == 2
    loop.add_seeds([url_of(0, 5)])
    hist = loop.run(max_iterations=30)
    assert sum(m["n_fetched"] for m in hist) == 20
