"""Settings system (O4) — frontera-parity configuration layer.

Reference: frontera's ``Settings`` / ``default_settings`` pair
(frontera/settings/__init__.py:~1-120, frontera/settings/default_settings.py:
~1-120): a defaults dict, overridable by a user module/dict/object, with
attribute access; plus ``load_object`` reflection loading
(frontera/utils/misc.py:~25-45) so string paths in settings resolve to
classes/objects ("BACKEND='frontera.contrib.backends...'" style).

Spark-first differences: there is one engine (no BACKEND/MESSAGE_BUS
switches); the keys that survive are the behavioral ones (batch shaping,
politeness, partitioning) plus this engine's own knobs. Precedence, lowest
to highest: DEFAULT_SETTINGS < constructor/module/dict overrides < env vars
``FRONTERA_SPARK_<KEY>`` (parity with frontera's Settings precedence, env
layer added for spark-submit friendliness).
"""

from __future__ import annotations

import importlib
import json
import os
from typing import Any

# frontera default_settings.py names kept where the concept carried over
# (MAX_NEXT_REQUESTS, BC_*, SPIDER_FEED_PARTITIONS, CANONICAL_SOLVER,
# CRAWLING_STRATEGY); engine-specific knobs use this engine's vocabulary.
DEFAULT_SETTINGS: dict[str, Any] = {
    "MAX_NEXT_REQUESTS": 64,            # frontera default_settings
    "BC_MIN_REQUESTS": None,            # batch-shaping floors (HBase backend)
    "BC_MIN_HOSTS": None,
    "BC_MAX_REQUESTS_PER_HOST": None,
    "MAX_PENDING": None,                # offset-lag backpressure gate
    "SPIDER_FEED_PARTITIONS": 8,        # = n_partitions (Crc32NamePartitioner)
    "CRAWLING_STRATEGY": "bfs",         # name or frontera-style object path
    "CANONICAL_SOLVER": "basic",        # 'basic' | 'corporate'
    "MIDDLEWARES": (),                  # dotted paths / callables (E2 chain)
    "MAX_DEPTH": None,
    "MAX_URL_LENGTH": 2048,
    "ROBOTS_DENY_HOSTS": (),
    "JID": 0,
    "USE_SEEN_SHARDS": False,
    "SHARD_CAPACITY": 1 << 20,
    "HOST_SALTS": 16,
    "SCHEDULE_MODE": "global",          # 'global' | 'per_partition'
    "TOKEN_CAP": 8.0,                   # politeness bucket size
    "BATCH_PERIOD": 1.0,                # deterministic clock seconds/iteration
    "CHECK_INVARIANT": True,            # PSNR/caption payload check
    "CORPUS_SEED": 42,
    "VACUUM_EVERY": 25,
    "VACUUM_KEEP": 10,
}

_ENV_PREFIX = "FRONTERA_SPARK_"


def load_object(path: str) -> Any:
    """Reflection config loading (frontera/utils/misc.py load_object parity):
    'pkg.mod.Name' → the attribute. Returns non-string inputs unchanged so
    settings may hold either a path or the object itself."""
    if not isinstance(path, str):
        return path
    module_path, _, name = path.rpartition(".")
    if not module_path:
        raise ValueError(f"load_object: not a dotted path: {path!r}")
    mod = importlib.import_module(module_path)
    try:
        return getattr(mod, name)
    except AttributeError as e:
        raise NameError(f"load_object: {name!r} not found in {module_path!r}") from e


def _coerce(key: str, default: Any, raw: str) -> Any:
    """Env strings coerced to the default's type (JSON first, then literal),
    then VALIDATED against the default's type when the default is non-None —
    ``FRONTERA_SPARK_MAX_NEXT_REQUESTS=abc`` must fail here with the env-var
    name, not much later as a bare int() error inside loop_from_settings."""
    try:
        val = json.loads(raw)
    except (json.JSONDecodeError, ValueError):
        val = raw
    if default is None:
        return val
    # JSON has no tuple: sequence defaults accept a list and normalize
    if isinstance(default, tuple) and isinstance(val, list):
        return tuple(val)
    # bool is an int subclass: an int/float default must NOT accept true/false,
    # and a bool default must not accept 0/1
    if isinstance(default, bool) != isinstance(val, bool) or not isinstance(
        val, (type(default), int) if isinstance(default, float) else type(default)
    ):
        raise ValueError(
            f"{_ENV_PREFIX}{key}={raw!r} parsed to {type(val).__name__} "
            f"{val!r}; expected {type(default).__name__} "
            f"(default {default!r})"
        )
    return float(val) if isinstance(default, float) else val


class Settings:
    """Attribute-access settings with frontera-style layering."""

    def __init__(self, module: Any = None, attributes: dict | None = None):
        self._store: dict[str, Any] = dict(DEFAULT_SETTINGS)
        if module is not None:
            self.add_module(module)
        if attributes:
            self._store.update(attributes)
        for key, default in DEFAULT_SETTINGS.items():
            raw = os.environ.get(_ENV_PREFIX + key)
            if raw is not None:
                self._store[key] = _coerce(key, default, raw)

    @classmethod
    def from_params(cls, **kwargs: Any) -> "Settings":
        return cls(attributes={k.upper(): v for k, v in kwargs.items()})

    def add_module(self, module: Any) -> None:
        """Overlay a settings module/object/dotted-path/dict (UPPERCASE
        attributes only — same rule as frontera's Settings)."""
        if isinstance(module, dict):
            self._store.update(module)
            return
        if isinstance(module, str):
            module = importlib.import_module(module)
        for key in dir(module):
            if key.isupper():
                self._store[key] = getattr(module, key)

    def get(self, key: str, default: Any = None) -> Any:
        return self._store.get(key, default)

    def set(self, key: str, value: Any) -> None:
        self._store[key] = value

    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return self._store[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __contains__(self, key: str) -> bool:
        return key in self._store

    def to_dict(self) -> dict[str, Any]:
        return dict(self._store)


def loop_from_settings(spark, workdir: str, corpus_path: str, settings: Settings, **extra):
    """Build a CrawlLoop from a Settings object — the frontera
    ``Settings``-driven worker entry points, collapsed onto the one engine."""
    from frontera_spark.core.strategies import STRATEGIES, Strategy
    from frontera_spark.streaming.loop import CrawlLoop

    strat = settings.CRAWLING_STRATEGY
    strategy_obj = None
    if isinstance(strat, Strategy):
        strategy_obj, strat = strat, strat.name
    elif isinstance(strat, str) and strat not in STRATEGIES:
        strategy_obj = load_object(strat)
        if isinstance(strategy_obj, type):
            strategy_obj = strategy_obj()
        strat = strategy_obj.name
    return CrawlLoop(
        spark,
        workdir,
        corpus_path,
        corpus_seed=int(settings.CORPUS_SEED),
        strategy=strat,
        strategy_obj=strategy_obj,
        batch_size=int(settings.MAX_NEXT_REQUESTS),
        max_per_host=settings.BC_MAX_REQUESTS_PER_HOST,
        n_partitions=int(settings.SPIDER_FEED_PARTITIONS),
        mode=settings.SCHEDULE_MODE,
        check_invariant=bool(settings.CHECK_INVARIANT),
        robots_deny_hosts=frozenset(settings.ROBOTS_DENY_HOSTS or ()),
        max_depth=settings.MAX_DEPTH,
        batch_period=float(settings.BATCH_PERIOD),
        token_cap=float(settings.TOKEN_CAP),
        min_requests=settings.BC_MIN_REQUESTS,
        min_hosts=settings.BC_MIN_HOSTS,
        max_pending=settings.MAX_PENDING,
        middlewares=[load_object(m) for m in (settings.MIDDLEWARES or ())],
        canonical_solver=settings.CANONICAL_SOLVER,
        **extra,
    )


def engine_from_settings(spark, workdir: str, settings: Settings):
    """Build a FrontierEngine from a Settings object (frontera
    ``FrontierManager.from_settings`` parity)."""
    from frontera_spark.core.frontier import FrontierEngine
    from frontera_spark.core.strategies import STRATEGIES, Strategy

    strat = settings.CRAWLING_STRATEGY
    if isinstance(strat, str) and strat not in STRATEGIES:
        strat = load_object(strat)  # dotted path to a Strategy instance/class
        if isinstance(strat, type):
            strat = strat()
    if not isinstance(strat, (str, Strategy)):
        raise TypeError(f"CRAWLING_STRATEGY resolved to {type(strat)}")
    return FrontierEngine(
        spark,
        workdir,
        n_partitions=int(settings.SPIDER_FEED_PARTITIONS),
        strategy=strat,
        max_depth=settings.MAX_DEPTH,
        max_url_length=int(settings.MAX_URL_LENGTH),
        robots_deny_hosts=frozenset(settings.ROBOTS_DENY_HOSTS or ()),
        jid=int(settings.JID),
        use_seen_shards=bool(settings.USE_SEEN_SHARDS),
        shard_capacity=int(settings.SHARD_CAPACITY),
        host_salts=int(settings.HOST_SALTS),
        canonical_solver=settings.CANONICAL_SOLVER,
        middlewares=[load_object(m) for m in (settings.MIDDLEWARES or ())],
    )
