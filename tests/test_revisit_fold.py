"""Incremental revisit fold (core/revisit.py fold_fetch_slice +
state_schedule): the constant-per-tick formulation of the full-log policy.
Pinned bit-equal to ``fetchlog_schedule`` over randomized fetch logs under
every slicing of the same log, and end-to-end by running the same crawl in
``full`` and ``incremental`` revisit modes and comparing the complete fetch
logs (which capture the whole recrawl dynamics).
"""

import random

import pytest
from pyspark.sql import functions as F

from frontera_spark.core.revisit import (
    REVISIT_STATE_DDL,
    fetchlog_schedule,
    fold_fetch_slice,
    state_schedule,
)
from frontera_spark.streaming.loop import CrawlLoop

_SLICE_DDL = "fingerprint long, partition_id int, iteration long, sig long"
_STATE_COLS = [c.split()[0] for c in REVISIT_STATE_DDL.split(", ")]


def _random_log(seed: int, n_pages: int = 40, max_fetches: int = 8):
    """(fp, pid, it, sig) rows; per-page strictly increasing iterations,
    sigs from a small alphabet so changes/no-changes both occur, plus the
    policy's edge shapes (single fetch, all-same, change-on-last-fetch)."""
    rng = random.Random(seed)
    rows = []
    for p in range(n_pages):
        n = rng.randint(1, max_fetches)
        its = sorted(rng.sample(range(64), n))
        if p % 10 == 0:
            sigs = [7] * n  # never changes
        elif p % 10 == 1:
            sigs = [7] * (n - 1) + [8]  # change on the very last fetch
        else:
            sigs = [rng.randint(0, 2) for _ in range(n)]
        rows += [(p, p % 4, it, sig) for it, sig in zip(its, sigs)]
    return rows


def _fold_in_slices(spark, rows, n_slices: int):
    """Fold the log as ``n_slices`` consecutive iteration windows, emulating
    the state table's MERGE with a dict (folded rows replace, untouched
    pages persist)."""
    hi = max(r[2] for r in rows) + 1
    bounds = [round(i * hi / n_slices) for i in range(n_slices + 1)]
    state: dict = {}
    for lo, up in zip(bounds, bounds[1:]):
        sl = [r for r in rows if lo <= r[2] < up]
        if not sl:
            continue
        sl_df = spark.createDataFrame(sl, _SLICE_DDL)
        st_df = (
            spark.createDataFrame(list(state.values()), REVISIT_STATE_DDL)
            if state
            else None
        )
        for r in fold_fetch_slice(st_df, sl_df).collect():
            state[r.fingerprint] = tuple(r[c] for c in _STATE_COLS)
    return spark.createDataFrame(list(state.values()), REVISIT_STATE_DDL)


@pytest.mark.parametrize("seed", [3, 17])
@pytest.mark.parametrize("n_slices", [1, 2, 5])
@pytest.mark.parametrize("base", [None, 4])
def test_fold_matches_full_log_policy(spark, seed, n_slices, base):
    rows = _random_log(seed)
    log = spark.createDataFrame(rows, _SLICE_DDL)
    want = sorted(
        tuple(r)
        for r in fetchlog_schedule(
            log, base_interval_s=base, it_col="iteration"
        ).collect()
    )
    folded = _fold_in_slices(spark, rows, n_slices)
    got = sorted(
        tuple(r) for r in state_schedule(folded, base_interval_s=base).collect()
    )
    assert got == want


def test_fold_boundary_change_between_slices(spark):
    """A change whose two sigs land in DIFFERENT slices must still count:
    the boundary lag comes from the state's last_sig."""
    rows = [(1, 0, 0, 10), (1, 0, 5, 20), (1, 0, 9, 30)]
    log = spark.createDataFrame(rows, _SLICE_DDL)
    want = sorted(
        tuple(r)
        for r in fetchlog_schedule(log, base_interval_s=2, it_col="iteration").collect()
    )
    # slice per single fetch: every change crosses a fold boundary
    folded = _fold_in_slices(spark, rows, 10)
    got = sorted(
        tuple(r) for r in state_schedule(folded, base_interval_s=2).collect()
    )
    assert got == want
    st = folded.collect()[0]
    assert (st.n_changes, st.first_chg_it, st.last_chg_it, st.tail) == (2, 5, 9, 0)


def _run(spark, tmp_path, tag, mode, corpus, seed, n_images):
    from frontera_spark.sources.corpus import url_of

    loop = CrawlLoop(
        spark,
        str(tmp_path / tag),
        corpus,
        corpus_seed=seed,
        strategy="bfs",
        batch_size=n_images,
        n_partitions=2,
        mode="global",
        revisit={"every": 2, "bootstrap_after": 2, "mode": mode},
        dynamic_hosts={"h000.example.test": 1},
    )
    loop.add_seeds([url_of(0, 3)])
    hist = loop.run(max_iterations=14)
    assert sum(m.get("invariant_violations", 0) for m in hist) == 0
    log = (
        spark.read.option("basePath", loop.fetchlog_dir)
        .parquet(loop.fetchlog_dir + "/iter=*")
        .select("fingerprint", "iteration", "sig")
    )
    return sorted(tuple(r) for r in log.collect())


def test_incremental_loop_equals_full_recompute(spark, tmp_path):
    """Same crawl, same change model, both revisit modes: the complete fetch
    logs must be identical — every re-queue decision at every tick agreed."""
    from frontera_spark.sources.corpus import write_corpus

    corpus = str(tmp_path / "corpus")
    n_images, seed = 12, 11
    write_corpus(spark, corpus, n_images, 3, seed)
    full = _run(spark, tmp_path, "full", "full", corpus, seed, n_images)
    inc = _run(spark, tmp_path, "inc", "incremental", corpus, seed, n_images)
    assert inc == full and len(full) > n_images  # revisits actually happened


def test_incremental_fold_high_water_on_resume(spark, tmp_path):
    """A second CrawlLoop over the same workdir resumes the fold from the
    committed high-water iteration instead of re-folding history."""
    from frontera_spark.sources.corpus import url_of, write_corpus

    corpus = str(tmp_path / "corpus")
    write_corpus(spark, corpus, 8, 2, 5)
    kw = dict(
        corpus_seed=5, strategy="bfs", batch_size=8, n_partitions=2,
        mode="global", revisit={"every": 1, "bootstrap_after": 2},
    )
    loop = CrawlLoop(spark, str(tmp_path / "loop"), corpus, **kw)
    loop.add_seeds([url_of(0, 2)])
    loop.run(max_iterations=5)
    hw1 = int(
        loop._revisit_state_table().manifest()["meta"]["folded_iter"]
    )
    resumed = CrawlLoop(spark, str(tmp_path / "loop"), corpus, **kw)
    resumed.run(max_iterations=3)
    tbl = resumed._revisit_state_table()
    assert int(tbl.manifest()["meta"]["folded_iter"]) > hw1
    # folded state equals a from-scratch fold of the on-disk log up to the
    # committed high-water mark (iterations after the last tick are folded
    # by the NEXT tick, by design)
    hw2 = int(tbl.manifest()["meta"]["folded_iter"])
    log = (
        spark.read.option("basePath", resumed.fetchlog_dir)
        .parquet(resumed.fetchlog_dir + "/iter=*")
        .filter(F.col("iteration") <= hw2)
    )
    scratch = fold_fetch_slice(
        None, log.select("fingerprint", "partition_id", "iteration", "sig")
    )
    got = sorted(tuple(r[c] for c in _STATE_COLS) for r in tbl.read(with_marks=False).collect())
    want = sorted(tuple(r[c] for c in _STATE_COLS) for r in scratch.collect())
    assert got == want
