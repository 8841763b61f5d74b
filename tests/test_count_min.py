"""Mergeable-sketch operator laws (operators/profiling.py): count-min
(x120) and KMV bottom-k distinct (x122), plus the waterfill allocator
(x121)."""

import pytest
from pyspark.sql import functions as F

from airflow_project_flight_price_analysis_spark.operators.profiling import (
    _KMV_DOMAIN,
    cms_buckets,
    count_min_estimates,
    count_min_sketch_table,
    kmv_estimate,
    kmv_hash,
    kmv_sketch_table,
)


def test_cms_never_underestimates_and_is_exact_sans_collisions(spark):
    """For every key in the data: est >= exact (deterministic CMS law).
    With width >> keys and no collisions, est == exact."""
    rows = [(k,) for k in [1, 1, 1, 2, 2, 3] * 10]
    df = spark.createDataFrame(rows, "k long")
    sketch = count_min_sketch_table(df, "k", depth=4, width=512)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    got = {r.k: r for r in
           count_min_estimates(exact, sketch, "k", 4, 512).collect()}
    for k, exp in [(1, 30), (2, 20), (3, 10)]:
        assert got[k].cms_est >= exp
    # 3 keys x 4 rows into 512 buckets: verify whether any collision
    # actually happened; if none, estimates are exact
    n_counters = sketch.count()
    if n_counters == 12:
        assert {k: r.cms_est for k, r in got.items()} == {1: 30, 2: 20, 3: 10}


def test_cms_unseen_key_estimates_zero_absent_collisions(spark):
    """A key never inserted estimates 0 unless every one of its d
    buckets collides with inserted keys (left-join coalesce path)."""
    df = spark.createDataFrame([(1,), (2,)], "k long")
    sketch = count_min_sketch_table(df, "k", depth=4, width=4096)
    probe = spark.createDataFrame([(999_999,)], "k long")
    est = count_min_estimates(probe, sketch, "k", 4, 4096).collect()[0]
    # md5 buckets are deterministic: with 2 keys in 4096 buckets the
    # probe's 4 buckets are empty (verified once, stable forever)
    assert est.cms_est == 0


def test_cms_counter_table_is_bounded_and_mergeable(spark):
    """<= depth*width counters regardless of input size; counter-wise
    union-sum of two shard sketches equals the whole-corpus sketch."""
    df = spark.range(0, 2000).select(
        (F.col("id") % 50).alias("k"))
    depth, width = 3, 16
    whole = count_min_sketch_table(df, "k", depth, width)
    assert whole.count() <= depth * width
    a = count_min_sketch_table(df.filter("id % 2 = 0"), "k", depth, width)
    b = count_min_sketch_table(df.filter("id % 2 = 1"), "k", depth, width)
    merged = (a.unionAll(b).groupBy("i", "b")
              .agg(F.sum("cnt").alias("cnt")))
    lhs = {(r.i, r.b): r.cnt for r in merged.collect()}
    rhs = {(r.i, r.b): r.cnt for r in whole.collect()}
    assert lhs == rhs


def test_cms_bucket_range_lanes_and_param_validation(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    bs = cms_buckets(F.col("k"), 6, 7)  # 4 digest lanes + 2 seeded
    got = df.select(*[b.alias(f"b{i}") for i, b in enumerate(bs)]).collect()
    for r in got:
        assert all(0 <= r[f"b{i}"] < 7 for i in range(6))
    # lanes are not all identical for some key (independence smoke)
    assert any(len({r[f"b{i}"] for i in range(6)}) > 1 for r in got)
    with pytest.raises(ValueError, match="depth/width"):
        count_min_sketch_table(df, "k", depth=0)


# --------------------------------------------------------------------------
# waterfill_allocate (operators/sampling.py, x121)
# --------------------------------------------------------------------------

def _waterfill_reference(caps, budget):
    """Brute-force reference: binary-search the real-valued fill level,
    then floor the common level the closed form uses."""
    n = len(caps)
    order = sorted(range(n), key=lambda i: (caps[i], i))
    prefix = 0
    k = 0
    for pos, i in enumerate(order, start=1):
        if caps[i] * (n - pos + 1) + prefix <= budget:
            k = pos
            prefix += caps[i]
        else:
            break
    level = (budget - prefix) // (n - k) if k < n else 0
    out = {}
    for pos, i in enumerate(order, start=1):
        out[i] = caps[i] if pos <= k else level
    return out, k


def test_waterfill_matches_reference_and_laws(spark):
    """Random capacity sets x budgets: allocation equals the reference
    closed form; sum(allocated) <= budget; leftover is the bounded
    floor residue; saturated groups keep exactly their capacity."""
    import random

    from airflow_project_flight_price_analysis_spark.operators.sampling import (
        waterfill_allocate,
    )

    rng = random.Random(12)
    for trial in range(6):
        n = rng.randint(1, 9)
        caps = [rng.randint(0, 1000) for _ in range(n)]
        num, den = rng.choice([(1, 2), (3, 5), (4, 5), (9, 10), (1, 1)])
        total = sum(caps)
        budget = total * num // den
        df = spark.createDataFrame(
            [(f"g{i}", c) for i, c in enumerate(caps)],
            "grp string, capacity long")
        got = {r.grp: r for r in waterfill_allocate(
            df, "grp", "capacity", num, den).collect()}
        ref, k = _waterfill_reference(caps, budget)
        for i, c in enumerate(caps):
            r = got[f"g{i}"]
            assert r.allocated == ref[i], (trial, caps, budget, i)
            assert r.allocated <= c
            if r.saturated:
                assert r.allocated == c
        total_alloc = sum(r.allocated for r in got.values())
        assert total_alloc <= budget
        assert got["g0"].leftover == budget - total_alloc
        if k < n:
            assert budget - total_alloc < n - k  # floor residue bound


def test_waterfill_saturation_monotonicity(spark):
    """The saturated set is ALWAYS a prefix of the capacity-ascending
    order (the closed form's correctness hinges on this)."""
    import random

    from airflow_project_flight_price_analysis_spark.operators.sampling import (
        waterfill_allocate,
    )

    rng = random.Random(99)
    for _ in range(4):
        caps = [rng.randint(1, 500) for _ in range(rng.randint(2, 12))]
        df = spark.createDataFrame(
            [(f"g{i}", c) for i, c in enumerate(caps)],
            "grp string, capacity long")
        rows = waterfill_allocate(df, "grp", "capacity", 4, 5).collect()
        by_cap = sorted(rows, key=lambda r: (r.capacity, r.grp))
        flags = [r.saturated for r in by_cap]
        assert flags == sorted(flags, reverse=True), flags  # prefix-true


def test_waterfill_param_validation(spark):
    import pytest

    from airflow_project_flight_price_analysis_spark.operators.sampling import (
        waterfill_allocate,
    )

    df = spark.createDataFrame([("a", 1)], "grp string, capacity long")
    with pytest.raises(ValueError, match="budget"):
        waterfill_allocate(df, "grp", "capacity", -1, 2)
    with pytest.raises(ValueError, match="budget"):
        waterfill_allocate(df, "grp", "capacity", 1, 0)


def test_waterfill_all_saturate_guards_divisor(spark):
    """budget >= total capacity ⇒ EVERY group saturates (k == n) and
    the common-level branch's divisor (n − k) is zero. The expression
    must guard that branch explicitly (ADVICE r12 — mirroring the
    oracle's `WHEN n > k ... ELSE 0`), not lean on CaseWhen
    short-circuiting: every group keeps its capacity, leftover is the
    full surplus."""
    from airflow_project_flight_price_analysis_spark.operators.sampling import (
        waterfill_allocate,
    )

    df = spark.createDataFrame(
        [("a", 10), ("b", 250), ("c", 0)], "grp string, capacity long")
    # num/den = 3/2 ⇒ budget = 390 > total = 260
    rows = {r.grp: r for r in waterfill_allocate(
        df, "grp", "capacity", 3, 2).collect()}
    assert all(r.saturated for r in rows.values())
    assert {g: r.allocated for g, r in rows.items()} == \
        {"a": 10, "b": 250, "c": 0}
    assert rows["a"].leftover == 390 - 260


def test_parquet_num_rows_returns_none_on_unreadable(tmp_path):
    """x83's broadcast gate reads parquet footers driver-side; on any
    non-local or unreadable path it must report 'unknown' (None) so the
    face falls back to the shuffled equi-join instead of raising at
    plan-build time (ADVICE r12)."""
    from airflow_project_flight_price_analysis_spark.plans.insights import (
        _parquet_num_rows,
    )

    assert _parquet_num_rows("/nonexistent/supplier.parquet") is None
    assert _parquet_num_rows(str(tmp_path)) is None  # empty dir
    junk = tmp_path / "supplier.parquet"
    junk.write_bytes(b"not parquet at all")
    assert _parquet_num_rows(str(junk)) is None
    real = "/root/testdata/sf0.001/supplier.parquet"
    n = _parquet_num_rows(real)
    assert isinstance(n, int) and n > 0


# --- KMV bottom-k distinct sketch (x122) ------------------------------------

def _brute_kmv(spark, keys, k):
    """Reference bottom-k: hash every distinct key driver-side."""
    import hashlib

    hs = sorted({int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
                 for key in keys})
    return hs[:k]


def test_kmv_sketch_is_exact_bottom_k(spark):
    keys = [f"doc-{i}" for i in range(500)] * 3  # duplicates must not count
    df = spark.createDataFrame([(x,) for x in keys], "key string")
    got = [r.h for r in kmv_sketch_table(df, "key", 32).collect()]
    assert sorted(got) == _brute_kmv(spark, keys, 32)


def test_kmv_prefilter_is_lossless_when_k_survive(spark):
    """Any threshold leaving >= k survivors yields EXACTLY the
    unfiltered sketch — the self-certifying property the x122 face's
    scale path rides."""
    df = spark.createDataFrame([(i,) for i in range(2000)], "key long")
    base = [r.h for r in kmv_sketch_table(df, "key", 64).collect()]
    filt = [r.h for r in
            kmv_sketch_table(df, "key", 64, prefilter_denom=8).collect()]
    assert sorted(filt) == sorted(base)
    # estimates identical too
    e0 = kmv_estimate(kmv_sketch_table(df, "key", 64), 64).collect()[0]
    e1 = kmv_estimate(
        kmv_sketch_table(df, "key", 64, prefilter_denom=8), 64).collect()[0]
    assert (e0.n_sketch, e0.kth_min, e0.kmv_est) == \
        (e1.n_sketch, e1.kth_min, e1.kmv_est)


def test_kmv_too_tight_prefilter_shrinks_and_falls_back(spark):
    """A threshold leaving < k survivors can only SHRINK the sketch
    (never corrupt it): the rows that survive are still true bottom-k
    members, n_sketch < k, and the estimate falls back to the exact
    survivor count instead of extrapolating from a wrong kth min."""
    df = spark.createDataFrame([(i,) for i in range(40)], "key long")
    # denom so large that only a handful of the 40 hashes survive
    sk = kmv_sketch_table(df, "key", 32, prefilter_denom=8)
    rows = sk.collect()
    assert 0 < len(rows) < 32
    base = _brute_kmv(spark, [i for i in range(40)], 32)
    assert sorted(r.h for r in rows) == base[:len(rows)]
    est = kmv_estimate(sk, 32).collect()[0]
    assert est.n_sketch == len(rows)
    assert est.kmv_est == len(rows)  # fallback, not extrapolation


def test_kmv_merge_law(spark):
    """bottom-k(union of member sketches) == sketch of the whole
    corpus, for an arbitrary 3-way split — the distinct-count merge
    algebra, value-exact."""
    import random

    rng = random.Random(7)
    keys = [f"k{i}" for i in range(900)]
    parts = [[], [], []]
    for key in keys:
        parts[rng.randrange(3)].append(key)
    k = 48
    whole = kmv_sketch_table(
        spark.createDataFrame([(x,) for x in keys], "key string"), "key", k)
    members = [
        kmv_sketch_table(
            spark.createDataFrame([(x,) for x in p], "key string"), "key", k)
        for p in parts if p
    ]
    merged = members[0]
    for m in members[1:]:
        merged = merged.unionAll(m)
    merged = merged.distinct().orderBy("h").limit(k)
    assert [r.h for r in merged.collect()] == [r.h for r in whole.collect()]


def test_kmv_estimate_formula_and_validation(spark):
    df = spark.createDataFrame([(i,) for i in range(3000)], "key long")
    k = 128
    sk = kmv_sketch_table(df, "key", k)
    hs = sorted(r.h for r in sk.collect())
    est = kmv_estimate(sk, k).collect()[0]
    assert est.kth_min == hs[-1]
    import math
    assert est.kmv_est == math.floor((k - 1) * float(_KMV_DOMAIN) / hs[-1])
    # ballpark sanity only (this fixed key set happens to draw ~3.5σ,
    # 31% — the formula lines above are the real pin; the x122 face's
    # envelope law checks a 3σ bound on its own corpus)
    assert abs(est.kmv_est - 3000) / 3000 < 0.4
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch_table(df, "key", 1)
    with pytest.raises(ValueError, match="prefilter_denom"):
        kmv_sketch_table(df, "key", 8, prefilter_denom=0)


def test_kmv_null_key_occupies_one_slot(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "key string")
    got = sorted(r.h for r in kmv_sketch_table(df, "key", 16).collect())
    assert len(got) == 3  # a, b, and the single NULL slot
    import hashlib
    assert int(hashlib.md5(b"").hexdigest()[:15], 16) in got


# --- hash bottom-k row sampling (x123) ---------------------------------------

def test_hash_bottomk_sample_is_exact_and_prefilter_lossless(spark):
    import hashlib

    from airflow_project_flight_price_analysis_spark.operators.sampling import (
        hash_bottomk_sample,
    )

    rows = [(i, j, float(i * 10 + j)) for i in range(200) for j in (1, 2)]
    df = spark.createDataFrame(rows, "a long, b long, v double")

    def brute(k):
        hs = sorted(
            (int(hashlib.md5(f"{a}:{b}".encode()).hexdigest()[:15], 16), v)
            for a, b, v in rows)
        return hs[:k]

    got = sorted((r["__sample_h"], r.v)
                 for r in hash_bottomk_sample(df, ["a", "b"], 37).collect())
    assert got == brute(37)
    # prefilter leaving >= k survivors yields the identical sample
    filt = sorted((r["__sample_h"], r.v) for r in hash_bottomk_sample(
        df, ["a", "b"], 37, prefilter_denom=4).collect())
    assert filt == got
    # too-tight prefilter only SHRINKS the sample, never corrupts it
    tight = sorted((r["__sample_h"], r.v) for r in hash_bottomk_sample(
        df, ["a", "b"], 37, prefilter_denom=64).collect())
    assert tight == brute(400)[:len(tight)]
    assert 0 < len(tight) < 37

    with pytest.raises(ValueError, match="k must be"):
        hash_bottomk_sample(df, ["a"], 0)
    with pytest.raises(ValueError, match="prefilter_denom"):
        hash_bottomk_sample(df, ["a"], 5, prefilter_denom=0)


# --- weighted systematic sampling (x125) -------------------------------------

def _ws_reference(rows, n_picks):
    """Brute-force reference: hash order, cumulative axis, targets
    t_j = j*step."""
    import hashlib

    hashed = sorted(
        (int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16), key, w)
        for key, w in rows)
    total = sum(w for _, _, w in hashed)
    step = total // n_picks
    out, c = {}, 0
    targets = [j * step for j in range(n_picks)]
    for _, key, w in hashed:
        m = sum(1 for t in targets if c <= t < c + w)
        if m:
            out[key] = m
        c += w
    return out, total, step


def test_weighted_systematic_sample_matches_reference(spark):
    import random

    from airflow_project_flight_price_analysis_spark.operators.sampling import (
        weighted_systematic_sample,
    )

    rng = random.Random(5)
    for trial in range(3):
        rows = [(f"d{i}", rng.randint(0, 40)) for i in range(300)]
        # one heavy row so the multi-win branch (multiplicity > 1) runs
        rows.append(("whale", 5000))
        df = spark.createDataFrame(rows, "key string, w long")
        got = {r.key: r for r in weighted_systematic_sample(
            df, "key", "w", 32).collect()}
        ref, total, step = _ws_reference(rows, 32)
        assert {k: r.multiplicity for k, r in got.items()} == ref, trial
        assert got["whale"].multiplicity > 1  # the heavy row multi-wins
        assert sum(r.multiplicity for r in got.values()) == 32
        for k, r in got.items():
            w = dict(rows)[k]
            assert w // step <= r.multiplicity <= w // step + 1
        assert all(r.total_w == total and r.step == step
                   for r in got.values())


def test_weighted_systematic_sample_band_invariance_and_guards(spark):
    import pytest

    from airflow_project_flight_price_analysis_spark.operators.sampling import (
        weighted_systematic_sample,
    )

    rows = [(f"k{i}", (i * 7) % 23) for i in range(200)]
    df = spark.createDataFrame(rows, "key string, w long")
    base = {r.key: r.multiplicity for r in weighted_systematic_sample(
        df, "key", "w", 16, n_bands=8).collect()}
    for nb in (1, 3, 64):
        got = {r.key: r.multiplicity for r in weighted_systematic_sample(
            df, "key", "w", 16, n_bands=nb).collect()}
        assert got == base, nb  # the band split is an execution detail
    # zero-weight rows are never selected
    zdf = spark.createDataFrame(
        [("z", 0), ("a", 10), ("b", 10)], "key string, w long")
    got = {r.key for r in weighted_systematic_sample(
        zdf, "key", "w", 4).collect()}
    assert "z" not in got
    with pytest.raises(ValueError, match="n_picks"):
        weighted_systematic_sample(df, "key", "w", 0)
    with pytest.raises(ValueError, match="n_bands"):
        weighted_systematic_sample(df, "key", "w", 4, n_bands=0)
    # total weight < n_picks -> step would be 0 -> in-plan raise
    tiny = spark.createDataFrame([("a", 1), ("b", 1)], "key string, w long")
    with pytest.raises(Exception, match="total weight < n_picks"):
        weighted_systematic_sample(tiny, "key", "w", 8).collect()


# --- per-group KMV (x126) ----------------------------------------------------

def test_kmv_by_group_matches_brute_force_and_merges(spark):
    import hashlib

    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        kmv_group_estimates,
        kmv_sketch_by_group,
    )

    rows = [(f"g{i % 3}", f"u{j}") for i in range(3) for j in range(50 * (i % 3 + 1))]
    df = spark.createDataFrame(rows, "g string, k string")
    k = 16
    got = {}
    for r in kmv_sketch_by_group(df, "g", "k", k).collect():
        got.setdefault(r.g, []).append(r.h)

    def brute(keys):
        return sorted({int(hashlib.md5(x.encode()).hexdigest()[:15], 16)
                       for x in keys})[:k]

    by_g = {}
    for g, key in rows:
        by_g.setdefault(g, set()).add(key)
    for g, keys in by_g.items():
        assert sorted(got[g]) == brute(keys), g
    # estimates: fallback for small groups, formula otherwise
    import math

    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        _KMV_DOMAIN,
    )
    ests = {r.g: r for r in kmv_group_estimates(
        kmv_sketch_by_group(df, "g", "k", k), k).collect()}
    for g, keys in by_g.items():
        e = ests[g]
        if len(keys) < k:
            assert e.n_sketch == len(keys) and e.kmv_est == len(keys)
        else:
            assert e.n_sketch == k
            assert e.kmv_est == math.floor(
                (k - 1) * float(_KMV_DOMAIN) / brute(keys)[-1])
    # per-group merge law: union of half-sketches re-bottom-k'd == whole
    from pyspark.sql import functions as F
    h1 = kmv_sketch_by_group(df.filter(F.length("k") % 2 == 0), "g", "k", k)
    h2 = kmv_sketch_by_group(df.filter(F.length("k") % 2 == 1), "g", "k", k)
    from pyspark.sql.window import Window as W
    merged = (h1.unionAll(h2).distinct()
              .withColumn("__rk", F.row_number().over(
                  W.partitionBy("g").orderBy("h")))
              .filter(F.col("__rk") <= k).select("g", "h"))
    lhs = {(r.g, r.h) for r in merged.collect()}
    rhs = {(r.g, r.h) for r in kmv_sketch_by_group(df, "g", "k", k).collect()}
    assert lhs == rhs
    import pytest
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch_by_group(df, "g", "k", 1)


# --- kmv_set_algebra (x129) --------------------------------------------------

def test_kmv_set_algebra_exact_when_unsaturated(spark):
    """Both sets below k: the union sketch carries every hash, so all
    three outputs are exact, not estimates."""
    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        kmv_set_algebra,
    )

    a = spark.createDataFrame([(i,) for i in range(30)], "k long")
    b = spark.createDataFrame([(i,) for i in range(20, 50)], "k long")
    k = 128
    row = kmv_set_algebra(
        kmv_sketch_table(a, "k", k), kmv_sketch_table(b, "k", k), k
    ).collect()[0]
    assert row.n_sketch_a == 30 and row.n_sketch_b == 30
    assert row.n_union_sketch == 50
    assert row.union_est == 50
    assert row.n_inter_sketch == 10 and row.inter_est == 10
    assert row.jaccard_bp_est == 10 * 10000 // 50


def test_kmv_set_algebra_disjoint_sets(spark):
    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        kmv_set_algebra,
    )

    a = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(10000, 12000)], "k long")
    k = 128
    row = kmv_set_algebra(
        kmv_sketch_table(a, "k", k), kmv_sketch_table(b, "k", k), k
    ).collect()[0]
    assert row.n_inter_sketch == 0
    assert row.inter_est == 0 and row.jaccard_bp_est == 0


def test_kmv_set_algebra_saturated_matches_brute_force(spark):
    """Saturated path: the union sketch must equal the brute-force
    bottom-k of A ∪ B's hash set, and the estimates must land inside a
    wide deterministic envelope of the true cardinalities."""
    import hashlib

    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        kmv_set_algebra,
    )

    k = 128
    a_keys = list(range(5000))
    b_keys = list(range(2500, 7500))
    a = spark.createDataFrame([(i,) for i in a_keys], "k long")
    b = spark.createDataFrame([(i,) for i in b_keys], "k long")
    row = kmv_set_algebra(
        kmv_sketch_table(a, "k", k), kmv_sketch_table(b, "k", k), k
    ).collect()[0]

    def h(key: int) -> int:
        return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)

    union_hashes = sorted(h(x) for x in set(a_keys) | set(b_keys))
    assert row.n_union_sketch == k
    assert row.kth_min == union_hashes[k - 1]
    bottom = set(union_hashes[:k])
    ha, hb = {h(x) for x in a_keys}, {h(x) for x in b_keys}
    assert row.n_inter_sketch == len(bottom & ha & hb)
    # deterministic data: estimates are fixed; 4-sigma-ish envelopes
    assert abs(row.union_est - 7500) <= 7500 * 4 / (k - 2) ** 0.5
    assert abs(row.inter_est - 2500) <= 2500 * 0.5
    assert row.n_sketch_a == k and row.n_sketch_b == k


def test_kmv_set_algebra_validates_k(spark):
    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        kmv_set_algebra,
    )

    df = spark.createDataFrame([(1,)], "k long")
    sk = kmv_sketch_table(df, "k", 2)
    with pytest.raises(ValueError, match="k must be"):
        kmv_set_algebra(sk, sk, 1)


# --- priority_sample (x130) --------------------------------------------------

def test_priority_sample_small_corpus_is_exact(spark):
    """<= k rows: no boundary, tau = 0, every row kept with its exact
    weight."""
    from airflow_project_flight_price_analysis_spark.operators.sampling import (
        priority_sample,
    )

    df = spark.createDataFrame(
        [(i, 10 * (i + 1)) for i in range(5)], "key long, w long")
    out = priority_sample(df, ["key"], "w", 8).collect()
    assert len(out) == 5
    assert all(not r.is_boundary and r.tau == 0.0 for r in out)
    assert sorted(r.w_est for r in out) == [10.0, 20.0, 30.0, 40.0, 50.0]


def test_priority_sample_matches_brute_force_selection(spark):
    """The engine's top-(k+1), boundary identity, and tau replay
    exactly against an independent python md5 computation."""
    import hashlib

    from airflow_project_flight_price_analysis_spark.operators.sampling import (
        priority_sample,
    )

    rows = [(i, (i * 37) % 100 + 1) for i in range(3000)]
    df = spark.createDataFrame(rows, "key long, w long")
    k = 64
    got = priority_sample(df, ["key"], "w", k).collect()
    assert len(got) == k + 1

    def pri(key: int, w: int) -> tuple:
        hv = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) + 1
        return (w / hv, hv)

    ordered = sorted(rows, key=lambda r: (-pri(*r)[0], pri(*r)[1]))
    want_top = ordered[: k + 1]
    assert sorted(r.key for r in got) == sorted(r[0] for r in want_top)
    b_key, b_w = want_top[-1]
    brow = [r for r in got if r.is_boundary]
    assert len(brow) == 1 and brow[0].key == b_key
    assert all(r.tau == pri(b_key, b_w)[0] * 2.0 ** 60 for r in got)


def test_priority_sample_subset_sum_estimate_in_envelope(spark):
    """DLT estimator: Sum of max(w, tau) over the k sampled rows lands
    within the Szegedy 3·W/sqrt(k-1) envelope of the true total, and
    an after-the-fact subset does too (deterministic data)."""
    from airflow_project_flight_price_analysis_spark.operators.sampling import (
        priority_sample,
    )

    rows = [(i, (i * 131) % 997 + 1, i % 3) for i in range(20000)]
    df = spark.createDataFrame(rows, "key long, w long, grp int")
    k = 256
    samp = priority_sample(df, ["key"], "w", k).filter("NOT is_boundary")
    est = {
        r.grp: r.e
        for r in samp.groupBy("grp").agg(F.sum("w_est").alias("e")).collect()
    }
    total_w = sum(r[1] for r in rows)
    env = 3.0 * total_w / (k - 1) ** 0.5
    for g in range(3):
        exact = sum(r[1] for r in rows if r[2] == g)
        assert abs(est.get(g, 0.0) - exact) <= env
    assert abs(sum(est.values()) - total_w) <= env


def test_priority_sample_validates_k(spark):
    from airflow_project_flight_price_analysis_spark.operators.sampling import (
        priority_sample,
    )

    df = spark.createDataFrame([(1, 1)], "key long, w long")
    with pytest.raises(ValueError, match="k must be"):
        priority_sample(df, ["key"], "w", 0)


def test_cms_inner_product_never_underestimates_join_size(spark):
    """AMS-on-CMS join-size law (x134): min over lanes of the sketch
    inner product >= the exact join size; equality when the sketch is
    collision-free."""
    r = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3, 7, 7]], "k long")
    s = spark.createDataFrame(
        [(k,) for k in [1, 2, 2, 2, 3, 9]], "k long")
    d, w = 4, 4096
    cr, cs = (count_min_sketch_table(x, "k", d, w) for x in (r, s))
    lanes = (cr.alias("r").join(cs.alias("c"), ["i", "b"])
             .groupBy("i").agg(F.sum(F.expr("r.cnt * c.cnt")).alias("ip")))
    est = lanes.agg(F.min("ip").alias("e")).collect()[0].e
    # exact: 3*1 + 2*3 + 1*1 = 10 (keys 7 and 9 join nothing)
    assert est >= 10
    if cr.count() == 16 and cs.count() == 16:  # collision-free lanes
        assert est == 10


def test_kmv_by_group_distinct_keys_fast_path(spark):
    """r14: `distinct_keys=True` skips the operator's own dedup exchange;
    on an already-distinct (g, key) frame the sketch must be identical
    to the default path — and on a frame WITH duplicates the default
    path still dedups (the flag is opt-in, not a behavior change)."""
    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        kmv_sketch_by_group,
    )

    rows = [(f"g{i % 2}", f"u{j}") for i in range(2) for j in range(40)]
    dedup = spark.createDataFrame(sorted(set(rows)), "g string, k string")
    k = 8
    fast = {(r.g, r.h)
            for r in kmv_sketch_by_group(
                dedup, "g", "k", k, distinct_keys=True).collect()}
    slow = {(r.g, r.h)
            for r in kmv_sketch_by_group(dedup, "g", "k", k).collect()}
    assert fast == slow
    # duplicates + default path: still the distinct-set sketch
    dup = spark.createDataFrame(rows + rows, "g string, k string")
    assert {(r.g, r.h)
            for r in kmv_sketch_by_group(dup, "g", "k", k).collect()} == slow
