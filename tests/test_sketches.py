"""Deterministic-sketch evidence beyond the driver's hash check.

The oracle parity test (test_oracle_parity.py) proves Spark == DuckDB;
these tests prove the sketches are also *correct as sketches*:
- an engine-independent pure-Python reference (hashlib.md5 + integer
  arithmetic) reproduces the HLL registers and estimate exactly, so a
  shared Spark/DuckDB bug can't hide behind the parity check;
- accuracy bounds vs exact answers (HLL within its m=256 error regime,
  CMS one-sided overestimate);
- conservation invariants (each CMS counter row sums to n_rows).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from backend_fastapi_spark.operators import sketches as SK
from tests.conftest import SF_SMOKE


def _py_hll(keys) -> tuple[int, int, int]:
    """Pure-Python deterministic HLL: (v_zero, reg_sum, est)."""
    regs: dict[int, int] = {}
    for k in keys:
        hv = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        bucket, w = hv >> SK.HLL_W_BITS, hv % SK.HLL_W_MOD
        rho = SK.HLL_RHO_MAX if w == 0 else SK.HLL_RHO_MAX - w.bit_length()
        if rho > regs.get(bucket, 0):
            regs[bucket] = rho
    v_zero = SK.HLL_M - len(regs)
    reg_sum = sum(1 << (SK.HLL_RHO_MAX - m) for m in regs.values()) + v_zero * (
        1 << SK.HLL_RHO_MAX
    )
    raw = SK.HLL_NUMER // reg_sum // 1_000_000
    if v_zero >= SK.HLL_M:
        est = 0
    elif v_zero > 0 and raw <= SK.HLL_LC_CUT:
        est = SK.HLL_LC_TABLE[v_zero - 1]
    else:
        est = raw
    return v_zero, reg_sum, est


def test_hll_matches_pure_python_reference(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    row = SK.hll_sketch(df, "o_orderkey", "o").collect()[0]
    keys = [r[0] for r in df.select("o_orderkey").collect()]
    v_zero, reg_sum, est = _py_hll(keys)
    assert (row["v_zero"], row["reg_sum"], row["hll_est"]) == (v_zero, reg_sum, est)
    assert row["n_rows"] == len(keys)


def test_hll_estimate_accuracy(spark):
    # m=256 -> ~6.5% std error; assert a generous 3-sigma-ish bound in
    # the raw-estimator regime (n >> 2.5m), which the chosen inputs are in.
    for table, col in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        df = spark.read.parquet(f"{SF_SMOKE}/{table}.parquet")
        exact = df.select(col).distinct().count()
        assert exact > int(2.5 * SK.HLL_M)
        est = SK.hll_sketch(df, col, "x").collect()[0]["hll_est"]
        assert abs(est - exact) / exact < 0.20, (table, col, est, exact)


def test_hll_linear_counting_regime(spark):
    # below ~2.5m the raw estimator is badly biased (confirmed +1780% at
    # n=10 before the fix); the precomputed m*ln(m/V) table must kick in
    # and track small cardinalities closely. Oracle parity at these
    # cardinalities is covered by the same-table Python reference below.
    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    for n in (10, 50, 100, 500):
        sub = df.filter(F.col("o_orderkey") < n)
        row = SK.hll_sketch(sub, "o_orderkey", "x").collect()[0]
        assert abs(row["hll_est"] - n) / n < 0.15, (n, row["hll_est"])
        # the pure-Python reference (with the same LC table) agrees
        keys = [r[0] for r in sub.select("o_orderkey").collect()]
        assert row["hll_est"] == _py_hll(keys)[2]


def test_bottomk_quantiles_empty_input_returns_no_rows(spark):
    # regression: element_at(arr, 1) on the empty collect_list used to
    # raise INVALID_ARRAY_INDEX_IN_ELEMENT_AT; the oracle returns 0 rows
    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
        F.col("o_orderkey") < 0
    )
    assert SK.bottomk_quantiles(df, "o_orderkey", "o_totalprice").collect() == []


def test_hll_insensitive_to_duplication_and_order(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select("o_orderkey")
    base = SK.hll_sketch(df, "o_orderkey", "x").collect()[0]
    doubled = SK.hll_sketch(
        df.unionAll(df.orderBy(F.col("o_orderkey").desc())), "o_orderkey", "x"
    ).collect()[0]
    assert (base["v_zero"], base["reg_sum"], base["hll_est"]) == (
        doubled["v_zero"],
        doubled["reg_sum"],
        doubled["hll_est"],
    )
    assert doubled["n_rows"] == 2 * base["n_rows"]


def test_cms_overestimates_and_conserves_mass(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_rows = ev.count()
    exact = {
        str(r["user_id"]): r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    top = SK.cms_topk(ev, "user_id", k=20).collect()
    assert len(top) == min(20, len(exact))
    for r in top:
        # CMS error is one-sided: est >= exact, always.
        assert r["est_count"] >= exact[r["key"]], r
        # ...and bounded: est - exact <= sum of colliding keys < n_rows.
        assert r["est_count"] <= n_rows
    # ranking is by estimate with a total tie-break
    ranks = [(-r["est_count"], r["key"]) for r in top]
    assert ranks == sorted(ranks)


def test_cms_counter_rows_each_conserve_total(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_rows = ev.count()
    rows = F.array(*[F.lit(i) for i in range(SK.CMS_D)])
    bucketed = ev.select(
        F.col("user_id").cast("string").alias("key"), F.explode(rows).alias("i")
    ).select(
        "i",
        (
            SK._h32(F.concat(F.col("key"), F.lit("#"), F.col("i").cast("string")))
            % F.lit(SK.CMS_W)
        ).alias("bucket"),
    )
    per_row = (
        bucketed.groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("i")
        .agg(F.sum("cnt").alias("total"))
        .collect()
    )
    assert len(per_row) == SK.CMS_D
    for r in per_row:
        assert r["total"] == n_rows


def test_bottomk_quantiles_rank_error_bounded(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    n = df.count()
    vals = sorted(r[0] for r in df.select("o_totalprice").collect())
    est = {
        r["q"]: r["est_value"]
        for r in SK.bottomk_quantiles(df, "o_orderkey", "o_totalprice").collect()
    }
    targets = {"p10": 0.10, "p25": 0.25, "p50": 0.50, "p75": 0.75, "p90": 0.90}
    import bisect

    for label, q in targets.items():
        # rank of the estimate in the TRUE distribution must sit within
        # ~4/sqrt(k) of q (k=1024 -> 12.5pp; typical error is ~1-3pp)
        rank = bisect.bisect_left(vals, est[label]) / n
        assert abs(rank - q) < 0.125, (label, est[label], rank, q)
    # every estimate is a raw input value, not an interpolation
    sv = set(vals)
    assert all(v in sv for v in est.values())


def test_bottomk_sample_is_mergeable(spark):
    # bottom-k of a union == bottom-k of (bottom-k(A) ∪ bottom-k(B)):
    # the defining property that lets partial sketches merge at scale.
    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    a = df.filter(F.col("o_orderkey") % 2 == 0)
    b = df.filter(F.col("o_orderkey") % 2 == 1)

    def bottom(d, k=64):
        return (
            d.select(
                F.col("o_orderkey").alias("k"),
                F.md5(F.col("o_orderkey").cast("string")).alias("h"),
            )
            .orderBy("h", "k")
            .limit(k)
        )

    full = [r["k"] for r in bottom(df).collect()]
    merged = [
        r["k"]
        for r in bottom(a, 64)
        .unionAll(bottom(b, 64))
        .orderBy("h", "k")
        .limit(64)
        .collect()
    ]
    assert full == merged


@pytest.mark.parametrize("w,expect_rho", [(0, 25), (1, 24), (2, 23), (3, 23)])
def test_rho_bitlength_identity(w, expect_rho):
    # rho = 25 - bitlength(w) (w > 0), matching both engines' length(bin()).
    rho = SK.HLL_RHO_MAX if w == 0 else SK.HLL_RHO_MAX - w.bit_length()
    assert rho == expect_rho


def test_kmv_jaccard_estimate_accuracy(spark):
    """KMV estimate vs exact Jaccard on constructed overlaps: three
    groups sharing known fractions of a 600-key universe. k=64 gives
    std ~ sqrt(J(1-J)/64) <= 0.063; assert within 3 sigma (~0.19) and
    that ordering of clearly-separated overlaps is preserved."""
    rows = []
    # A = 0..399, B = 200..599 (J = 200/600 = 1/3), C = 0..99 disjoint
    # from B except nothing (C subset of A: J(A,C) = 100/400 = 0.25,
    # J(B,C) = 0).
    for i in range(400):
        rows.append(("A", i))
    for i in range(200, 600):
        rows.append(("B", i))
    for i in range(100):
        rows.append(("C", i))
    df = spark.createDataFrame(rows, ["g", "k"])
    got = {(r.group_a, r.group_b): r for r in
           SK.kmv_jaccard(df, "g", "k").collect()}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    exact = {("A", "B"): 200 / 600, ("A", "C"): 100 / 400, ("B", "C"): 0.0}
    for pair, j in exact.items():
        est = got[pair].est_jaccard
        assert abs(est - j) <= 0.19, (pair, est, j)
        assert got[pair].n_common == round(est * SK.KMV_K)
    # disjoint sets estimate exactly zero (no common member can enter)
    assert got[("B", "C")].est_jaccard == 0.0


# --- Bloom filter ------------------------------------------------------


def _py_bloom_positions(key, m_bits):
    out = []
    for i in range(SK.BLOOM_J):
        hv = int(hashlib.md5(f"{key}#{i}".encode()).hexdigest()[:8], 16)
        pos = hv % m_bits
        out.append((pos // SK.BLOOM_WORD_BITS, 1 << (pos % SK.BLOOM_WORD_BITS)))
    return out


def test_bloom_build_matches_pure_python_reference(spark):
    df = spark.createDataFrame([(k,) for k in range(50)], ["k"])
    words = SK._bloom_words(50)
    got = {r.word_idx: r.bits for r in SK.bloom_build(df, "k", words).collect()}
    want: dict[int, int] = {}
    for k in range(50):
        for w, mask in _py_bloom_positions(k, words * SK.BLOOM_WORD_BITS):
            want[w] = want.get(w, 0) | mask
    assert got == want


def test_bloom_no_false_negatives_and_fpr_bounded(spark):
    members = spark.createDataFrame([(k,) for k in range(500)], ["k"])
    probes = spark.createDataFrame([(k,) for k in range(5000)], ["k"])
    row = SK.bloom_prejoin_stats(members, "k", probes, "k", "t").collect()[0]
    assert row.n_members == 500
    assert row.n_probe_keys == 5000
    # structural: every member's bits were set by the build, so the
    # exact-member count must be fully contained in the pass set.
    assert row.n_true == 500
    assert row.n_pass >= row.n_true
    assert row.n_false_pos == row.n_pass - row.n_true
    # sizing targets fill ~1/3 -> fpr ~2.3%; assert a loose 10% bound.
    assert row.n_false_pos <= 0.10 * (row.n_probe_keys - row.n_true)


def test_bloom_is_mergeable(spark):
    """bit_or of two builds over disjoint halves == build of the union
    (the mergeable-summary property, same as HLL max-merge)."""
    words = SK._bloom_words(100)
    a = spark.createDataFrame([(k,) for k in range(50)], ["k"])
    b = spark.createDataFrame([(k,) for k in range(50, 100)], ["k"])
    u = a.unionByName(b)
    merged = (
        SK.bloom_build(a, "k", words)
        .unionByName(SK.bloom_build(b, "k", words))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    got = {r.word_idx: r.bits for r in merged.collect()}
    want = {r.word_idx: r.bits for r in SK.bloom_build(u, "k", words).collect()}
    assert got == want


def test_bloom_sizing_pow2_and_monotone():
    sizes = [SK._bloom_words(n) for n in (0, 1, 10, 100, 1000, 10000)]
    assert all(s & (s - 1) == 0 for s in sizes)  # powers of two
    assert sizes == sorted(sizes)
    assert sizes[0] == SK.BLOOM_MIN_WORDS
    # >= 3 bits per probe (fill <= 1/3) for every nontrivial size
    for n, s in zip((100, 1000, 10000), sizes[3:]):
        assert s * SK.BLOOM_WORD_BITS >= 3 * SK.BLOOM_J * n


def test_bloom_sizing_sql_parity():
    """The oracle recomputes _bloom_words in SQL (length(bin(tw-1))
    bit-length idiom); pin the two implementations together across the
    boundary values so they can never drift."""
    import duckdb

    ns = [0, 1, 2, 5, 20, 21, 22, 100, 302, 336, 337, 1000, 3000,
          10**5, 10**6]
    expr = f"""
      SELECT GREATEST({SK.BLOOM_MIN_WORDS},
        CASE WHEN tw <= 1 THEN 1
             ELSE CAST(1 AS BIGINT) << length(bin(tw - 1)) END)
      FROM (SELECT (3 * {SK.BLOOM_J} * GREATEST(?, 1)
                    + {SK.BLOOM_WORD_BITS} - 1) // {SK.BLOOM_WORD_BITS} AS tw)
    """
    con = duckdb.connect()
    for n in ns:
        got = con.execute(expr, [n]).fetchone()[0]
        assert got == SK._bloom_words(n), (n, got, SK._bloom_words(n))


def test_bloom_empty_member_set(spark):
    """Zero members: min-size filter, zero bits set (NULL sum in both
    engines — the oracle's SUM over an empty filter is NULL too), every
    probe rejected."""
    members = spark.createDataFrame([], "k long")
    probes = spark.createDataFrame([(k,) for k in range(100)], ["k"])
    row = SK.bloom_prejoin_stats(members, "k", probes, "k", "t").collect()[0]
    assert row.n_members == 0
    assert row.n_words == SK.BLOOM_MIN_WORDS
    assert row.n_bits_set is None
    assert row.n_pass == 0 and row.n_true == 0 and row.n_false_pos == 0


def test_bloom_empty_probe_set(spark):
    """Zero non-null probe keys (ADVICE r06 #1): the audit still emits
    ONE row with zeroed counters — not NULL sums, and not the zero rows
    the oracle's old GROUP BY form produced — in both engines."""
    import duckdb

    members = spark.createDataFrame([(k,) for k in range(50)], ["k"])
    probes = spark.createDataFrame([(None,)], "k long")
    row = SK.bloom_prejoin_stats(members, "k", probes, "k", "t").collect()[0]
    assert row.n_members == 50
    assert row.n_probe_keys == 0
    assert row.n_pass == 0 and row.n_true == 0 and row.n_false_pos == 0

    con = duckdb.connect()
    con.execute("CREATE TABLE m AS SELECT unnest(range(50)) AS k")
    con.execute("CREATE TABLE p (k BIGINT)")
    con.execute("INSERT INTO p VALUES (NULL)")
    sql = SK.bloom_prejoin_oracle_sql("m", "k", "p", "k", "t")
    o = con.execute(sql).fetchall()
    assert len(o) == 1
    (_, n_members, _, _, n_probe, n_pass, n_true, n_fp) = o[0]
    assert (n_members, n_probe, n_pass, n_true, n_fp) == (50, 0, 0, 0, 0)


def test_kmv_identical_small_sets_estimate_one(spark):
    """|A∪B| < k: the estimator divides by the union's bottom-k SIZE,
    so two identical 10-key sets estimate J=1.0 (a constant-k
    denominator would read 10/64)."""
    rows = [("a", k) for k in range(10)] + [("b", k) for k in range(10)]
    df = spark.createDataFrame(rows, ["g", "key"])
    r = SK.kmv_jaccard(df, "g", "key").collect()[0]
    assert r.n_common == 10
    assert r.est_jaccard == 1.0


def test_kmv_single_group_returns_empty(spark):
    df = spark.createDataFrame([("only", 1), ("only", 2)], ["g", "key"])
    assert SK.kmv_jaccard(df, "g", "key").count() == 0


def test_hll_ignores_null_keys_and_counts_nonnull_rows(spark):
    a = spark.createDataFrame([(k,) for k in range(100)], ["k"])
    b = a.unionByName(
        spark.createDataFrame([(None,)] * 7, "k bigint")
    )
    ra = SK.hll_sketch(a, "k", "t").collect()[0]
    rb = SK.hll_sketch(b, "k", "t").collect()[0]
    # NULLs contribute nothing: registers, v_zero, estimate identical
    assert (ra.v_zero, ra.reg_sum, ra.hll_est) == (
        rb.v_zero, rb.reg_sum, rb.hll_est)
    assert rb.n_rows == 100  # non-null rows only, matching the oracle


def test_hll_empty_input_all_columns_zeroed(spark):
    r = SK.hll_sketch(
        spark.createDataFrame([], "k long"), "k", "t"
    ).collect()[0]
    assert (r.n_rows, r.v_zero, r.hll_est) == (0, SK.HLL_M, 0)
    assert r.reg_sum == SK.HLL_M * (1 << SK.HLL_RHO_MAX)


def test_hll_merge_equals_direct_sketch(spark):
    """Register-level max-merge is associative: the merged row of
    hll_sketch_by must be BIT-IDENTICAL (v_zero, reg_sum, estimate) to
    sketching the union directly — the property that lets rolling
    distinct counts reuse per-partition sketches without re-scanning
    raw keys."""
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    by = SK.hll_sketch_by(
        orders, "o_custkey", F.date_format("o_orderdate", "yyyy-MM")
    )
    merged = by.filter(F.col("src") == "merged").collect()[0]
    direct = SK.hll_sketch(orders, "o_custkey", "direct").collect()[0]
    assert (merged.v_zero, merged.reg_sum, merged.hll_est) == (
        direct.v_zero, direct.reg_sum, direct.hll_est
    )
    assert merged.n_rows == direct.n_rows


def test_kmv_set_cardinalities_accuracy_and_exact_regime(spark):
    """Beyer estimator sanity: on planted sets A=0..999, B=500..1499
    (|A∪B|=1500, |A∩B|=500) the k=64 estimates land within the ~3σ
    sketch band; sets smaller than k take the exact branch
    (m_union < k → est_union == m_union == |A∪B| exactly)."""
    rows = [("A", i) for i in range(1000)] + [("B", i) for i in range(500, 1500)]
    df = spark.createDataFrame(rows, ["g", "u"])
    r = SK.kmv_set_cardinalities(df, "g", "u").collect()[0]
    assert r.m_union == SK.KMV_K
    assert abs(r.est_union - 1500) / 1500 < 0.40, r
    assert abs(r.est_inter - 500) / 500 < 0.60, r  # inter compounds J-error
    assert 0 <= r.est_inter <= r.est_union

    small = [("A", i) for i in range(20)] + [("B", i) for i in range(10, 40)]
    r2 = SK.kmv_set_cardinalities(
        spark.createDataFrame(small, ["g", "u"]), "g", "u"
    ).collect()[0]
    assert (r2.m_union, r2.est_union, r2.n_common, r2.est_inter) == (40, 40, 10, 10)


def test_bottomk_monthly_merge_equals_direct(spark):
    """The two-stage route (per-month bottom-64 → global bottom-1024
    over the partials) must produce the same quantiles as the direct
    global sample: md5 ranks are independent of the month, so no month
    contributes more than 64 of the global winners on this data — the
    distributed-merge plan loses nothing."""
    from backend_fastapi_spark import queries as Q

    direct = {r.q: r.est_value for r in
              Q.REGISTRY["bottomk_sample_quantiles"]
              .fn(spark, SF_SMOKE).collect()}
    merged = {r.q: r.est_value for r in
              Q.REGISTRY["bottomk_monthly_merge"]
              .fn(spark, SF_SMOKE).collect()}
    assert merged == direct and len(merged) == 5
    # the premise itself: max per-month contribution to the global
    # bottom-1024 stays under the 64-row partial cap
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    winners = (
        orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("m"),
            F.md5(F.col("o_orderkey").cast("string")).alias("h"),
            "o_orderkey",
        )
        .orderBy("h", "o_orderkey")
        .limit(1024)
    )
    worst = (
        winners.groupBy("m").count().agg(F.max("count")).collect()[0][0]
    )
    assert worst <= 64, worst
