"""KMV sketch properties: merge theorem, partition-local fold
equivalence (the bounded-state 100 TB path), estimator accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators import sketches as SK

def _pairs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return SK.token_hashes(docs, "lang", "text")


def test_merge_of_sketches_equals_direct_union_sketch(spark, sf_dir):
    """The merge theorem: the k smallest distinct hashes across the
    per-group kept sets are exactly the union set's k minima."""
    pairs = _pairs(spark, sf_dir)
    merged = SK.merge_sketches(SK.kept_values(pairs)).collect()[0]
    direct = SK.merge_sketches(pairs.select("h").withColumn(
        "grp", F.lit("all"))).collect()[0]
    assert merged.asDict() == direct.asDict()


def test_partition_local_fold_merges_losslessly(spark, sf_dir):
    """The bounded-state path: fold a k-min sketch per partition, then
    merge the partials — must equal the exact global composition. This
    is what caps the shuffle at k values per partition per group."""
    pairs = _pairs(spark, sf_dir).repartition(7)  # arbitrary partitioning
    partials = (
        pairs.withColumn("pid", F.spark_partition_id())
        .withColumn("grp2", F.concat_ws("#", "grp", "pid"))
        .drop("grp").withColumnRenamed("grp2", "grp")
    )
    # per-(group,partition) kept sets, then restore the group key
    local = SK.kept_values(partials).withColumn(
        "grp", F.split("grp", "#").getItem(0))
    merged_per_group = SK.kmv_sketch(local.distinct()).collect()
    exact = SK.kmv_sketch(_pairs(spark, sf_dir)).collect()
    key = lambda rows: {r["grp"]: (r["n_kept"], r["kth_min_hash"],
                                   r["est_distinct"]) for r in rows}
    assert key(merged_per_group) == key(exact)


def test_estimate_tracks_exact_cardinality(spark, sf_dir):
    """Relative error of a full k=256 sketch is ~1/sqrt(k) (~6%);
    assert a generous 4-sigma bound so the test never flakes, and
    exactness below k."""
    pairs = _pairs(spark, sf_dir)
    sk = {r["grp"]: r for r in SK.kmv_sketch(pairs).collect()}
    exact = {r["grp"]: r["n"] for r in
             pairs.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    for grp, row in sk.items():
        if row["n_kept"] < SK.K_DEFAULT:
            assert row["est_distinct"] == float(exact[grp])
        else:
            rel = abs(row["est_distinct"] - exact[grp]) / exact[grp]
            assert rel < 0.25, (grp, row["est_distinct"], exact[grp])


def test_sketch_store_idempotent_under_duplicate_appends(spark, sf_dir, tmp_path):
    """At-least-once delivery: appending the same batch's kept set N
    times must leave the merged store sketch identical to one append —
    KMV's set-union merge makes the store retry-idempotent with no
    batch-id machinery."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    once, thrice = str(tmp_path / "once"), str(tmp_path / "thrice")
    SK.append_batch_sketch(docs, once, "lang", "text", batch_id=0)
    for i in range(3):
        SK.append_batch_sketch(docs, thrice, "lang", "text", batch_id=i)
    a = {r["grp"]: r.asDict() for r in
         SK.merged_store_sketch(spark, once).collect()}
    b = {r["grp"]: r.asDict() for r in
         SK.merged_store_sketch(spark, thrice).collect()}
    assert a == b
    # and the merged store equals the direct corpus sketch
    direct = {r["grp"]: r.asDict() for r in
              SK.kmv_sketch(_pairs(spark, sf_dir)).collect()}
    for grp, row in a.items():
        assert row == direct[grp]


def test_sketch_store_merges_across_batch_splits(spark, sf_dir, tmp_path):
    """Split the corpus into 3 disjoint batches by doc_id; the merged
    store sketch must equal the whole-corpus sketch exactly (merge
    theorem, across real batch boundaries)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store = str(tmp_path / "split")
    for i in range(3):
        SK.append_batch_sketch(docs.filter(F.col("doc_id") % 3 == i),
                               store, "lang", "text", batch_id=i)
    merged = {r["grp"]: r.asDict() for r in
              SK.merged_store_sketch(spark, store).collect()}
    direct = {r["grp"]: r.asDict() for r in
              SK.kmv_sketch(_pairs(spark, sf_dir)).collect()}
    assert merged == direct


def test_cms_estimate_is_one_sided_and_tight_for_heavy_hitters(spark, sf_dir):
    """CMS invariants: estimate >= exact for every probed token
    (collisions only add), and with d=4, w=1024 over this corpus the
    heavy hitters' estimates stay within the classic eps*N slack."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    occ = docs.select(F.explode(F.expr(
        "filter(split(text, '\\\\s+'), x -> x <> '')")).alias("token"))
    n_total = occ.count()
    rows = SK.cms_estimates(occ, 10).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["cms_estimate"] >= r["exact_count"], r
        # eps = e/w; slack bound holds w.h.p. — generous x4 margin
        assert r["cms_estimate"] - r["exact_count"] <= \
            4 * (3 * n_total) // SK.CMS_WIDTH, (r, n_total)


def test_bloom_no_false_negatives_and_fixed_size(spark):
    from distributed_computing_projects_spark.operators import (
        sketches as SK,
    )

    members = spark.createDataFrame(
        [(f"gram-{i}",) for i in range(500)], ["gram"]
    )
    bits = SK.bloom_bits(members)
    # fixed size: at most 2^(log2_bits - 6) mask words, ever
    assert bits.count() <= (1 << SK.BLOOM_LOG2_BITS) // 64
    # every member passes (no false negatives) — probe the member set
    probe = members.selectExpr("gram AS id", "gram")
    hits = SK.bloom_hits(probe, bits)
    assert hits.filter("n_bloom_hits <> n_grams").count() == 0


def test_bloom_fpr_is_bounded_and_one_sided(spark):
    from pyspark.sql import functions as F

    from distributed_computing_projects_spark.operators import (
        sketches as SK,
    )

    members = spark.createDataFrame(
        [(f"in-{i}",) for i in range(1000)], ["gram"]
    )
    bits = SK.bloom_bits(members)
    outsiders = spark.createDataFrame(
        [("q", f"out-{i}") for i in range(2000)], ["id", "gram"]
    )
    fp = (
        SK.bloom_hits(outsiders, bits)
        .agg(F.sum("n_bloom_hits").cast("long"))
        .collect()[0][0]
    )
    # theoretical FPR at n=1000, m=65536, k=3 is ~2e-4; allow 50x
    # headroom — the point is one-sidedness and the order of magnitude
    assert fp <= 20


def test_bloom_build_is_union_mergeable(spark):
    from distributed_computing_projects_spark.operators import (
        sketches as SK,
    )

    a = spark.createDataFrame([(f"a-{i}",) for i in range(100)], ["gram"])
    b = spark.createDataFrame([(f"b-{i}",) for i in range(100)], ["gram"])
    both = SK.bloom_bits(a.unionByName(b))
    merged = (
        SK.bloom_bits(a).unionByName(SK.bloom_bits(b))
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("mask"))
    )
    got = {(r["word"], r["mask"]) for r in merged.collect()}
    want = {(r["word"], r["mask"]) for r in both.collect()}
    assert got == want


def test_bloom_store_duplicate_append_is_noop(spark, tmp_path):
    from distributed_computing_projects_spark.operators import (
        sketches as SK,
    )

    grams = spark.createDataFrame(
        [(f"g-{i}",) for i in range(300)], ["gram"]
    )
    store = str(tmp_path / "bloom")
    SK.append_batch_bloom(grams, store, batch_id=0)
    once = {(r["word"], r["mask"])
            for r in SK.merged_store_bloom(spark, store).collect()}
    SK.append_batch_bloom(grams, store, batch_id=0)  # the "retry"
    twice = {(r["word"], r["mask"])
             for r in SK.merged_store_bloom(spark, store).collect()}
    assert once == twice
    # and a DISJOINT second batch merges to the union filter
    more = spark.createDataFrame(
        [(f"h-{i}",) for i in range(300)], ["gram"]
    )
    SK.append_batch_bloom(more, store, batch_id=1)
    merged = {(r["word"], r["mask"])
              for r in SK.merged_store_bloom(spark, store).collect()}
    direct = {(r["word"], r["mask"])
              for r in SK.bloom_bits(grams.unionByName(more)).collect()}
    assert merged == direct


def test_bloom_duplicate_probe_rows_cannot_false_negative(spark):
    from distributed_computing_projects_spark.operators import (
        sketches as SK,
    )

    members = spark.createDataFrame([("only-gram",)], ["gram"])
    bits = SK.bloom_bits(members)
    # the same (id, gram) row THREE times: a count-based membership
    # test would see 9 set positions != k=3 and report a miss
    probe = spark.createDataFrame(
        [("d", "only-gram")] * 3, ["id", "gram"]
    )
    out = SK.bloom_hits(probe, bits).collect()
    assert [(r["n_grams"], r["n_bloom_hits"]) for r in out] == [(1, 1)]


def test_hll_estimate_accuracy_and_exactness(spark):
    """HLL with m=1024 has ~3.25% std error; seeded corpora with
    known cardinalities must estimate within 3 sigma, and the
    harmonic denominator must be an exact integer (bit-stable)."""
    import distributed_computing_projects_spark.operators.hll as SK

    rows = [(f"g{g}", f"tok-{g}-{i % n}")
            for g, n in ((0, 500), (1, 5000), (2, 20000))
            for i in range(n)]
    docs = spark.createDataFrame(
        [(g, " ".join(t for gg, t in rows if gg == g))
         for g in ("g0", "g1", "g2")], "lang string, text string")
    pairs = SK.token_hll_pairs(docs, "lang", "text")
    out = {r["grp"]: r for r in SK.hll_sketch(pairs).collect()}
    for g, n in (("g0", 500), ("g1", 5000), ("g2", 20000)):
        r = out[g]
        assert r["exact_distinct_hashes"] == n
        if n >= 2560:  # 2.5 * m: above the small-range regime
            assert abs(r["est_distinct"] - n) / n < 0.10
        assert isinstance(r["harmonic_scaled"], int)
        assert r["n_registers_hit"] + r["n_zero_registers"] \
            == SK.HLL_M


def test_hll_register_terms_are_integral(spark):
    """rho <= 33 < SCALE: every 2^(SCALE-rho) term is integral, so
    the scaled harmonic sum is exact in BIGINT by construction."""
    import distributed_computing_projects_spark.operators.hll as SK

    assert SK.HLL_SCALE > 33
    assert SK.HLL_M * (1 << SK.HLL_SCALE) < (1 << 62)


def test_hist_quantile_error_bound_and_merge(spark):
    """Estimates must be within one bin width below the exact
    discrete quantile, and the sketch must merge by plain SUM:
    sketching two halves then merging equals sketching the whole."""
    import pyspark.sql.functions as SF

    import distributed_computing_projects_spark.operators.histsketch as HS

    rows = [("g", i, i * 0.37) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, k bigint, v double")
    out = HS.quantile_sketch(df, "grp", "v").collect()[0]
    vals = sorted(r[2] for r in rows)
    import math
    for q, est in ((0.5, out["q50_est"]), (0.9, out["q90_est"]),
                   (0.99, out["q99_est"])):
        exact = vals[math.ceil(q * len(vals)) - 1]
        assert est <= exact < est + 1.0 / HS.WIDTH_INV
    assert out["n"] == 2000

    halves = [HS.value_bins(df.filter(f"k % 2 = {h}"), "grp", "v")
              for h in (0, 1)]
    merged = (halves[0].unionByName(halves[1])
              .groupBy("grp", "bin").agg(SF.sum("n").alias("n")))
    direct = {(r["grp"], r["bin"]): r["n"]
              for r in HS.value_bins(df, "grp", "v").collect()}
    got = {(r["grp"], r["bin"]): r["n"] for r in merged.collect()}
    assert got == direct


def test_hist_quantile_negative_and_null_values(spark):
    import distributed_computing_projects_spark.operators.histsketch as HS

    df = spark.createDataFrame(
        [("g", -5.0), ("g", -1.0), ("g", None), ("g", 3.0)],
        "grp string, v double")
    out = HS.quantile_sketch(df, "grp", "v", qs=(0.5,)).collect()[0]
    assert out["n"] == 3  # nulls are not observations
    assert out["q50_est"] <= -1.0 < out["q50_est"] + 1.0 / 16


def test_theta_intersection_exact_when_sketches_complete(spark):
    """Sets with < k distinct hashes are COMPLETE sketches: theta is
    the full hash space and the estimate equals the exact
    intersection with zero error, by construction."""
    import distributed_computing_projects_spark.operators.sketches as SK
    import distributed_computing_projects_spark.operators.thetasketch as TH

    docs = spark.createDataFrame(
        [("a", " ".join(f"t{i}" for i in range(60))),
         ("b", " ".join(f"t{i}" for i in range(40, 100)))],
        "grp string, text string")
    pairs = SK.token_hashes(docs, "grp", "text")
    row = TH.intersect_estimate(pairs, "a", "b").collect()[0]
    assert row["theta"] == SK.HASH_SPACE
    assert row["exact_common_hashes"] == 20  # t40..t59
    assert row["n_common_below_theta"] == 20
    assert row["est_common"] == 20.0


def test_theta_intersection_estimates_large_overlap(spark):
    """Above k the estimate must land near the true overlap (KMV
    relative error ~1/sqrt(k) per sketch; 3-sigma-ish bound)."""
    import distributed_computing_projects_spark.operators.sketches as SK
    import distributed_computing_projects_spark.operators.thetasketch as TH

    n, overlap = 4000, 1500
    a_toks = [f"a{i}" for i in range(n - overlap)] \
        + [f"c{i}" for i in range(overlap)]
    b_toks = [f"b{i}" for i in range(n - overlap)] \
        + [f"c{i}" for i in range(overlap)]
    docs = spark.createDataFrame(
        [("a", " ".join(a_toks)), ("b", " ".join(b_toks))],
        "grp string, text string")
    pairs = SK.token_hashes(docs, "grp", "text")
    row = TH.intersect_estimate(pairs, "a", "b").collect()[0]
    assert row["exact_common_hashes"] == overlap
    assert abs(row["est_common"] - overlap) / overlap < 0.35
