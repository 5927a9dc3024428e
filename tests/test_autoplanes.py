"""Auto-sized LSH blocking (operators/autoplanes.py): the integer
sizing rule, its equivalence to the float rule it mirrors, the band-OR
multi-table join, and the auto-sized bucketed store."""

from __future__ import annotations


import pytest

from distributed_computing_projects_spark.operators import autoplanes as AP
from distributed_computing_projects_spark.operators import similarity as S


def test_resolve_matches_float_rule_exhaustively():
    """resolve_n_planes (integer bit-length) must agree with
    suggest_n_planes (float log2) everywhere the float form is exact —
    including every power-of-two boundary, where a 1-ulp log2 error
    would flip ceil()."""
    for target in (1, 2, 64, 1024, 4096):
        for n in range(1, 5000):
            assert AP.resolve_n_planes(n, target) == S.suggest_n_planes(
                n, target
            ), (n, target)
    # large boundary sweep: k planes exactly at n = target * 2^k
    for k in range(1, 40):
        t = 1024
        n = t * (1 << k)
        assert AP.resolve_n_planes(n, t) == k
        assert AP.resolve_n_planes(n + 1, t) == k + 1
        assert AP.resolve_n_planes(n - 1, t) == k


def test_resolve_floor_and_smallest_property():
    assert AP.resolve_n_planes(0) == 1
    assert AP.resolve_n_planes(1) == 1
    assert AP.resolve_n_planes(1024, 1024) == 1
    # smallest k with 2^k * target >= n
    for n, t in ((500, 64), (2000, 64), (10**9, 1024), (7, 2)):
        k = AP.resolve_n_planes(n, t)
        assert (1 << k) * t >= n
        assert k == 1 or (1 << (k - 1)) * t < n


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_knn_join_auto_uses_derived_count(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    n = AP.auto_n_planes(emb, 64)
    assert n == AP.resolve_n_planes(emb.count(), 64)
    auto = AP.knn_join_auto(emb, "vec_id", "embedding", 3,
                            target_bucket_size=64)
    explicit = S.knn_join(emb, "vec_id", "embedding", 3, n_planes=n)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )


def test_knn_join_tables_one_table_equals_knn_join(spark, sf_dir):
    """Table 0 of the band-OR join uses the standard plane set, so
    n_tables=1 must reproduce similarity.knn_join bit-for-bit."""
    emb = _emb(spark, sf_dir)
    one = AP.knn_join_tables(emb, "vec_id", "embedding", 3,
                             n_planes=4, n_tables=1)
    std = S.knn_join(emb, "vec_id", "embedding", 3, n_planes=4)
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, std.collect())
    )


def test_knn_join_tables_recall_dominates_single_table(spark, sf_dir):
    """More tables can only ADD candidate pairs (table 0 is the single
    table), so for every id the band-OR top-1 cosine must be >= the
    single-table top-1 cosine."""
    emb = _emb(spark, sf_dir).limit(200)
    single = {r.id: r.cosine for r in S.knn_join(
        emb, "vec_id", "embedding", 1, n_planes=4).collect()}
    multi = {r.id: r.cosine for r in AP.knn_join_tables(
        emb, "vec_id", "embedding", 1, n_planes=4, n_tables=3).collect()}
    assert set(single) <= set(multi)
    for i, c in single.items():
        assert multi[i] >= c - 1e-12, i


def test_lsh_bucket_table_zero_is_standard_bucket():
    from distributed_computing_projects_spark.functions import text as T

    assert AP.lsh_bucket_table("e", "spark", 5, 0) == T.lsh_bucket(
        "e", "spark", 5
    )
    with pytest.raises(ValueError):
        AP.lsh_bucket_table("e", "spark", AP.TABLE_STRIDE + 1, 0)


def test_write_bucketed_auto_roundtrip(spark, sf_dir, tmp_path):
    """The auto-sized store must be probe-able with the RETURNED plane
    count and agree with the on-the-fly lsh_topk at that count."""
    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "store")
    n = AP.write_bucketed_auto(emb, path, "vec_id", "embedding",
                               target_bucket_size=64)
    assert n == AP.resolve_n_planes(emb.count(), 64)
    q = [0.5 if j % 3 else -0.25 for j in range(64)]
    got = S.lsh_topk_bucketed(spark, path, q, 5, probe_hamming=1,
                              n_planes=n).collect()
    want = S.lsh_topk(emb, q, 5, "vec_id", "embedding",
                      probe_hamming=1, n_planes=n).collect()
    assert [(r.id, r.cosine) for r in got] == [(r.id, r.cosine)
                                              for r in want]
    # bucket directories bounded by the derived count
    import os
    dirs = [d for d in os.listdir(path) if d.startswith("bucket=")]
    assert 0 < len(dirs) <= 2 ** n


def test_spread_fans_out_single_split_sources(spark, sf_dir, tmp_path):
    """spread() must fan a small single-file parquet out to the
    session's full parallelism (the compute-dense self-join guard),
    be a no-op on many-file sources, and never change rows."""
    from distributed_computing_projects_spark.operators.spread import spread

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    target = spark.sparkContext.defaultParallelism
    out = spread(emb)
    assert out.rdd.getNumPartitions() >= target
    assert sorted(r.vec_id for r in out.collect()) == sorted(
        r.vec_id for r in emb.collect()
    )
    # many-file source: no repartition inserted (plan unchanged)
    many = str(tmp_path / "many")
    emb.repartition(target + 4).write.parquet(many)
    again = spark.read.parquet(many)
    assert spread(again) is again
    # in-memory frame (no input files at all): untouched
    local = spark.createDataFrame([(1, "a")], "id long, s string")
    assert spread(local) is local


def test_knn_join_recall_internal_consistency(spark):
    """hits@k is monotone in k and bounded by total; both methods
    present; band-OR hits >= single-table hits at every k (its
    candidate set is a superset and ranking ties are deterministic)."""
    from distributed_computing_projects_spark.queries import load_registry

    rows = load_registry()["knn_join_recall"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_method: dict = {}
    for r in rows:
        by_method.setdefault(r.method, {})[r.k] = (r.hits, r.total)
    assert set(by_method) == {"blocked", "bandor"}
    for method, ks in by_method.items():
        seq = sorted(ks.items())
        for (k, (h, t)) in seq:
            assert 0 <= h <= t and t > 0, (method, k)
        hits = [h for _, (h, _) in seq]
        assert hits == sorted(hits), f"{method} hits not monotone in k"


def test_band_or_store_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    """The (tbl, bucket)-partitioned store must (a) prune directories
    at execution, (b) return exactly the top-k over the UNION of the
    probed tables' candidates, deduped, (c) dominate the single-table
    store's best candidate set."""
    from pyspark.sql import functions as F

    from distributed_computing_projects_spark.functions import text as T

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "tables_store")
    n_planes, n_tables, k = 4, 3, 5
    AP.write_bucketed_tables(emb, path, "vec_id", "embedding",
                             n_planes, n_tables)
    q = [0.4 if j % 5 else -0.3 for j in range(T.EMBEDDING_DIM)]
    got = AP.lsh_topk_tables(spark, path, q, k, n_planes, n_tables,
                             probe_hamming=1).collect()
    # expected: on-the-fly union of per-table candidates, exact cosine
    cand_ids = set()
    for t in range(n_tables):
        probes = AP.probe_buckets_table(q, 1, n_planes, t)
        b = emb.select(
            F.col("vec_id").alias("id"),
            F.expr(AP.lsh_bucket_table("embedding", "spark", n_planes, t))
            .alias("bucket"),
        )
        cand_ids |= {r.id for r in
                     b.filter(F.col("bucket").isin(probes)).collect()}
    qs = T._float_array_literal([float(x) for x in q], "spark")
    cos = T.cosine(T.dot("embedding", qs, "spark"),
                   T.sq_norm("embedding", "spark"), T.sq_norm(qs, "spark"))
    want = (
        emb.filter(F.col("vec_id").isin(sorted(cand_ids)))
        .select(F.col("vec_id").alias("id"), F.expr(cos).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id")).limit(k).collect()
    )
    assert [(r.id, r.cosine) for r in got] == [(r.id, r.cosine)
                                              for r in want]
    # no duplicate ids despite multi-table membership
    assert len({r.id for r in got}) == len(got)
    # pruning is real at execution
    touched = (
        spark.read.parquet(path)
        .filter((F.col("tbl") == 0) & F.col("bucket").isin(
            AP.probe_buckets_table(q, 1, n_planes, 0)))
        .select(F.input_file_name().alias("f")).distinct().collect()
    )
    for r in touched:
        t = int(r.f.split("tbl=")[1].split("/")[0])
        b = int(r.f.split("bucket=")[1].split("/")[0])
        assert t == 0 and b in AP.probe_buckets_table(q, 1, n_planes, 0)


def test_candidate_accounting_exact_on_identical_vectors(spark):
    """All-identical vectors land in one bucket per table: measured
    must be exactly n_tables * C(n, 2), and the model is the uniform
    floor below it."""
    from pyspark.sql import functions as F

    n = 64
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr("array(1.0f, 2.0f, 3.0f, 4.0f)").alias("embedding"),
    )
    exact = n * (n - 1) // 2
    assert AP.measured_candidates(df, "embedding", 4) == exact
    assert AP.measured_candidates(df, "embedding", 4, n_tables=2) == 2 * exact
    assert AP.model_candidates(n, 4) == exact // 16
    assert AP.model_candidates(n, 4, n_tables=2) == 2 * (exact // 16)


def test_candidate_accounting_matches_uniform_model(spark):
    """On direction-uniform pseudo-random vectors the measured
    candidate count must sit near the analytic model
    C(N,2)/2^n_planes — the tolerance band that makes the SCALE.md
    100x extrapolation arithmetic, not prose."""
    from pyspark.sql import functions as F

    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            # per-element hash, NOT a sinusoid lattice: sin(a + j*b)
            # spans a 2-D subspace (sin/cos addition), which skews the
            # sign-bit buckets 2.4x; hashed elements are direction-
            # uniform and land within ~3% of the model
            "transform(sequence(0, 63),"
            " j -> cast((pmod(hash(id, j), 2001) - 1000) / 1000.0"
            " as float))"
        ).alias("embedding"),
    )
    n_planes = 4
    measured = AP.measured_candidates(df, "embedding", n_planes)
    model = AP.model_candidates(n, n_planes)
    assert 0.5 * model <= measured <= 2.0 * model, (measured, model)


def test_grouped_candidates_counts_band_pairs(spark):
    from pyspark.sql import Row

    rows = [Row(band=0, key="a")] * 3 + [Row(band=0, key="b")] * 2 + \
           [Row(band=1, key="a")]
    df = spark.createDataFrame(rows)
    # C(3,2) + C(2,2) + C(1,2) = 3 + 1 + 0
    assert AP.measured_grouped_candidates(df, "band", "key") == 4


def test_semdedup_cell_accounting_matches_uniform_model(spark):
    """Same arithmetic discipline for the SemDeDup blocking: on
    direction-uniform hashed vectors, within-cell pairs under k seeded
    centroids sit near C(N,2)/k — the band that makes the SCALE.md
    semdedup_cells 100x row (ratio 1.18, per-row ~cell_size/2)
    arithmetic rather than prose. k-means Voronoi cells are not
    perfectly balanced, so the band is the same generous one the
    hyperplane test uses."""
    from pyspark.sql import functions as F

    from distributed_computing_projects_spark.operators import (
        ivf_train as IVT,
    )

    n, k = 2048, 8
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63),"
            " j -> cast((pmod(hash(id, j), 2001) - 1000) / 1000.0"
            " as float))"
        ).alias("embedding"),
    )
    assigned = IVT.assign_cells_join(
        df, "vec_id", "embedding", IVT.seed_centroids(k)
    )
    measured = AP.measured_grouped_candidates(assigned, "cell")
    model = (n * (n - 1) // 2) // k
    assert 0.5 * model <= measured <= 2.0 * model, (measured, model)
