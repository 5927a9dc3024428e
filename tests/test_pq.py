"""Product quantization (operators/pq.py): training shape/determinism,
ADC distances against an independent numpy reference, recall sanity,
and the IVF-PQ composition."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators import pq as PQ
from distributed_computing_projects_spark.operators import similarity as S

Q = [0.3, -0.7] + [0.01 * i for i in range(62)]
K = 10


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_train_shape_and_determinism(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = PQ.train(spark, emb, "vec_id", "embedding")
    b = PQ.train(spark, emb, "vec_id", "embedding")
    assert a == b  # bit-identical across runs
    assert set(a) == set(range(PQ.M_SUB))
    for m, cells in a.items():
        assert 1 <= len(cells) <= PQ.K_SUB
        for cell, cent in cells:
            assert 0 <= cell < PQ.K_SUB
            assert len(cent) == PQ.SUB_DIM


def test_adc_matches_numpy_reference(spark, sf_dir):
    """The Spark-side encode + baked-LUT ADC sum must equal an
    independent numpy recomputation (assign each sub-slice to its
    nearest sub-centroid, sum full sub-squared-distances) for every
    vector — float64 to ~1e-9, since numpy's summation order differs
    from the pinned fold."""
    emb = _emb(spark, sf_dir)
    cents = PQ.train(spark, emb, "vec_id", "embedding")
    rows = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.expr(PQ.adc_dist_expr("embedding", Q, cents)).alias("d"),
        F.expr(PQ.encode_expr("embedding", cents, "spark")).alias("codes"),
    ).collect()
    q = np.asarray(Q, dtype=np.float64)
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        ref = 0.0
        for m in range(PQ.M_SUB):
            sv = v[m * PQ.SUB_DIM:(m + 1) * PQ.SUB_DIM]
            qm = q[m * PQ.SUB_DIM:(m + 1) * PQ.SUB_DIM]
            best_cell, best_d = None, None
            for cell, cent in cents[m]:
                d = float(((sv - np.asarray(cent)) ** 2).sum())
                if best_d is None or d < best_d - 1e-12:
                    best_cell, best_d = cell, d
            assert r.codes[m] == best_cell or abs(
                best_d - float(((sv - np.asarray(
                    dict(cents[m])[r.codes[m]])) ** 2).sum())
            ) < 1e-9  # tie within float tolerance
            cm = np.asarray(dict(cents[m])[r.codes[m]])
            ref += float(((qm - cm) ** 2).sum())
        assert abs(r.d - ref) < 1e-9, (r.id, r.d, ref)


def test_pq_topk_finds_planted_neighbours(spark, sf_dir):
    """On near-random vectors PQ recall is weak by nature (distances
    concentrate and 24-bit codes can't separate them — that's the
    accuracy/memory trade PQ makes), so the meaningful end-to-end
    check is PLANTED structure: vectors genuinely close to the query
    must dominate the ADC top-k over background vectors."""
    from pyspark.sql import Row

    rng = np.random.default_rng(5)
    rows = []
    for i in range(300):  # background: far from Q
        v = rng.normal(0, 1.0, 64)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    q = np.asarray(Q, dtype=np.float64)
    planted = []
    for i in range(5):  # planted: tiny perturbations of Q
        v = q + rng.normal(0, 0.01, 64)
        rows.append(Row(vec_id=1000 + i,
                        embedding=[float(x) for x in v]))
        planted.append(1000 + i)
    emb = spark.createDataFrame(rows)
    got = [r.id for r in PQ.pq_topk(
        spark, emb, Q, K, "vec_id", "embedding").collect()]
    assert len(got) == K
    # every planted near-neighbour outranks the background noise
    assert set(planted) <= set(got), (planted, got)
    # and they occupy the TOP of the ranking
    assert set(got[:5]) == set(planted)


def test_ivfpq_is_pq_restricted_to_probed_cells(spark, sf_dir):
    """IVF-PQ == exhaustive PQ-ADC filtered to the coarse probe cells:
    same distances, subset membership."""
    emb = _emb(spark, sf_dir)
    cents = PQ.train(spark, emb, "vec_id", "embedding")
    cells = S.ivf_cells([float(x) for x in Q], 2)
    pruned = emb.filter(
        F.expr(S.ivf_cell_expr("embedding", "spark")).isin(cells)
    )
    via_filter = [(r.id, r.adc_dist) for r in PQ.pq_topk(
        spark, pruned, Q, K, "vec_id", "embedding",
        centroids=cents).collect()]
    direct = [(r.id, r.adc_dist) for r in PQ.ivfpq_topk(
        spark, emb, Q, K, "vec_id", "embedding", probes=2,
        centroids=cents).collect()]
    assert via_filter == direct


def test_ivfpq_store_probe_matches_direct(spark, sf_dir, tmp_path):
    """The persisted IVF-PQ store (codes only, no vectors) must probe
    to exactly the direct computation's rows; an at-least-once retry
    (epoch appended twice) must not change the result; compaction
    reclaims the duplicates without changing probes."""
    emb = _emb(spark, sf_dir)
    cents = PQ.train(spark, emb, "vec_id", "embedding")
    direct = [(r.id, r.adc_dist) for r in PQ.ivfpq_topk(
        spark, emb, Q, K, "vec_id", "embedding", probes=2,
        centroids=cents).collect()]

    path = str(tmp_path / "ivfpq")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    epoch = emb.filter(F.col("vec_id") % 10 == 0)
    PQ.write_ivfpq(spark, corpus, path, "vec_id", "embedding",
                   centroids=cents)
    PQ.append_ivfpq(epoch, path, "vec_id", "embedding")
    PQ.append_ivfpq(epoch, path, "vec_id", "embedding")  # retry

    got = [(r.id, r.adc_dist) for r in PQ.ivfpq_topk_store(
        spark, path, Q, K, probes=2).collect()]
    assert got == direct

    before, after = PQ.compact_ivfpq_store(spark, path)
    assert before > after == emb.count()
    got2 = [(r.id, r.adc_dist) for r in PQ.ivfpq_topk_store(
        spark, path, Q, K, probes=2).collect()]
    assert got2 == direct


def test_ivfpq_store_reads_codes_not_vectors(spark, sf_dir, tmp_path):
    """The store probe's scan must be directory-pruned to the probed
    cells (PartitionFilters) and must read ONLY (id, codes) — the
    32x-compressed columns; no vector column exists in the store at
    all, which IS the layout's point."""
    from distributed_computing_projects_spark.plans.inspect import (
        physical_plan,
    )

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivfpq")
    PQ.write_ivfpq(spark, emb, path, "vec_id", "embedding")
    probe = PQ.ivfpq_topk_store(spark, path, Q, K, probes=2)
    plan = physical_plan(probe)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("cell IN" in ln or "cell#" in ln for ln in pf), plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "codes" in rs[0], plan
    assert "embedding" not in rs[0] and '"v"' not in rs[0], plan


def test_ivfpq_store_sidecar_roundtrip(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    cents = PQ.train(spark, emb, "vec_id", "embedding")
    path = str(tmp_path / "ivfpq")
    PQ.write_ivfpq(spark, emb, path, "vec_id", "embedding",
                   centroids=cents)
    assert PQ.store_centroids(path) == cents
