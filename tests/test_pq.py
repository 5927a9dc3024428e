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
