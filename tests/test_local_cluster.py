"""Multi-executor correctness smoke: representative queries on a REAL
two-executor local-cluster, value-compared against DuckDB oracles.

Why this exists: ``local[*]`` runs executors as threads in the driver
JVM, which hides the serialization boundary — a closure capturing
driver-side state, a non-serializable object in a UDF, or Python
worker environment assumptions all pass in local mode and fail on a
real cluster. local-cluster[2,2,1024] spawns real executor JVMs with
real serialization, real shuffle over the wire shape, and separate
Python worker pools; one representative query per execution family
runs here (scan+agg, banded self-join with Python-free signature
math, Arrow mapInPandas decode, cloudpickled maple/juice UDFs,
LM scoring with its pinned fold, iterative integer PageRank, and
SemDeDup whose driver-side k-means training bakes centroids into
an executor-shipped expression).

Subprocess-isolated like the other cluster tests (the suite session
pins local[*]).
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import os, sys
sys.path.insert(0, "@REPO@")
os.environ["PYTHONPATH"] = "@REPO@"
import duckdb
from pyspark.sql import SparkSession
from distributed_computing_projects_spark.queries import load_registry

spark = (
    SparkSession.builder.master("local-cluster[2, 2, 1024]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("local-cluster-smoke")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sf = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events"
          " documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

reg = load_registry()
NAMES = [
    "q5_local_supplier_volume",   # scan + broadcast joins + agg
    "dedup_minhash_lsh",          # banded self-join, JVM signature math
    "multimodal_jpeg_decode",     # Arrow mapInPandas encode+decode
    "maplejuice_wordcount",       # cloudpickled maple/juice UDF tier
    "lm_perplexity_rank",         # gram-key joins + pinned per-doc fold
    "graph_pagerank_topk",        # iterative join+agg, BIGINT exactness
    "dedup_semantic",             # driver-trained centroids baked into
                                  # an expression shipped to executors
]
for name in NAMES:
    spec = reg[name]
    sdf = spec.fn(spark, sf).toPandas()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(by=cols).reset_index(drop=True)
    o = con.sql(spec.oracle).df()
    b = o[sorted(o.columns)].sort_values(by=sorted(o.columns)).reset_index(drop=True)
    assert a.shape == b.shape, (name, a.shape, b.shape)
    assert (a.astype(str).values == b.astype(str).values).all(), name
    print("OK", name, a.shape)
print("LOCAL-CLUSTER-SMOKE-OK")
spark.stop()
"""


def test_representative_queries_on_real_executors():
    import os

    import distributed_computing_projects_spark as pkg

    repo = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("@REPO@", repo)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "LOCAL-CLUSTER-SMOKE-OK" in proc.stdout
