"""PySpark-native analytics engine with the query/data-processing
capabilities of karthiksharma98/distributed-computing-projects
(the "MapleJuice" Go MapReduce stack; see SURVEY.md).

Spark-first design: the DataFrame/SQL API declares logical plans and
Catalyst/Tungsten pick the physical strategy. The reference's custom
machinery (SDFS blocks, shuffle files, task pools) maps onto Spark
built-ins; only the user-facing surfaces are re-expressed here:

- ``session``   — SparkSession factory tuned for OLAP (AQE, Arrow, UTC).
- ``catalog``   — SDFS-as-API: put/get/ls/store/delete over parquet dirs
                  (reference: mp3/src/sdfs.go, mp3/src/main.go:179-229).
- ``operators`` — grep, wordcount, wine filter-agg, condorcet, MapleJuice
                  API, relational surface, dedup, similarity search,
                  text stats, multimodal plumbing.
- ``streaming`` — Structured Streaming extension over the events table.
"""

from distributed_computing_projects_spark.session import get_spark
from distributed_computing_projects_spark.catalog import Catalog

__version__ = "0.1.0"

__all__ = ["get_spark", "Catalog", "__version__"]
