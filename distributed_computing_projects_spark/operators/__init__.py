from distributed_computing_projects_spark.operators.grep import grep, grep_count, tail_n
from distributed_computing_projects_spark.operators.wordcount import wordcount
from distributed_computing_projects_spark.operators.wine import token_occurrence_agg
from distributed_computing_projects_spark.operators.condorcet import (
    condorcet,
    pairwise_preferences,
)
from distributed_computing_projects_spark.operators.maplejuice import (
    maple,
    juice,
    juice_tree,
    maple_exec,
    juice_exec,
)

__all__ = [
    "grep",
    "grep_count",
    "tail_n",
    "wordcount",
    "token_occurrence_agg",
    "condorcet",
    "pairwise_preferences",
    "maple",
    "juice",
    "juice_tree",
    "maple_exec",
    "juice_exec",
]
