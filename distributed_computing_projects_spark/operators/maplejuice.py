"""MapleJuice programming model on Spark — the reference's UDF surface.

Reference contract (SURVEY §2.10):
- maple: ``Maple(line) -> Emit(key, value)*`` — a flatMap over text
  lines emitting string pairs (mp3/src/maple/mapler.go:10-22); the
  framework runs one task per SDFS block (mp3/src/maplejuice.go:174-206).
- juice: ``Juice(key, values[])`` — grouped reduction; keys are
  hash- or range-partitioned into ``num_juices`` partitions
  (mp3/src/partition.go:9-38) and each key's values are gathered from
  every mapper (ShuffleSort, mp3/src/maplejuice.go:623-652).

Two tiers here:

1. **Native tier** (``maple``/``juice``): Python callables executed via
   Arrow-batched ``mapInPandas`` / ``applyInPandas``. The shuffle,
   partitioning, locality scheduling, and retry the reference
   hand-builds (mp3/src/maplejuice.go:209-307) are Spark built-ins.

2. **Exec-compat tier** (``maple_exec``/``juice_exec``): run an opaque
   executable with the reference's exact stdin/stdout contracts —
   maple reads a block of lines and prints ``key,value`` lines
   (mp3/src/maplejuice.go:342-355); juice gets one key's values on
   stdin (mp3/src/maplejuice.go:655-669). ``maple_exec`` pipes whole
   partitions (many lines per process); ``juice_exec`` faithfully runs
   one process per key — the reference's costliest quirk (SURVEY §4.3),
   kept only behind this compat API.

Value-parsing divergence kept OUT of the native tier: the reference
splits emitted lines on "," and silently truncates values containing
commas (mp3/src/maplejuice.go:347-355). Native-tier pairs are real
columns; only the exec tier re-parses text, where the contract demands.
"""

from __future__ import annotations

import shlex
import subprocess
from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MapleFn = Callable[[str], Iterable[tuple[str, str]]]
JuiceFn = Callable[[str, list[str]], str]

KV_SCHEMA = "key string, value string"


def _first_string_col(df: DataFrame) -> str:
    for name, dtype in df.dtypes:
        if dtype == "string":
            return name
    raise ValueError("maple input needs a string column of lines")


def maple(
    df: DataFrame,
    fn: MapleFn,
    num_tasks: int | None = None,
    line_col: str | None = None,
) -> DataFrame:
    """Native maple: apply ``fn`` to each line, yielding (key, value)
    string pairs. ``num_tasks`` mirrors the reference CLI knob
    (mp3/README.md:50-52); omit it and AQE sizes the stage.
    """
    col = line_col or _first_string_col(df)
    src = df.select(F.col(col).alias("_line"))
    if num_tasks:
        src = src.repartition(num_tasks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys: list[str] = []
            vals: list[str] = []
            for line in pdf["_line"]:
                for k, v in fn(line):
                    keys.append(str(k))
                    vals.append(str(v))
            yield pd.DataFrame({"key": keys, "value": vals})

    return src.mapInPandas(run, KV_SCHEMA)


def juice(
    kv: DataFrame,
    fn: JuiceFn,
    num_juices: int | None = None,
    partition: str = "hash",
    sorted_output: bool = True,
) -> DataFrame:
    """Native juice: group by key, apply ``fn(key, values) -> value``.

    ``partition='hash'|'range'`` mirrors mp3/src/partition.go:9-38
    (hash = FNV mod n there, Murmur3 here — assignment differs, results
    identical; range = sorted contiguous runs ≅ repartitionByRange).

    ``sorted_output``: by default output is key-sorted — the
    reference's output order is Go-map nondeterministic
    (mp3/src/maplejuice.go:552) and we deliberately define a
    deterministic one (SURVEY §4.3). That determinism costs a full
    range-shuffle sort of the OUTPUT on every job; pass
    ``sorted_output=False`` when juice feeds another pipeline stage
    (the parity default only matters for user-facing output files).
    """
    if num_juices:
        if partition == "range":
            kv = kv.repartitionByRange(num_juices, "key")
        else:
            kv = kv.repartition(num_juices, "key")

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["key"].iloc[0]
        return pd.DataFrame({"key": [key], "value": [str(fn(key, list(pdf["value"])))]})

    out = kv.groupBy("key").applyInPandas(reduce_group, KV_SCHEMA)
    return out.orderBy("key") if sorted_output else out


def juice_tree(
    kv: DataFrame,
    fn: JuiceFn,
    num_juices: int | None = None,
    partition: str = "hash",
    sorted_output: bool = True,
) -> DataFrame:
    """Juice for ASSOCIATIVE reducers, safe on giant groups.

    Plain ``juice`` gathers a key's full value list into one pandas
    group — the reference has the same failure mode (its juicer holds
    all values in memory, mp3/src/juice/juicer.go:25-28, and its own
    stress generator makes 5M values for ONE key,
    mp3/src/juice/generateMockMap.py:1-9). When ``fn`` is associative
    and value-closed (fn(k, [fn(k, chunk)...]) == fn(k, all)), combine
    per shuffle partition first, then reduce the per-partition partials
    — the hot key's state never exceeds one partition's slice.
    """
    if num_juices:
        if partition == "range":
            kv = kv.repartitionByRange(num_juices, "key")
        else:
            kv = kv.repartition(num_juices, "key")

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            g = pdf.groupby("key", sort=False)["value"]
            yield pd.DataFrame(
                {
                    "key": list(g.groups),
                    "value": [str(fn(k, list(v))) for k, v in g],
                }
            )

    partials = kv.mapInPandas(combine, KV_SCHEMA)

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["key"].iloc[0]
        return pd.DataFrame({"key": [key], "value": [str(fn(key, list(pdf["value"])))]})

    out = partials.groupBy("key").applyInPandas(reduce_group, KV_SCHEMA)
    return out.orderBy("key") if sorted_output else out


def maple_exec(df: DataFrame, cmd: str, line_col: str | None = None) -> DataFrame:
    """Exec-compat maple: pipe lines through ``cmd`` (one process per
    partition, not per block), parse ``key,value`` stdout exactly like
    WriteMapleKeys (mp3/src/maplejuice.go:342-355): split on "," keeping
    fields [0] and [1], skip lines with fewer than 2 fields.

    Memory bound: one PARTITION of lines is buffered in the Python
    worker before exec'ing (see the note in ``run``) — the same bound
    the reference's per-block exec has, PROVIDED partitions stay
    block-sized. Inputs read through this engine's sources respect
    ``spark.sql.files.maxPartitionBytes`` (128 MB default), so the
    bound holds; if a caller hands a frame with giant partitions
    (e.g. after a heavy ``coalesce``), ``repartition`` first — there
    is deliberately no silent chunked-exec fallback because execs may
    depend on seeing their whole block (per-block dedup/counters).
    """
    col = line_col or _first_string_col(df)
    lines = df.select(F.col(col).alias("_line"))
    argv = shlex.split(cmd)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # gather the WHOLE partition before exec'ing: mapInPandas
        # delivers ~10k-row Arrow chunks, and one process per chunk
        # would break execs whose output depends on their full block
        # (per-block dedup/counters — the reference runs the binary
        # once per block). Memory = one partition of lines, the same
        # bound the reference's per-block exec has.
        all_lines = [str(x) for pdf in batches for x in pdf["_line"]]
        if not all_lines:
            return
        payload = "\n".join(all_lines) + "\n"
        out = subprocess.run(
            argv, input=payload, capture_output=True, text=True, check=True
        ).stdout
        keys, vals = [], []
        for line in out.splitlines():
            parts = line.split(",")
            if len(parts) >= 2:
                keys.append(parts[0])
                vals.append(parts[1])
        yield pd.DataFrame({"key": keys, "value": vals})

    return lines.mapInPandas(run, KV_SCHEMA)


def juice_exec(kv: DataFrame, cmd: str, num_juices: int | None = None) -> DataFrame:
    """Exec-compat juice: one process per key, values on stdin, output
    ``key\\tvalue`` lines parsed back (ExecuteJuice
    mp3/src/maplejuice.go:655-669; juicer harness
    mp3/src/juice/juicer.go:93-117)."""
    if num_juices:
        kv = kv.repartition(num_juices, "key")
    argv = shlex.split(cmd)

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key = str(pdf["key"].iloc[0])
        payload = "\n".join(str(v) for v in pdf["value"]) + "\n"
        out = subprocess.run(
            argv + [key], input=payload, capture_output=True, text=True, check=True
        ).stdout
        keys, vals = [], []
        for line in out.splitlines():
            if "\t" in line:
                k, v = line.split("\t", 1)
                keys.append(k)
                vals.append(v)
        return pd.DataFrame({"key": keys, "value": vals})

    return kv.groupBy("key").applyInPandas(reduce_group, KV_SCHEMA).orderBy("key")
