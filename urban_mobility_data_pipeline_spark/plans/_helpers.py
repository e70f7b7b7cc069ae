"""Shared helpers for the query catalog.

Cross-engine parity rules used by every query (the driver compares our
Spark result against a DuckDB oracle by row-count + schema +
order-insensitive value hash):

- **Timestamps** never leave a query raw: the testdata parquet stores
  naive timestamps, DuckDB reads them naive, and Spark reads them as
  ``timestamp_ntz`` — except TIMESTAMP(NANOS), which Spark 4 only reads
  with ``spark.sql.legacy.parquet.nanosAsLong=true`` (as a ``long``).
  ``events.ts`` has shipped as BOTH physical types across testdata
  regenerations, so :func:`table` adapts to the loaded dtype and always
  derives the same ``ts_us`` epoch-microsecond long; queries only ever
  consume ``ts_us``. We emit formatted date/time strings or
  epoch-microsecond longs.
- **Doubles** are rounded explicitly on BOTH sides after aggregation, so
  sub-ulp fold-order differences can't flip the value hash.
- **Integer sums** are ``CAST(... AS BIGINT)`` in DuckDB (whose sum(int)
  is HUGEINT) to match Spark's long.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.session import configure_session
from urban_mobility_data_pipeline_spark.sources.files import (
    load_table,
    resolve_table_path,
    table_bytes,
)

#: 30-minute sessionization gap, in microseconds.
SESSION_GAP_US = 30 * 60 * 1_000_000

#: Spreadable tables and the id to hash-spread them on. The spread is
#: OPT-IN per consumer (``table(..., spread=True)``): an 87-row
#: isolated A/B (sf0.1 local[32], best-of-2, spread on vs off via the
#: conf knob) split the documents family cleanly in two. Pipelines
#: whose heavy stage is per-DOC compute (regex tokenize, n-gram
#: shingling, minhash/simhash signatures, Jaccard/edit verifies) or
#: doc_id-keyed aggregation win 0.3-6.7 s each — the spread partitions
#: BY doc_id, so doc-keyed work is co-partitioned for free. Pipelines
#: whose heavy stage is an explode-to-wide-key aggregation
#: (token/term/bigram/bucket keys: CMS sketches, postings, DSIR
#: buckets, NB token counts) or a cheap map/agg LOSE: the exchange
#: turns 1-task stages into 32-task waves fetching KB-sized blocks
#: (measured: ks_test stage runTime 13.7 s vs 2.1 s CPU on a 74 KB
#: shuffle) and multiplies partial-agg state per partition (worst:
#: corpus_dsir_sample wall 2.9 -> 18.5 s, CPU 5.5 -> 214 s). Embeddings
#: are NOT here at all for the same aggregation-dominated reason
#: (r13 mid-round: ivfpq CPU 4.0 -> 18.0 s, tasks 21 -> 331); the
#: adaptive quantizer's Lloyd's loop gets its parallelism from the
#: targeted train-sample repartition in
#: `similarity.train_adaptive_quantizer`.
_SPREAD_KEYS = {"documents": "doc_id"}

#: Only spread a table whose ENTIRE on-disk footprint is at most this
#: many bytes (conf `spark.umdp.spread.maxBytes` overrides). The gate is
#: what keeps the rule scale-adaptive rather than a local[32] tune: a
#: table this small arrives as ONE scan split (often one parquet row
#: group), so every compute-dense stage downstream runs single-task no
#: matter how many cores exist — the shuffle that fixes it moves at
#: most this many bytes (sub-second anywhere). Past the gate the
#: file/row-group layout already provides scan parallelism and a
#: repartition would be a pure extra exchange of a big table, so the
#: rule degrades to a no-op exactly when it should (measured sf0.1
#: local[32]: minhash over documents 2.0-3.2 s -> 0.6-0.8 s; a trivial
#: projection pays ~+0.05 s for the exchange).
_SPREAD_MAX_BYTES = 128 * 1024 * 1024


def _spread_small(spark: SparkSession, df: DataFrame, sf_dir: str,
                  name: str) -> DataFrame:
    key = _SPREAD_KEYS.get(name)
    if key is None:
        return df
    try:
        limit = int(
            spark.conf.get(
                "spark.umdp.spread.maxBytes", str(_SPREAD_MAX_BYTES)
            )
        )
    except Exception:
        limit = _SPREAD_MAX_BYTES
    path, _ = resolve_table_path(spark, sf_dir, name)
    if table_bytes(spark, path) > limit:
        return df
    par = spark.sparkContext.defaultParallelism
    # hash on the id: deterministic row->partition placement (no
    # round-robin local sort), and downstream id-keyed ops can reuse
    # the partitioning
    return df.repartition(par, F.col(key))


def table(
    spark: SparkSession, sf_dir: str, name: str, *, spread: bool = False
) -> DataFrame:
    """Load a testdata table with parity-safe session settings.

    ``spread=True`` opts the load into the size-gated small-table
    hash-spread (see ``_SPREAD_KEYS`` for the decision rule and the
    measured evidence; ``_spread_small`` for the gate). Results are
    identical either way — the spread only changes partitioning.

    For ``events``, the physical type of ``ts`` has varied across testdata
    generations (TIMESTAMP(NANOS) vs TIMESTAMP(MICROS)), so the derivation
    of the canonical ``ts_us`` (epoch micros, bigint) branches on the
    dtype Spark actually loaded:

    - ``timestamp``/``timestamp_ntz`` (micros/millis physical): cast to
      ``timestamp`` (session TZ is pinned UTC by ``configure_session``, so
      the naive value maps to the same wall-clock instant DuckDB's
      ``epoch_us(ts)`` sees) then ``unix_micros``. ``unix_micros`` rejects
      TIMESTAMP_NTZ directly, hence the cast.
    - nanos: Spark 4 refuses TIMESTAMP(NANOS) unless
      ``spark.sql.legacy.parquet.nanosAsLong=true`` reads it as a long;
      then ``ts div 1000`` floor-divides to micros, matching DuckDB's
      micro-truncated reading.
    """
    configure_session(spark)
    if name == "events":
        try:
            df = load_table(spark, sf_dir, name)
            ts_type = dict(df.dtypes).get("ts")
        except Exception:
            # TIMESTAMP(NANOS) without nanosAsLong fails at schema
            # inference — flip the legacy flag and read as long.
            ts_type = None
        if ts_type is None:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = load_table(spark, sf_dir, name)
            ts_type = dict(df.dtypes).get("ts")
        return df.withColumn("ts_us", events_ts_us(ts_type))
    df = load_table(spark, sf_dir, name)
    if spread:
        df = _spread_small(spark, df, sf_dir, name)
    return df


def events_ts_us(ts_type: str | None) -> Column:
    """Epoch-micros bigint from ``events.ts``, adapted to the dtype Spark
    loaded it as (``bigint`` = nanos-as-long; otherwise a timestamp type)."""
    if ts_type == "bigint":
        return F.expr("ts div 1000")
    return F.unix_micros(F.col("ts").cast("timestamp"))


def date_str(col: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    """Format a date/timestamp column as string (engine-neutral output)."""
    return F.date_format(col, fmt)


def event_time(ts_us: Column | str = "ts_us") -> Column:
    """Event-time timestamp from epoch micros. Session TZ is pinned to UTC
    by configure_session, so formatting matches DuckDB's naive reading."""
    c = F.col(ts_us) if isinstance(ts_us, str) else ts_us
    return F.timestamp_micros(c)


def duck_md5_int_key(expr: str) -> str:
    """DuckDB SQL reproducing functions.hashing.md5_int_key bit-for-bit:
    first 15 hex chars of md5 parsed base-16 → pmod 2147483646 → +1."""
    return (
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(substring(md5(coalesce({expr}, '')), 1, 15), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        "(a, b) -> a * 16 + b) % 2147483646 + 1 AS INTEGER)"
    )
