"""Lake sinks: partitioned parquet with idempotent partition overwrite.

Replaces the reference's destructive full-table JDBC overwrite
(``/root/reference/project/transform_data.py:199-209`` — mode="overwrite"
drops and recreates ``intraday_data``, silently discarding the
UNIQUE(symbol, timestamp) DDL constraint from ``schema.py:42``) with the
lake-native pattern: partition by date, and INSERT OVERWRITE only the
partitions present in the incoming frame
(``spark.sql.sources.partitionOverwriteMode=dynamic``, set by the session
factory).  A daily re-run replaces exactly that day — older partitions are
untouched, so loads are idempotent and re-playable.

At 100 TB: date partitioning gives the scan layer partition pruning for
the time-range queries every consumer runs (app.py:40-44 pushes the same
predicate manually); target file sizes are controlled by a pre-write
``repartition(n, keys)`` so each partition lands a bounded file count
instead of one file per shuffle task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _require_dynamic_overwrite(spark: SparkSession) -> None:
    """Refuse to partition-overwrite in STATIC mode.

    In static mode ``mode("overwrite").partitionBy(...)`` wipes EVERY
    partition of the target, not just the ones present in the frame —
    the exact data-loss mode dynamic overwrite exists to prevent.  The
    session factory sets the conf, but a session created elsewhere (a
    notebook, the correctness driver) may not have run through it; this
    assert turns silent data loss into an actionable error.
    """
    mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    if str(mode).lower() != "dynamic":
        raise RuntimeError(
            "partition-overwrite sink requires "
            "spark.sql.sources.partitionOverwriteMode=dynamic "
            f"(got {mode!r}); call "
            "quant_market_data_pipeline_spark.session.configure_runtime("
            "spark) first — static mode would wipe untouched partitions"
        )


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the JVM Hadoop API.

    Storage-agnostic: resolves file:/, hdfs://, s3a://, ... from the
    path URI + the session's Hadoop configuration, so partition-level
    metadata operations (listing, directory deletes) run wherever the
    lake actually lives.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _partition_dir_name(spark: SparkSession, partition_col: str, value) -> str:
    """Hive-style partition directory name with Spark's path escaping.

    Spark writes NULL partition values as ``__HIVE_DEFAULT_PARTITION__``
    and escapes special characters (space, colon, percent, ...) via
    ``ExternalCatalogUtils.escapePathName`` — a directory name derived as
    a bare f-string misses the real directory for such values, silently
    leaving a fully-deleted partition's old files in place.
    """
    if value is None:
        return f"{partition_col}=__HIVE_DEFAULT_PARTITION__"
    esc = (
        spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(str(value))
    )
    return f"{partition_col}={esc}"


def _member_of(col, values: list):
    """NULL-safe membership predicate: ``isin`` never matches NULL, so a
    touched-partition list containing None needs an explicit isNull arm."""
    non_null = [v for v in values if v is not None]
    cond = col.isin(non_null) if non_null else F.lit(False)
    if len(non_null) < len(values):
        cond = cond | col.isNull()
    return cond


def _rewrite_parallelism(spark: SparkSession, n_touched: int) -> int:
    """Shuffle-partition count for a surgical partition rewrite.

    ``repartition(1, col)`` funnels EVERY touched partition through one
    task — fine for a few days, serial I/O for a 10,000-partition
    erasure.  Hash-partitioning on the partition column into
    min(n_touched, session shuffle partitions) buckets keeps
    one-file-per-partition (all rows of a value land in one task) while
    letting distinct partitions rewrite in parallel.
    """
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(1, min(n_touched, cap))


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "trading_date",
    ts_col: str | None = "timestamp",
    files_per_partition: int = 1,
) -> None:
    """Idempotent partition-overwrite parquet write.

    Derives ``partition_col`` from ``ts_col`` when absent (to_date);
    repartitions by the partition key so each date lands
    ``files_per_partition`` files (small-file hygiene at scale).
    Requires ``partitionOverwriteMode=dynamic`` (session factory default):
    ``mode("overwrite")`` then only replaces partitions present in ``df``.
    """
    _require_dynamic_overwrite(df.sparkSession)
    out = df
    if partition_col not in df.columns:
        if ts_col is None or ts_col not in df.columns:
            raise ValueError(
                f"need {partition_col!r} or a ts_col to derive it"
            )
        out = df.withColumn(partition_col, F.to_date(F.col(ts_col)))
    out = out.repartition(files_per_partition, F.col(partition_col))
    out.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def read_partitioned(
    spark: SparkSession, path: str, partition_col: str = "trading_date"
) -> DataFrame:
    """Read a partitioned lake table; date predicates on ``partition_col``
    prune directories before any IO (dynamic partition pruning handles the
    join-driven case)."""
    return spark.read.parquet(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    driver: str = "org.postgresql.Driver",
    fetch_size: int = 10_000,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC scan mirroring the reference's Postgres read
    (audit_pipeline.py:92-102) as a DataFrame source (S4 read side).

    ``table`` may be a table name OR a parenthesized pushdown subquery
    (``"(SELECT ... WHERE ...) t"``) — the standard way to push projection
    + selection into the database.  Filters applied to the returned frame
    also push down (Catalyst JDBC pushdown handles =, <, >, IN, ...).

    Parallelism, pick ONE (else the scan is a single connection):
    - ``predicates``: one scan partition per WHERE fragment (e.g. one per
      trading day) — best when the table has a natural range key;
    - ``partition_column``/``lower_bound``/``upper_bound``/
      ``num_partitions``: Spark generates uniform range predicates on a
      numeric/date column.

    ``fetch_size`` overrides the JDBC driver's row-at-a-time default
    cursor (Postgres: 0 = all rows in memory; 10k batches stream).
    Untested against a live database in-container (none available); plan
    construction and option wiring are test-covered.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("fetchsize", str(fetch_size))
    )
    if predicates is not None and partition_column is not None:
        raise ValueError("pass predicates OR partition_column, not both")
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and "
                "num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if predicates is not None:
        # the predicates API lives on the long-form load()
        return spark.read.jdbc(
            url,
            table,
            predicates=predicates,
            properties={
                "driver": driver,
                "fetchsize": str(fetch_size),
                **(options or {}),
            },
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str = "org.postgresql.Driver",
    batch_size: int = 10_000,
    options: dict[str, str] | None = None,
) -> None:
    """JDBC sink mirroring the reference adapter (transform_data.py:199-209)
    with safer defaults: append (not overwrite), explicit batchsize, and
    per-executor parallel writes (one connection per partition).

    Untested in-container (no database); the parquet path above is the
    engine's primary sink.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batch_size))
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "trading_date",
    files_per_partition: int = 1,
    partitions: list | None = None,
) -> None:
    """Small-file compaction: rewrite each (or the given) partition into
    ``files_per_partition`` files.

    Streaming sinks and incremental loads accrete small files (one per
    micro-batch task); scans then pay per-file open/footer costs.  This
    rewrites data unchanged — same dynamic partition-overwrite mechanism
    as ``write_partitioned``, so un-listed partitions are untouched and a
    crash mid-compaction loses nothing (overwrite is per-partition
    atomic-ish via the commit protocol).
    """
    _require_dynamic_overwrite(spark)
    df = spark.read.parquet(path)
    if partitions is not None:
        df = df.filter(F.col(partition_col).isin(partitions))
    (
        df.repartition(files_per_partition, F.col(partition_col))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def upsert_rows(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_col: str = "trading_date",
    ts_col: str | None = "timestamp",
) -> None:
    """Row-level MERGE (upsert) into a partitioned parquet lake.

    Without a table format (Delta/Iceberg) a row update must rewrite
    files; this bounds the rewrite to the TOUCHED PARTITIONS only:
    read just those partitions (partition pruning), anti-join out rows
    whose keys are being replaced, union the updates, and dynamic-
    partition-overwrite exactly those partitions back.  Cost scales with
    the touched partitions, not the table — the practical upsert shape
    for an append-mostly time-partitioned lake.  For heavy random-update
    workloads, use a real table format instead.
    """
    _require_dynamic_overwrite(spark)
    up = updates
    if partition_col not in up.columns:
        if ts_col is None or ts_col not in up.columns:
            raise ValueError(f"updates need {partition_col!r} or {ts_col!r}")
        up = up.withColumn(partition_col, F.to_date(F.col(ts_col)))
    # The touched-partition list is the ONE driver-side collect in the
    # engine; it is bounded by partition count, not rows — but a caller
    # accidentally updating half the table would still materialize a huge
    # list and then rewrite everything.  Cap it: past the cap a full
    # overwrite (or a real table format) is the right tool anyway.
    max_touched = 10_000
    touched = [
        r[0]
        for r in up.select(partition_col).distinct().limit(max_touched + 1).collect()
    ]
    if len(touched) > max_touched:
        raise ValueError(
            f"upsert touches more than {max_touched} {partition_col!r} "
            "partitions; use a bulk overwrite or a table format for "
            "table-scale rewrites"
        )

    current = spark.read.parquet(path).filter(
        _member_of(F.col(partition_col), touched)
    )
    kept = current.join(
        F.broadcast(up.select(*keys).distinct()), keys, "left_anti"
    )
    merged = kept.unionByName(up.select(*kept.columns))
    (
        merged.repartition(
            _rewrite_parallelism(spark, len(touched)), F.col(partition_col)
        )
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def delete_rows(
    spark: SparkSession,
    path: str,
    predicate,
    partition_col: str = "trading_date",
) -> list:
    """Row-level DELETE from a partitioned parquet lake (GDPR erasure).

    Same touched-partition bound as ``upsert_rows``: only partitions that
    actually contain matching rows are rewritten (dynamic partition
    overwrite); untouched partitions keep their files byte-identical.
    ``predicate`` is a Column selecting the rows to REMOVE.  Returns the
    list of rewritten partition values (bounded by the same 10k sanity
    cap — an erasure touching more partitions than that is a bulk
    rewrite job, not a surgical delete).

    SQL DELETE semantics: a row is removed only where the predicate is
    TRUE — NULL-valued predicates (e.g. NULL user_id under
    ``user_id % 100 == 0``) keep the row, consistently in rewritten and
    untouched partitions alike.

    Fully-matching partitions (every row deleted) produce ZERO output
    rows, and dynamic overwrite only replaces partitions that receive
    output — so their old files would silently survive.  Those
    partition directories are removed explicitly through the Hadoop
    FileSystem API after the write.
    """
    _require_dynamic_overwrite(spark)
    current = spark.read.parquet(path)
    # null-safe on both sides of the split: delete where TRUE, keep
    # where FALSE or NULL (SQL DELETE semantics).
    hit = F.coalesce(predicate, F.lit(False))
    max_touched = 10_000
    touched = [
        r[0]
        for r in current.filter(hit)
        .select(partition_col)
        .distinct()
        .limit(max_touched + 1)
        .collect()
    ]
    if len(touched) > max_touched:
        raise ValueError(
            f"delete touches more than {max_touched} {partition_col!r} "
            "partitions; run a bulk rewrite instead"
        )
    if not touched:
        return []
    kept = current.filter(
        _member_of(F.col(partition_col), touched)
    ).filter(~hit)
    # Partitions whose every row matches yield no kept rows; list them
    # BEFORE the write (both collects are bounded by len(touched)).
    kept_parts = {
        r[0] for r in kept.select(partition_col).distinct().collect()
    }
    emptied = [v for v in touched if v not in kept_parts]
    if kept_parts:
        (
            kept.repartition(
                _rewrite_parallelism(spark, len(touched)),
                F.col(partition_col),
            )
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    if emptied:
        fs, root = _hadoop_fs(spark, path)
        jpath = spark._jvm.org.apache.hadoop.fs.Path
        for value in emptied:
            child = jpath(root, _partition_dir_name(spark, partition_col, value))
            if fs.exists(child):
                fs.delete(child, True)
    return touched


def expire_partitions(
    spark: SparkSession,
    path: str,
    cutoff,
    partition_col: str = "trading_date",
) -> list[str]:
    """Retention expiry: drop whole partitions strictly older than
    ``cutoff`` (a value whose string form compares against the
    partition-directory values — ISO dates do).

    Partition-level deletes never touch row data — the directory listing
    identifies expired partitions and removes their directories, which
    is the O(#partitions) retention mechanism every time-partitioned
    lake runs on a schedule.  Returns the removed partition values.

    Storage-agnostic: lists and deletes through the JVM Hadoop
    ``FileSystem`` API, so the same code runs against file:/, hdfs://
    and s3a:// lakes (on S3 a "directory" delete is the bulk object
    delete the committer left under that prefix).
    """
    fs, root = _hadoop_fs(spark, path)
    prefix = f"{partition_col}="
    removed: list[str] = []
    for status in fs.listStatus(root):
        if not status.isDirectory():
            continue
        name = status.getPath().getName()
        if not name.startswith(prefix):
            continue
        value = name[len(prefix):]
        if value < str(cutoff):
            fs.delete(status.getPath(), True)
            removed.append(value)
    return sorted(removed)
