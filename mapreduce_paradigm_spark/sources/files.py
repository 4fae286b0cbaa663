"""Delimited / JSON file sources and sinks.

The reference reads only raw text files (src/main.cpp:232-242); the
generalized engine adds the standard columnar-adjacent interchange formats.
Design rules for 100 TB:

- ALWAYS pass an explicit schema: ``inferSchema``/sampling re-reads the
  input and produces drifting types — a schema is part of the contract.
- CSV/JSON are ingest/egress formats, not processing formats: land them,
  convert to parquet early, keep plans on the columnar path (pushdown,
  vectorized reads, stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Schema-explicit CSV scan (PERMISSIVE mode: malformed rows become
    nulls rather than failing the 100 TB job; route them to a quarantine
    column with ``columnNameOfCorruptRecord`` if auditing is needed)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV scan with a QUARANTINE column: malformed rows land with their
    raw line preserved in ``_corrupt_record`` (and typed fields NULL)
    instead of silently nulling (plain PERMISSIVE) or killing the job
    (FAILFAST). The 100 TB posture: ingest never stops for bad rows, but
    every bad row is auditable — filter ``_corrupt_record IS NOT NULL``
    into a quarantine sink and alert on its volume. The schema string
    must NOT include the corrupt column; it is appended here. Caveat
    (Spark contract): a query that selects ONLY _corrupt_record must
    cache or materialize first — Spark refuses the corrupt-only
    projection on an uncached scan."""
    full = schema + ", _corrupt_record STRING"
    return (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite").option("header", str(header).lower())
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Schema-explicit JSON-lines scan (one object per line — the only JSON
    layout that splits across executors; multiline documents serialize the
    whole file through one task)."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_json_multiline(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Multiline JSON scan (a file holding one JSON array / pretty-printed
    objects — the layout REST-API dumps and config exports arrive in).
    Unlike JSONL, a multiline document is NOT splittable: the whole file
    parses in one task, so this source is for many-small-files corpora
    (parallelism = file count, the binaryFile pattern), never one big
    array — repack those to JSONL/parquet at ingest. Schema-explicit for
    the same reasons as read_jsonl; corrupt records surface in the
    standard ``_corrupt_record`` column if added to the schema
    (PERMISSIVE default) rather than failing the scan."""
    return spark.read.schema(schema).option("multiLine", "true").json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink; ``partition_by`` yields hive-style directories that
    Catalyst partition-prunes (the scale form of the reference's 26
    per-letter files, src/main.cpp:156-162)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """ORC scan — the other columnar interchange format (Hive-ecosystem
    counterpart to parquet; vectorized reader, predicate pushdown, and
    column pruning all apply). Schema optional: ORC embeds its schema, so
    unlike CSV/JSON there is no inference re-read; pass one to pin the
    contract anyway when reading third-party data."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Opaque-media ingest via the built-in ``binaryFile`` source: one row
    per file with (path, modificationTime, length, content BINARY) — the
    landing step for image/audio/video corpora before the multimodal
    featurizers (operators/multimodal.py) take over. ``pathGlobFilter``
    prunes at LISTING time (non-matching files are never opened), and each
    file is one task input — at 100 TB of small media files, compact the
    landing zone into parquet (payload BINARY + metadata) with
    ``with_binary_payload``-shaped rows early, exactly like CSV→parquet.

    NOTE: Avro is the one interchange format NOT wired here — Spark ships
    it as an external module (spark-avro jar), absent from this container
    with no network to fetch it; probed round 3 (``Failed to find data
    source: avro``). The read/write helpers would mirror read_orc/write_orc
    one-for-one when the jar is present."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: StructType | str | None = None,
) -> DataFrame:
    """XML scan via the Spark 4 NATIVE xml source (the spark-xml package
    folded into core): each ``rowTag`` element becomes a row, attributes
    and child elements become columns. Schema strongly recommended for
    third-party feeds — XML inference re-reads the data and infers unions
    loosely; an explicit schema also keeps column pruning effective (only
    projected fields are parsed)."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    partition_by: list[str] | None = None,
) -> None:
    w = (
        df.write.mode("overwrite")
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def save_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: pre-shuffles data into ``num_buckets`` by
    ``bucket_col`` at WRITE time, so every later equi-join or aggregation
    on that key runs with NO exchange — the amortize-one-shuffle-forever
    strategy for hot join keys (fact tables joined every query). Both join
    sides must agree on (col, num_buckets)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    partition_by: list[str] | None = None,
) -> None:
    """Layout-optimized parquet: sort rows WITHIN each output partition by
    ``sort_cols`` before writing. Parquet stores per-row-group min/max
    statistics; a sorted layout makes those ranges narrow and disjoint, so
    later range/point predicates on the sort key skip whole row groups at
    scan time (the poor man's Z-order — the single most effective 100 TB
    data-skipping lever after partition pruning). ``sortWithinPartitions``
    is a per-partition sort, NOT a global exchange: no extra shuffle is
    added to the write. For multi-dimensional skipping, put the highest-
    selectivity column first; for two hot dimensions, consider
    ``repartitionByRange`` on one + sort on the other."""
    w = df.sortWithinPartitions(*sort_cols).write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def zorder_key_expr(x: str, y: str, bits: int = 10) -> str:
    """Portable SQL fragment interleaving the low ``bits`` bits of two
    non-negative BIGINT expressions (x → even bit positions, y → odd): a
    Z-order / Morton key. Pure floor/div/mod arithmetic, so the same string
    is valid Spark SQL and DuckDB SQL — `queries/warehouse.py` shares it
    verbatim between the registered query and its oracle."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(CAST(floor(({x}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i)}"
        )
        terms.append(
            f"(CAST(floor(({y}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i + 1)}"
        )
    return " + ".join(terms)


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    bits: int = 10,
    num_partitions: int | None = None,
) -> None:
    """Z-order-clustered parquet layout: cluster rows by the Morton
    interleave of two integer dimensions so parquet row-group min/max
    statistics become narrow on BOTH columns — point/range predicates on
    either dimension skip most row groups at scan time (what Delta/Iceberg
    ``OPTIMIZE ZORDER BY`` does, built from plain Catalyst arithmetic).

    One range shuffle on the derived key (``repartitionByRange`` keeps
    files balanced even when the key distribution is skewed) + an in-
    partition sort; the key column is projected away before the write, so
    the layout is invisible to readers except through the stats. Compare
    ``write_sorted_parquet``: sorting one column leaves the other with
    full-range row-group spans — the footer-stats test pins the
    difference. At 100 TB, choose ``bits`` so 2^(2·bits) ≫ row-group
    count, and mod/bucket raw values into the 2^bits domain first (done
    here) — Z-order locality only needs the low bits to vary."""
    from pyspark.sql import functions as F

    key = zorder_key_expr(
        f"({col_x}) % {1 << bits}", f"({col_y}) % {1 << bits}", bits
    )
    zdf = df.withColumn("__zkey", F.expr(key))
    if num_partitions:
        zdf = zdf.repartitionByRange(num_partitions, "__zkey")
    else:
        zdf = zdf.repartitionByRange("__zkey")
    zdf.sortWithinPartitions("__zkey").drop("__zkey").write.mode(
        "overwrite"
    ).parquet(path)


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: ``mergeSchema=true`` unions the schemas of
    every parquet footer under ``path`` (new columns appear as NULL in old
    files) — the additive-evolution contract a long-lived 100 TB dataset
    needs as producers add fields. Cost note: merging reads every file
    footer at planning time, so datasets evolve behind a table format or a
    pinned explicit schema once footer counts reach the millions; column
    RENAMES and type changes are NOT evolution (they fork the dataset) —
    only additions are."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: list[tuple[str, int, int, str]],
) -> DataFrame:
    """Fixed-width text reader (COBOL/mainframe export layout): each
    ``(name, start, length, type)`` spec — 1-based start, inclusive length —
    becomes ``trim(substring(line, start, length)) :: type``. The whole
    record parse is one projection of JVM substring/cast expressions over
    ``spark.read.text``: no UDF, no regex, whole-stage codegen, and the
    line scan parallelizes by file split exactly like CSV. Types use the
    PERMISSIVE philosophy of read_csv via try_cast — a malformed numeric
    field becomes NULL, never a job failure at terabyte scale; route
    NULL-bearing rows to quarantine downstream if auditing is required.
    """
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    return raw.select(
        *[
            F.expr(
                f"try_cast(trim(substring(value, {start}, {length})) AS {dtype})"
            ).alias(name)
            for name, start, length, dtype in colspecs
        ]
    )
