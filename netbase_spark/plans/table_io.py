"""Table-format seam for stage snapshots: parquet directories in the
sandbox, Iceberg tables on a real cluster.

The reference persists its graph with binary array snapshots
(``save()``, src/export.cpp:5-47); the Spark-first equivalent
(SURVEY.md §2.1) is ``df.writeTo(<table>).createOrReplace()`` against
an Iceberg catalog — atomic snapshot commits, readable-while-writing,
and time-travel for resume.  This sandbox has no Iceberg runtime jars,
so the shipped default is a plain parquet snapshot directory with a
``_SUCCESS`` marker (same atomicity contract from the committer); the
Iceberg path below is the exact call a cluster deployment flips on by
configuring a catalog, and it fails loudly — never silently — when the
runtime is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_PREFIX = "org.apache.iceberg.spark.Spark"  # SparkCatalog / SparkSessionCatalog


def iceberg_catalogs(spark: SparkSession) -> list[str]:
    """Names of configured Iceberg catalogs (``spark.sql.catalog.<name>``
    set to SparkCatalog or SparkSessionCatalog); [] in the parquet
    sandbox.  Checks both the static SparkConf and the runtime SQL conf
    (``SET``) — catalogs registered after session start never appear in
    ``sparkContext.getConf()``."""
    pairs = dict(spark.sparkContext.getConf().getAll())
    pairs.update(
        (r["key"], r["value"])
        for r in spark.sql("SET").collect()
        if r["key"].startswith("spark.sql.catalog.")
    )
    return sorted(
        k.split(".")[3]
        for k, v in pairs.items()
        if k.startswith("spark.sql.catalog.")
        and k.count(".") == 3
        and v.startswith(ICEBERG_CATALOG_PREFIX)
    )


def write_snapshot(
    df: DataFrame, target: str, fmt: str = "parquet", partition_by: list[str] | None = None
) -> None:
    """Materialize one stage snapshot.

    fmt="parquet": ``target`` is a directory; overwrite in place.
    fmt="iceberg": ``target`` is a catalog-qualified table identifier;
    ``writeTo(...).createOrReplace()`` commits an atomic Iceberg
    snapshot (the resume checkpoint).  Raises RuntimeError with the
    missing-runtime explanation if no Iceberg catalog is configured.
    """
    if fmt == "parquet":
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)
        return
    if fmt == "iceberg":
        spark = df.sparkSession
        if not iceberg_catalogs(spark):
            raise RuntimeError(
                "fmt='iceberg' requires an Iceberg catalog "
                "(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog "
                "+ the iceberg-spark-runtime jar); none is configured in "
                "this session. The sandbox default is fmt='parquet'."
            )
        w = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return
    raise ValueError(f"unknown snapshot format: {fmt!r}")


def read_snapshot(spark: SparkSession, target: str, fmt: str = "parquet") -> DataFrame:
    """Re-open a stage snapshot written by :func:`write_snapshot`."""
    if fmt == "parquet":
        return spark.read.parquet(target)
    if fmt == "iceberg":
        return spark.read.table(target)
    raise ValueError(f"unknown snapshot format: {fmt!r}")
