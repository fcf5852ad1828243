"""Storage layer: Iceberg when its runtime jar is on the classpath,
partitioned parquet otherwise — one interface either way (SURVEY §7.1).

The sandbox image has no Iceberg jar, so the parquet path is first-class:
identical schema, hive-style ``tier=K/bucket=B`` layout (partition pruning
on both columns), and atomic per-partition commits via temp-dir + rename
used by plans/checkpoint.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def s3_available(spark: SparkSession) -> bool:
    """True when the hadoop-aws S3A filesystem is on the classpath
    (absent in this sandbox — the s3 surface is jar-gated exactly like
    Iceberg; injection = add hadoop-aws + aws-sdk-bundle jars)."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:
        return False


def s3a_path(location: str, spark: SparkSession | None = None,
             keep_scheme: bool = False) -> str:
    """Normalize an S3 URI scheme to the client Spark/Hadoop will
    actually use: ``s3://`` and the legacy ``s3n://`` map to ``s3a://``
    (reference parity: caits loaders address buckets with plain s3 URLs;
    on vanilla Spark the S3A connector is the supported client).

    The rewrite is GATED (ADVICE r6): if the live hadoop conf binds a
    dedicated filesystem to the caller's scheme (``fs.s3.impl`` /
    ``fs.s3n.impl`` — on EMR that is EMRFS, the supported,
    consistency-tuned client there), the scheme is preserved — forcing
    s3a would swap the filesystem implementation, committer, and
    credential chain behind the caller's back. ``keep_scheme=True``
    skips normalization unconditionally."""
    if keep_scheme:
        return location
    for scheme, impl_key in (("s3://", "fs.s3.impl"), ("s3n://", "fs.s3n.impl")):
        if location.startswith(scheme):
            if spark is not None:
                try:
                    conf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
                    if conf.get(impl_key, ""):
                        return location  # dedicated handler bound (e.g. EMRFS)
                except Exception:
                    # Spark Connect sessions expose no sparkContext/_jsc
                    # (ADVICE r7): fall back to the unconditional rewrite
                    # rather than failing the read/write
                    pass
            return "s3a://" + location[len(scheme):]
    return location


def configure_s3(
    spark: SparkSession,
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style: bool = False,
    anonymous: bool = False,
) -> None:
    """Set the S3A client config on the live session's hadoop conf.

    Defaults follow the provider chain (env vars / instance profile —
    the right setup on a real cluster); pass ``endpoint``/``path_style``
    for S3-compatible stores (MinIO, Ceph), explicit keys for static
    credentials, or ``anonymous=True`` for public buckets. Settings are
    cluster-wide and take effect for filesystems opened AFTER the call."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    if endpoint is not None:
        conf.set("fs.s3a.endpoint", endpoint)
    if access_key is not None:
        conf.set("fs.s3a.access.key", access_key)
    if secret_key is not None:
        conf.set("fs.s3a.secret.key", secret_key)
    if path_style:
        conf.set("fs.s3a.path.style.access", "true")
    if anonymous:
        conf.set(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider",
        )


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """Read a table: ``iceberg:catalog.db.tbl``, an ``s3://``/``s3a://``
    object-store prefix (jar-gated, see :func:`s3_available`), or a
    parquet path/dir."""
    if location.startswith("iceberg:"):
        return spark.read.format("iceberg").load(location[len("iceberg:") :])
    return spark.read.parquet(s3a_path(location, spark))


def write_table(
    df: DataFrame,
    location: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    if location.startswith("iceberg:"):
        tbl = location[len("iceberg:") :]
        if mode == "append":
            df.writeTo(tbl).append()
        else:
            df.writeTo(tbl).createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(s3a_path(location, df.sparkSession))


def read_sequences(spark: SparkSession, location: str) -> DataFrame:
    """Input_hint table (doc_id, tokens, n_tok, source) from storage."""
    df = read_table(spark, location)
    return df.select("doc_id", "tokens", "n_tok", "source")


def ensure_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def load_json(spark, path: str):
    """json_loader parity (caits/loading): spark.read.json with schema
    inference disabled-by-sample (cluster-friendly: one pass)."""
    return spark.read.json(path)


def load_yaml_config(path: str) -> dict:
    """load_yaml_config parity (caits/experiment config loading). The
    sandbox has no pyyaml; covers the reference's flat `key: value` configs
    (str/int/float/bool) — nested YAML needs the real parser."""
    out: dict = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            k, v = line.split(":", 1)
            v = v.strip().strip("'\"")
            if v.lower() in ("true", "false"):
                out[k.strip()] = v.lower() == "true"
            else:
                try:
                    out[k.strip()] = int(v)
                except ValueError:
                    try:
                        out[k.strip()] = float(v)
                    except ValueError:
                        out[k.strip()] = v
    return out
