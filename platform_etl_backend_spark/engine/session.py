"""SparkSession factory with scale-oriented defaults.

Reference parity: ``spark/Helpers.scala:72-102`` (getOrCreateSparkSession
builds a SparkConf from config key/value pairs) and
``literature/Literature.scala:18-31`` (per-step session conf overrides).

Design-for-100TB notes
----------------------
- AQE is on by default (the reference predates the AQE culture; SURVEY §4
  calls out enabling it): runtime coalescing of shuffle partitions, skew-join
  splitting, and SMJ→BHJ conversion are all free wins at cluster scale.
- ``spark.sql.shuffle.partitions`` defaults low for local testing but is a
  plain conf knob — on a 1000-executor cluster set it (or rely on AQE
  ``advisoryPartitionSizeInBytes``) so post-shuffle partitions land in the
  128-256MB sweet spot.
- Arrow is enabled for the few pandas_udf paths (Monte-Carlo, multimodal).
- Session timezone pinned to UTC so timestamp semantics don't depend on the
  machine the driver runs on.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Mapping

from pyspark.sql import SparkSession

# Reference session conf (reference.conf:16-20) carried over, plus
# scale-oriented additions.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.broadcastTimeout": "3000",
    "spark.driver.maxResultSize": "0",
    "spark.sql.debug.maxToStringFields": "2000",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    # Read ntz parquet timestamps as TIMESTAMP_NTZ so values are not
    # reinterpreted through the session zone (testdata is written ntz).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    # Split small single-file inputs down to row-group granularity so local
    # CPU-heavy stages parallelize; on a real cluster inputs are many files
    # and this floor is a no-op.
    "spark.sql.files.minPartitionNum": "32",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "platform-etl-backend-spark",
    master: str | None = None,
    extra_conf: Mapping[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    ``master`` falls back to ``local[$SPARK_GRAFT_CPUS]`` for local runs; on
    a real cluster leave it None and let spark-submit supply it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


@contextlib.contextmanager
def session_scoped_conf(spark: SparkSession, conf: Mapping[str, str]) -> Iterator[SparkSession]:
    """Temporarily override runtime SQL conf, restoring on exit.

    PySpark-native equivalent of the reference's per-step session rebuild
    (``Literature.scala:18-31`` sets ``spark.sql.mapKeyDedupPolicy=LAST_WIN``
    for one step only): runtime-settable confs are scoped, not baked into a
    new session.
    """
    saved: dict[str, str | None] = {}
    for k, v in conf.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
