"""SparkSession construction with scale-conscious defaults.

The session the *driver* passes into ``queries()`` callables is not built
here; for that path :func:`tune` applies the runtime-settable subset of the
same configuration.  ``build_session`` is used by tests and ``bench.py``.

Design notes for the 100 TB posture (tested on local[32]):

* AQE on — runtime coalescing of shuffle partitions, skew-join splitting and
  broadcast-join demotion replace hand-tuned partition counts when the same
  plans run on a 1000-executor cluster.
* shuffle partitions sized for the local harness; on a real cluster AQE's
  ``advisoryPartitionSizeInBytes`` makes the static number mostly irrelevant.
* Arrow enabled — every pandas_udf / mapInPandas boundary is Arrow-batched
  (row-at-a-time Python UDFs are banned in this codebase).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf that must be set before the JVM starts.
_BUILD_TIME_CONF = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # r13 (guide §3.1/§9): let the planner pick shuffled-hash join when its
    # size conditions hold and let AQE rewrite SMJ->SHJ at runtime when
    # every post-shuffle partition is under the local-map threshold. SMJ
    # stays the fallback above the threshold (spill-graceful at 100 TB).
    # Measured r13 (flip-flop interleaved A/B with per-rep calibration,
    # sf0.1/local[32]): parity on every join-bearing suite entry (q20
    # 1.18 vs 1.16 s, q3 0.82 vs 0.82, ks_drift 0.50 vs 0.53, minhash
    # 10.8 vs 12.0, q5 1.27 vs 1.23 — shj vs smj medians); sequential
    # same-mode A/Bs that suggested large deltas were external-host-load
    # artifacts (calibration swung 0.09-1.2 s within minutes).
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.showConsoleProgress": "false",
    "spark.ui.enabled": "false",
    # events.parquet stores TIMESTAMP(NANOS) which Spark cannot read natively;
    # read as long (ns since epoch) and convert in tables.table().
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Python Data Source API filter pushdown (vmhub_datasource.pushFilters)
    "spark.sql.python.filterPushdown.enabled": "true",
}

# Conf that is runtime-settable on an existing session (e.g. the driver's).
_RUNTIME_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.python.filterPushdown.enabled": "true",
    # see _BUILD_TIME_CONF — runtime-settable, so the driver's externally
    # built session gets the same join planning.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
}


def build_session(app_name: str = "vmhub-spark", master: str | None = None) -> SparkSession:
    """Build a tuned local session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _BUILD_TIME_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable config subset to an externally built session.

    Called at the top of every catalog query so results are deterministic
    (UTC timestamps) and plans adaptive, no matter who built the session.
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build — keep going
    return spark
