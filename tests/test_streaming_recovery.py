"""Kill-and-restart exactly-once (VERDICT round-1 item 5 / SURVEY §5.5).

The reference marks files imported at job LAUNCH (BucketToBigQuery.js:
390-397 via index.js:88-89), so a crash between launch and completion
loses data permanently. The Spark-native design must survive the worst
crash point — AFTER a batch's sink write, BEFORE its checkpoint commit —
with neither loss nor duplication. This test injects exactly that crash
deterministically and restarts.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

BASE = "/tmp/b2bqs_test_recovery"


@pytest.fixture()
def workdir():
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    yield BASE
    shutil.rmtree(BASE, ignore_errors=True)


def test_exactly_once_across_midstream_crash(spark, workdir):
    from pyspark.sql import functions as F

    # source: 6 files, forced into 3 micro-batches of 2 files
    src = f"{workdir}/src"
    df = spark.range(600).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    df.repartition(6).write.parquet(src)
    schema = spark.read.parquet(src).schema

    sink = f"{workdir}/sink"
    crashed_marker = f"{workdir}/crashed"

    from bucket_to_bigquery_spark.streaming import idempotent_batch_writer

    inner = idempotent_batch_writer(sink)

    def crashing_writer(batch_df, batch_id: int) -> None:
        inner(batch_df, batch_id)
        if batch_id == 1 and not os.path.exists(crashed_marker):
            with open(crashed_marker, "w") as fh:
                fh.write("x")
            # crash AFTER the write, BEFORE the checkpoint commit — the
            # exact hazard window the reference gets wrong in reverse
            raise RuntimeError("injected crash between write and commit")

    def run() -> None:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
            .writeStream.foreachBatch(crashing_writer)
            .option("checkpointLocation", f"{workdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(Exception, match="injected crash"):
        run()
    # batch 1's data was WRITTEN but not committed
    assert os.path.exists(f"{sink}/batch=1")

    run()  # restart: re-attempts batch 1 (overwrite), continues to batch 2

    out = spark.read.option("recursiveFileLookup", True).parquet(sink)
    assert out.count() == 600  # nothing lost
    assert out.select("id").distinct().count() == 600  # nothing duplicated

    # a further restart with nothing new is a no-op
    n_files = len(glob.glob(f"{sink}/**/*.parquet", recursive=True))
    run()
    assert len(glob.glob(f"{sink}/**/*.parquet", recursive=True)) == n_files
