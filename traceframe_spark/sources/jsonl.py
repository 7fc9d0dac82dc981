"""Schema-checked JSONL ingestion with corrupt-record quarantine.

Real feeds contain garbage: truncated lines from crashed collectors,
mixed-in log output, encoding damage. Dropping them silently (DROPMALFORMED)
destroys the audit trail; failing the job (FAILFAST) lets one bad line
stall a 100 TB backfill. The production shape is PERMISSIVE parsing with
the raw text of every unparseable line captured in a corrupt-record
column, split into (valid rows, quarantined raw lines) so the pipeline
proceeds while the quarantine is triaged.

Spark caveat encoded here: a query that selects ONLY the corrupt-record
column is disallowed (the parser would skip parsing entirely), so the
split materializes the parsed frame once via cache — documented Spark
behavior, see SQL migration guide on ``columnNameOfCorruptRecord``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl_quarantined(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine): ``valid`` has exactly ``schema``'s columns;
    ``quarantine`` is one column ``raw`` holding each unparseable line
    verbatim. If ``quarantine_path`` is given, the quarantine is also
    appended there as text for out-of-band triage."""
    if any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema already contains {CORRUPT_COL}")
    # new StructType, not schema.add(...) — add() mutates the caller's schema
    aug = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    parsed = (
        spark.read.schema(aug)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()
    )
    valid = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    if quarantine_path is not None:
        quarantine.select(F.col("raw").alias("value")).write.mode("append").text(
            quarantine_path
        )
    # the cache must not outlive its consumers: release when BOTH
    # returned frames are garbage-collected (a backfill looping over
    # many inputs would otherwise pin every parsed dataset for the
    # session lifetime). Early release only costs a re-parse.
    import weakref

    def _release(jdf=parsed._jdf):
        try:
            jdf.unpersist(False)
        except Exception:  # noqa: BLE001 — session may already be gone
            pass

    keep = {"holders": 2}

    def _on_gc():
        keep["holders"] -= 1
        if keep["holders"] <= 0:
            _release()

    weakref.finalize(valid, _on_gc)
    weakref.finalize(quarantine, _on_gc)
    return valid, quarantine


def spans_from_jsonl(
    spark: SparkSession, path: str, quarantine_path: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Flat span-feed JSONL (the collector wire shape used by the
    streaming reader) as a batch read with quarantine."""
    from traceframe_spark.streaming.spans import SPAN_FEED_SCHEMA

    return read_jsonl_quarantined(spark, path, SPAN_FEED_SCHEMA, quarantine_path)
