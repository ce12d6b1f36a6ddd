"""Measure the shuffle-write reduction from hashing the curation
shuffle keys (VERDICT r7 #5): llm_ngram_novelty shuffles
xxhash64(gram) and llm_chunk_dedup shuffles xxhash64(chunk) instead
of the raw strings.  Runs each query both ways on the same fixtures,
asserts the reports are IDENTICAL (64-bit collisions are vanishingly
unlikely at any feasible corpus and never resolved), and prints one
JSON line per query with the measured shuffle-write bytes.

Shuffle bytes come from the Spark UI REST API (stage-level
shuffleWriteBytes, summed over the stages each run adds), so the tool
builds its own UI-enabled session.

Usage: python tools/measure_curation_keys.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession  # noqa: E402

from pg_telemetry_spark.session import RUNTIME_CONFS, prepare_session  # noqa: E402


def _session() -> SparkSession:
    builder = (
        SparkSession.builder.master("local[*]")
        .appName("measure-curation-keys")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return prepare_session(spark)


def _shuffle_write_bytes(spark: SparkSession) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=COMPLETE"
    with urllib.request.urlopen(url) as resp:
        stages = json.load(resp)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "scaledata" / "sf1")
    spark = _session()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    from pg_telemetry_spark.queries.curation import (
        _chunk_dedup_report,
        _novelty_report,
    )

    for name, build in (
        ("llm_ngram_novelty", _novelty_report),
        ("llm_chunk_dedup", _chunk_dedup_report),
    ):
        results = {}
        bytes_used = {}
        for label, hash_keys in (("raw_keys", False), ("hashed_keys", True)):
            before = _shuffle_write_bytes(spark)
            rows = build(docs, hash_keys=hash_keys).collect()
            bytes_used[label] = _shuffle_write_bytes(spark) - before
            results[label] = sorted(tuple(r) for r in rows)
        assert results["raw_keys"] == results["hashed_keys"], (
            f"{name}: hashed-key report differs from raw-key report"
        )
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "shuffle_write_bytes_raw": bytes_used["raw_keys"],
                    "shuffle_write_bytes_hashed": bytes_used["hashed_keys"],
                    "reduction": round(
                        1 - bytes_used["hashed_keys"] / max(bytes_used["raw_keys"], 1),
                        4,
                    ),
                    "results_identical": True,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
