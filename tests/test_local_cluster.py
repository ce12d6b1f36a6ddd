"""Multi-process executor smoke: the one execution-mode axis a
``local[*]`` session can never exercise (VERDICT r12 #1).

``local-cluster[n,cores,mem]`` runs REAL separate executor JVMs with
their own Python workers, which is where pickled-by-reference UDFs
(every Arrow kernel in operators/) fail unless the engine ships its
source (``session.ship_package``, added after the round-13
local-cluster sweep found exactly that: ModuleNotFoundError on 6
Arrow-kernel ops).  This test pins the shipping path: it spawns a
SUBPROCESS (one SparkContext per Python process — the suite's shared
local[*] session cannot coexist with a cluster one) that builds a
plain local-cluster session, routes it through ``prepare_session``
the way any driver-contract consumer does, and runs an Arrow-kernel
op end-to-end.

The full-registry (315-op at r15) local-cluster archive lives in
CORRECTNESS_LOCALCLUSTER_r13.json; this is the fast per-commit guard.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local-cluster[2,2,1024]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from pg_telemetry_spark.registry import all_queries

reg = all_queries()
# agg_tdigest: applyInPandas with a module-level kernel — the exact
# pickled-by-reference shape that dies without ship_package
rows = reg["agg_tdigest"].fn(spark, {sf!r}).collect()
assert len(rows) > 0, "tdigest returned no rows under local-cluster"
# llm_ann_lsh (r14): the multi-table bucket-code kernel is a closure
# over module state (_bucket_code_rows) — a second, different
# pickling shape through the same shipping path
rows2 = reg["llm_ann_lsh"].fn(spark, {sf!r}).collect()
assert len(rows2) > 0, "multi-table LSH returned no rows under local-cluster"
spark.stop()
print("LOCAL_CLUSTER_OK", len(rows) + len(rows2))
"""


def test_arrow_kernel_runs_on_separate_executors():
    sf = "/root/testdata/sf0.001"
    script = _SCRIPT.format(repo=str(REPO), sf=sf)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
    )
    assert proc.returncode == 0 and "LOCAL_CLUSTER_OK" in proc.stdout, (
        f"local-cluster smoke failed\nstdout: {proc.stdout[-1500:]}\n"
        f"stderr: {proc.stderr[-1500:]}"
    )
