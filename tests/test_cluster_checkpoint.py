"""Exercise connected_components' cluster path for real.

``reliable_checkpoint=True`` swaps ``localCheckpoint`` (executor-storage
truncation, lost on executor failure) for reliable ``checkpoint()`` to a
checkpoint directory — the branch a cluster deployment runs. Until round
4 it was dead code in tests. This runs it under ``local-cluster[2,1,*]``
— Spark's real multi-process cluster harness: a standalone master plus
2 separate worker JVMs with 1 core each, so data genuinely crosses
process boundaries through the reliable checkpoint files — and asserts
the labels are identical to the plain local-mode run.

Runs in a SUBPROCESS: the pytest session owns a long-lived local-mode
SparkSession; a second master in-process would either be rejected or
clobber it. ~40 s of cluster spin-up, so env-gated like the sf0.1
parity suite (SPARK_GRAFT_SLOW_TESTS=1 enables; `make slow-parity` sets it).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

import pytest

# chain 0-1-2-3-4 (multi-hop propagation), clique {10,11,12}, pair {20,21}
PAIRS = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)]
EXPECTED = {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

_DRIVER = textwrap.dedent(
    """
    import json, sys, tempfile
    from pyspark.sql import SparkSession

    pairs = json.loads(sys.argv[1])
    spark = (
        SparkSession.builder.master("local-cluster[2,1,1024]")
        .appName("cc-reliable-ckpt")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as ckpt_dir:
        spark.sparkContext.setCheckpointDir(ckpt_dir)
        from flink_tank_spark.operators.dedup import connected_components

        df = spark.createDataFrame(pairs, ["id_a", "id_b"])
        labels = {
            r.doc_id: r.canon_id
            for r in connected_components(df, reliable_checkpoint=True).collect()
        }
    spark.stop()
    print("LABELS:" + json.dumps(labels))
    """
)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SLOW_TESTS"),
    reason="local-cluster spin-up is slow; set SPARK_GRAFT_SLOW_TESTS=1",
)
def test_reliable_checkpoint_labels_match_local_mode(spark, tmp_path):
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, json.dumps(PAIRS)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("LABELS:")]
    assert line, proc.stdout[-2000:]
    cluster_labels = {int(k): v for k, v in json.loads(line[0][7:]).items()}
    assert cluster_labels == EXPECTED

    # same graph through the default local path on the session fixture
    from flink_tank_spark.operators.dedup import connected_components

    df = spark.createDataFrame(PAIRS, ["id_a", "id_b"])
    local_labels = {r.doc_id: r.canon_id for r in connected_components(df).collect()}
    assert local_labels == cluster_labels
