"""Cross-PROCESS TxnTable contention: two real OS processes (separate
JVMs, separate Spark drivers) race appends that each evolve the schema
with a different new column.

The in-process thread tests (test_txn.py) prove the hard-link commit
protocol serializes within one interpreter; this test proves the same
with no shared Python state at all — the only coordination surface is
the filesystem, exactly as it would be for two executors-turned-writers
or two jobs on a shared table at 100 TB. Asserts:

  * every commit from both writers lands (version count, no lost rows)
  * the merged logical schema at the log head contains BOTH writers'
    added columns (the round-3 advisor's append_idempotent schema-drop
    hazard, fixed in 74404d2, re-checked here across processes)
  * each writer's column values survive with nulls only where expected
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from spark_data_engineering_spark.sources.txn import TxnTable  # noqa: E402

_CHILD = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from spark_data_engineering_spark.session import get_spark
from spark_data_engineering_spark.sources.txn import TxnTable

root, writer_id, n_appends, barrier = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
spark = get_spark(f"txn-mp-{writer_id}", master="local[2]", shuffle_partitions=2)
table = TxnTable(root, "shared")

# Signal ready, then spin until the parent opens the gate so both
# writers' commit loops genuinely overlap (not sequential JVM startups).
open(os.path.join(barrier, f"ready-{writer_id}"), "w").close()
deadline = time.time() + 120
while not os.path.exists(os.path.join(barrier, "go")):
    if time.time() > deadline:
        raise SystemExit("barrier timeout")
    time.sleep(0.05)

for i in range(n_appends):
    df = spark.range(i * 10, i * 10 + 10).select(
        F.col("id"),
        F.lit(writer_id).alias("writer"),
        F.lit(i).alias(f"col_{writer_id}"),  # writer-specific column
    )
    table.append(df)
print("CHILD_OK", table.version())
"""


def test_two_process_schema_evolving_appends(tmp_path, spark):
    root = str(tmp_path / "tables")
    barrier = str(tmp_path / "barrier")
    os.makedirs(root)
    os.makedirs(barrier)
    child_py = str(tmp_path / "child.py")
    with open(child_py, "w") as f:
        f.write(_CHILD)

    n_appends = 4
    env = dict(os.environ, SPARK_DRIVER_MEMORY="2g")
    procs = [
        subprocess.Popen(
            [sys.executable, child_py, root, wid, str(n_appends), barrier],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for wid in ("a", "b")
    ]
    # Wait for both children to reach the barrier, then release together.
    deadline = time.time() + 180
    while not all(
        os.path.exists(os.path.join(barrier, f"ready-{w}")) for w in ("a", "b")
    ):
        if time.time() > deadline:
            for p in procs:
                p.kill()
            raise AssertionError("children never reached the barrier")
        time.sleep(0.1)
    open(os.path.join(barrier, "go"), "w").close()

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-2000:]
    assert all("CHILD_OK" in o for o in outs), outs

    table = TxnTable(root, "shared")
    # Every commit serialized to its own version — none lost, none doubled.
    assert table.version() == 2 * n_appends
    # The log-head logical schema merged BOTH writers' added columns.
    cols = {f["name"] for f in table.table_schema()}
    assert {"id", "writer", "col_a", "col_b"} <= cols
    # No lost rows; each writer's column survives on its own rows only.
    df = table.read(spark)
    rows = df.count()
    assert rows == 2 * n_appends * 10
    import pyspark.sql.functions as F

    per = {
        r["writer"]: (r["n"], r["a_nn"], r["b_nn"])
        for r in df.groupBy("writer")
        .agg(
            F.count("*").alias("n"),
            F.count("col_a").alias("a_nn"),
            F.count("col_b").alias("b_nn"),
        )
        .collect()
    }
    assert per["a"] == (n_appends * 10, n_appends * 10, 0)
    assert per["b"] == (n_appends * 10, 0, n_appends * 10)


_CHILD_IDEM = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from spark_data_engineering_spark.session import get_spark
from spark_data_engineering_spark.sources.txn import TxnTable

root, writer_id, barrier = sys.argv[1], sys.argv[2], sys.argv[3]
spark = get_spark(f"txn-idem-{writer_id}", master="local[2]", shuffle_partitions=2)
table = TxnTable(root, "shared")

open(os.path.join(barrier, f"ready-{writer_id}"), "w").close()
deadline = time.time() + 120
while not os.path.exists(os.path.join(barrier, "go")):
    if time.time() > deadline:
        raise SystemExit("barrier timeout")
    time.sleep(0.05)

# both processes race the SAME (app, epoch) for each of 3 epochs — the
# zombie-executor / speculative-retry shape. At most one commit may land
# per epoch across BOTH processes.
landed = []
for epoch in range(3):
    df = spark.range(epoch * 10, epoch * 10 + 10).select(
        F.col("id"), F.lit(writer_id).alias("writer")
    )
    v = table.append_idempotent(df, "stream-app", epoch)
    landed.append(v is not None)
print("CHILD_LANDED", sum(landed))
"""


def test_two_process_idempotent_epoch_race(tmp_path, spark):
    """Two real processes replay the SAME (app, epoch) sequence — the
    zombie-executor shape Delta's txnAppId/txnVersion exists for. For
    each epoch exactly ONE commit may land across both processes, and
    the table must contain each epoch's rows exactly once."""
    root = str(tmp_path / "tables")
    barrier = str(tmp_path / "barrier")
    os.makedirs(root)
    os.makedirs(barrier)
    child_py = str(tmp_path / "child.py")
    with open(child_py, "w") as f:
        f.write(_CHILD_IDEM)

    env = dict(os.environ, SPARK_DRIVER_MEMORY="2g")
    procs = [
        subprocess.Popen(
            [sys.executable, child_py, root, wid, barrier],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for wid in ("a", "b")
    ]
    deadline = time.time() + 180
    while not all(
        os.path.exists(os.path.join(barrier, f"ready-{w}")) for w in ("a", "b")
    ):
        if time.time() > deadline:
            for p in procs:
                p.kill()
            raise AssertionError("children never reached the barrier")
        time.sleep(0.1)
    open(os.path.join(barrier, "go"), "w").close()

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-2000:]

    table = TxnTable(root, "shared")
    # exactly 3 commits total (one per epoch), regardless of who won each
    assert table.version() == 3
    assert table.last_epoch("stream-app") == 2
    df = table.read(spark)
    assert df.count() == 30  # each epoch's 10 rows exactly once
    ids = sorted(r.id for r in df.select("id").collect())
    assert ids == list(range(30))
