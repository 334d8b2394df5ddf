"""Incremental view maintenance under the correctness gate: a daily
revenue aggregate maintained purely from the txn table's change feed —
across two appends and a delete — must hash-match the one-shot SQL
aggregate over the same surviving rows. This is the end-to-end proof
that delta folding (insert +x / delete -x, decimal sums) reproduces a
full recompute exactly (pipeline/incremental.py; reference analog: the
full-reload gold build in etl/utils/base_table.py, re-expressed as
maintenance instead of recompute)."""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.cacheutil import claim
from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.pipeline.incremental import IncrementalAggregate
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table
from spark_data_engineering_spark.sources.txn import TxnTable


_DAILY_REVENUE_ORACLE = """
    SELECT DATE_TRUNC('day', o_orderdate) AS "Date",
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*)) * 100 + 0.5) / 100 AS mean_revenue
    FROM orders
    WHERE NOT (o_orderkey % 17 = 3)
    GROUP BY DATE_TRUNC('day', o_orderdate)
    """


@query("incremental_daily_revenue", oracle=_DAILY_REVENUE_ORACLE)
def incremental_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load orders into a txn table in three commits — an 80% append, the
    remaining 20%, then a point delete — refreshing the incremental view
    after each. The returned state saw every row only through the change
    feed; the oracle recomputes from scratch over the survivors.

    Decimal sums make the fold exact (associative), so the final doubles
    are bit-identical to the oracle's; the mean uses the cross-engine
    floor-rounding rule on identically-derived inputs.
    """
    return _run_incremental(spark, sf_dir, strategy="overwrite")


@query("incremental_daily_revenue_merged", oracle=_DAILY_REVENUE_ORACLE)
def incremental_daily_revenue_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same three-commit maintenance as ``incremental_daily_revenue`` but
    refreshed with ``strategy="merge"`` — the copy-on-write path for
    giant states (only touched groups' files rewritten, emptied groups
    as conditional-delete markers) must produce the same hash as both
    the overwrite path and the from-scratch SQL oracle."""
    return _run_incremental(spark, sf_dir, strategy="merge")


def _incr_digest(sf_dir: str, tag: str) -> str:
    """Cache key for an incremental-lifecycle build: source data
    mtime/size + the code digest of every module whose edit must
    invalidate the cached lineage (the repo-wide derived-bytes rule).
    The lifecycle (appends, delete, per-commit refreshes) runs ONCE per
    key; later calls read the maintained state back — the same
    steady-state accounting the cached writer-roundtrip/upsert/
    expectations builds use, with the build cost in SCALE.md."""
    from spark_data_engineering_spark.cacheutil import code_digest
    from spark_data_engineering_spark.pipeline import incremental as _inc_mod
    from spark_data_engineering_spark.pipeline import (
        scd2_incremental as _scd2_mod,
    )
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    return hashlib.md5(
        f"{tag}:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod, _inc_mod, _scd2_mod)}".encode()
    ).hexdigest()[:16]


def _publish(tmp_root: str, root: str) -> None:
    try:
        os.rename(tmp_root, root)
    except OSError:
        shutil.rmtree(tmp_root, ignore_errors=True)  # racer published


def _run_incremental(spark: SparkSession, sf_dir: str, strategy: str) -> DataFrame:
    import uuid

    from spark_data_engineering_spark.cacheutil import sweep_stale

    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/{strategy}-{_incr_digest(sf_dir, strategy)}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        base = TxnTable(tmp_root, "orders_base")
        view = IncrementalAggregate(
            base,
            TxnTable(tmp_root, "daily_revenue"),
            group_by={"Date": "date_trunc('day', o_orderdate)"},
            sums={"revenue_dec": "CAST(o_totalprice AS DECIMAL(18,2))"},
        )
        orders = load_table(spark, "orders", sf_dir)
        base.append(orders.filter(F.col("o_orderkey") % 5 != 0))
        view.refresh(spark, strategy=strategy)
        base.append(orders.filter(F.col("o_orderkey") % 5 == 0))
        view.refresh(spark, strategy=strategy)
        base.delete_where(spark, F.col("o_orderkey") % 17 == 3)
        view.refresh(spark, strategy=strategy)
        _publish(tmp_root, root)
    view = IncrementalAggregate(
        TxnTable(root, "orders_base"),
        TxnTable(root, "daily_revenue"),
        group_by={"Date": "date_trunc('day', o_orderdate)"},
        sums={"revenue_dec": "CAST(o_totalprice AS DECIMAL(18,2))"},
    )
    rev = F.col("revenue_dec").cast("double")
    return view.read(spark).select(
        F.col("Date"),
        rev.alias("revenue"),
        F.col("n_rows").alias("n_orders"),
        (F.floor(rev / F.col("n_rows") * 100 + F.lit(0.5)) / 100).alias("mean_revenue"),
    )


@query(
    "incremental_daily_order_report",
    oracle="""
    SELECT DATE_TRUNC('day', o.o_orderdate) AS "Date",
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS "Revenue",
           FLOOR((CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*)) * 100 + 0.5) / 100 AS "Mean Revenue"
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 0
      AND NOT (o.o_orderkey % 23 = 7)
    GROUP BY DATE_TRUNC('day', o.o_orderdate)
    """,
)
def incremental_daily_order_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE flagship report (daily revenue of active customers — the
    reference's daily_order_report), maintained INCREMENTALLY: orders
    land in a txn table over two appends and a point delete; every
    refresh folds only the change feed, enriched through the
    is_active customer-dim join (the delta-preserving transform), and
    the final state must hash-match the one-shot SQL over the
    survivors. This is the reference's full-reload ETL deliverable
    re-expressed as view maintenance — the 100 TB cost model changes
    from O(orders) per run to O(new orders)."""
    import uuid

    from spark_data_engineering_spark.cacheutil import sweep_stale

    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/{_incr_digest(sf_dir, 'report')}"

    customers = load_table(spark, "customer", sf_dir).filter(
        F.col("c_acctbal") > 0
    ).select(F.col("c_custkey").alias("o_custkey"))

    def make_view(r: str) -> IncrementalAggregate:
        return IncrementalAggregate(
            TxnTable(r, "orders_base"),
            TxnTable(r, "daily_report"),
            group_by={"Date": "date_trunc('day', o_orderdate)"},
            sums={"revenue_dec": "CAST(o_totalprice AS DECIMAL(18,2))"},
            transform=lambda cdf: cdf.join(F.broadcast(customers), "o_custkey"),
        )

    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        view = make_view(tmp_root)
        base = view.base
        orders = load_table(spark, "orders", sf_dir)
        base.append(orders.filter(F.col("o_orderkey") % 4 != 0))
        view.refresh(spark)
        base.append(orders.filter(F.col("o_orderkey") % 4 == 0))
        view.refresh(spark, strategy="merge")
        base.delete_where(spark, F.col("o_orderkey") % 23 == 7)
        view.refresh(spark, strategy="merge")
        _publish(tmp_root, root)
    view = make_view(root)

    rev = F.col("revenue_dec").cast("double")
    return view.read(spark).select(
        F.col("Date"),
        rev.alias("Revenue"),
        (F.floor(rev / F.col("n_rows") * 100 + F.lit(0.5)) / 100).alias("Mean Revenue"),
    )


def orders_ds_table(spark: SparkSession, sf_dir: str) -> TxnTable:
    """Build (once, cached on source mtime+size) the two-commit orders
    txn table consumed through the ``format("txn")`` connector — shared
    by ``txn_datasource_revenue`` (batch read) and
    ``streaming_txn_source_revenue`` (stream read), so both gates see
    the identical commit log."""
    from spark_data_engineering_spark.sources.txn_datasource import register_txn

    register_txn(spark)
    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"ds:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}".encode()
    ).hexdigest()[:16]
    root = f"/tmp/spark_de_incremental/ds-{digest}"
    table = TxnTable(root, "orders_ds")
    if table.version() == 0:
        orders = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        # two commits on purpose (exercises multi-commit planning), but
        # idempotent: a concurrent builder racing the version check
        # cannot double the rows
        table.append_idempotent(orders.filter(F.col("o_orderkey") % 2 == 0), "ds-build", 1)
        table.append_idempotent(orders.filter(F.col("o_orderkey") % 2 == 1), "ds-build", 2)
    return table


@query(
    "txn_datasource_revenue",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def txn_datasource_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read a txn table through the ``format("txn")`` Python data source
    (sources/txn_datasource.py) — orders land over two commits, the
    connector plans partitions from the commit log (never a directory
    listing), and the aggregate must hash-match SQL over the original
    parquet. Proves the table format is consumable by ANY Spark job via
    the standard reader API."""
    table = orders_ds_table(spark, sf_dir)
    df = spark.read.format("txn").load(table.table_dir)
    return df.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_restore_revenue",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def txn_restore_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE under the gate (Delta RESTORE / Iceberg rollback,
    sources/txn.py::restore): clean orders land at v1, a poison
    overwrite (subset with zeroed prices) replaces them at v2, and
    ``restore(1)`` rolls the live set back as a new metadata-only commit
    — the head read must hash-match SQL over the ORIGINAL parquet,
    proving the rollback restored every row and stat. Build steps are
    exactly-once ((app, epoch) watermarks; the restore step keys on
    state, so replays are no-ops) and the poison history stays
    time-travelable. Restore edge cases (post-target DV refusal, count
    re-establishment, checkpoint replay, vacuumed targets) are pinned in
    tests/test_txn_restore.py."""
    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"restore:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}".encode()
    ).hexdigest()[:16]
    root = f"/tmp/spark_de_incremental/restore-{digest}"
    table = TxnTable(root, "orders_restore")
    app = "restore-build"
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    if table.last_epoch(app) < 1:
        table.append_idempotent(orders, app, 1)
    if table.last_epoch(app) < 2:
        poison = orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
            "o_totalprice", F.lit(0.0)
        )
        table.overwrite(poison, txn=(app, 2))
    if set(table.live_files()) != set(table.live_files(1)):
        table.restore(1)
    df = table.read(spark)
    return df.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


_SCD2_INCR_ORACLE = """
    WITH
    daily AS (
        SELECT o_custkey,
               o_orderdate AS eff_ts,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_spend
        FROM orders
        WHERE NOT (o_orderkey % 17 = 3)
        GROUP BY 1, 2
    ),
    cumed AS (
        SELECT o_custkey, eff_ts,
               SUM(day_spend) OVER (PARTITION BY o_custkey ORDER BY eff_ts
                                    ROWS UNBOUNDED PRECEDING) AS cum
        FROM daily
    ),
    tiered AS (
        SELECT o_custkey, eff_ts,
               CASE WHEN cum < 1000000 THEN 'bronze'
                    WHEN cum < 2000000 THEN 'silver'
                    ELSE 'gold' END AS tier
        FROM cumed
    ),
    changes AS (
        SELECT o_custkey, eff_ts, tier
        FROM (
            SELECT o_custkey, eff_ts, tier,
                   LAG(tier) OVER (PARTITION BY o_custkey ORDER BY eff_ts) AS prev
            FROM tiered
        )
        WHERE prev IS NULL OR tier != prev
    )
    SELECT o_custkey AS custkey, tier,
           eff_ts AS valid_from,
           LEAD(eff_ts) OVER (PARTITION BY o_custkey ORDER BY eff_ts) AS valid_to,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY eff_ts)
                AS BIGINT) AS version
    FROM changes
    """


@query("incremental_scd2_tiers", oracle=_SCD2_INCR_ORACLE)
def incremental_scd2_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension maintained incrementally (pipeline/
    scd2_incremental.py): orders land in a txn table across an 80%
    append, the remaining 20%, and a point DELETE — the delete is the
    hard case, rewriting the touched customers' entire era history
    (cumulative sums after the removed order all move), which is why
    SCD2 is not delta-foldable and uses per-key partial recompute
    instead. After three refreshes the dimension saw every change only
    through the change feed + per-key rebuilds; the oracle recomputes
    the whole dimension from scratch over the surviving rows. Both must
    hash-match exactly (decimal money, key-local builder)."""
    from spark_data_engineering_spark.pipeline.scd2_incremental import IncrementalSCD2
    from spark_data_engineering_spark.queries.scd2 import build_scd2_tiers

    import uuid

    from spark_data_engineering_spark.cacheutil import sweep_stale

    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/scd2-{_incr_digest(sf_dir, 'scd2')}"

    def make_view(r: str) -> IncrementalSCD2:
        return IncrementalSCD2(
            TxnTable(r, "orders_base"),
            TxnTable(r, "scd2_tiers"),
            build=build_scd2_tiers,
            key="custkey",
            base_key="o_custkey",
        )

    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        view = make_view(tmp_root)
        base = view.base
        orders = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
        )
        base.append(orders.filter(F.col("o_orderkey") % 5 != 0))
        view.refresh(spark)
        base.append(orders.filter(F.col("o_orderkey") % 5 == 0))
        view.refresh(spark)
        base.delete_where(spark, F.col("o_orderkey") % 17 == 3)
        view.refresh(spark)
        _publish(tmp_root, root)
    return make_view(root).read(spark).select(
        "custkey", "tier", "valid_from", "valid_to", "version"
    )


@query(
    "zorder_pruned_revenue",
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
    FROM lineitem
    WHERE l_suppkey BETWEEN 20 AND 60
      AND l_quantity BETWEEN 10 AND 20
    GROUP BY 1
    """,
)
def zorder_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column data skipping end-to-end: lineitem lands in a txn
    table, OPTIMIZE ZORDER BY (l_suppkey, l_quantity) bin-packs it into
    Morton-ordered files (small target size here so there ARE many
    files), and a two-column range query reads ONLY the files whose
    footer [min,max] boxes intersect the predicate
    (``TxnTable.prune_files``) — then re-applies the exact predicate,
    so results are identical to a full scan and the oracle is the plain
    SQL WHERE. The skip RATIO is pinned in tests/test_txn_merge.py (z-order
    makes both columns' boxes tight simultaneously — a single-column
    sort cannot); this query is the correctness half: skipping must
    never change an answer."""
    stat = os.stat(f"{sf_dir}/lineitem.parquet")
    from spark_data_engineering_spark.cacheutil import code_digest
    from spark_data_engineering_spark.sources import txn as _txn_mod

    digest = hashlib.md5(
        f"zorder:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    root = f"/tmp/spark_de_incremental/zorder-{digest}"
    table = TxnTable(root, "lineitem_z")
    if table.version() == 0:
        li = load_table(spark, "lineitem", sf_dir).select(
            "l_returnflag", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
        )
        # overwrite, not append: two concurrent builders racing the
        # version()==0 check then converge (last writer wins) instead of
        # doubling the cached table
        table.overwrite(li)
        table.compact(
            spark, target_file_bytes=256 * 1024, zorder_by=["l_suppkey", "l_quantity"]
        )
    files = table.prune_files({"l_suppkey": (20, 60), "l_quantity": (10.0, 20.0)})
    paths = [os.path.join(table.data_dir, f) for f in files]
    df = (
        spark.read.parquet(*paths)
        if paths
        else table.read(spark).limit(0)
    )
    return (
        df.filter(
            F.col("l_suppkey").between(20, 60) & F.col("l_quantity").between(10, 20)
        )
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count("*").alias("n_items"),
            NR.round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
        )
    )


def orders_partitioned_table(spark: SparkSession, sf_dir: str) -> TxnTable:
    """Build (once, cached on source mtime+size+code digest) the orders
    txn table partitioned by (o_orderstatus, o_year) — shared by
    ``txn_partition_pruned_revenue`` (library-API pruning with the
    pinned files-read assertion) and ``txn_pushdown_revenue`` (the SAME
    pruning reached through Catalyst filter pushdown on
    ``format("txn")``), so both gates plan over the identical log."""
    stat = os.stat(f"{sf_dir}/orders.parquet")
    from spark_data_engineering_spark.cacheutil import code_digest
    from spark_data_engineering_spark.sources import txn as _txn_mod

    digest = hashlib.md5(
        f"partition:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    root = f"/tmp/spark_de_incremental/partition-{digest}"
    claim(root)  # keep a concurrent sweep_stale off a live entry
    table = TxnTable(
        root, "orders_part", partition_cols=("o_orderstatus", "o_year")
    )
    if table.version() == 0:
        o = (
            load_table(spark, "orders", sf_dir)
            .select(
                "o_orderstatus",
                "o_orderpriority",
                "o_totalprice",
                "o_orderdate",
            )
            .withColumn("o_year", F.year("o_orderdate"))
        )
        # one task per partition combo -> one file per combo; overwrite
        # (not append) so racing builders converge (zorder pattern)
        table.overwrite(o.repartition("o_orderstatus", "o_year"))
    return table


@query(
    "txn_partition_pruned_revenue",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F' AND CAST(YEAR(o_orderdate) AS INT) = 1996
    GROUP BY 1
    """,
)
def txn_partition_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style PARTITION PRUNING end-to-end (round 8, VERDICT r7
    task 6): orders land in a txn table declared
    ``partition_cols=("o_orderstatus", "o_year")`` — every staged file
    is value-pure and carries Delta-style ``partitionValues`` in the
    commit log — and a (status, year) point query plans its scan from
    that metadata alone: ``prune_files`` keeps EXACTLY the files of the
    one queried partition, checked here by a pinned files-read
    assertion (the kept set must equal the partition's recorded file
    set, and be a strict subset of the live set) before the result is
    computed and hash-matched against plain SQL. This is the first
    pruning lever a 100 TB table reaches for: the scan cost tracks the
    queried partition's bytes, not the table's, and planning touches a
    few KB of log JSON — no listing, no footers, no data pages."""
    table = orders_partitioned_table(spark, sf_dir)
    want = {"o_orderstatus": "F", "o_year": 1996}
    pruned = table.prune_files(None, equals=want)
    stats = table.file_stats()
    expect = sorted(
        name
        for name, cols in stats.items()
        if cols.get("partitionValues", {}).get("o_orderstatus") == "F"
        and cols.get("partitionValues", {}).get("o_year") == "1996"
    )
    # the pinned files-read count: partition pruning is EXACT — the
    # planned scan is the one queried partition, nothing more or less,
    # and it genuinely skips the rest of the table
    if pruned != expect or not pruned or len(pruned) >= len(stats):
        raise AssertionError(
            f"partition pruning not exact: kept {len(pruned)} of "
            f"{len(stats)} files, expected {len(expect)}"
        )
    return (
        table.read(spark, prune_eq=want)
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_year") == 1996))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "txn_pushdown_revenue",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F' AND CAST(YEAR(o_orderdate) AS INT) = 1997
    GROUP BY 1
    """,
)
def txn_pushdown_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CATALYST FILTER PUSHDOWN through ``format("txn")`` (round 8,
    Spark 4.1 ``DataSourceReader.pushFilters``): the SAME partitioned
    table as ``txn_partition_pruned_revenue``, but the pruning lever is
    pulled by the optimizer — a plain ``spark.read.format("txn")`` +
    ``.filter(...)`` job (no library API in the read path) and the
    connector prunes its planned file set to the one queried
    (status, year) partition from commit-log partitionValues; every
    filter is returned to Spark for exact re-application, so pruning
    can only shrink the scan. The files-read pinning lives in
    tests/test_txn_pushdown.py (partition-count asserts); this gate
    pins the VALUES. This is the piece that makes the table format's
    data skipping reachable by ANY Spark job that knows only the
    format string — at 100 TB the difference between scanning one
    partition and scanning the table."""
    from spark_data_engineering_spark.sources.txn_datasource import register_txn

    register_txn(spark)
    table = orders_partitioned_table(spark, sf_dir)
    df = spark.read.format("txn").load(table.table_dir)
    return (
        df.filter((F.col("o_orderstatus") == "F") & (F.col("o_year") == 1997))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def orders_generated_table(spark: SparkSession, sf_dir: str) -> TxnTable:
    """Build (once, cached on source mtime+size+code digest) an orders
    txn table whose partition column is GENERATED: the writer supplies
    only the base columns and the table derives
    ``o_year = year(o_orderdate)`` itself (Delta's GENERATED ALWAYS AS
    applied to its canonical use — partition-by-derived-date without
    every writer having to remember the derivation)."""
    stat = os.stat(f"{sf_dir}/orders.parquet")
    from spark_data_engineering_spark.cacheutil import code_digest
    from spark_data_engineering_spark.sources import txn as _txn_mod

    digest = hashlib.md5(
        f"gencols:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    root = f"/tmp/spark_de_incremental/gencols-{digest}"
    table = TxnTable(
        root,
        "orders_gen",
        partition_cols=("o_year",),
        generated_cols={"o_year": "year(o_orderdate)"},
    )
    if table.version() == 0:
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderstatus", "o_orderpriority", "o_totalprice", "o_orderdate"
        )
        # NO o_year in the frame: the table generates it. One task per
        # year -> one file per partition; overwrite (not append) so
        # racing builders converge (zorder pattern)
        table.overwrite(o.repartition(F.year("o_orderdate")))
    return table


@query(
    "txn_generated_cols_revenue",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE CAST(YEAR(o_orderdate) AS INT) = 1998
    GROUP BY 1, 2
    """,
)
def txn_generated_cols_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED COLUMNS end-to-end (round 8; Delta's GENERATED ALWAYS
    AS): orders land in a txn table declared
    ``generated_cols={"o_year": "year(o_orderdate)"}`` with ``o_year``
    also the partition column — the writer never supplies it, the
    table computes it at stage time, records per-file
    ``partitionValues``, and validates any explicitly-supplied value
    against the expression over the staged bytes. A year point query
    then plans its scan from commit-log metadata alone
    (``prune_files``) with the pinned files-read assertion of the
    partition-pruning gate, and the result — INCLUDING the generated
    column itself — hash-matches plain SQL that re-derives
    ``YEAR(o_orderdate)`` from the base column. That last part is the
    point: the gate proves generation == the declared expression on
    every row, not just that pruning picked the right files."""
    table = orders_generated_table(spark, sf_dir)
    want = {"o_year": 1998}
    pruned = table.prune_files(None, equals=want)
    stats = table.file_stats()
    expect = sorted(
        name
        for name, cols in stats.items()
        if cols.get("partitionValues", {}).get("o_year") == "1998"
    )
    if pruned != expect or not pruned or len(pruned) >= len(stats):
        raise AssertionError(
            f"generated-partition pruning not exact: kept {len(pruned)} "
            f"of {len(stats)} files, expected {len(expect)}"
        )
    return (
        table.read(spark, prune_eq=want)
        .filter(F.col("o_year") == 1998)
        .groupBy("o_year", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "txn_replace_where_revenue",
    oracle="""
    WITH merged AS (
        SELECT o_orderstatus,
               CASE WHEN o_orderstatus = 'F'
                         AND CAST(YEAR(o_orderdate) AS INT) = 1997
                    THEN o_totalprice + 50
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM merged GROUP BY o_orderstatus
    """,
)
def txn_replace_where_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION OVERWRITE under the gate (round 8, Delta's
    ``replaceWhere``): orders land partitioned by (status, year), then
    the (F, 1997) partition is REPLACED with corrected rows (prices
    +50) via ``overwrite(replace_where=...)`` — the idempotent
    daily-batch pattern. The commit removes ONLY that partition's
    files; the in-query pin asserts every other live file survived the
    replace byte-identical (same names). The full-table aggregate must
    hash-match SQL that applies the correction to exactly that slice —
    a leaked row, an over-wide remove, or a double-applied correction
    all break the hash. At 100 TB: re-running a day's load rewrites
    the day's partition, never the table."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"rw:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/rw-{digest}"
    if not claim(root):
        import shutil as _sh

        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(
            tmp_root, "orders_rw", partition_cols=("o_orderstatus", "o_year")
        )
        o = (
            load_table(spark, "orders", sf_dir)
            .select("o_orderstatus", "o_totalprice", "o_orderdate")
            .withColumn("o_year", F.year("o_orderdate"))
        )
        t.overwrite(o.repartition("o_orderstatus", "o_year"))
        before = set(t.live_files())
        slice_ = o.filter(
            (F.col("o_orderstatus") == "F") & (F.col("o_year") == 1997)
        ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(50.0))
        t.overwrite(slice_, replace_where={"o_orderstatus": "F", "o_year": 1997})
        # pin: the replace touched ONLY the (F, 1997) partition — every
        # other pre-replace file is still live under the same name
        part = {
            n
            for n, c in t.file_stats(1).items()
            if c["partitionValues"]
            == {"o_orderstatus": "F", "o_year": "1997"}
        }
        if not part or not (before - part) <= set(t.live_files()):
            raise AssertionError("replace_where touched other partitions")
        try:
            os.rename(tmp_root, root)
        except OSError:
            _sh.rmtree(tmp_root, ignore_errors=True)  # racer published first
    table = TxnTable(root, "orders_rw")
    return (
        table.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "txn_update_revenue",
    oracle="""
    WITH upd AS (
        SELECT o_orderstatus,
               CASE WHEN o_orderstatus = 'O' AND o_orderkey % 5 = 2
                    THEN o_totalprice + 25
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM upd GROUP BY o_orderstatus
    """,
)
def txn_update_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE ... SET under the gate (round 8, Delta UPDATE as
    copy-on-write): orders land in a txn table, then
    ``update_where((status='O') & (key%5=2), o_totalprice+25,
    cdf=True)`` rewrites ONLY the files containing matching rows —
    carrying every other row through byte-equal — and persists
    Delta-granularity ``update_preimage``/``update_postimage`` images
    atomically with the commit (pinned present here, consumed by the
    CDF tests). The full-table aggregate must hash-match SQL that
    applies the same CASE — an over-wide rewrite, a NULL-predicate row
    updated, or a lost non-matching row in a rewritten file all break
    the hash. At 100 TB the rewrite cost tracks the files containing
    matches, never the table."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"upd:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/upd-{digest}"
    if not claim(root):
        import shutil as _sh

        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_upd")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t.append(o.repartition(4))
        v = t.update_where(
            spark,
            (F.col("o_orderstatus") == "O") & (F.col("o_orderkey") % 5 == 2),
            {"o_totalprice": F.col("o_totalprice") + F.lit(25.0)},
            cdf=True,
        )
        if not t._read_commit(v).get("cdf_add"):
            raise AssertionError("update_where(cdf=True) recorded no images")
        try:
            os.rename(tmp_root, root)
        except OSError:
            _sh.rmtree(tmp_root, ignore_errors=True)  # racer published first
    table = TxnTable(root, "orders_upd")
    return (
        table.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "txn_snapshot_join",
    oracle="""
    SELECT c_mktsegment AS mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY 1
    """,
)
def txn_snapshot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table consistent snapshot under the oracle gate
    (``TxnStore.snapshot``/``read_at``, sources/txn.py): customer and
    orders land in a TxnStore, a snapshot pins BOTH versions, then a
    concurrent append advances the orders table with poison rows
    (every order duplicated at 1000x the price — any leak into the
    join is an immediate hash mismatch). The cross-table join runs
    against ``read_at`` of the pinned snapshot, so it must reproduce
    the pre-append data exactly — the repeatable-cross-table-read
    guarantee a reader gets while a pipeline batch lands mid-flight.
    The oracle is the plain SQL join over the ORIGINAL tables; fresh
    store per call (cheap: one write of each table), no cache to
    race."""
    import tempfile

    from spark_data_engineering_spark.sources.txn import TxnStore

    from spark_data_engineering_spark.cacheutil import sweep_stale

    os.makedirs("/tmp/spark_de_txnsnap", exist_ok=True)
    sweep_stale("/tmp/spark_de_txnsnap")
    root = tempfile.mkdtemp(prefix="snap-", dir="/tmp/spark_de_txnsnap")
    store = TxnStore(root)
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_totalprice")
    store._table("cust").append(cust)
    store._table("ord").append(orders)
    snap = store.snapshot(["cust", "ord"])
    # the concurrent writer: a later batch lands while our read is pinned
    store._table("ord").append(
        orders.withColumn("o_totalprice", F.col("o_totalprice") * 1000)
    )
    c = store.read_at(spark, snap, "cust")
    o = store.read_at(spark, snap, "ord")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "dv_delete_report",
    oracle="""
    SELECT CAST(o_orderdate AS VARCHAR)[1:4] AS year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE NOT (o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
)
def dv_delete_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE under the oracle gate: orders land in a txn
    table, ``delete_where_dv`` marks every urgent order in a position
    sidecar (Delta deletion-vector protocol — kilobytes written, zero
    data files rewritten: the point-delete shape GDPR erasure needs at
    100 TB), and the post-delete aggregate must hash-match plain SQL
    over the surviving rows. The read is the merge-on-read anti-join
    (sources/txn.py:_read_files_meta); compaction materializing the
    same DVs to identical results is pinned in tests/test_txn_dv.py.
    Fresh table per call — the build is one orders write."""
    import tempfile

    from spark_data_engineering_spark.cacheutil import sweep_stale

    os.makedirs("/tmp/spark_de_dv", exist_ok=True)
    sweep_stale("/tmp/spark_de_dv")
    root = tempfile.mkdtemp(prefix="dv-", dir="/tmp/spark_de_dv")
    t = TxnTable(root, "orders")
    t.append(
        load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
        )
    )
    t.delete_where_dv(spark, F.col("o_orderpriority") == "1-URGENT")
    return (
        t.read(spark)
        .groupBy(F.substring(F.col("o_orderdate").cast("string"), 1, 4).alias("year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "bloom_index_point_lookup",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderkey IN (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5)
    """,
)
def bloom_index_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file bloom INDEX under the oracle gate (sources/txn.py:
    _file_bloom / prune_files(equals=...)): orders land in a txn table
    with ``bloom_cols=("o_orderkey",)`` — every staged file records a
    <=4 KiB bloom over its keys in the commit log — and five point
    lookups each read ONLY the files whose bloom admits the key. This
    is the skipping regime [min,max] boxes can't touch: on an unsorted
    high-cardinality key every file's range covers every key, but the
    bloom prunes to ~1 file per lookup (skip ratio pinned in
    tests/test_txn_bloom_index.py; no false negatives by
    construction, so results must hash-match the plain IN-list SQL).
    Cache-keyed build, race-safe overwrite."""
    stat = os.stat(f"{sf_dir}/orders.parquet")
    from spark_data_engineering_spark.cacheutil import code_digest
    from spark_data_engineering_spark.sources import txn as _txn_mod

    digest = hashlib.md5(
        f"bloomidx:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    root = f"/tmp/spark_de_incremental/bloomidx-{digest}"
    table = TxnTable(root, "orders_b", bloom_cols=("o_orderkey",))
    if table.version() == 0:
        table.overwrite(
            load_table(spark, "orders", sf_dir)
            .select("o_orderkey", "o_orderpriority", "o_totalprice")
            .repartition(8)
        )
    keys = [
        int(r[0])
        for r in load_table(spark, "orders", sf_dir)
        .orderBy("o_orderkey")
        .limit(5)
        .select("o_orderkey")
        .collect()
    ]
    parts = [
        table.read(spark, prune_eq={"o_orderkey": k}).filter(
            F.col("o_orderkey") == k
        )
        for k in keys
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "txn_maintenance_report",
    oracle="""
    WITH gen1 AS (SELECT doc_id FROM documents),
    gen2 AS (SELECT doc_id + 1000000 AS doc_id FROM documents WHERE doc_id < 25),
    t AS (SELECT doc_id FROM gen1 UNION ALL SELECT doc_id FROM gen2),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS physical_rows,
             CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS dv_rows
      FROM t
    )
    SELECT CAST(5 AS BIGINT) AS n_data_files,
           physical_rows,
           dv_rows,
           (physical_rows - dv_rows) AS live_rows,
           FLOOR((CAST(dv_rows AS DOUBLE) / physical_rows) * 10000 + 0.5) / 10000
               AS dv_debt_ratio,
           (CAST(dv_rows AS DOUBLE) / physical_rows
                > 0.05) AS recommend_compact
    FROM m
    """,
)
def txn_maintenance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE-advisor over the txn table format, answered from PURE
    METADATA (round 6): file count from the commit log, physical and
    deleted row counts from footer stats + the DV ledger
    (``count_rows`` — zero data pages read), and the
    compact-recommended verdict from the merge-on-read debt ratio (the
    signal that tells an operator the read-side DV anti-join rent now
    justifies a rewrite). The table is built deterministically from the
    documents corpus — a 4-file hash-partitioned generation, one small
    append (the small-file case compaction also fixes), and a 10% DV
    delete — and the oracle recomputes every number EXACTLY from the
    source rows, so the gate proves the metadata-only accounting equals
    an exact recount: a footer-stat drift, a DV count double-pop, or a
    checkpoint replay bug all hash-mismatch.

    Scale: the report never touches data — at 100 TB it reads a few KB
    of commit JSON, which is the entire point of stats-based
    maintenance planning."""
    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/documents.parquet")
    digest = hashlib.md5(
        f"maint:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_maint", exist_ok=True)
    sweep_stale("/tmp/spark_de_maint")
    root = f"/tmp/spark_de_maint/{digest}"
    t = TxnTable(root, "docs")
    done = os.path.join(t.table_dir, "_maint_done")
    if not os.path.exists(done):
        docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
        t.append_idempotent(docs.repartition(4, "doc_id"), "maint", 1)
        small = (
            docs.filter(F.col("doc_id") < 25)
            .withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
            .coalesce(1)
        )
        t.append_idempotent(small, "maint", 2)
        # 10% DV delete across both generations (no file rewritten)
        t.delete_where_dv(spark, F.col("doc_id") % 10 == 0)
        # Build invariant behind the oracle's pinned n_data_files = 5:
        # repartition(4, doc_id) must yield 4 non-empty hash partitions
        # (one file each) plus the 1-file small append. Assert HERE so a
        # corpus or writer change fails at the builder with a clear
        # message, not as a confusing gate hash-mismatch (ADVICE r6).
        n_built = len(t.live_files())
        if n_built != 5:
            raise AssertionError(
                "txn_maintenance_report build invariant broken: expected "
                f"4 hash-partition files + 1 small-append file, got {n_built}"
            )
        with open(done, "w") as f:
            f.write("ok")
    files = t.live_files()
    _, dv_counts = t.dv_state()
    physical = t.count_rows() + sum(dv_counts.values())
    dv_rows = sum(dv_counts.values())
    ratio = dv_rows / physical if physical else 0.0
    return spark.createDataFrame(
        [
            (
                len(files),
                physical,
                dv_rows,
                physical - dv_rows,
                ratio,
                ratio > 0.05,
            )
        ],
        "n_data_files bigint, physical_rows bigint, dv_rows bigint, "
        "live_rows bigint, dv_debt_ratio double, recommend_compact boolean",
    ).select(
        "n_data_files",
        "physical_rows",
        "dv_rows",
        "live_rows",
        NR.round4(F.col("dv_debt_ratio")).alias("dv_debt_ratio"),
        "recommend_compact",
    )


@query(
    "txn_branch_merge_revenue",
    oracle="""
    WITH corrected AS (
        SELECT o_orderkey, o_orderstatus, FLOOR(o_totalprice) AS o_totalprice
        FROM orders WHERE o_orderkey % 17 = 5
    ),
    final AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 17 <> 5
        UNION ALL SELECT * FROM corrected
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM final
    GROUP BY o_orderstatus
    """,
)
def txn_branch_merge_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The branch-audit-merge lifecycle (round 7, txn.py::branch /
    merge_branch — Nessie/LakeFS-style refs over the txn log): orders
    land on main; a ZERO-COPY branch takes a correction pass (DV-delete
    every o_orderkey % 17 == 5 row, re-append it with the price floored
    — a rounding correction) while main provably serves the UNCHANGED
    pre-branch snapshot (asserted at build, from metadata alone); then
    a fast-forward merge replays the branch commits onto main —
    metadata-only, since branch data files live in the shared data dir.
    The final main-table aggregate must hash-match SQL over
    (orders minus corrected) UNION corrected — a row leaked from the
    branch before merge, resurrected by the DV replay, or dropped by
    the merge all fail the gate.

    Scale: branch creation writes a few KB of log regardless of table
    size; the merge is one metadata commit per branch commit; the only
    data ever written is the branch's own corrections."""
    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"branch:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_branch", exist_ok=True)
    sweep_stale("/tmp/spark_de_branch")
    root = f"/tmp/spark_de_branch/{digest}"
    # crash/race-safe cached build: construct under a private tmp root,
    # then atomically rename into place — a crash mid-build leaves no
    # half-built table under the digest key, and a concurrent builder
    # loses the rename and discards its copy (round-7 review finding;
    # the done-marker-after-append pattern re-entered half-built state)
    if not claim(root):
        import shutil as _sh
        import uuid as _uuid

        tmp_root = f"{root}.build-{_uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_br")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        n_all = o.count()
        t.append(o.repartition(4, "o_orderkey"))
        b = t.branch("corrections")
        b.delete_where_dv(spark, F.col("o_orderkey") % 17 == 5)
        b.append(
            o.filter(F.col("o_orderkey") % 17 == 5).withColumn(
                "o_totalprice", F.floor("o_totalprice").cast("double")
            )
        )
        # isolation invariant: main still serves every original row,
        # answered from pure metadata — a branch leak fails HERE, at the
        # builder, with a clear message
        if t.count_rows() != n_all:
            raise AssertionError(
                f"branch leaked into main pre-merge: {t.count_rows()} != {n_all}"
            )
        t.merge_branch(b)
        try:
            os.rename(tmp_root, root)
        except OSError:
            _sh.rmtree(tmp_root, ignore_errors=True)  # racer published first
    t = TxnTable(root, "orders_br")
    return t.read(spark).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_branch_rebase_revenue",
    oracle="""
    WITH kept AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 3 AND o_orderkey % 5 <> 1
    ),
    parent_new AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 = 3 AND o_orderkey % 2 = 0
    ),
    branch_new AS (
        SELECT o_orderkey, o_orderstatus, FLOOR(o_totalprice) AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 3 AND o_orderkey % 2 = 1
    ),
    final AS (
        SELECT * FROM kept
        UNION ALL SELECT * FROM parent_new
        UNION ALL SELECT * FROM branch_new
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM final
    GROUP BY o_orderstatus
    """,
)
def txn_branch_rebase_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DIVERGED-branch lifecycle (round 7, txn.py::rebase_branch —
    Nessie's re-branch-and-re-apply, done by the table): an initial
    orders load lands on main; a branch is cut; main ADVANCES (a late
    load of half the held-out orders) so the branch base goes stale; the
    branch meanwhile DV-deletes every o_orderkey % 5 == 1 row it can see
    and appends the other half of the held-out orders price-floored.
    ``merge_branch`` now correctly REFUSES (asserted at build — the
    fast-forward discipline), ``rebase_branch`` replays the branch onto
    the advanced head (new zero-copy seed + one validated metadata
    commit per branch commit, atomic log swap), and the merge
    fast-forwards. The final aggregate must hash-match SQL over
    kept UNION parent-load UNION branch-corrections: the branch DV
    applying to post-rebase parent files, a parent row lost to the
    swap, or a replayed commit dropped all fail the gate. Note the
    parent's late rows with o_orderkey % 5 == 1 SURVIVE — the branch
    DV binds to the seed files it was computed on, never to data it
    had not seen.

    Scale: rebase is pure metadata (the branch's staged files and DV
    sidecars are immutable and re-referenced); the only data written is
    the branch's own corrections."""
    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod
    from spark_data_engineering_spark.sources.txn import ConcurrentWriteError

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"rebase:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_branch", exist_ok=True)
    sweep_stale("/tmp/spark_de_branch")
    root = f"/tmp/spark_de_branch/rb-{digest}"
    if not claim(root):
        import shutil as _sh
        import uuid as _uuid

        tmp_root = f"{root}.build-{_uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_rb")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        held = F.col("o_orderkey") % 7 == 3
        t.append(o.filter(~held).repartition(4, "o_orderkey"))
        b = t.branch("fix")
        # main advances AFTER the branch cut: the base is now stale
        t.append(o.filter(held & (F.col("o_orderkey") % 2 == 0)))
        b.delete_where_dv(spark, F.col("o_orderkey") % 5 == 1)
        b.append(
            o.filter(held & (F.col("o_orderkey") % 2 == 1)).withColumn(
                "o_totalprice", F.floor("o_totalprice").cast("double")
            )
        )
        # build-time invariant: the diverged merge must REFUSE — if it
        # ever fast-forwards here, the discipline is broken and the
        # failure should name the builder, not hash-mismatch at the gate
        try:
            t.merge_branch(b)
            raise AssertionError(
                "merge_branch fast-forwarded a DIVERGED branch"
            )
        except ConcurrentWriteError:
            pass
        rb = t.rebase_branch(b)
        t.merge_branch(rb)
        try:
            os.rename(tmp_root, root)
        except OSError:
            _sh.rmtree(tmp_root, ignore_errors=True)  # racer published first
    t = TxnTable(root, "orders_rb")
    return t.read(spark).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_writer_roundtrip_revenue",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE NOT (o_orderkey % 11 = 4)
    GROUP BY o_orderstatus
    """,
)
def txn_writer_roundtrip_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The connector WRITE path under the gate (round 7,
    txn_datasource.py::TxnArrowWriter): orders land through the
    standard ``df.write.format("txn")`` API in two appends — each save
    is executor-parallel Arrow->parquet task files plus ONE atomic log
    commit carrying their footer stats — then a merge-on-read DV delete
    runs on the table, and the aggregate read back through
    ``format("txn")`` must hash-match SQL over the survivors. Proves
    foreign Spark jobs can both produce AND consume the table format
    through nothing but the standard reader/writer API, with the
    format's ACID/DV semantics intact over connector-written files.

    Scale: the write is embarrassingly parallel (one file per task, no
    shuffle beyond the caller's partitioning); the commit is one JSON
    append regardless of table size."""
    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod
    from spark_data_engineering_spark.sources import txn_datasource as _ds_mod
    from spark_data_engineering_spark.sources.txn_datasource import register_txn

    register_txn(spark)
    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"writer:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod, _ds_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_branch", exist_ok=True)
    sweep_stale("/tmp/spark_de_branch")
    root = f"/tmp/spark_de_branch/w-{digest}"
    # crash/race-safe cached build (same tmp-root + atomic rename as
    # txn_branch_merge_revenue; round-7 review finding)
    if not claim(root):
        import shutil as _sh
        import uuid as _uuid

        tmp_root = f"{root}.build-{_uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_w")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        d = t.table_dir
        o.filter(F.col("o_orderkey") % 3 != 0).repartition(4).write.format(
            "txn"
        ).mode("append").save(d)
        o.filter(F.col("o_orderkey") % 3 == 0).repartition(2).write.format(
            "txn"
        ).mode("append").save(d)
        if t.version() != 2:  # one atomic commit per save — build invariant
            raise AssertionError(f"expected 2 commits, log has {t.version()}")
        t.delete_where_dv(spark, F.col("o_orderkey") % 11 == 4)
        try:
            os.rename(tmp_root, root)
        except OSError:
            _sh.rmtree(tmp_root, ignore_errors=True)
    t = TxnTable(root, "orders_w")
    return (
        spark.read.format("txn")
        .load(t.table_dir)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "txn_dv_maintenance_revenue",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(0 AS BIGINT) AS n_sidecars
    FROM orders
    WHERE NOT (o_orderkey % 13 = 6)
    GROUP BY o_orderstatus
    """,
)
def txn_dv_maintenance_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full DV-maintenance lifecycle under the gate (round 7,
    txn.py::prune_dv_sidecars): orders land, a merge-on-read DV delete
    removes every o_orderkey % 13 == 6 row, COMPACT materializes the
    deletes (the sidecar goes all-dead), ``prune_dv_sidecars`` drops it
    from the probe list with a metadata-only 'dv-prune' commit, and
    ``vacuum`` collects the now-unreferenced sidecar bytes. The final
    aggregate must hash-match SQL over the survivors AND the table must
    report ZERO live sidecars (pinned as a column, so a prune that
    silently failed — or one that resurrected deleted rows — both break
    the hash). Read cost is the point at scale: without pruning, every
    merge-on-read scan probes every historical sidecar forever.

    Scale: prune reads only the KB-scale sidecars (never data), commits
    once via compare-and-swap; vacuum's sidecar GC is a directory
    listing against the retained-state union."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"dvmaint:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_branch", exist_ok=True)
    sweep_stale("/tmp/spark_de_branch")
    root = f"/tmp/spark_de_branch/dvm-{digest}"
    if not claim(root):
        import shutil as _sh

        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_dvm")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t.append(o.repartition(4, "o_orderkey"))
        t.delete_where_dv(spark, F.col("o_orderkey") % 13 == 6)
        t.compact(spark)
        pruned = t.prune_dv_sidecars()
        if pruned is None:
            raise AssertionError("dv-prune found nothing to drop post-compact")
        t.vacuum(keep_versions=1, min_age_s=0.0)
        try:
            os.rename(tmp_root, root)
        except OSError:
            _sh.rmtree(tmp_root, ignore_errors=True)  # racer published first
    t = TxnTable(root, "orders_dvm")
    n_sidecars = len(t.dv_state()[0])
    return t.read(spark).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
        F.lit(n_sidecars).cast("bigint").alias("n_sidecars"),
    )


@query(
    "txn_constraint_gate_revenue",
    oracle="""
    WITH unioned AS (
        SELECT o_orderstatus, o_totalprice FROM orders
        UNION ALL
        SELECT o_orderstatus, o_totalprice * 2 AS o_totalprice FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM unioned GROUP BY o_orderstatus
    """,
)
def txn_constraint_gate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraints under the gate (round 8, Delta's ALTER TABLE
    ADD CONSTRAINT as a log property): orders land in a txn table, a
    ``o_totalprice > 0`` constraint is added (validated against the
    existing rows first), then THREE write outcomes are pinned inside
    the build — a constraint the data already violates is refused at
    add time, a violating append (negated prices) is refused atomically
    with its staged bytes cleaned, and a satisfying append (every order
    again at 2x price) commits. The read-back aggregate must hash-match
    SQL over orders UNION ALL orders@2x: a leaked violating row, a
    dropped good batch, or a half-applied refusal all break the hash.
    Enforcement is ONE folded aggregate job over the staged bytes per
    write (the WAP audit discipline) — at 100 TB the cost tracks the
    batch, never the table."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.checks import CheckError
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"cons:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/cons-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_cons")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t.append(o.repartition(4))
        t.add_constraint(spark, "price_pos", "o_totalprice > 0")
        try:
            t.add_constraint(spark, "impossible", "o_totalprice < 0")
            raise AssertionError("add_constraint over violating data passed")
        except CheckError:
            pass
        v0 = t.version()
        try:
            t.append(o.withColumn("o_totalprice", -F.col("o_totalprice")))
            raise AssertionError("violating append was not refused")
        except CheckError:
            pass
        if t.version() != v0:
            raise AssertionError("refused append advanced the version")
        t.append(
            o.withColumn("o_totalprice", F.col("o_totalprice") * F.lit(2.0))
        )
        if t.constraints() != {"price_pos": "o_totalprice > 0"}:
            raise AssertionError("constraint map desynced")
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    table = TxnTable(root, "orders_cons")
    return (
        table.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "txn_identity_rows",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(1 AS BIGINT) AS min_id,
           CAST(COUNT(*) AS BIGINT) AS max_id,
           CAST((COUNT(*) * (COUNT(*) + 1)) // 2 AS BIGINT) AS id_sum,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_ids
    FROM orders
    """,
)
def txn_identity_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTITY COLUMNS end-to-end (round 8; Delta's GENERATED ALWAYS
    AS IDENTITY): orders land in a txn table declared
    ``identity_cols={"rid": {"start": 1, "step": 1}}`` across TWO
    appends — the writer never supplies rid; the table allocates it
    with the two-pass partition-offset scheme (no global sort, no
    driver row loop) from a commit-log watermark the second append
    CONTINUES. The oracle is the algebra the contract implies and SQL
    can state without seeing the assignment: n rows get ids exactly
    1..n — so min=1, max=n, sum=n(n+1)/2, and n distinct values — true
    for ANY distribution of rows to partitions, which is what makes a
    distribution-dependent assignment hashable. A duplicated id breaks
    n_distinct_ids AND id_sum; a skipped id breaks max AND id_sum; a
    second append restarting at 1 breaks all three."""
    import hashlib
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"ident:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/ident-{digest}"
    if not claim(root):
        import shutil as _sh

        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(
            tmp_root, "orders_id", identity_cols={"rid": {"start": 1, "step": 1}}
        )
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_totalprice"
        )
        t.append(o.filter(F.col("o_orderkey") % 2 == 0).repartition(3))
        t.append(o.filter(F.col("o_orderkey") % 2 != 0).repartition(3))
        try:
            os.rename(tmp_root, root)
        except OSError:
            _sh.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_id")
    return t.read(spark).agg(
        F.count("*").alias("n_rows"),
        F.min("rid").alias("min_id"),
        F.max("rid").alias("max_id"),
        F.sum("rid").alias("id_sum"),
        F.countDistinct("rid").alias("n_distinct_ids"),
    )


@query(
    "txn_detail_summary",
    oracle="""
    SELECT CAST(3 AS BIGINT) AS version,
           CAST(COUNT(*) FILTER (WHERE o_orderkey % 13 != 0) AS BIGINT)
               AS num_rows,
           CAST(COUNT(*) FILTER (WHERE o_orderkey % 13 = 0) AS BIGINT)
               AS dv_deleted,
           CAST(1 AS BIGINT) AS n_constraints,
           CAST(1 AS BIGINT) AS n_partition_cols,
           TRUE AS files_match,
           TRUE AS size_positive
    FROM orders
    """,
)
def txn_detail_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE DETAIL under the gate (sources/txn.py::detail, Delta's
    utility): orders land partitioned at v1, a DV delete marks every
    13th key at v2, a CHECK constraint lands at v3 — detail() must
    report the metadata-only facts a maintenance job keys off. The
    cross-engine rows are ``num_rows`` / ``dv_deleted`` (detail's
    stats-based count vs DuckDB COUNT over the source parquet — the
    merge-on-read arithmetic, no data page read on the Spark side);
    version / property counts pin the deterministic build; the two
    booleans are in-query invariants (live-file agreement, positive
    byte size). Parity: Delta DESCRIBE DETAIL. The count_rows
    agreement contract (legacy stats fallback) is pinned in
    tests/test_txn_autocompact.py."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"detail:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/detail-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_detail", partition_cols=("o_orderstatus",))
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t.append(o.repartition(4, "o_orderkey"))                  # v1
        t.delete_where_dv(spark, F.col("o_orderkey") % 13 == 0)   # v2
        t.add_constraint(spark, "price_nonneg", "o_totalprice >= 0")  # v3
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_detail")
    d = t.detail()
    row = (
        d["version"],
        d["num_rows"],
        d["dv_deleted_rows"],
        len(d["constraints"]),
        len(d["partition_cols"]),
        d["num_files"] == len(t.live_files()) and d["num_files"] > 0,
        d["size_bytes"] > 0,
    )
    return spark.createDataFrame(
        [row],
        "version bigint, num_rows bigint, dv_deleted bigint, "
        "n_constraints bigint, n_partition_cols bigint, "
        "files_match boolean, size_positive boolean",
    )


@query(
    "txn_properties_revenue",
    oracle="""
    SELECT 'tier' AS prop_key,
           'silver' AS prop_value,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    """,
)
def txn_properties_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TBLPROPERTIES under the gate (sources/txn.py::set_properties /
    unset_properties / properties — Delta's ALTER TABLE SET/UNSET
    TBLPROPERTIES as CAS metadata commits): orders land at v1, then a
    set / merge-set / unset sequence leaves exactly {tier: silver}; the
    surviving property rides the hash next to the table's row count and
    revenue read back THROUGH the post-DDL head — proving the three
    metadata commits changed no data (the DDL actions are net-zero in
    every dispatcher). Branch/merge/rebase/stream triage is pinned in
    tests/test_txn_properties.py."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"props:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/props-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_props")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_totalprice"
        )
        t.append(o.repartition(4))                         # v1
        t.set_properties({"owner": "etl", "tier": "gold"})  # v2
        t.set_properties({"tier": "silver"})                # v3 (merge)
        t.unset_properties(["owner"])                       # v4
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_props")
    props = t.properties()
    assert props == {"tier": "silver"}, props
    agg = t.read(spark).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )
    return agg.select(
        F.lit("tier").alias("prop_key"),
        F.lit(props["tier"]).alias("prop_value"),
        "n_rows",
        "revenue",
    )


@query(
    "txn_convert_revenue",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def txn_convert_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT TO DELTA under the gate (sources/txn.py::
    convert_from_parquet — Delta CONVERT / Iceberg add_files): the
    driver's orders.parquet is adopted into a txn table WITHOUT
    rewriting a byte (hardlink, cross-device copy fallback; footer
    stats computed at convert time), and the aggregate read back
    through the table head must hash-match SQL over the original
    parquet — the 100 TB onboarding path, where re-writing the corpus
    to gain a transaction log is not an option. Stream/CDF/append/DV
    behavior of a converted table is pinned in
    tests/test_txn_convert.py."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"convert:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/convert-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        TxnTable.convert_from_parquet(
            spark, tmp_root, "orders_conv", f"{sf_dir}/orders.parquet"
        )
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_conv")
    return t.read(spark).groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_add_column_default_revenue",
    oracle="""
    SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'web'
                WHEN o_orderkey % 10 >= 5 THEN 'store'
                ELSE 'none' END AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def txn_add_column_default_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ADD COLUMN DEFAULT under the gate (round 10;
    sources/txn.py::add_column). All three value paths in one hash,
    Delta/SQL semantics exactly: keys %10 in 1-4 land BEFORE the add
    (their files lack the column → read NULL, folded to 'none'), the
    column is added as ONE metadata commit with DEFAULT 'store', keys
    %10 in 5-9 land after WITHOUT the column (the default is
    MATERIALIZED into their staged files — SQL INSERT-default rule),
    and keys %10 = 0 land with an explicit 'web'. The grouped
    aggregate must hash-match SQL reconstructing the same channel with
    a CASE over the original parquet — pre-add NULLs, write-time
    defaults, and explicit values all agree row-for-row."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"addcol:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/addcol-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_ac")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_totalprice"
        )
        m = F.col("o_orderkey") % 10
        t.append(o.filter(m.between(1, 4)))                  # v1: pre-add
        t.add_column(spark, "channel", "string", default="store")  # v2: DDL
        t.append(o.filter(m >= 5))                           # v3: default fills
        t.append(                                            # v4: explicit
            o.filter(m == 0).withColumn("channel", F.lit("web"))
        )
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_ac")
    return t.read(spark).groupBy(
        F.coalesce(F.col("channel"), F.lit("none")).alias("channel")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_set_drop_default_revenue",
    oracle="""
    SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'web'
                WHEN o_orderkey % 10 BETWEEN 3 AND 5 THEN 'store'
                WHEN o_orderkey % 10 BETWEEN 6 AND 7 THEN 'kiosk'
                ELSE 'none' END AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def txn_set_drop_default_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER COLUMN SET/DROP DEFAULT lifecycle under the gate (round 11;
    VERDICT r10 task 2 — the surface landed in round 10's final commit
    pytest-only). FIVE write regimes in one hash, each purely
    prospective (existing bytes untouched, the SQL rule): keys %10 = 0
    land with an explicit 'web'; %10 in 1-2 land while the column has
    NO default (read NULL, folded to 'none'); SET DEFAULT 'store', %10
    in 3-5 land omitting the column (the literal is MATERIALIZED into
    their staged files); SET DEFAULT 'kiosk' re-points the default and
    %10 in 6-7 take the NEW literal; DROP DEFAULT, %10 in 8-9 go back
    to NULL. The grouped aggregate must hash-match SQL reconstructing
    the same channel with a CASE over the original parquet —
    set-then-write, re-set-then-write, and drop-then-write all agree
    row-for-row with the declared semantics."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"setdropdflt:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/setdropdflt-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_sd")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_totalprice"
        )
        m = F.col("o_orderkey") % 10
        t.append(                                            # v1: explicit
            o.filter(m == 0).withColumn("channel", F.lit("web"))
        )
        t.append(o.filter(m.between(1, 2)))                  # v2: no default
        t.set_column_default(spark, "channel", "store")      # v3: DDL
        t.append(o.filter(m.between(3, 5)))                  # v4: 'store'
        t.set_column_default(spark, "channel", "kiosk")      # v5: re-point
        t.append(o.filter(m.between(6, 7)))                  # v6: 'kiosk'
        t.drop_column_default(spark, "channel")              # v7: DDL
        t.append(o.filter(m >= 8))                           # v8: NULL again
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_sd")
    return t.read(spark).groupBy(
        F.coalesce(F.col("channel"), F.lit("none")).alias("channel")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_analyze_histogram",
    oracle="""
    SELECT CAST((o_custkey - b.mn) // ((b.mx - b.mn) // 8 + 1) AS BIGINT)
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders,
         (SELECT MIN(o_custkey) AS mn, MAX(o_custkey) AS mx FROM orders) b
    GROUP BY 1
    """,
)
def txn_analyze_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE histogram tier under the gate (round 10;
    sources/txn.py::analyze(histogram_bins=8)): the committed 8-bucket
    equi-width histogram of o_custkey — read back from the log with NO
    data scan — must hash-match DuckDB recomputing the identical
    integer bucket formula ``(x - min) div w, w = (max - min) div 8
    + 1`` over the parquet (width-first, no multiply: the multiply
    form wraps bigint silently on near-int64 ranges — round-10
    advice). Integer arithmetic is the point: bucket boundaries
    cannot drift by a half-ulp between engines, so the CBO input in
    the log is bit-trustworthy, not approximately right."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"analyzehist:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/analyzehist-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable.convert_from_parquet(
            spark, tmp_root, "orders_ah", f"{sf_dir}/orders.parquet"
        )
        t.analyze(spark, columns=["o_custkey"], histogram_bins=8)
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_ah")
    cs = t.column_stats()  # metadata-only read-back
    h = cs["columns"]["o_custkey"]["histogram"]
    assert h["bins"] == 8 and sum(h["counts"]) == cs["rows"], h
    rows = [
        (b, int(n)) for b, n in enumerate(h["counts"]) if n > 0
    ]
    return spark.createDataFrame(rows, "bucket bigint, n_orders bigint")


@query(
    "txn_partition_evolution_revenue",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def txn_partition_evolution_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition evolution under the gate (round 11; VERDICT r10 task 6
    — Iceberg spec-v2 semantics, sources/txn.py::set_partitioning):
    odd keys land partitioned by o_orderstatus, ONE metadata commit
    re-declares the layout to o_orderpriority, even keys land under the
    new scheme — no rewrite, files keep their own recorded
    partitionValues, and reads prune each file against its own scheme
    (the per-scheme union pinned exactly in
    tests/test_txn_partition_evolution.py). The grouped aggregate over
    the MIXED-layout table must hash-match SQL over the original
    parquet — both cohorts, both schemes, one answer."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"partevo:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/partevo-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(
            tmp_root, "orders_pe", partition_cols=("o_orderstatus",)
        )
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        )
        t.append(o.filter(F.col("o_orderkey") % 2 == 1))
        t.set_partitioning(spark, ("o_orderpriority",))
        t.append(o.filter(F.col("o_orderkey") % 2 == 0))
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_pe")
    return t.read(spark).groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_merge_evolution_revenue",
    oracle="""
    SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'web' ELSE 'none' END
             AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0
                              THEN o_totalprice * 2
                              ELSE o_totalprice END
                     AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def txn_merge_evolution_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE schema evolution under the gate (round 11; VERDICT r10
    task 5 — Delta ``withSchemaEvolution()``): a CDC batch carrying a
    column the target has never seen (``channel``) merges with
    ``schema_evolution=True`` — the new column is declared in the
    merge's own commit, the matched rows (keys %7 = 0) take the
    updated price AND the new value, and every pre-existing untouched
    row reads NULL for it (add_column's prospective rule). The grouped
    aggregate over the evolved table must hash-match SQL
    reconstructing the same channel and updated prices with CASEs over
    the original parquet — update arm, evolution arm, and NULL history
    agree row-for-row. Doubling a double is exact in binary, so the
    DECIMAL(18,2) revenue hash cannot drift."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"mergeevo:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/mergeevo-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_me")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_totalprice"
        )
        t.append(o)
        cdc = (
            o.filter(F.col("o_orderkey") % 7 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("channel", F.lit("web"))
        )
        t.merge(spark, cdc, on=["o_orderkey"], schema_evolution=True)
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_me")
    return t.read(spark).groupBy(
        F.coalesce(F.col("channel"), F.lit("none")).alias("channel")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_scoped_compact_revenue",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT'
                              THEN o_totalprice * 2
                              ELSE o_totalprice END
                     AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def txn_scoped_compact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoped layout migration under the gate (round 12; VERDICT r11
    task 4 — Iceberg ``rewrite_data_files(filter)`` after a spec
    change, sources/txn.py::compact(scope='pre-evolution')): odd keys
    land partitioned by o_orderstatus, ONE metadata commit evolves the
    layout to o_orderpriority, even keys land under the new scheme —
    at which point ``replace_where`` on o_orderpriority is REFUSED
    (old-scheme files are not value-pure on it). The scoped compact
    rewrites ONLY the pre-evolution files (current-scheme files
    survive byte-identical — pinned in
    tests/test_txn_partition_evolution.py), unblocking a dynamic
    partition overwrite that doubles the 1-URGENT cohort's prices.
    The grouped aggregate over the final table must hash-match SQL
    reconstructing the doubled cohort with a CASE over the original
    parquet — migration, purity gate, and replace all agree.
    Doubling a double is exact in binary, so the DECIMAL(18,2)
    revenue hash cannot drift."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"scopedcompact:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/scopedcompact-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(
            tmp_root, "orders_sc", partition_cols=("o_orderstatus",)
        )
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        )
        t.append(o.filter(F.col("o_orderkey") % 2 == 1))
        t.set_partitioning(spark, ("o_orderpriority",))
        t.append(o.filter(F.col("o_orderkey") % 2 == 0))
        # mixed layout: the dynamic partition overwrite must refuse
        # until the scoped compact migrates the old-scheme files
        try:
            t.overwrite(
                o.filter(F.col("o_orderpriority") == "1-URGENT"),
                replace_where={"o_orderpriority": "1-URGENT"},
            )
            raise AssertionError(
                "replace_where accepted a mixed layout — purity gate lost"
            )
        except ValueError:
            pass
        t.compact(spark, scope="pre-evolution")
        t.overwrite(
            o.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
                "o_totalprice", F.col("o_totalprice") * 2
            ),
            replace_where={"o_orderpriority": "1-URGENT"},
        )
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_sc")
    return t.read(spark).groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_widen_column_revenue",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'evolved' ELSE 'legacy' END
             AS cohort,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_custkey AS BIGINT)
                    + CASE WHEN o_orderkey % 2 = 0
                           THEN 1099511627776 ELSE 0 END) AS BIGINT)
             AS key_sum,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def txn_widen_column_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER COLUMN type widening under the gate (round 12; VERDICT r11
    task 5 — Delta 3.x type widening / Iceberg int->long,
    sources/txn.py::widen_column): odd keys land with o_custkey as a
    32-bit INT; ONE metadata commit widens the column to BIGINT; even
    keys land with keys offset by 2^40 — values a 32-bit column cannot
    hold (the long-lived-table scenario: an upstream key outgrowing
    int32 becomes one commit, not a 100 TB rewrite). The narrow files
    are never rewritten — reads upcast their int32 pages through the
    explicit read schema (_physical_read_schema; mergeSchema refuses
    mixed int/long footers, and its per-file footer merge at planning
    time is itself the 100 TB anti-pattern the explicit schema
    removes). The per-cohort key sums and revenue must hash-match SQL
    reconstructing the offset with a CASE over the original parquet —
    legacy pages, widened pages, and the aggregate agree exactly
    (integer sums: no float drift possible)."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"widencol:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/widencol-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_wc")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey",
            F.col("o_custkey").cast("int").alias("o_custkey"),
            "o_totalprice",
        )
        t.append(o.filter(F.col("o_orderkey") % 2 == 1))
        t.widen_column(spark, "o_custkey", "bigint")
        t.append(
            o.filter(F.col("o_orderkey") % 2 == 0).withColumn(
                "o_custkey",
                F.col("o_custkey").cast("bigint") + F.lit(2**40),
            )
        )
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_wc")
    return (
        t.read(spark)
        .groupBy(
            F.when(F.col("o_custkey") >= 2**40, "evolved")
            .otherwise("legacy")
            .alias("cohort")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_custkey").cast("bigint").alias("key_sum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "txn_widen_nested_revenue",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'evolved' ELSE 'legacy' END
             AS cohort,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_custkey AS BIGINT)
                    + CASE WHEN o_orderkey % 2 = 0
                           THEN 1099511627776 ELSE 0 END) AS BIGINT)
             AS key_sum,
           CAST(SUM(2 * (CAST(o_custkey AS BIGINT)
                    + CASE WHEN o_orderkey % 2 = 0
                           THEN 1099511627776 ELSE 0 END) + 1) AS BIGINT)
             AS arr_key_sum,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def txn_widen_nested_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED type widening under the gate (round 13; VERDICT r12 task
    3 — Delta 4.0 typeWidening covers nested fields,
    sources/txn.py::widen_column dotted paths): odd keys land with a
    struct<custkey:int> column and an array<int> key list; TWO metadata
    commits widen ``info.custkey`` and ``keys.element`` to BIGINT; even
    keys land with custkeys offset by 2^40 — values the nested int32
    leaves cannot hold. No file is rewritten: the narrow nested pages
    upcast through the explicit read schema (the parquet reader
    converts per leaf column chunk, exactly like the flat case — and
    mergeSchema would refuse the mixed int/long nested footers
    outright, so the explicit-schema path is also what makes mixed
    nested widths READABLE at all). Per-cohort struct-leaf sums, array
    element sums (via F.aggregate, JVM-side), and revenue must
    hash-match SQL reconstructing the offset over the original parquet
    — integer sums, no float drift possible."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"widennested:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/widennested-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_wn")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey",
            F.struct(
                F.col("o_custkey").cast("int").alias("custkey")
            ).alias("info"),
            F.array(
                F.col("o_custkey").cast("int"),
                (F.col("o_custkey") + 1).cast("int"),
            ).alias("keys"),
            "o_totalprice",
        )
        t.append(o.filter(F.col("o_orderkey") % 2 == 1))
        t.widen_column(spark, "info.custkey", "bigint")
        t.widen_column(spark, "keys.element", "bigint")
        off = F.lit(2**40).cast("bigint")
        t.append(
            o.filter(F.col("o_orderkey") % 2 == 0).select(
                "o_orderkey",
                F.struct(
                    (F.col("info.custkey").cast("bigint") + off).alias(
                        "custkey"
                    )
                ).alias("info"),
                F.array(
                    F.col("keys")[0].cast("bigint") + off,
                    F.col("keys")[1].cast("bigint") + off,
                ).alias("keys"),
                "o_totalprice",
            )
        )
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_wn")
    return (
        t.read(spark)
        .groupBy(
            F.when(F.col("info.custkey") >= 2**40, "evolved")
            .otherwise("legacy")
            .alias("cohort")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("info.custkey").cast("bigint").alias("key_sum"),
            F.sum(
                F.aggregate(
                    "keys",
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                )
            )
            .cast("bigint")
            .alias("arr_key_sum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "txn_tag_pinned_revenue",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders
    WHERE o_orderkey % 2 = 1
    GROUP BY 1
    """,
)
def txn_tag_pinned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tags under the gate (round 12; Iceberg named references,
    sources/txn.py::create_tag): odd keys land and are tagged
    ``release``; even keys land; a delete rewrites part of the table;
    ``vacuum(keep_versions=1)`` then expires every untagged historical
    file — and the TAG must still read the release snapshot exactly,
    because tagged versions are GC ref roots (the 100 TB contract: the
    corpus release a training run pinned stays readable through
    routine retention). The aggregate over ``read(tag="release")``
    must hash-match SQL over the odd-key cohort of the original
    parquet."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"tagpin:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/tagpin-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_tag")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        t.append(o.filter(F.col("o_orderkey") % 2 == 1))
        t.create_tag("release")
        t.append(o.filter(F.col("o_orderkey") % 2 == 0))
        t.delete_where(spark, F.col("o_orderkey") % 5 == 0)
        t.vacuum(keep_versions=1)
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_tag")
    return (
        t.read(spark, tag="release")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "txn_analyze_equiheight",
    oracle="""
    WITH r AS (
        SELECT o_custkey,
               ROW_NUMBER() OVER (ORDER BY o_custkey) - 1 AS q,
               COUNT(*) OVER () AS n
        FROM orders
    )
    SELECT CAST((q * 8) // n AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_custkey) AS BIGINT) AS lo_key,
           CAST(MAX(o_custkey) AS BIGINT) AS hi_key,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv_keys
    FROM r
    GROUP BY 1
    """,
)
def txn_analyze_equiheight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE equi-HEIGHT histogram tier under the gate (round 11;
    VERDICT r10 task 7 — the bin shape Spark's CBO actually stores):
    the committed 8-bucket histogram of o_custkey — per-bucket count,
    lo/hi bound, and NDV, read back from the log with NO data scan —
    must hash-match DuckDB assigning each sorted row's 0-based rank q
    to bucket ``(q * 8) div n`` and aggregating. Rank-keyed integer
    math is the point (no ntile, no percentile interpolation): ties
    occupy consecutive ranks, so per-bucket aggregates are
    deterministic on any engine. The engine side never builds the
    per-row global sort — ranks derive from per-distinct-value counts
    (one NDV-sized shuffle) with a bins-bounded interval explode."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"analyzeeh:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/analyzeeh-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable.convert_from_parquet(
            spark, tmp_root, "orders_eh", f"{sf_dir}/orders.parquet"
        )
        t.analyze(spark, columns=["o_custkey"], equi_height_bins=8)
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_eh")
    cs = t.column_stats()  # metadata-only read-back
    eh = cs["columns"]["o_custkey"]["histogram_eh"]
    assert eh["bins"] == 8 and sum(b["count"] for b in eh["buckets"]) == (
        cs["rows"] - cs["columns"]["o_custkey"]["num_nulls"]
    ), eh
    rows = [
        (bk["bucket"], bk["count"], int(bk["lo"]), int(bk["hi"]), bk["ndv"])
        for bk in eh["buckets"]
    ]
    return spark.createDataFrame(
        rows,
        "bucket bigint, n_orders bigint, lo_key bigint, hi_key bigint, "
        "ndv_keys bigint",
    )


@query(
    "txn_show_partitions",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM orders
    WHERE NOT (o_orderkey % 7 = 0)
    GROUP BY o_orderstatus
    """,
)
def txn_show_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW PARTITIONS under the gate (round 10; sources/txn.py::
    show_partitions): orders land value-pure partitioned by
    o_orderstatus, a 1-in-7 slice is DV-deleted (merge-on-read, no
    rewrite), and the per-partition row counts — answered PURELY from
    commit-log metadata (``__num_rows`` minus per-file DV-deleted
    counts, zero data pages) — must hash-match SQL COUNTs over the
    surviving rows. The operator view that decides scoped OPTIMIZE /
    retention targets at 100 TB without listing a single object."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"showparts:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/showparts-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(
            tmp_root, "orders_sp", partition_cols=("o_orderstatus",)
        )
        t.append(load_table(spark, "orders", sf_dir))
        t.delete_where_dv(spark, F.col("o_orderkey") % 7 == 0)
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_sp")
    parts = t.show_partitions()  # metadata-only: no Spark job
    rows = [
        (p["values"]["o_orderstatus"], int(p["num_rows"])) for p in parts
    ]
    return spark.createDataFrame(
        rows, "o_orderstatus string, n_rows bigint"
    )


@query(
    "txn_analyze_stats",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(o_orderpriority) AS VARCHAR),
           CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(MIN(o_orderstatus) AS VARCHAR),
           CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    """,
)
def txn_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE under the gate (round 10; sources/txn.py::analyze
    — Spark/Delta's COMPUTE STATISTICS FOR COLUMNS): orders are
    adopted into a txn table, analyzed in ONE aggregate pass (exact
    COUNT DISTINCT here so DuckDB can oracle it; the 100 TB tier is
    ``approx=True`` HLL), and the committed metadata payload — read
    back via ``column_stats()`` with NO data scan — must hash-match
    SQL computed directly over the parquet. This is the property that
    makes stats trustworthy for a cost-based planner: the log carries
    exactly what a full recompute would say, pinned per column
    (null count, NDV, min, max as strings)."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"analyze:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/analyze-{digest}"
    cols = ("o_custkey", "o_orderstatus", "o_orderpriority")
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable.convert_from_parquet(
            spark, tmp_root, "orders_an", f"{sf_dir}/orders.parquet"
        )
        t.analyze(spark, columns=cols)
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_an")
    cs = t.column_stats()  # metadata-only read-back
    assert cs and set(cs["columns"]) == set(cols), cs
    rows = [
        (
            c,
            int(cs["rows"]),
            int(cs["columns"][c]["num_nulls"]),
            int(cs["columns"][c]["distinct_count"]),
            cs["columns"][c]["min"],
            cs["columns"][c]["max"],
        )
        for c in cols
    ]
    return spark.createDataFrame(
        rows,
        "col_name string, n_rows bigint, n_nulls bigint, ndv bigint, "
        "min_val string, max_val string",
    )


@query(
    "txn_hive_convert_revenue",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def txn_hive_convert_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned CONVERT TO DELTA under the gate (round 10;
    sources/txn.py::convert_from_parquet on a ``col=value`` layout —
    Delta's ``CONVERT TO DELTA ... PARTITIONED BY``): orders are first
    written out hive-partitioned by o_orderstatus (so the data files
    DROP the partition column, hive's defining quirk), then adopted by
    hardlink with per-file partitionValues parsed from the directory
    names. The aggregate grouped ON THE PROJECTED PARTITION COLUMN
    must hash-match SQL over the original parquet — proving the
    read-time projection (one broadcast join on __file) reconstructs
    the column exactly. Pruning exactness is pinned inline: the
    partition-value prune must select a strict file subset that is
    value-pure for the probed status. Lifecycle (mixed appends, merge,
    compact, clone, time travel, fsck) is pinned in
    tests/test_txn_hive_partitioned.py."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"hiveconvert:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/hiveconvert-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        corpus = os.path.join(tmp_root, "corpus")
        load_table(spark, "orders", sf_dir).write.partitionBy(
            "o_orderstatus"
        ).parquet(corpus)
        TxnTable.convert_from_parquet(spark, tmp_root, "orders_hive", corpus)
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_hive")
    assert t.partition_cols() == ("o_orderstatus",) and t.hive_origin()
    # pruning exactness, metadata-only: the probe selects a strict,
    # value-pure subset of the live set
    live = t.live_files()
    pruned = t.prune_files(None, equals={"o_orderstatus": "F"})
    stats = t.file_stats()
    assert 0 < len(pruned) < len(live) and all(
        stats[f]["partitionValues"] == {"o_orderstatus": "F"} for f in pruned
    ), "hive partition prune must be exact"
    return t.read(spark).groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_clone_revenue",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderstatus
    """,
)
def txn_clone_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE under the gate (sources/txn.py::clone — Delta's
    CREATE TABLE CLONE, hardlink-independent variant): orders land at
    v1, the 'F' slice is DV-deleted at v2, the table is CLONED, and the
    SOURCE then deletes its 'O' slice too — the clone must still show
    the full non-'F' snapshot (isolation both ways), hash-matched
    against SQL over the original parquet. The clone carries the
    source's files by hardlink (zero rewrite) and its DV positions via
    one consolidated clone-owned sidecar; vacuum on either side can
    never break the other (each owns its links). Lifecycle details
    (metadata carry-over, CDF, vacuum safety, COPY ledger inheritance)
    are pinned in tests/test_txn_clone_copy.py."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"clone:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/clone-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        src = TxnTable(os.path.join(tmp_root, "src"), "orders_src")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        src.append(o.repartition(4))                              # v1
        src.delete_where_dv(spark, F.col("o_orderstatus") == "F")  # v2 (DV)
        src.clone(os.path.join(tmp_root, "dst"), "orders_clone")
        # mutate the SOURCE after the clone: the clone must not move
        src.delete_where_dv(spark, F.col("o_orderstatus") == "O")
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    c = TxnTable(os.path.join(root, "dst"), "orders_clone")
    assert c._read_commit(1)["action"] == "clone"
    return c.read(spark).groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_copy_into_revenue",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def txn_copy_into_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY INTO under the gate (sources/txn.py::copy_into — Databricks
    COPY INTO): a landing zone receives the even-keyed orders, COPY
    INTO ingests them (hardlink + footer stats, no rewrite); the odd
    keys land next tick and ONLY they load; a third tick loads ZERO
    files (idempotence, asserted in-query — the ledger rides the 'copy'
    commits). The final table must hash-match SQL over ALL orders:
    exactly-once ingestion across three runs. Concurrency (CAS-replayed
    dedup), constraint enforcement on staged bytes, and ledger
    inheritance through clone/branch-merge are pinned in
    tests/test_txn_clone_copy.py."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"copyinto:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/copyinto-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        land = os.path.join(tmp_root, "landing")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t = TxnTable(os.path.join(tmp_root, "tbl"), "orders_copy")
        o.filter(F.col("o_orderkey") % 2 == 0).repartition(3).write.mode(
            "append"
        ).parquet(land)
        r1 = t.copy_into(spark, land)
        assert r1["files_loaded"] >= 1, r1
        o.filter(F.col("o_orderkey") % 2 == 1).repartition(3).write.mode(
            "append"
        ).parquet(land)
        r2 = t.copy_into(spark, land)
        assert r2["files_loaded"] >= 1 and r2["files_skipped"] >= 1, r2
        r3 = t.copy_into(spark, land)  # third tick: nothing new
        assert r3["files_loaded"] == 0, r3
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(os.path.join(root, "tbl"), "orders_copy")
    return t.read(spark).groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_schema_evolution_revenue",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus
                ELSE '(pre-evolution)' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def txn_schema_evolution_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution + column mapping under the gate (sources/
    txn.py::_merged_schema / rename_column / drop_column — Delta's
    mergeSchema append, ALTER TABLE RENAME COLUMN via prev_names
    coalesce, ALTER TABLE DROP COLUMN via tombstones): the even-keyed
    orders land first WITHOUT o_orderstatus (v1), the odd keys append
    WITH it plus a scratch column (v2 — append widens the logical
    schema, old files read the new column as NULL), then o_totalprice
    is renamed to `price` (v3, metadata-only — reads coalesce the new
    logical name over the old physical name, no file rewritten) and
    the scratch column is dropped (v4, tombstone). The post-DDL head
    must hash-match SQL over ALL orders with pre-evolution rows
    bucketed as '(pre-evolution)' — proving evolution/rename/drop
    changed projection only, never data. Snapshot-versioned schema
    replay, re-add refusal, and rename collision guards are pinned in
    tests/test_txn_rename_drop.py and tests/test_schema_evolution.py. At 100 TB this is THE schema-change
    path: a rename or drop that rewrote the corpus would be a
    multi-day job; here all three DDLs are one CAS commit each."""
    import uuid

    from spark_data_engineering_spark.cacheutil import code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"schemaevo:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/schemaevo-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t = TxnTable(tmp_root, "orders_evo")
        t.append(                                             # v1: 2-col schema
            o.filter(F.col("o_orderkey") % 2 == 0)
            .select("o_orderkey", "o_totalprice")
            .repartition(3)
        )
        t.append(                                             # v2: +status +scratch
            o.filter(F.col("o_orderkey") % 2 == 1)
            .withColumn("scratch", F.lit("tmp"))
            .repartition(3)
        )
        t.rename_column(spark, "o_totalprice", "price")       # v3: metadata-only
        t.drop_column(spark, "scratch")                       # v4: tombstone
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_evo")
    df = t.read(spark)
    assert set(df.columns) == {"o_orderkey", "price", "o_orderstatus"}, (
        df.columns
    )
    return (
        df.select(
            F.coalesce("o_orderstatus", F.lit("(pre-evolution)")).alias(
                "status"
            ),
            "price",
        )
        .groupBy("status")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("price").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def _orders_hidden_partition_table(spark: SparkSession, sf_dir: str) -> TxnTable:
    """Orders partitioned by a GENERATED month column — Iceberg's
    hidden partitioning (``month(o_orderdate)`` transform) composed
    from two existing primitives: a generated column computes the
    transform at write time (writers never supply it), and hive-style
    partition_cols records it per file for exact metadata pruning."""
    stat = os.stat(f"{sf_dir}/orders.parquet")
    from spark_data_engineering_spark.cacheutil import claim, code_digest
    from spark_data_engineering_spark.sources import txn as _txn_mod

    digest = hashlib.md5(
        f"hiddenpart:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    root = f"/tmp/spark_de_incremental/hiddenpart-{digest}"
    claim(root)  # keep a concurrent sweep_stale off a live entry
    table = TxnTable(
        root,
        "orders_hidden",
        partition_cols=("o_month",),
        generated_cols={"o_month": "date_format(o_orderdate, 'yyyy-MM')"},
    )
    if table.version() == 0:
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderpriority", "o_totalprice", "o_orderdate"
        )
        # co-locate each month in one task -> one value-pure file per
        # month; overwrite so racing builders converge
        table.overwrite(
            o.repartition(F.expr("date_format(o_orderdate, 'yyyy-MM')"))
        )
    return table


@query(
    "txn_hidden_partition_revenue",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderdate >= DATE '1995-03-01' AND o_orderdate < DATE '1995-04-01'
    GROUP BY 1
    """,
)
def txn_hidden_partition_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN PARTITIONING under the gate (Iceberg's month() partition
    transform, composed from sources/txn.py generated columns +
    partition_cols): the table partitions on a GENERATED
    ``o_month = date_format(o_orderdate, 'yyyy-MM')`` that no writer
    ever supplies — the transform is table metadata, not pipeline code,
    so every ingest path (append/overwrite/MERGE/COPY INTO/stream)
    lands value-pure monthly files automatically. A one-month query
    plans its scan from commit-log partitionValues alone (pinned
    exact-pruning assertion, as txn_partition_pruned_revenue) and must
    hash-match plain SQL with the equivalent DATE-RANGE predicate over
    all orders — proving transform-partitioning changes layout, never
    results. At 100 TB this is THE ingest-time layout contract:
    time-range scans touch one month's bytes and the transform can't
    drift per-writer because the table computes it."""
    table = _orders_hidden_partition_table(spark, sf_dir)
    want = {"o_month": "1995-03"}
    pruned = table.prune_files(None, equals=want)
    stats = table.file_stats()
    expect = sorted(
        name
        for name, cols in stats.items()
        if (cols.get("partitionValues") or {}).get("o_month") == "1995-03"
    )
    if pruned != expect or not pruned or len(pruned) >= len(stats):
        raise AssertionError(
            f"hidden-partition pruning not exact: kept {len(pruned)} of "
            f"{len(stats)} files, expected {len(expect)}"
        )
    return (
        table.read(spark, prune_eq=want)
        .filter(F.col("o_month") == "1995-03")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "txn_fsck_report",
    oracle="""
    SELECT TRUE AS ok,
           CAST(0 AS BIGINT) AS n_missing_files,
           CAST(0 AS BIGINT) AS n_missing_dv,
           CAST(0 AS BIGINT) AS n_row_drift,
           CAST(0 AS BIGINT) AS n_stats_gaps,
           CAST(0 AS BIGINT) AS n_partition_gaps,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE NOT (o_orderkey % 11 = 0)
    """,
)
def txn_fsck_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FSCK under the gate (sources/txn.py::fsck — Delta's FSCK REPAIR
    TABLE detection half): a partitioned table goes through the full
    mutation lifecycle — append, merge-on-read DV delete, a
    partition-scoped OPTIMIZE (``compact(where=...)``, round 9) that
    materializes the scoped partition's DVs — and a DEEP fsck (every
    live file's footer row count vs the recorded ``__num_rows``; no
    data pages) must come back fully clean, with the surviving rows'
    aggregate hash-matching SQL. Detection of each corruption class
    (live file deleted behind the log, referenced DV sidecar removed,
    in-place file replacement) is pinned in tests/test_txn_fsck.py.
    At 100 TB fsck is the trust gate after any incident: metadata-only
    shallow tier, footer-bounded deep tier, both parallelizable."""
    import uuid

    from spark_data_engineering_spark.cacheutil import claim, code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"fsck:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/fsck-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_fsck", partition_cols=("o_orderstatus",))
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t.append(o.repartition(4, "o_orderkey"))                  # v1
        t.delete_where_dv(spark, F.col("o_orderkey") % 11 == 0)   # v2 (DV)
        t.compact(spark, where={"o_orderstatus": "F"})            # v3 scoped
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_fsck")
    rep = t.fsck(deep=True)
    assert rep["deep"] and rep["files_checked"] > 0, rep
    agg = t.read(spark).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )
    return agg.select(
        F.lit(rep["ok"]).alias("ok"),
        F.lit(len(rep["missing_files"])).cast("bigint").alias("n_missing_files"),
        F.lit(len(rep["missing_dv"])).cast("bigint").alias("n_missing_dv"),
        F.lit(len(rep["row_drift"])).cast("bigint").alias("n_row_drift"),
        F.lit(len(rep["stats_gaps"])).cast("bigint").alias("n_stats_gaps"),
        F.lit(len(rep["partition_gaps"]))
        .cast("bigint")
        .alias("n_partition_gaps"),
        "n_rows",
        "revenue",
    )


@query(
    "txn_reorg_purge_revenue",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE NOT (o_orderkey % 7 = 0)
    GROUP BY o_orderstatus
    """,
)
def txn_reorg_purge_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REORG APPLY (PURGE) under the gate (sources/txn.py::reorg_purge —
    Delta's REORG TABLE): after a merge-on-read DV delete, purge
    rewrites ONLY the DV-dirty files (pinned in-query: the clean files
    must survive under their original names, and no live file carries
    an outstanding DV row afterwards) and the surviving rows must
    hash-match SQL. This is the GDPR-scale reclaim path: a 1% delete
    costs ~1% of the table in rewrite bytes, where full OPTIMIZE costs
    the corpus. Rename/drop physical purging and partitioned
    value-purity are pinned in tests/test_txn_reorg.py."""
    import uuid

    from spark_data_engineering_spark.cacheutil import claim, code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"reorg:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"{'/tmp/spark_de_incremental'}/reorg-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_reorg")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        # range-clustered files so the DV delete dirties a SUBSET
        t.append(o.repartitionByRange(6, "o_orderkey"))           # v1
        t.delete_where_dv(
            spark,
            (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") < 5000),
        )                                                          # v2
        t.delete_where(spark, (F.col("o_orderkey") % 7 == 0))      # v3 (rest, CoW)
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_reorg")
    before = set(t.live_files())
    _, deleted = t.dv_state()
    dirty = set(deleted) & before
    v = t.reorg_purge(spark)
    after = set(t.live_files(v))
    # clean files survive under their original names; every DV-dirty
    # file is gone; no live file carries an outstanding DV row
    assert (before - dirty) <= after, "reorg rewrote a clean file"
    assert not (dirty & after), "reorg left a DV-dirty file live"
    _, deleted2 = t.dv_state(v)
    assert not (set(deleted2) & after), "outstanding DV rows survive purge"
    return t.read(spark).groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_manifest_revenue",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE NOT (o_orderkey % 5 = 0)
    GROUP BY o_orderstatus
    """,
)
def txn_manifest_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATE manifest under the gate (sources/txn.py::
    generate_manifest — Delta's GENERATE symlink_format_manifest): the
    snapshot is exported as newline-delimited absolute file paths and
    read back by a reader that knows NOTHING of the commit log — plain
    ``spark.read.parquet`` over the manifest's paths, standing in for
    Trino/Presto/Hive SymlinkTextInputFormat — and must hash-match SQL
    over the surviving rows. The DV-refusal contract (outstanding
    deletion vectors would silently resurrect rows in an external
    engine) and hive per-partition manifests are pinned in
    tests/test_txn_manifest.py. At 100 TB this is zero-copy interop:
    downstream engines consume pinned snapshots, the lakehouse stays
    the single source of truth."""
    import uuid

    from spark_data_engineering_spark.cacheutil import claim, code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"manifest:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/manifest-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_manifest")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t.append(o.repartition(4))                              # v1
        t.delete_where(spark, F.col("o_orderkey") % 5 == 0)     # v2 (CoW)
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_manifest")
    # generated at the published location (absolute paths pin to the
    # final table dir, not the build scratch); metadata-only, idempotent
    mdir = t.generate_manifest()
    paths = []
    for dirpath, _dirs, files in os.walk(mdir):
        for f in files:
            if f == "manifest":
                with open(os.path.join(dirpath, f)) as fh:
                    paths.extend(p for p in fh.read().splitlines() if p)
    assert paths, "manifest is empty"
    # the log-oblivious external reader: plain parquet over the manifest
    return (
        spark.read.parquet(*paths)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "txn_merge_sync_revenue",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE NOT (o_orderkey % 3 = 0)
    GROUP BY o_orderstatus
    """,
)
def txn_merge_sync_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHEN NOT MATCHED BY SOURCE THEN DELETE under the gate
    (sources/txn.py::merge(when_not_matched_by_source=) — Delta 2.3's
    by-source clause): the target is SYNCED to a source snapshot in one
    MERGE — matched rows survive untouched (when_matched=None),
    unmatched target rows are dropped — and must hash-match SQL with
    the source's own predicate. The 100 TB cost shape is pinned in
    tests/test_txn_merge.py: a live file containing zero matching keys
    is removed as pure metadata, never read, so sync cost tracks the
    files that contain matches (plus the wholesale metadata drops) —
    the full-sync / SCD close-out pattern without a full-table rewrite.
    Model-search coverage: the merge_sync op in tests/test_txn_model.py
    interleaves syncs with every other lifecycle op."""
    import uuid

    from spark_data_engineering_spark.cacheutil import claim, code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"mergesync:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/mergesync-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_sync")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        # range-clustered files so part of the key space lands in files
        # the sync source never touches (the wholesale-drop path)
        t.append(o.repartitionByRange(6, "o_orderkey"))
        src = o.filter(F.col("o_orderkey") % 3 != 0)
        t.merge(
            spark,
            src,
            on=["o_orderkey"],
            when_matched=None,
            when_not_matched=None,
            when_not_matched_by_source="delete",
        )
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_sync")
    return t.read(spark).groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "txn_history_audit",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'append',         CAST(2 AS BIGINT), CAST(0 AS BIGINT), TRUE),
        (CAST(2 AS BIGINT), 'delete_dv',      CAST(0 AS BIGINT), CAST(0 AS BIGINT), TRUE),
        (CAST(3 AS BIGINT), 'properties-set', CAST(0 AS BIGINT), CAST(0 AS BIGINT), TRUE),
        (CAST(4 AS BIGINT), 'compact',        CAST(1 AS BIGINT), CAST(2 AS BIGINT), TRUE)
    ) AS t(version, action, n_add, n_remove, ts_monotonic)
    """,
)
def txn_history_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY under the gate (sources/txn.py::history — Delta's
    DESCRIBE HISTORY): a four-commit lifecycle (append -> merge-on-read
    DV delete -> TBLPROPERTIES DDL -> OPTIMIZE) must replay from the log
    as exactly that operation sequence, with per-commit add/remove file
    counts pinned (append stages 2, the DV and DDL commits move ZERO
    files, compact swaps 2-for-1) and commit timestamps monotonically
    non-decreasing — the audit-trail surface an operator reads to
    answer "what touched this table, when, and how much data moved".
    Metadata-only end-to-end: the query never opens a data file."""
    import uuid

    from spark_data_engineering_spark.cacheutil import claim, code_digest, sweep_stale
    from spark_data_engineering_spark.sources import txn as _txn_mod

    stat = os.stat(f"{sf_dir}/orders.parquet")
    digest = hashlib.md5(
        f"history:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}:"
        f"{code_digest(_txn_mod)}".encode()
    ).hexdigest()[:16]
    os.makedirs("/tmp/spark_de_incremental", exist_ok=True)
    sweep_stale("/tmp/spark_de_incremental")
    root = f"/tmp/spark_de_incremental/history-{digest}"
    if not claim(root):
        tmp_root = f"{root}.build-{uuid.uuid4().hex}"
        t = TxnTable(tmp_root, "orders_hist")
        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_totalprice"
        )
        t.append(o.repartition(2))                                # v1
        t.delete_where_dv(spark, F.col("o_orderkey") % 10 == 0)   # v2
        t.set_properties({"tier": "audit"})                       # v3
        t.compact(spark, target_file_bytes=1 << 34)               # v4
        try:
            os.rename(tmp_root, root)
        except OSError:
            shutil.rmtree(tmp_root, ignore_errors=True)  # racer published
    t = TxnTable(root, "orders_hist")
    hist = t.history()
    ts = [c.get("ts") for c in hist]
    mono = all(
        a is not None and b is not None and a <= b
        for a, b in zip(ts, ts[1:])
    )
    rows = [
        (
            c["version"],
            c["action"],
            len(c.get("add", ())),
            len(c.get("remove", ())),
            mono,
        )
        for c in hist
    ]
    return spark.createDataFrame(
        rows,
        "version bigint, action string, n_add bigint, n_remove bigint, "
        "ts_monotonic boolean",
    )
