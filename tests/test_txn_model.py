"""Model-based ACID check for TxnTable: a random sequence of
append / overwrite / delete_where / compact operations is applied both
to the real table and to a trivial in-memory model; after EVERY op the
table's read() must equal the model, and at the end every recorded
version must time-travel back to exactly the model snapshot taken when
that version committed.

This is the randomized complement to the fixed-scenario tests in
test_txn.py — it searches op-order interactions (e.g. compact directly
after delete, overwrite of an empty table, consecutive compacts) that
hand-written cases don't enumerate. Checkpoint cadence is forced low
(checkpoint_every=3) so log-replay-from-checkpoint is exercised inside
nearly every sequence.

Round-9 dimensions: partition-scoped OPTIMIZE (``compact_where`` —
visible no-op on a partitioned table, refused on an unpartitioned
one) joins the op mix, and the FSCK invariant runs after EVERY op
(shallow log-vs-disk check; one deep footer pass per sequence at the
end) — any op that commits a reference to a file or sidecar it did
not actually leave on disk now fails the search immediately.

Round-10 dimensions (VERDICT r9 task 7): the round-9 maintenance
surfaces join the mix so ledger inheritance, property snapshots, and
clone isolation interact with the full lifecycle under
FSCK-after-every-op:
  - ``set_props``: TBLPROPERTIES set/unset cycles — a property-model
    dict is asserted equal after every op (CAS metadata commits must
    be data no-ops AND property merges must fold exactly);
  - ``clone_cycle``: SHALLOW CLONE at head — the clone must read the
    model exactly, mutating the clone must not leak into the parent,
    and the clone's own fsck must pass;
  - ``copy_into_cycle``: landing-zone ingest + immediate replay — the
    replay must load 0 files (at-most-once ledger) at any point in
    the lifecycle; on generated/identity tables the op must REFUSE as
    a perfect no-op; on partitioned tables it exercises the round-10
    value-pure re-staging path;
  - ``convert_seed``: when the table has no commits yet, seed it via
    CONVERT TO DELTA instead of append — on a partitioned run the
    corpus is written hive-partitioned (round-10 adoption path), so
    EVERY subsequent op in the sequence runs against a hive-origin
    table whose reads project partition values from the log;
  - ``analyze``: metadata-only ANALYZE — visible state untouched and
    the committed stats payload must equal a recompute over the model
    (rows / NDV / min / max of val);
  - ``add_column``: ADD COLUMN DEFAULT once per sequence — every row
    thereafter reads NULL (pre-add file) or the default, never
    garbage, re-asserted after EVERY subsequent op (rewrites must
    carry the column without inventing values).

Round-11 dimensions (VERDICT r10 tasks 5 & 8):
  - ``hive`` joins plain/generated/identity as a FOURTH first-class
    table mode: the whole sequence is seeded via CONVERT TO DELTA
    before the first op (hive-partitioned corpus when the run is
    partitioned, so data files physically DROP the partition column
    and every read/CDF/stream projection runs hive-origin), with the
    default-DDL and merge-evolution ops mixed in — round 10's one
    real bug lived exactly in this interaction class;
  - ``set_default``: ALTER COLUMN SET/DROP DEFAULT mid-lifecycle —
    the 'extra' value domain tracks every default that was ever
    active ({None, 7..9}), asserted after every op;
  - ``merge_evolve``: MERGE schema evolution (Delta
    withSchemaEvolution) — the source declares mcol = val*3; later
    single-column merges are MISSING it and opt into evolution
    (Delta's strict rule would refuse them), updated rows must KEEP
    their mcol (updateAll preserves unSET columns), inserts read
    NULL, and the mcol domain {NULL, val*3} is asserted after every
    rewrite.

Round-11 find (40-example deep run): ``convert_seed`` (hive mode) ->
``partition_evolve`` to UNPARTITIONED -> read returned NULL for the
adopted files' partition column — the JVM read and CDF gates required
a non-empty CURRENT partition_cols() before projecting hive-origin
partition values. Fixed (both gates key on hive_origin alone); pinned
in tests/test_txn_partition_evolution.py::
test_hive_projection_survives_unpartitioning. A 40-example re-run is
clean.

Round-10 find (first deep run, 25 examples): ``convert_seed`` +
``branch_cycle`` falsified the CDF fold — read_changes' delete_dv arm
read data files RAW (bypassing the partition-value projection), so DV
delete images on hive-origin files carried NULL partition columns and
the fold diverged from the table. Fixed in txn.py (the arm now
projects); pinned in tests/test_txn_hive_partitioned.py::
test_hive_dv_delete_cdf_images_carry_partition_values.
"""

from __future__ import annotations

import os

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable

# ops: ("append", [vals]) | ("overwrite", [vals]) | ("delete_le", v)
#    | ("compact",) | ("merge_upsert", [vals]) | ("merge_delete", [vals])
#    | ("append_epoch", epoch, [vals]) | ("vacuum",)
_op = st.one_of(
    st.tuples(st.just("append"), st.lists(st.integers(0, 99), min_size=1, max_size=5)),
    st.tuples(st.just("overwrite"), st.lists(st.integers(0, 99), max_size=4)),
    st.tuples(st.just("delete_le"), st.integers(0, 99)),
    st.tuples(st.just("delete_dv_le"), st.integers(0, 99)),
    st.tuples(st.just("compact")),
    st.tuples(
        st.just("merge_upsert"), st.lists(st.integers(0, 99), min_size=1, max_size=4)
    ),
    st.tuples(
        st.just("merge_delete"), st.lists(st.integers(0, 99), min_size=1, max_size=4)
    ),
    # WHEN NOT MATCHED BY SOURCE THEN DELETE (round 9): one merge syncs
    # the target to the source key set — matched rows update, unmatched
    # source keys insert, unmatched TARGET rows are dropped (an empty
    # key list empties the table, metadata-only)
    st.tuples(
        st.just("merge_sync"), st.lists(st.integers(0, 99), max_size=4)
    ),
    # bounded sync (round 9): WHEN NOT MATCHED BY SOURCE AND val < c
    # THEN DELETE — unmatched rows BELOW the bound drop, unmatched rows
    # at/above it survive as-is (the blast-radius guard)
    st.tuples(
        st.just("merge_sync_bounded"),
        st.lists(st.integers(0, 99), max_size=3),
        st.integers(0, 99),
    ),
    # epochs drawn from a tiny range so replays (epoch <= last committed)
    # occur in most sequences — the exactly-once property under test
    st.tuples(
        st.just("append_epoch"),
        st.integers(1, 3),
        st.lists(st.integers(0, 99), min_size=1, max_size=3),
    ),
    st.tuples(st.just("vacuum")),
    # rollback to a random recorded version (refusals — vacuumed target,
    # post-target DV overlap — must be perfect no-ops)
    st.tuples(st.just("restore"), st.integers(0, 100)),
    # branch -> DV-correct + append on the branch -> fast-forward merge
    st.tuples(
        st.just("branch_cycle"),
        st.lists(st.integers(0, 99), min_size=1, max_size=3),
        st.integers(0, 99),
    ),
    # branch -> parent diverges -> branch appends -> rebase -> merge
    st.tuples(
        st.just("rebase_cycle"),
        st.lists(st.integers(0, 99), min_size=1, max_size=3),
        st.lists(st.integers(0, 99), min_size=1, max_size=3),
    ),
    # DV maintenance: drop all-dead sidecars — visible state unchanged
    st.tuples(st.just("dv_prune")),
    # partition-scoped OPTIMIZE (round 9): rewrites only the files of
    # one partition value — visible no-op; on an UNPARTITIONED table
    # the predicate must be refused as a perfect no-op
    st.tuples(st.just("compact_where"), st.integers(0, 99)),
    # scoped layout migration (round 12): compact(scope='pre-evolution')
    # rewrites ONLY files staged under a pre-set_partitioning scheme —
    # visible no-op; afterwards every live file must be value-pure on
    # the current scheme (the replace_where unblock invariant)
    st.tuples(st.just("compact_evolved")),
    # ALTER COLUMN type widening (round 12): one metadata commit widens
    # val int->bigint; later int appends stay accepted (stage narrow,
    # read wide), re-widening and widening a partition column are
    # refused as perfect no-ops; values must survive unchanged
    st.tuples(st.just("widen_val")),
    # tags (round 12): create a tag at the current head — the tagged
    # read must equal the tag-time snapshot at the END of the sequence,
    # through every later rewrite AND through vacuum(keep_versions=1)
    # (tagged versions are GC ref roots)
    st.tuples(st.just("tag_head")),
    # auto-compaction: bin-pack only sub-threshold small files —
    # visible state unchanged, DVs materialized, value-purity kept
    st.tuples(st.just("compact_small")),
    # UPDATE ... SET val = val + 100 WHERE val <= x (copy-on-write
    # rewrite); on a PARTITIONED table the op targets the partition
    # column and must be REFUSED as a perfect no-op
    st.tuples(st.just("update_le"), st.integers(0, 99)),
    # CHECK constraint lifecycle: add (refused if existing data
    # violates), a possibly-violating append (refused atomically,
    # staged bytes cleaned), then drop — table state must match the
    # model through every refusal
    # TBLPROPERTIES set/unset (round 10): pure-metadata CAS commits —
    # data must be untouched, the property model must fold exactly
    st.tuples(st.just("set_props"), st.integers(0, 99)),
    # ANALYZE TABLE (round 10): metadata-only stats commit — visible
    # state untouched, and the committed payload must equal what a
    # recompute over the model says (rows / min / max / NDV of val)
    st.tuples(st.just("analyze")),
    # ADD COLUMN DEFAULT (round 10): one metadata commit; every row
    # thereafter reads NULL (pre-add file) or the default (post-add
    # default-omitting write) — never garbage — through every rewrite
    st.tuples(st.just("add_column")),
    # ALTER COLUMN SET/DROP DEFAULT (round 11): re-point or drop the
    # 'extra' default mid-lifecycle — the value domain of later
    # default-omitting writes must track the change exactly, and
    # existing bytes must never move
    st.tuples(st.just("set_default"), st.integers(0, 99)),
    # MERGE schema evolution (round 11, Delta withSchemaEvolution):
    # the source introduces a brand-new column mcol = val * 3 — the
    # merge's own commit declares it, matched/inserted rows carry it,
    # pre-existing untouched rows read NULL, and every later rewrite
    # must preserve the mcol in (NULL, val*3) domain
    st.tuples(
        st.just("merge_evolve"),
        st.lists(st.integers(0, 99), min_size=1, max_size=4),
    ),
    # partition evolution (round 11, Iceberg v2): toggle the layout
    # between ("val",) and () mid-lifecycle — a pure-metadata commit;
    # old files keep their recorded values, later writes stage under
    # the new scheme, and every subsequent op must hold the model on
    # the MIXED layout
    st.tuples(st.just("partition_evolve")),
    # SHALLOW CLONE at head (round 10): clone == model, clone mutation
    # never leaks into the parent, clone fsck passes
    st.tuples(
        st.just("clone_cycle"), st.lists(st.integers(0, 99), max_size=3)
    ),
    # COPY INTO + immediate replay (round 10): at-most-once ledger at
    # any lifecycle point; refused (perfect no-op) on generated /
    # identity tables; value-pure re-staging on partitioned ones
    st.tuples(
        st.just("copy_into_cycle"),
        st.lists(st.integers(0, 99), min_size=1, max_size=4),
    ),
    # CONVERT TO DELTA seed (round 10): only fires while the table has
    # no commits — on partitioned runs the corpus is hive-partitioned,
    # making the whole remaining sequence run hive-origin
    st.tuples(
        st.just("convert_seed"),
        st.lists(st.integers(0, 99), min_size=1, max_size=4),
    ),
    st.tuples(
        st.just("constraint_cycle"),
        st.integers(0, 99),
        st.lists(st.integers(0, 99), max_size=4),
        # persist flag: additionally leave a never-violated constraint
        # (val >= 0) on the table so every LATER op runs under an
        # active CHECK — in particular restore's r9 guard (a
        # constraint-add whose validation never saw re-added files
        # refuses metadata-only restore; restore(v, spark)
        # re-validates and proceeds)
        st.booleans(),
    ),
)

# one-off deeper searches: TXN_MODEL_EXAMPLES=25 python -m pytest tests/test_txn_model.py
# (and TXN_MODEL_MAXOPS=12 for longer op sequences — deep interleavings
# like branch->restore->prune->merge need more than 7 steps to form)
_EXAMPLES = int(os.environ.get("TXN_MODEL_EXAMPLES", "4"))
_MAXOPS = int(os.environ.get("TXN_MODEL_MAXOPS", "7"))


@settings(max_examples=_EXAMPLES, deadline=None)
@given(
    st.lists(_op, min_size=2, max_size=_MAXOPS),
    st.integers(0, 10**6),
    st.booleans(),
    st.sampled_from(["plain", "generated", "identity", "hive"]),
)
def test_random_op_sequence_matches_model(
    spark, tmp_path_factory, ops, seq_id, partitioned, colmode
):
    generated = colmode == "generated"
    identity = colmode == "identity"
    hive = colmode == "hive"
    # half the searches run on a hive-PARTITIONED table (partition col =
    # the value column, so every staged file is value-pure): every op
    # interaction — append/delete/dv/compact/merge/branch/restore — then
    # exercises the partitioned staging path and the same invariants.
    # Orthogonally, half declare a GENERATED column g = val * 2 + 1 that
    # no op ever supplies: every row-introducing path must compute it,
    # every rewrite (delete/compact/merge/branch replay/update) must
    # carry or regenerate it, and the g == 2*val+1 invariant is asserted
    # on every read below — the classic place a rewrite path that
    # re-stages rows without the table's write contract would surface
    # ...or an IDENTITY column rid (GENERATED ALWAYS AS IDENTITY) that
    # no op ever supplies: row-introducing paths allocate, rewrites
    # carry values through, and rid stays UNIQUE after every op; ops
    # the identity contract refuses (merge, a both-sides-allocating
    # rebase) must refuse as perfect no-ops
    root = str(tmp_path_factory.mktemp(f"txnmodel{seq_id}"))
    table = TxnTable(
        root,
        "t",
        checkpoint_every=3,
        partition_cols=("val",) if partitioned else (),
        generated_cols={"g": "val * 2 + 1"} if generated else None,
        identity_cols={"rid": {"start": 1, "step": 1}} if identity else None,
    )
    model: list[int] = []
    if hive:
        # fourth first-class mode (round 11, VERDICT r10 task 8): the
        # WHOLE sequence runs against a hive-origin table — seeded via
        # CONVERT before the first op, hive-partitioned when the run
        # is partitioned (data files DROP val; every read projects it
        # from the log) — with the default-DDL and merge-evolution ops
        # in the mix. Round 10's one real bug lived exactly in this
        # interaction class.
        corpus0 = os.path.join(root, "corpus0")
        seed = [1, 2, 3]
        seed_df = spark.createDataFrame(
            [(v,) for v in seed], "val int"
        ).coalesce(1)
        if partitioned:
            seed_df.withColumn("pad", F.col("val") * 10).write.partitionBy(
                "val"
            ).parquet(corpus0)
        else:
            seed_df.write.parquet(corpus0)
        TxnTable.convert_from_parquet(spark, root, "t", corpus0)
        model.extend(seed)
        if partitioned:
            assert table.hive_origin(), "hive origin not recorded"
    snapshots: dict[int, list[int]] = {}
    last_epoch = 0  # exactly-once watermark model for app "m"
    vacuumed = False  # read_changes(0) needs every historical file
    n_branches = 0
    prop_model: dict[str, str] = {}  # TBLPROPERTIES model (round 10)
    tag_model: dict[str, list[int]] = {}  # tag name -> snapshot (round 12)
    extra_domain = {None, 7}  # legal 'extra' values (round-11 set_default)
    n_side = 0  # landing/clone/corpus dir counter (round 10)

    def df_of(vals):
        return spark.createDataFrame([(v,) for v in vals], "val int").coalesce(1)

    def read_vals(at_version=None):
        # an empty table (never written, or fully deleted) raises by
        # contract; the model maps that to the empty multiset
        try:
            rows = table.read(spark, at_version=at_version).collect()
        except FileNotFoundError:
            return []
        if generated:
            bad = [(r.val, r.g) for r in rows if r.g != r.val * 2 + 1]
            assert not bad, f"generated column diverged: {bad[:5]}"
        if rows and hasattr(rows[0], "extra"):
            # ADD/SET/DROP COLUMN DEFAULT invariant (rounds 10-11):
            # NULL (pre-add file or post-drop write) or a default that
            # was ACTIVE at some write — never garbage — after every op
            badx = [
                (r.val, r.extra)
                for r in rows
                if r.extra not in extra_domain
            ]
            assert not badx, f"extra column corrupted: {badx[:5]}"
        if rows and hasattr(rows[0], "mcol"):
            # MERGE schema evolution invariant (round 11): the evolved
            # column is val*3 where a merge wrote it, NULL everywhere
            # else (pre-evolution files, evolution-less inserts) —
            # through every rewrite. update_le shifts val by +100 while
            # correctly PRESERVING mcol (UPDATE SET val touches val
            # alone), so a post-update row legitimately carries its
            # PRE-update key's mcol — the round-12 harness fix: the
            # original invariant keyed mcol to the current val and
            # flagged exactly that correct preservation (merge_evolve
            # -> update_le, found when new strategy entries reshuffled
            # exploration). vals are 0..99 and one update moves a row
            # out of every update predicate's range, so at most one
            # shift applies.
            badm = [
                (r.val, r.mcol)
                for r in rows
                if r.mcol not in (None, r.val * 3)
                and not (r.val >= 100 and r.mcol == (r.val - 100) * 3)
            ]
            assert not badm, f"mcol corrupted: {badm[:5]}"
        if identity:
            rids = [r.rid for r in rows]
            assert len(set(rids)) == len(rids), "identity values collided"
        return sorted(r.val for r in rows)

    def evolve_kw():
        # the model's merge sources are always val-only; whenever the
        # live target schema carries MORE than defaults/generation/
        # identity will fill (mcol from merge_evolve, the hive seed's
        # pad column), Delta's strict rule refuses them — so the model
        # (like a real CDC caller after an upstream column add) opts
        # into evolution; otherwise the strict path runs
        live = {
            f["name"]
            for f in (table.table_schema() or [])
            if not f.get("dropped")
        }
        filled = (
            {"val"}
            | set(table.generated_cols())
            | set(table.identity_cols())
            | set(table.column_defaults())
        )
        return {"schema_evolution": True} if live - filled else {}

    for op in ops:
        if op[0] == "append":
            table.append(df_of(op[1]))
            model.extend(op[1])
        elif op[0] == "overwrite":
            if op[1]:
                table.overwrite(df_of(op[1]))
                model = list(op[1])
            else:
                continue  # empty overwrite not modeled
        elif op[0] == "delete_le":
            if table.version() == 0:
                continue  # nothing committed yet
            table.delete_where(spark, F.col("val") <= op[1])
            model = [v for v in model if v > op[1]]
        elif op[0] == "delete_dv_le":
            # merge-on-read twin of delete_le: same visible semantics,
            # wildly different mechanics (position sidecar, no rewrite) —
            # random interleavings with compact/merge/vacuum are exactly
            # where a DV-materialization bug would hide
            if table.version() == 0:
                continue
            table.delete_where_dv(spark, F.col("val") <= op[1])
            model = [v for v in model if v > op[1]]
        elif op[0] == "merge_upsert":
            # single-column rows: key == value, so "update" keeps every
            # matched target row byte-identical (multiplicity preserved)
            # and "insert" adds one copy of each unmatched source key.
            # On an identity table, matched rows must KEEP their rid and
            # inserts get fresh ones — the read_vals uniqueness check
            # catches either going wrong.
            keys = sorted(set(op[1]))
            table.merge(spark, df_of(keys), on=["val"], **evolve_kw())
            model = model + [k for k in keys if k not in model]
        elif op[0] == "merge_delete":
            keys = sorted(set(op[1]))
            table.merge(
                spark,
                df_of(keys),
                on=["val"],
                when_matched="delete",
                when_not_matched=None,
                **evolve_kw(),
            )
            model = [v for v in model if v not in set(keys)]
        elif op[0] == "merge_sync":
            if table.version() == 0:
                continue
            keys = sorted(set(op[1]))
            table.merge(
                spark,
                df_of(keys),
                on=["val"],
                when_not_matched_by_source="delete",
                **evolve_kw(),
            )
            ks = set(keys)
            # matched rows "update" to themselves (key == value) with
            # multiplicity preserved; unmatched source keys insert;
            # unmatched target rows are dropped by the sync
            model = [v for v in model if v in ks] + [
                k for k in keys if k not in model
            ]
        elif op[0] == "merge_sync_bounded":
            if table.version() == 0:
                continue
            keys, bound = sorted(set(op[1])), op[2]
            table.merge(
                spark,
                df_of(keys),
                on=["val"],
                when_matched=None,
                when_not_matched="insert",
                when_not_matched_by_source="delete",
                by_source_condition=F.col("val") < bound,
                **evolve_kw(),
            )
            ks = set(keys)
            # matched rows survive AS-IS; unmatched rows below the bound
            # drop, at/above it survive; unmatched source keys insert
            model = [v for v in model if v in ks or v >= bound] + [
                k for k in keys if k not in model
            ]
        elif op[0] == "append_epoch":
            committed = table.append_idempotent(df_of(op[2]), "m", op[1])
            if op[1] <= last_epoch:
                assert committed is None, f"replayed epoch {op[1]} committed"
            else:
                assert committed is not None
                model.extend(op[2])
                last_epoch = op[1]
        elif op[0] == "vacuum":
            # keep_versions=1 retains only the head snapshot; every older
            # version's files may be gone, so drop their snapshots from
            # the time-travel expectations
            table.vacuum(keep_versions=1, min_age_s=0.0)
            head = table.version()
            snapshots = {v: s for v, s in snapshots.items() if v >= head}
            vacuumed = True
        elif op[0] == "dv_prune":
            if table.version() == 0:
                continue
            table.prune_dv_sidecars()  # never changes visible state
        elif op[0] == "compact_small":
            if table.version() == 0:
                continue
            table.compact_small(spark, min_files=2)  # visible no-op
        elif op[0] == "compact_where":
            if table.version() == 0:
                continue
            # branch on the CURRENT scheme, not the run flag —
            # partition_evolve toggles the layout mid-sequence (r11)
            if table.partition_cols() == ("val",):
                # scoped rewrite of one partition value: visible no-op
                table.compact(
                    spark, target_file_bytes=1 << 20, where={"val": op[1]}
                )
            else:
                import pytest as _pytest

                with _pytest.raises(ValueError, match="not partition columns"):
                    table.compact(spark, where={"val": op[1]})
        elif op[0] == "update_le":
            if table.version() == 0:
                continue
            if table.partition_cols() == ("val",):
                # val IS the partition column: the update must refuse
                # (rows would move between value-pure files) and leave
                # the table untouched
                import pytest as _pytest

                with _pytest.raises(ValueError, match="partition column"):
                    table.update_where(
                        spark,
                        F.col("val") <= op[1],
                        {"val": F.col("val") + 100},
                    )
            else:
                table.update_where(
                    spark, F.col("val") <= op[1], {"val": F.col("val") + 100}
                )
                model = [v + 100 if v <= op[1] else v for v in model]
        elif op[0] == "constraint_cycle":
            import pytest as _pytest

            from spark_data_engineering_spark.checks import CheckError

            k, vals = op[1], op[2]
            if any(v > k for v in model):
                # existing data violates: the add must refuse and leave
                # no constraint behind
                with _pytest.raises(CheckError, match="existing data"):
                    table.add_constraint(spark, "le", f"val <= {k}")
                assert "le" not in table.constraints()
            else:
                table.add_constraint(spark, "le", f"val <= {k}")
                if vals and any(v > k for v in vals):
                    # a mixed batch refuses ATOMICALLY (good rows in the
                    # same staged batch must not land)
                    with _pytest.raises(CheckError, match="le"):
                        table.append(df_of(vals))
                elif vals:
                    table.append(df_of(vals))
                    model.extend(vals)
                table.drop_constraint("le")
            if op[3] and "nonneg" not in table.constraints():
                # persistent, never-violated (vals are 0..99; update
                # adds +100): later ops run under an active CHECK
                table.add_constraint(spark, "nonneg", "val >= 0")
        elif op[0] == "analyze":
            if table.version() == 0 or not model:
                continue
            stats = table.analyze(spark, columns=["val"])
            assert stats["val"]["num_nulls"] == 0
            assert stats["val"]["distinct_count"] == len(set(model))
            assert int(stats["val"]["min"]) == min(model)
            assert int(stats["val"]["max"]) == max(model)
            cs = table.column_stats()
            assert cs["rows"] == len(model) and cs["columns"] == stats
        elif op[0] == "add_column":
            # once per sequence: later ops must carry the column through
            # every rewrite without inventing values
            sch = table.table_schema() or []
            # needs a recorded schema to extend (a props-only commit at
            # v1 has none — _seeded_schema raises by contract, found by
            # the search itself); once per sequence
            if not sch or "extra" in {f["name"] for f in sch}:
                continue
            table.add_column(spark, "extra", "int", default=7)
            # pre-add rows read NULL; every later default-omitting write
            # (all of this model's writes) materializes 7 — checked via
            # the read below and the value-domain assertion here (an
            # emptied table reads by raising, its own contract)
            try:
                vals = {
                    r.extra
                    for r in table.read(spark).select("extra").collect()
                }
            except FileNotFoundError:
                vals = set()
            assert vals <= {None, 7}, vals
        elif op[0] == "set_default":
            sch = {f["name"] for f in (table.table_schema() or [])}
            if "extra" not in sch:
                continue
            if op[1] % 4 == 3:
                # DROP DEFAULT (refused loudly when none is active —
                # that refusal must be a perfect no-op)
                if "extra" in table.column_defaults():
                    table.drop_column_default(spark, "extra")
                else:
                    import pytest as _pytest

                    with _pytest.raises(ValueError, match="no default"):
                        table.drop_column_default(spark, "extra")
            else:
                d = 7 + (op[1] % 3)  # 7..9
                table.set_column_default(spark, "extra", d)
                extra_domain.add(d)
        elif op[0] == "partition_evolve":
            if table.version() == 0:
                continue
            cur = table.partition_cols()
            table.set_partitioning(spark, () if cur else ("val",))
        elif op[0] == "compact_evolved":
            table.compact(
                spark, scope="pre-evolution", target_file_bytes=1 << 20
            )
            pcols = table.partition_cols()
            if pcols:
                fstats = table.file_stats(table.version())
                assert all(
                    c in (st.get("partitionValues") or {})
                    for st in fstats.values()
                    for c in pcols
                ), "scoped compact left a pre-evolution file live"
        elif op[0] == "widen_val":
            import pytest as _pytest

            if table.version() == 0:
                continue
            if "val" in table.partition_cols():
                with _pytest.raises(ValueError, match="partition column"):
                    table.widen_column(spark, "val", "bigint")
            else:
                cur_ty = {
                    f["name"]: f["type"] for f in table.table_schema()
                }.get("val")
                if cur_ty == "long":
                    with _pytest.raises(ValueError, match="nothing to widen"):
                        table.widen_column(spark, "val", "bigint")
                else:
                    table.widen_column(spark, "val", "bigint")
                    assert dict(table.read(spark).dtypes)["val"] == "bigint"
        elif op[0] == "tag_head":
            if table.version() == 0:
                continue
            name = f"tag{len(tag_model)}"
            table.create_tag(name)
            tag_model[name] = sorted(model)
        elif op[0] == "merge_evolve":
            keys = sorted(set(op[1]))
            src = spark.createDataFrame(
                [(v, v * 3) for v in keys], "val int, mcol int"
            ).coalesce(1)
            table.merge(spark, src, on=["val"], schema_evolution=True)
            model = model + [k for k in keys if k not in model]
        elif op[0] == "set_props":
            # pure-metadata CAS commit; every 3rd draw unsets instead.
            # The prop_model equality below (after every op) pins that
            # merges fold exactly and nothing else disturbs them.
            k = f"k{op[1] % 3}"
            if op[1] % 3 == 2 and k in prop_model:
                table.unset_properties([k])
                prop_model.pop(k, None)
            else:
                table.set_properties({k: str(op[1])})
                prop_model[k] = str(op[1])
        elif op[0] == "clone_cycle":
            if table.version() == 0:
                continue
            n_side += 1
            c = table.clone(os.path.join(root, "clones"), f"c{n_side}")
            try:
                got = sorted(r.val for r in c.read(spark).collect())
            except FileNotFoundError:
                got = []  # clone of an emptied table reads empty by contract
            assert got == sorted(model), "clone != parent snapshot"
            assert c.properties() == prop_model, "clone props diverged"
            if op[1]:
                c.append(df_of(op[1]))  # must NOT leak into the parent
            assert c.fsck()["ok"], "clone fsck"
        elif op[0] == "copy_into_cycle":
            n_side += 1
            land = os.path.join(root, f"landing{n_side}")
            df_of(op[1]).write.parquet(land)
            if generated or identity:
                import pytest as _pytest

                with _pytest.raises(ValueError, match="generated"):
                    table.copy_into(spark, land)
            else:
                r1 = table.copy_into(spark, land)
                assert r1["files_loaded"] >= 1
                model.extend(op[1])
                # immediate replay: the at-most-once ledger must hold
                # at ANY point in the lifecycle
                r2 = table.copy_into(spark, land)
                assert r2["files_loaded"] == 0, "COPY INTO replayed"
        elif op[0] == "convert_seed":
            # only meaningful as the table's FIRST commit, and convert
            # declares no generated/identity columns
            if table.version() != 0 or generated or identity:
                continue
            n_side += 1
            corpus = os.path.join(root, f"corpus{n_side}")
            if partitioned:
                # hive layout (round 10): data files DROP val; every
                # later op runs against a hive-origin table whose reads
                # project it from the log. A pad column keeps Spark's
                # all-columns-partitioning refusal away; appends lack
                # it and read NULL (never asserted on).
                df_of(op[1]).withColumn(
                    "pad", F.col("val") * 10
                ).write.partitionBy("val").parquet(corpus)
            else:
                df_of(op[1]).write.parquet(corpus)
            TxnTable.convert_from_parquet(spark, root, "t", corpus)
            model.extend(op[1])
            if partitioned:
                assert table.hive_origin(), "hive origin not recorded"
        elif op[0] == "restore":
            if not snapshots or table.version() == 0:
                continue
            versions = sorted(snapshots)
            target = versions[op[1] % len(versions)]
            if target == table.version():
                continue
            try:
                table.restore(target)
                model = list(snapshots[target])
            except ValueError as e:
                # legal refusal (vacuumed target / post-target DV overlap
                # with restored files / post-target constraint-add that
                # never validated the re-added files): a perfect no-op
                assert read_vals() == sorted(model), "refused restore mutated"
                if "constraint" in str(e):
                    # the r9 guard: DV checks already passed (they run
                    # first), and the persistent constraint (val >= 0)
                    # holds on every snapshot — the spark-assisted
                    # restore re-validates and MUST go through
                    table.restore(target, spark)
                    model = list(snapshots[target])
                else:
                    continue
        elif op[0] == "branch_cycle":
            if table.version() == 0:
                continue
            n_branches += 1
            b = table.branch(f"b{n_branches}")
            b.delete_where_dv(spark, F.col("val") <= op[2])
            b.append(df_of(op[1]))
            table.merge_branch(b)
            table.drop_branch(f"b{n_branches}")
            model = [v for v in model if v > op[2]] + list(op[1])
        elif op[0] == "rebase_cycle":
            if table.version() == 0:
                continue
            n_branches += 1
            b = table.branch(f"b{n_branches}")
            table.append(df_of(op[1]))  # parent DIVERGES past the base
            b.append(df_of(op[2]))
            if identity:
                # BOTH lines allocated from the shared base watermark:
                # the rebase must refuse (staged ids collide) and leave
                # the parent exactly as its own append left it
                from spark_data_engineering_spark.sources.txn import (
                    ConcurrentWriteError as _CWE,
                )

                import pytest as _pytest

                with _pytest.raises(_CWE, match="IDENTITY"):
                    table.rebase_branch(b)
                table.drop_branch(f"b{n_branches}")
                model = model + list(op[1])
            else:
                rb = table.rebase_branch(b)
                table.merge_branch(rb)
                table.drop_branch(f"b{n_branches}")
                model = model + list(op[1]) + list(op[2])
        else:
            table.compact(spark, target_file_bytes=1 << 20)
        if table.version() > 0:
            snapshots[table.version()] = sorted(model)
        assert read_vals() == sorted(model), f"after {op}"
        # TBLPROPERTIES model (round 10): metadata commits fold exactly
        # and no data op disturbs them
        assert table.properties() == prop_model, f"props after {op}"
        # FSCK invariant (round 9): after EVERY op the log's promises
        # hold on disk — no live file missing, no referenced sidecar
        # gone. Shallow tier only (metadata + existence) so the search
        # stays fast; one deep pass runs at the end.
        rep = table.fsck()
        assert rep["ok"], f"fsck after {op}: {rep}"

    if table.version() > 0:
        deep = table.fsck(deep=True)
        assert deep["ok"], f"deep fsck at end: {deep}"

    # every committed version time-travels to its exact snapshot
    for v, snap in snapshots.items():
        assert read_vals(at_version=v) == snap, f"time travel v{v}"

    # every tag reads its tag-time snapshot — INCLUDING through vacuum
    # (tagged versions are ref roots; untagged history may be gone)
    for name, snap in tag_model.items():
        try:
            got = sorted(
                r.val for r in table.read(spark, tag=name).collect()
            )
        except FileNotFoundError:
            got = []
        assert got == snap, f"tag {name} diverged from its snapshot"

    # partitioned: partition pruning is EXACT for every surviving value
    # (pruned read == filtered model), and each kept file that RECORDED
    # a val partition value carries the queried one (value-purity held
    # through every rewrite — delete/compact/merge/branch replay).
    # Under partition evolution (round 11) a kept file may carry NO
    # recorded val at all — written while the layout was evolved away —
    # and the conservative keep is the contract; a file recording a
    # DIFFERENT val would still be a pruning bug
    if partitioned and model and table.version() > 0:
        probe = sorted(set(model))[: 3]
        stats = table.file_stats()
        for x in probe:
            kept = table.prune_files(None, equals={"val": x})
            got = sorted(
                r.val
                for r in table.read(spark, prune_eq={"val": x})
                .filter(F.col("val") == x)
                .collect()
            )
            assert got == [v for v in sorted(model) if v == x], f"prune {x}"
            for f in kept:
                pv = stats[f].get("partitionValues") or {}
                assert "val" not in pv or pv["val"] == str(x), (
                    f"file {f} kept for val={x} carries {pv}"
                )

    # the change feed is CONSERVATIVE over any op mix: folding
    # read_changes(0) — insert +1 / delete -1 per row — must land on
    # exactly the final multiset (vacuum excluded: the row-level diff
    # needs historical files it may have collected)
    if not vacuumed and table.version() > 0:
        from collections import Counter

        fold: Counter = Counter()
        for r in table.read_changes(spark, 0).collect():
            fold[r.val] += 1 if r._change_type == "insert" else -1
        folded = sorted(v for v, n in fold.items() for _ in range(n))
        assert folded == sorted(model), "CDF fold diverged from the table"


def test_emptied_table_ops_are_noops_then_reusable(spark, tmp_path):
    """Regression for the round-4 Hypothesis find (append -> delete-all ->
    delete again raised FileNotFoundError from delete_where's unguarded
    read): every mutating op on a fully-emptied table must be a no-op
    commit-wise, read() must raise by contract, and the table must be
    reusable by a later append."""
    import pytest

    table = TxnTable(str(tmp_path), "t")
    table.append(spark.createDataFrame([(0,)], "val int").coalesce(1))
    table.delete_where(spark, F.col("val") <= 0)  # table now empty
    v_empty = table.version()

    # the original falsifying example: delete on the emptied table
    assert table.delete_where(spark, F.col("val") <= 0) == v_empty
    assert table.compact(spark, target_file_bytes=1 << 20) == v_empty
    assert (
        table.merge(
            spark,
            spark.createDataFrame([(1,)], "val int").coalesce(1),
            on=["val"],
            when_matched="delete",
            when_not_matched=None,
        )
        == v_empty
    )
    with pytest.raises(FileNotFoundError):
        table.read(spark)

    # the table is not dead: a later append resumes normal life
    table.append(spark.createDataFrame([(7,)], "val int").coalesce(1))
    assert [r.val for r in table.read(spark).collect()] == [7]


# ---------------------------------------------------------------------------
# Two-handle concurrent-DDL interleavings (round 12; VERDICT r11 task 7).
# Both round-11 finds — the lost-DDL head-cache race and the hive
# projection gate — were STALE-HANDLE classes the single-handle walk
# only grazed: one handle resolves table state, another commits DDL,
# and the first handle's next commit must not act on (or re-stamp) the
# world it cached. This mode drives one table through two independent
# TxnTable handles ("a" opened at creation, "b" opened before the first
# op — neither ever re-opened), interleaving data commits and the full
# DDL family, and after EVERY op asserts on a THIRD, fresh handle:
# model equality, fsck, and that all three handles agree on
# partition_cols / schema (the exact surface a stale cache reverts).

_H_OP = st.one_of(
    st.tuples(
        st.just("append"),
        st.lists(st.integers(0, 99), min_size=1, max_size=3),
    ),
    st.tuples(st.just("delete_le"), st.integers(0, 99)),
    st.tuples(st.just("partition_evolve")),
    st.tuples(st.just("widen_val")),
    # NESTED widening (round 13): the seed carries meta struct<id:int>
    # with id = val*10; one handle widens meta.id -> bigint while the
    # other may be appending / merging at the narrow shape — the
    # id==val*10 domain must hold on every row that has a meta, through
    # every later rewrite, and re-widening must refuse
    st.tuples(st.just("widen_nested")),
    # tags (round 12; handler added round 13 — the op was in the set
    # but unhandled, a silent no-op): tag the current head; after EVERY
    # later op each tag must still read its tag-time snapshot exactly
    st.tuples(st.just("tag_head")),
    # tag-vs-vacuum (round 13, VERDICT r12 task 6): retention on one
    # handle while the other tags/rewrites — tagged versions are GC
    # ref roots, so every tag survives keep_versions=1
    st.tuples(st.just("vacuum")),
    st.tuples(st.just("add_extra"), st.integers(0, 9)),
    st.tuples(
        st.just("merge_evolve"),
        st.lists(st.integers(0, 99), min_size=1, max_size=3),
    ),
    st.tuples(st.just("compact_evolved")),
    st.tuples(st.just("set_props"), st.integers(0, 99)),
)


@settings(max_examples=_EXAMPLES, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), _H_OP),
        min_size=3,
        max_size=_MAXOPS,
    ),
    st.integers(0, 10**6),
)
def test_two_handle_ddl_interleavings(spark, tmp_path_factory, ops, seq_id):
    import pytest as _pytest

    root = str(tmp_path_factory.mktemp(f"txn2h{seq_id}"))
    a = TxnTable(root, "t", checkpoint_every=3)
    # the seed carries a NESTED column (id = val*10) so widen_nested
    # and narrow-shape concurrent writers exercise the recursive
    # lattice; later appends omit meta entirely (reads NULL)
    a.append(
        spark.createDataFrame(
            [(1, (10,)), (2, (20,))], "val int, meta struct<id:int>"
        ).coalesce(1)
    )
    model = [1, 2]
    b = TxnTable(root, "t")  # independent handle (another process)
    handles = {"a": a, "b": b}
    prop_model: dict[str, str] = {}
    defaults: dict[str, int] = {}  # extra column -> its add-time default
    tag_model: dict[str, list[int]] = {}  # tag -> sorted vals at tag time
    n_extra = 0

    def df_of(vals, h):
        df = spark.createDataFrame(
            [(v,) for v in vals], "val int"
        ).coalesce(1)
        return df

    for who, op in ops:
        h = handles[who]
        if op[0] == "append":
            h.append(df_of(op[1], h))
            model.extend(op[1])
        elif op[0] == "delete_le":
            h.delete_where(spark, F.col("val") <= op[1])
            model = [v for v in model if v > op[1]]
        elif op[0] == "partition_evolve":
            cur = h.partition_cols()
            h.set_partitioning(spark, () if cur else ("val",))
        elif op[0] == "widen_val":
            if "val" in h.partition_cols():
                with _pytest.raises(ValueError, match="partition column"):
                    h.widen_column(spark, "val", "bigint")
            elif {
                f["name"]: f["type"] for f in h.table_schema()
            }.get("val") == "long":
                with _pytest.raises(ValueError, match="nothing to widen"):
                    h.widen_column(spark, "val", "bigint")
            else:
                h.widen_column(spark, "val", "bigint")
        elif op[0] == "widen_nested":
            meta_ty = {
                f["name"]: f["type"] for f in h.table_schema()
            }.get("meta")
            leaf = (
                meta_ty["fields"][0]["type"]
                if isinstance(meta_ty, dict)
                else None
            )
            if leaf == "long":
                with _pytest.raises(ValueError, match="nothing to widen"):
                    h.widen_column(spark, "meta.id", "bigint")
            else:
                h.widen_column(spark, "meta.id", "bigint")
        elif op[0] == "tag_head":
            name = f"tag{len(tag_model)}"
            h.create_tag(name)
            tag_model[name] = sorted(model)
        elif op[0] == "vacuum":
            h.vacuum(keep_versions=1, min_age_s=0.0)
        elif op[0] == "add_extra":
            n_extra += 1
            name = f"x{n_extra}"
            h.add_column(spark, name, "int", default=op[1])
            defaults[name] = op[1]
        elif op[0] == "merge_evolve":
            keys = sorted(set(op[1]))
            src = spark.createDataFrame(
                [(v, v * 3) for v in keys], "val int, mcol int"
            ).coalesce(1)
            h.merge(spark, src, on=["val"], schema_evolution=True)
            model = model + [k for k in keys if k not in model]
        elif op[0] == "compact_evolved":
            h.compact(
                spark, scope="pre-evolution", target_file_bytes=1 << 20
            )
            pcols = h.partition_cols()
            if pcols:
                fstats = h.file_stats(h.version())
                assert all(
                    c in (st_.get("partitionValues") or {})
                    for st_ in fstats.values()
                    for c in pcols
                ), "scoped compact left a pre-evolution file live"
        elif op[0] == "set_props":
            k = f"k{op[1] % 3}"
            if op[1] % 3 == 2 and k in prop_model:
                h.unset_properties([k])
                prop_model.pop(k, None)
            else:
                h.set_properties({k: str(op[1])})
                prop_model[k] = str(op[1])
        # ---- invariants on a FRESH third handle, after every op ----
        fresh = TxnTable(root, "t")
        try:
            rows = fresh.read(spark).collect()
        except FileNotFoundError:
            rows = []
        assert sorted(r.val for r in rows) == sorted(model), f"after {op}"
        # the lost-DDL surface: all three handles must resolve the SAME
        # scheme and schema — a stale cache on the idle handle would
        # diverge here (and its next commit would revert the DDL)
        assert (
            a.partition_cols()
            == b.partition_cols()
            == fresh.partition_cols()
        ), f"partition_cols diverged across handles after {op}"
        assert a.table_schema() == b.table_schema() == fresh.table_schema(), (
            f"schema diverged across handles after {op}"
        )
        assert fresh.properties() == prop_model, f"props diverged after {op}"
        for r in rows:
            if hasattr(r, "mcol"):
                assert r.mcol in (None, r.val * 3), (r.val, r.mcol)
            if hasattr(r, "meta") and r.meta is not None:
                # the nested domain survives widening + every rewrite
                assert r.meta.id == r.val * 10, (r.val, r.meta)
            for name, d in defaults.items():
                if hasattr(r, name):
                    assert getattr(r, name) in (None, d), (name, r.val)
        # tag-vs-vacuum: every tag still reads its tag-time snapshot —
        # through later rewrites on EITHER handle and keep_versions=1
        # retention (tagged versions are GC ref roots)
        for tname, tvals in tag_model.items():
            try:
                got = sorted(
                    r.val for r in fresh.read(spark, tag=tname).collect()
                )
            except FileNotFoundError:
                got = []  # empty-at-tag-time snapshot (documented raise)
            assert got == tvals, f"tag {tname} diverged after {op}"
        assert fresh.fsck()["ok"], f"fsck after {op}"
