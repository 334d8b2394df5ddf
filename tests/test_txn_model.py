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
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable

# ops: ("append", [vals]) | ("overwrite", [vals]) | ("delete_le", v) | ("compact",)
_op = st.one_of(
    st.tuples(st.just("append"), st.lists(st.integers(0, 99), min_size=1, max_size=5)),
    st.tuples(st.just("overwrite"), st.lists(st.integers(0, 99), max_size=4)),
    st.tuples(st.just("delete_le"), st.integers(0, 99)),
    st.tuples(st.just("compact")),
)


@settings(max_examples=4, deadline=None)
@given(st.lists(_op, min_size=2, max_size=7), st.integers(0, 10**6))
def test_random_op_sequence_matches_model(spark, tmp_path_factory, ops, seq_id):
    root = str(tmp_path_factory.mktemp(f"txnmodel{seq_id}"))
    table = TxnTable(root, "t", checkpoint_every=3)
    model: list[int] = []
    snapshots: dict[int, list[int]] = {}

    def df_of(vals):
        return spark.createDataFrame([(v,) for v in vals], "val int").coalesce(1)

    def read_vals(at_version=None):
        # an empty table (never written, or fully deleted) raises by
        # contract; the model maps that to the empty multiset
        try:
            return sorted(
                r.val for r in table.read(spark, at_version=at_version).collect()
            )
        except FileNotFoundError:
            return []

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
        else:
            table.compact(spark, target_file_bytes=1 << 20)
        if table.version() > 0:
            snapshots[table.version()] = sorted(model)
        assert read_vals() == sorted(model), f"after {op}"

    # every committed version time-travels to its exact snapshot
    for v, snap in snapshots.items():
        assert read_vals(at_version=v) == snap, f"time travel v{v}"
