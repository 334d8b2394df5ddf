"""tools/make_scale_data.py invariants (duckdb-only, no Spark): exact
N x row counts for replicated tables, fixed dims, join integrity under
the key offsets, and similarity-structure preservation for documents."""

from __future__ import annotations

import subprocess
import sys

import duckdb
import pytest

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scaled"))
    subprocess.run(
        [sys.executable, "/root/repo/tools/make_scale_data.py", SRC, dst, "3"],
        check=True,
        capture_output=True,
    )
    return dst


def _n(con, path):
    return con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0]


def test_counts_and_fixed_dims(scaled):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        assert _n(con, f"{scaled}/{t}.parquet") == 3 * _n(con, f"{SRC}/{t}.parquet"), t
    for t in ("region", "nation", "part", "supplier"):
        assert _n(con, f"{scaled}/{t}.parquet") == _n(con, f"{SRC}/{t}.parquet"), t


def test_join_integrity_under_offsets(scaled):
    con = duckdb.connect()
    orphans = con.execute(
        f"""SELECT count(*) FROM '{scaled}/orders.parquet' o
            LEFT JOIN '{scaled}/customer.parquet' c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL"""
    ).fetchone()[0]
    assert orphans == 0
    li_orphans = con.execute(
        f"""SELECT count(*) FROM '{scaled}/lineitem.parquet' l
            LEFT JOIN '{scaled}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL"""
    ).fetchone()[0]
    assert li_orphans == 0
    # keys stay unique after offsetting
    for t, k in (("orders", "o_orderkey"), ("customer", "c_custkey"),
                 ("documents", "doc_id"), ("embeddings", "vec_id"),
                 ("events", "event_id")):
        dup = con.execute(
            f"SELECT count(*) - count(DISTINCT {k}) FROM '{scaled}/{t}.parquet'"
        ).fetchone()[0]
        assert dup == 0, t


def test_document_similarity_structure_preserved(scaled):
    """The per-replica word bijection must preserve exact 3-gram Jaccard
    within each replica (pair count scales exactly N x) and create no
    cross-replica shingle overlap."""
    con = duckdb.connect()
    pair_sql = """
    WITH sh AS (
        SELECT doc_id,
               UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
                   RANGE(LEN(STRING_SPLIT(text, ' ')) - 2),
                   i -> STRING_SPLIT(text, ' ')[i + 1] || ' ' ||
                        STRING_SPLIT(text, ' ')[i + 2] || ' ' ||
                        STRING_SPLIT(text, ' ')[i + 3]))) AS shingle
        FROM '{path}'
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT count(*) FROM inter
    JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
    """
    base_pairs = con.execute(pair_sql.format(path=f"{SRC}/documents.parquet")).fetchone()[0]
    big_pairs = con.execute(
        pair_sql.format(path=f"{scaled}/documents.parquet")
    ).fetchone()[0]
    assert big_pairs == 3 * base_pairs
    # replicas share no vocabulary at all (disjoint shingle universes)
    dstride = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    cross = con.execute(
        f"""
        WITH w AS (
            SELECT doc_id // {dstride} AS rep,
                   UNNEST(STRING_SPLIT(text, ' ')) AS word
            FROM '{scaled}/documents.parquet'
        )
        SELECT count(*) FROM
            (SELECT DISTINCT word FROM w WHERE rep = 0) a
        JOIN (SELECT DISTINCT word FROM w WHERE rep = 1) b USING (word)
        """
    ).fetchone()[0]
    assert cross == 0
