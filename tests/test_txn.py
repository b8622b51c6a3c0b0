"""Transaction semantics over vec0 tables.

The reference gets BEGIN/COMMIT/ROLLBACK for free: its vtab's shadow
tables live inside SQLite, so the journal covers vector writes
(src/shadow.rs:192-257) and its insert benchmarks batch inside explicit
transactions (tests/test_transaction_batching.rs:28-55,
tests/test_inmemory_batching.rs). tpuvec's engine owns the write path,
so Database implements the same surface with an undo log: vec0 writes
inside BEGIN..COMMIT defer their device flush to COMMIT (txn batching)
and ROLLBACK restores before-images through the normal write path.
"""

import numpy as np
import pytest

from tpuvec.sql import connect
from tpuvec.types import InvalidState


def mk(db, name="t", dim=8):
    db.execute(f"CREATE VIRTUAL TABLE {name} USING vec0(e float[{dim}])")


def vec(i, dim=8):
    rng = np.random.RandomState(i)
    return rng.randn(dim).astype(np.float32).tobytes()


def count(db, name="t"):
    return db.execute(f"SELECT COUNT(*) FROM {name}").fetchone()[0]


class TestCommit:
    def test_insert_batch_commits(self):
        db = connect()
        mk(db)
        db.execute("BEGIN")
        for i in range(1, 101):
            db.execute("INSERT INTO t(rowid, e) VALUES (?, ?)", [i, vec(i)])
        # flush deferred: rows pending, not yet in the device index
        assert len(db.table("t")._pending) == 100
        db.execute("COMMIT")
        assert len(db.table("t")._pending) == 0
        assert count(db) == 100

    def test_txn_keyword_variants(self):
        db = connect()
        mk(db)
        db.execute("BEGIN TRANSACTION")
        db.execute("INSERT INTO t(rowid, e) VALUES (1, ?)", [vec(1)])
        db.execute("END TRANSACTION;")
        assert count(db) == 1
        db.execute("BEGIN IMMEDIATE")
        db.execute("DELETE FROM t WHERE rowid = 1")
        db.execute("COMMIT;")
        assert count(db) == 0

    def test_read_your_writes_inside_txn(self):
        db = connect()
        mk(db)
        db.execute("BEGIN")
        db.execute("INSERT INTO t(rowid, e) VALUES (7, ?)", [vec(7)])
        rows = db.execute(
            "SELECT rowid, distance FROM t WHERE e MATCH ? AND k = 1",
            [vec(7)],
        ).fetchall()
        assert rows[0][0] == 7
        db.execute("COMMIT")


class TestRollback:
    def test_insert_rolls_back(self):
        db = connect()
        mk(db)
        db.execute("INSERT INTO t(rowid, e) VALUES (1, ?)", [vec(1)])
        db.execute("BEGIN")
        db.execute("INSERT INTO t(rowid, e) VALUES (2, ?)", [vec(2)])
        db.execute("INSERT INTO t(rowid, e) VALUES (3, ?)", [vec(3)])
        assert count(db) == 3
        db.execute("ROLLBACK")
        assert count(db) == 1
        assert [r[0] for r in db.execute("SELECT rowid FROM t")] == [1]
        # the graph no longer returns the rolled-back rows
        rows = db.execute(
            "SELECT rowid FROM t WHERE e MATCH ? AND k = 3", [vec(2)]
        ).fetchall()
        assert [r[0] for r in rows] == [1]

    def test_delete_rolls_back_with_original_vector(self):
        db = connect()
        mk(db)
        for i in range(1, 6):
            db.execute("INSERT INTO t(rowid, e) VALUES (?, ?)", [i, vec(i)])
        db.execute("BEGIN")
        db.execute("DELETE FROM t WHERE rowid IN (2, 4)")
        assert count(db) == 3
        db.execute("ROLLBACK")
        assert count(db) == 5
        # restored row still nearest to its own vector
        rows = db.execute(
            "SELECT rowid, distance FROM t WHERE e MATCH ? AND k = 1",
            [vec(4)],
        ).fetchall()
        assert rows[0][0] == 4 and rows[0][1] < 1e-5

    def test_update_rolls_back_to_before_image(self):
        db = connect()
        mk(db)
        db.execute("INSERT INTO t(rowid, e) VALUES (1, ?)", [vec(1)])
        db.execute("BEGIN")
        db.execute("UPDATE t SET e = ? WHERE rowid = 1", [vec(99)])
        db.execute("ROLLBACK")
        got = db.table("t").row(1)["e"].to_numpy()
        want = np.frombuffer(vec(1), dtype=np.float32)
        np.testing.assert_array_equal(got, want)

    def test_create_and_drop_roll_back(self):
        db = connect()
        mk(db, "keep")
        db.execute("INSERT INTO keep(rowid, e) VALUES (1, ?)", [vec(1)])
        db.execute("BEGIN")
        mk(db, "fresh")
        db.execute("DROP TABLE keep")
        assert "fresh" in db.tables and "keep" not in db.tables
        db.execute("ROLLBACK")
        assert "fresh" not in db.tables
        assert count(db, "keep") == 1

    def test_metadata_filter_delete_rolls_back(self):
        db = connect()
        db.execute(
            "CREATE VIRTUAL TABLE t USING vec0(e float[8], tag TEXT)"
        )
        for i in range(1, 7):
            db.execute(
                "INSERT INTO t(rowid, e, tag) VALUES (?, ?, ?)",
                [i, vec(i), "a" if i % 2 else "b"],
            )
        db.execute("BEGIN")
        db.execute("DELETE FROM t WHERE tag = 'b'")  # composed WHERE
        assert count(db) == 3
        db.execute("ROLLBACK")
        assert count(db) == 6
        assert db.execute(
            "SELECT COUNT(*) FROM t WHERE tag = 'b'"
        ).fetchone()[0] == 3

    def test_plain_sql_table_rolls_back_too(self):
        db = connect()
        db.execute("CREATE TABLE meta (k TEXT, v TEXT)")
        db.execute("BEGIN")
        db.execute("INSERT INTO meta VALUES ('a', '1')")
        db.execute("ROLLBACK")
        assert db.execute("SELECT COUNT(*) FROM meta").fetchone()[0] == 0


class TestErrors:
    def test_nested_begin(self):
        db = connect()
        db.execute("BEGIN")
        with pytest.raises(InvalidState):
            db.execute("BEGIN")
        db.execute("ROLLBACK")

    def test_commit_without_begin(self):
        db = connect()
        with pytest.raises(InvalidState):
            db.execute("COMMIT")

    def test_rollback_without_begin(self):
        db = connect()
        with pytest.raises(InvalidState):
            db.execute("ROLLBACK")
