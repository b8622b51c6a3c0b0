"""Basic usage: create a table, insert, query (mirrors the reference's
examples/basic_usage.rs through the SQL surface)."""

import json

import numpy as np

from tpuvec.sql import connect


def main() -> None:
    db = connect()
    db.execute(
        """CREATE VIRTUAL TABLE docs USING vec0(
            emb float[64] hnsw(M=16, ef_construction=100, distance=l2),
            title TEXT)"""
    )

    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((200, 64)).astype(np.float32)
    for i, v in enumerate(vectors):
        db.execute(
            "INSERT INTO docs(rowid, emb, title) VALUES (?, ?, ?)",
            [i + 1, v.tobytes(), f"doc {i}"],
        )

    probe = vectors[42]
    rows = db.execute(
        "SELECT rowid, distance, title FROM docs "
        "WHERE emb MATCH ? AND k = 5 ORDER BY distance",
        [probe.tobytes()],
    ).fetchall()
    print("5 nearest to doc 42:")
    for rowid, dist, title in rows:
        print(f"  rowid={rowid:4d} distance={dist:.4f} {title}")
    assert rows[0][0] == 43  # itself

    (version,) = db.execute("SELECT vec_version()").fetchone()
    print("version:", version)
    (length,) = db.execute(
        "SELECT vec_length(vec_f32(?))", [json.dumps([1.0, 2.0, 3.0])]
    ).fetchone()
    print("vec_length([1,2,3]) =", length)


if __name__ == "__main__":
    main()
