"""Recall / QPS sweep runner.

Mirrors the reference's ef-sweep perf probe (tests/test_recall_perf.rs:
98-125, which prints an insert/search/recall table over (ef_c, ef_s)
configs) as a reusable library: measure recall@k against the brute-force
oracle and sustained QPS for a list of ef values.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from tpuvec.index.bruteforce import bruteforce_knn_internal
from tpuvec.index.graph import GraphState, HnswConfig
from tpuvec.index.search import search_graph

__all__ = ["SweepPoint", "recall_qps_sweep", "recall_at_k"]


@dataclass
class SweepPoint:
    ef: int
    n_expand: int
    recall: float
    ms_per_batch: float
    qps: float


def recall_at_k(found: np.ndarray, truth: np.ndarray) -> float:
    hits = total = 0
    for f, t in zip(found, truth):
        tt = set(int(v) for v in t if v >= 0)
        hits += len(tt & set(int(v) for v in f))
        total += len(tt)
    return hits / max(total, 1)


def recall_qps_sweep(
    config: HnswConfig,
    state: GraphState,
    queries_prepared: jnp.ndarray,
    *,
    k: int = 10,
    efs: tuple[int, ...] = (16, 24, 32, 48, 64, 96, 128),
    n_expand: int = 1,
    reps: int = 5,
    ground_truth: np.ndarray | None = None,
) -> list[SweepPoint]:
    """Run the ef sweep. Computes exact ground truth on device unless given."""
    qn = queries_prepared.shape[0]
    if ground_truth is None:
        _, gt = bruteforce_knn_internal(
            queries_prepared,
            state.vectors,
            state.levels >= 0,
            metric=config.graph_metric,
            k=k,
            normalized=config.normalized,
        )
        ground_truth = np.asarray(gt)
    # Distinct query batch per rep: the runtime result-caches repeated jit
    # executions with byte-identical inputs (CLAUDE.md), which would inflate
    # QPS. Rolling the rows changes the bytes but not the workload, and
    # works for every query dtype (f32 / int8 / packed bits).
    import jax

    rep_qs = [jnp.roll(queries_prepared, i + 1, axis=0) for i in range(reps)]
    jax.block_until_ready(rep_qs)
    out = []
    for ef in efs:
        d_h, i_h = search_graph(
            config, state, queries_prepared, k=k, ef=ef, n_expand=n_expand
        )
        i_h.block_until_ready()  # compile
        t0 = time.time()
        outs = [
            search_graph(config, state, rep_qs[i], k=k, ef=ef, n_expand=n_expand)[1]
            for i in range(reps)
        ]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / reps
        out.append(
            SweepPoint(
                ef=ef,
                n_expand=n_expand,
                recall=recall_at_k(np.asarray(i_h), ground_truth),
                ms_per_batch=dt * 1e3,
                qps=qn / dt,
            )
        )
    return out
