"""tpuvec benchmark — prints ONE JSON line for the driver.

North-star metric (BASELINE.json): QPS/chip at recall@10 >= 0.95 on
1M x 768 f32 (cosine), plus HNSW build vectors/sec. The single-core
reference baseline is ~357 QPS (the stated 2.8 ms/query parity
requirement, /root/reference/examples/performance_report.rs:247-250;
envelope /root/reference/CHANGELOG.md:92-96).

The 1M build takes 10-25 min on one chip and the axon relay can stall
nondeterministically on long runs (CLAUDE.md), so the build runs in a
retryable SUBPROCESS that checkpoints graph state to /tmp every segment:
a stalled attempt is killed by timeout, the device gets ~5 min to
recover, and the next attempt resumes from the checkpoint instead of
starting over.

Environment knobs:
  TPUVEC_BENCH_N       corpus size (default 1_000_000)
  TPUVEC_BENCH_D       dimensions (default 768)
  TPUVEC_BENCH_Q       query batch (default 256)
  TPUVEC_BENCH_FRESH   set to 1 to ignore an existing checkpoint

Side info (build rate, sweep table) goes to stderr; stdout carries
exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

N = int(os.environ.get("TPUVEC_BENCH_N", 1_000_000))
D = int(os.environ.get("TPUVEC_BENCH_D", 768))
QN = int(os.environ.get("TPUVEC_BENCH_Q", 256))
K = 10
REPS = 5
BASELINE_QPS = 357.0
SEGMENT = 131_072          # checkpoint every ~2.5 min of build
CKPT = f"/tmp/tpuvec_bench_{N}x{D}.npz"
SIDECAR = CKPT + ".json"
# graph fields persisted in the checkpoint; `vectors` is reconstructed
# from the (deterministic) dataset on load — saves 3 GB per checkpoint
_CKPT_FIELDS = [
    "adj0", "adj0_dist", "levels", "upper_slot", "upper_nodes",
    "upper_adj", "upper_dist", "entry_point", "entry_level", "count",
    "upper_count",
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _jax_setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvec_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from tpuvec.utils.safecache import enable_atomic_cache_writes

    enable_atomic_cache_writes()
    return jax


def _config():
    from tpuvec.index import HnswParams
    from tpuvec.index.graph import config_for
    from tpuvec.types import DistanceMetric

    # TPU-tuned degree: search cost is bound by gathered-row count
    # (B x M0 rows/iter at ~16 ns/row on v5e), so M0=32 beats the
    # reference's CPU-tuned 64 — measured at 100K x 768: 0.984 recall @
    # 20.9K QPS (vs 0.982 @ 15.3K) and 2x the build rate
    params = HnswParams(m=16, max_m0=32, ef_construction=200, ef_search=128)
    return config_for(D, metric=DistanceMetric.COSINE, params=params, cap=N)


def _dataset():
    """Deterministic corpus + query pool (worker and parent both call)."""
    from tpuvec.utils.data import synthetic_embeddings

    n_clusters = 1024 if N >= 500_000 else 256
    data = synthetic_embeddings(
        N + QN * (REPS + 1), D, n_clusters=n_clusters, seed=0
    )
    return data[:N], data[N:]


def _restore_state(cfg, xp_dev, jnp):
    """Load checkpoint -> (state, pos, build_seconds); fresh if absent."""
    from tpuvec.index.graph import GraphState

    if os.environ.get("TPUVEC_BENCH_FRESH") == "1" or not (
        os.path.exists(CKPT) and os.path.exists(SIDECAR)
    ):
        return None, 0, 0.0
    try:
        with open(SIDECAR) as f:
            side = json.load(f)
        z = np.load(CKPT)
        if z["upper_adj"].ndim != 2:  # pre-flattening checkpoint layout
            log("checkpoint from an older graph layout; starting fresh")
            return None, 0, 0.0
        pos = int(side["pos"])
        fields = {f: jnp.asarray(z[f]) for f in _CKPT_FIELDS}
        mask = (np.arange(N) < pos)[:, None]
        fields["vectors"] = jnp.where(jnp.asarray(mask), xp_dev, 0)
        state = GraphState(**fields)
        log(f"resumed checkpoint at {pos}/{N} ({side['secs']:.0f}s spent)")
        return state, pos, float(side["secs"])
    except Exception as e:
        log(f"checkpoint unreadable ({e!r}); starting fresh")
        return None, 0, 0.0


def _save_state(state, pos, secs):
    arrays = {f: np.asarray(getattr(state, f)) for f in _CKPT_FIELDS}
    tmp = CKPT + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, CKPT)
    with open(SIDECAR + ".tmp", "w") as f:
        json.dump({"pos": pos, "secs": secs}, f)
    os.replace(SIDECAR + ".tmp", SIDECAR)


def build_worker() -> int:
    """Subprocess: build (or resume) the graph, checkpointing per segment."""
    jax = _jax_setup()
    import jax.numpy as jnp

    from tpuvec.index.build import build_graph
    from tpuvec.index.graph import allocate
    from tpuvec.utils.transfer import prepare_vectors_device

    cfg = _config()
    log(f"worker: backend={jax.default_backend()}")
    x, _ = _dataset()
    xp_dev = prepare_vectors_device(cfg, x)
    state, pos, secs = _restore_state(cfg, xp_dev, jnp)
    if state is None:
        state = allocate(cfg)
    while pos < N:
        take = min(SEGMENT, N - pos)
        blk = np.arange(pos, pos + take, dtype=np.int32)
        t0 = time.time()
        state = build_graph(
            cfg,
            xp_dev[pos : pos + take],
            ids=blk,
            max_batch=1024,
            state=state,
            start_size=max(pos, 1),
        )
        state.count.block_until_ready()
        secs += time.time() - t0
        pos += take
        _save_state(state, pos, secs)
        log(f"worker: {pos}/{N} ({pos / max(secs, 1e-9):.0f} vec/s)")
    return 0


def run_build() -> float:
    """Drive the worker with retries; returns total build seconds."""
    if os.environ.get("TPUVEC_BENCH_FRESH") == "1":
        for p in (CKPT, SIDECAR):
            if os.path.exists(p):
                os.remove(p)
        os.environ.pop("TPUVEC_BENCH_FRESH")
    attempt_timeout = max(1200, int(N / 600) + 900)
    last_pos = -1
    for attempt in range(5):
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--build-worker"],
                timeout=attempt_timeout,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
            log(f"build attempt {attempt} timed out ({attempt_timeout}s)")
        pos = -1
        if os.path.exists(SIDECAR):
            with open(SIDECAR) as f:
                side = json.load(f)
            pos = int(side["pos"])
            if pos >= N:
                return float(side["secs"])
        if rc != 0 and pos <= last_pos:
            # no forward progress: give the device time to recover
            log("no progress; waiting 300s for device recovery")
            time.sleep(300)
        last_pos = pos
    raise RuntimeError("build did not complete after 5 attempts")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--build-worker":
        sys.exit(build_worker())

    t_all = time.time()
    build_s = run_build()

    jax = _jax_setup()
    import jax.numpy as jnp

    from tpuvec.index import bruteforce_knn
    from tpuvec.index.graph import prepare_vectors
    from tpuvec.index.search import search_graph
    from tpuvec.utils.transfer import prepare_vectors_device

    cfg = _config()
    log(f"backend={jax.default_backend()} corpus {N}x{D} f32 cosine k={K}")
    log(f"build: {N} vectors in {build_s:.1f}s = {N / build_s:.0f} vec/s")
    x, qpool = _dataset()
    xp_dev = prepare_vectors_device(cfg, x)
    state, pos, _ = _restore_state(cfg, xp_dev, jnp)
    assert state is not None and pos == N, "checkpoint must be complete here"

    qp = prepare_vectors(cfg, jnp.asarray(qpool[:QN]))
    gt_d, gt_i = bruteforce_knn(
        qp, xp_dev, jnp.ones(N, bool), metric=cfg.graph_metric, k=K,
        normalized=cfg.normalized,
    )
    gt = np.asarray(gt_i)
    del xp_dev

    def recall(found):
        hits = sum(
            len(set(found[b].tolist()) & set(gt[b].tolist())) for b in range(QN)
        )
        return hits / (QN * K)

    # distinct query batches per rep: defeats the runtime's same-input
    # result cache (CLAUDE.md)
    rep_qs = [
        prepare_vectors(cfg, jnp.asarray(qpool[(i + 1) * QN : (i + 2) * QN]))
        for i in range(REPS)
    ]
    jax.block_until_ready(rep_qs)

    best = None
    fallback = None
    # (ef, max_iters): a capped iteration budget trades the last ~0.003
    # recall for 20-25% QPS (measured at 1M: ef=48 default-iters 0.983 @
    # 12.9K vs iters=56 0.977 @ 16.5K); None = default_max_iters
    sweep = [
        (24, None), (32, None), (48, 44), (48, 56), (48, None),
        (64, 64), (96, None), (128, None), (192, None), (256, None),
    ]
    for ef, mi in sweep:
        d_h, i_h = search_graph(cfg, state, qp, k=K, ef=ef, max_iters=mi)
        i_h.block_until_ready()  # compile
        t0 = time.time()
        outs = [
            search_graph(cfg, state, rep_qs[i], k=K, ef=ef, max_iters=mi)[1]
            for i in range(REPS)
        ]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / REPS
        qps = QN / dt
        r = recall(np.asarray(i_h))
        log(
            f"ef={ef:4d} iters={mi if mi else 'def':>4} recall@10={r:.4f} "
            f"{dt * 1e3:7.2f} ms/batch {qps:9.0f} QPS"
        )
        if fallback is None or r > fallback[1]:
            fallback = (qps, r, ef)
        if r >= 0.95 and (best is None or qps > best[0]):
            best = (qps, r, ef)
        if r >= 0.95 and best is not None and qps < best[0] / 2:
            break  # recall already met; deeper ef only gets slower

    if best is None:
        log("WARNING: no ef reached recall 0.95; reporting highest-recall point")
        best = fallback

    qps, r, ef = best
    log(f"total bench wall time {time.time() - t_all:.0f}s")
    print(
        json.dumps(
            {
                "metric": (
                    f"QPS/chip at recall@10>={r:.3f} ({N}x{D} f32 cosine, "
                    f"ef={ef}); build {N / build_s:.0f} vec/s"
                ),
                "value": round(qps, 1),
                "unit": "QPS",
                "vs_baseline": round(qps / BASELINE_QPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
