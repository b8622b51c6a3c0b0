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
  TPUVEC_BENCH_BUDGET  wall-clock budget in seconds (default 900). The
                       bench ALWAYS emits a JSON line within the budget:
                       a completed checkpoint -> sweep-only fast path;
                       otherwise the build runs only if it fits, else the
                       run downgrades to the largest tier that does
                       (262K/100K/25K), so the driver never times out
                       with nothing to show (round-2 BENCH rc=124).
The full BASELINE config table (configs 1-5) is a separate command:
``python scripts/bench_suite.py`` -> BENCH_CONFIGS.md.

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
# checkpoint granularity + fit-estimate knobs (env-overridable so the
# partial-build path is testable at CPU scale)
SEGMENT = int(os.environ.get("TPUVEC_BENCH_SEGMENT", 131_072))
BUDGET = float(os.environ.get("TPUVEC_BENCH_BUDGET", 900))
RATE = float(os.environ.get("TPUVEC_BENCH_RATE", 900))  # e2e build vec/s
COLD_START = 300.0         # first-segment compile overhead estimate
ATTEMPT_CAP = float(os.environ.get("TPUVEC_BENCH_ATTEMPT", 1500))
SWEEP_RESERVE = 420.0      # ground truth + ef sweep, warm caches
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

    if os.environ.get("TPUVEC_BENCH_CPU") == "1":  # smoke-testing only
        jax.config.update("jax_platforms", "cpu")
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
    # 20.9K QPS (vs 0.982 @ 15.3K) and 2x the build rate.
    # Keep efc=200 with the UNCAPPED construction beam: capping it to 64
    # iterations (efc=128) was +46% build rate at 100K with -0.002
    # recall, but at 1M the same cap starves graph navigation (0.900 vs
    # 0.983 recall@ef=48) and buys no build rate at all (636 vs 643
    # vec/s) — the 1M build cost is NOT candidate-beam-bound
    # (ROUND_NOTES round 3)
    params = HnswParams(m=16, max_m0=32, ef_construction=200, ef_search=128)
    return config_for(D, metric=DistanceMetric.COSINE, params=params, cap=N)


def _dataset():
    """Deterministic corpus + query pool (worker and parent both call).

    Cached to /tmp as one .npy: generation takes ~5 min of single-core
    CPU at 1M x 768 and both the worker subprocess and the parent need
    it every run — a disk read is ~20x faster."""
    from tpuvec.utils.data import synthetic_embeddings

    n_clusters = 1024 if N >= 500_000 else 256
    rows = N + QN * (REPS + 1)
    cache = f"/tmp/tpuvec_data_{rows}x{D}_c{n_clusters}_s0.npy"
    if os.path.exists(cache):
        data = np.load(cache, mmap_mode="r")
    else:
        data = synthetic_embeddings(rows, D, n_clusters=n_clusters, seed=0)
        np.save(cache + f".tmp{os.getpid()}.npy", data)
        os.replace(cache + f".tmp{os.getpid()}.npy", cache)
    return data[:N], np.asarray(data[N:])


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


_ckpt_layout_ok: dict[str, bool] = {}


def _ckpt_pos() -> int:
    """Completed position recorded in the current tier's sidecar (0 if
    the checkpoint is unreadable or from an older graph layout — must
    agree with _restore_state or a tier gets selected on a checkpoint
    that then fails to load)."""
    if not (os.path.exists(CKPT) and os.path.exists(SIDECAR)):
        return 0
    try:
        with open(SIDECAR) as f:
            pos = int(json.load(f)["pos"])
        if CKPT not in _ckpt_layout_ok:
            with np.load(CKPT) as z:
                _ckpt_layout_ok[CKPT] = z["upper_adj"].ndim == 2
        return pos if _ckpt_layout_ok[CKPT] else 0
    except Exception:
        return 0


def _set_tier(n: int) -> None:
    """Point the module (and the worker subprocess env) at corpus size n."""
    global N, CKPT, SIDECAR
    N = n
    os.environ["TPUVEC_BENCH_N"] = str(n)
    CKPT = f"/tmp/tpuvec_bench_{N}x{D}.npz"
    SIDECAR = CKPT + ".json"


def run_build(stop_at: float, force: bool = False) -> float | None:
    """Drive the worker with retries until ``stop_at``; returns total
    build seconds, or None if the build can't finish in time.
    ``force`` skips the fit estimate and builds as far as the clock
    allows (partial checkpoints are sweepable)."""
    if os.environ.get("TPUVEC_BENCH_FRESH") == "1":
        for p in (CKPT, SIDECAR):
            if os.path.exists(p):
                os.remove(p)
        os.environ.pop("TPUVEC_BENCH_FRESH")
    if _ckpt_pos() >= N:
        with open(SIDECAR) as f:
            return float(json.load(f)["secs"])
    last_pos = -1
    for attempt in range(12):
        left = stop_at - time.time()
        pos0 = _ckpt_pos()
        # don't launch an attempt that can't finish: resuming later is
        # cheaper than a wasted partial segment
        if not force and (
            (N - pos0) / RATE + (COLD_START if pos0 == 0 else 60) > left
        ):
            log(
                f"build attempt skipped: {N - pos0} rows left won't fit "
                f"{left:.0f}s"
            )
            return None
        if force and left < 60:
            return None
        # a wedged relay session can hang a worker INDEFINITELY before its
        # first segment (observed round 4: ~50% of processes stall at a
        # random early point with ~0 CPU, while retries succeed) — so no
        # attempt may own the whole remaining budget. Cap each attempt so
        # a stall costs one retry, not the round: enough for cold start +
        # a few segments, env-overridable for slow relays.
        att_t = min(max(left, 60), ATTEMPT_CAP)
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--build-worker"],
                timeout=att_t,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
            log(f"build attempt {attempt} hit its {att_t:.0f}s stall cap")
        pos = _ckpt_pos()
        if pos >= N:
            with open(SIDECAR) as f:
                return float(json.load(f)["secs"])
        if rc != 0 and pos <= last_pos:
            # no forward progress: give the device time to recover, if
            # the budget allows it
            if stop_at - time.time() < 360:
                return None
            log("no progress; waiting 300s for device recovery")
            time.sleep(300)
        last_pos = pos
    return None


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--build-worker":
        sys.exit(build_worker())

    t_all = time.time()
    deadline = t_all + BUDGET
    build_s = run_build(deadline - SWEEP_RESERVE)

    jax = _jax_setup()
    import jax.numpy as jnp

    from tpuvec.index import bruteforce_knn
    from tpuvec.index.graph import prepare_vectors
    from tpuvec.index.search import search_graph
    from tpuvec.utils.transfer import prepare_vectors_device

    cfg = _config()
    log(f"backend={jax.default_backend()} corpus {N}x{D} f32 cosine k={K}")
    x, qpool = _dataset()
    xp_dev = prepare_vectors_device(cfg, x)
    state, pos, ck_secs = _restore_state(cfg, xp_dev, jnp)
    if state is None or pos == 0:
        # nothing built at the target tier and no budget to build it:
        # downgrade to the largest tier that fits (or already has a
        # completed checkpoint from a prior run)
        del xp_dev, state
        picked = False
        for n in (100_000, 20_000):
            _set_tier(n)
            fits = n / RATE + COLD_START + 120 < (
                deadline - SWEEP_RESERVE - time.time()
            )
            if _ckpt_pos() >= n or fits:
                picked = True
                break
        log(f"downgraded to the {N}-row tier to fit the budget")
        # if even the smallest tier doesn't fit the estimate, build it
        # best-effort anyway: a partial prefix is sweepable, a crash isn't
        build_s = run_build(deadline - SWEEP_RESERVE, force=not picked)
        cfg = _config()
        x, qpool = _dataset()
        xp_dev = prepare_vectors_device(cfg, x)
        state, pos, ck_secs = _restore_state(cfg, xp_dev, jnp)
        if state is None or pos == 0:
            raise RuntimeError("no bench tier fits the budget")
    if build_s is None:
        build_s = ck_secs  # partial build: report the rate achieved so far
    live = pos  # rows actually in the graph (may be a prefix of N)
    log(f"build: {live} vectors in {build_s:.1f}s = {live / build_s:.0f} vec/s")

    qp = prepare_vectors(cfg, jnp.asarray(qpool[:QN]))
    live_mask = jnp.asarray(np.arange(N) < live)
    gt_d, gt_i = bruteforce_knn(
        qp, xp_dev, live_mask, metric=cfg.graph_metric, k=K,
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
    # 12.9K vs iters=56 0.977 @ 16.5K); None = default_max_iters.
    # (48, None) runs FIRST: it is the known recall>=0.95 point at 1M, so
    # even a deadline-truncated sweep reports a qualifying number.
    sweep = [
        (48, None), (24, None), (32, None), (48, 44), (48, 56),
        (64, 64), (96, None), (128, None), (192, None), (256, None),
    ]
    for ef, mi in sweep:
        if best is not None and time.time() > deadline - 45:
            log("sweep truncated by the budget deadline")
            break
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
                    f"QPS/chip at recall@10>={r:.3f} ({live}x{D} f32 cosine, "
                    f"ef={ef}); build {live / build_s:.0f} vec/s"
                ),
                "value": round(qps, 1),
                "unit": "QPS",
                "vs_baseline": round(qps / BASELINE_QPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
