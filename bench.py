"""Benchmark driver: headline extraction pipeline + representative ops.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "turns": N, "turns_per_sec": N}

Env:
  GRAFT_SF_DIR     input dir (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS   num_cpus for ray.init (default 32)
  BENCH_REPEAT     transcript amplification factor (default 480 -> 2.4M
                   turns at sf0.1, so fixed costs — actor-pool spin-up,
                   sort sampling — amortize at both parallelism levels)

`--scaling` runs the headline pipeline at 8 and 32 CPUs in fresh
processes on the SAME pre-materialized input and reports both
throughputs + scaling efficiency (the sandbox substitute for N vs 4N
clusters, BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("BENCH_REPEAT", "480"))
# v3: bump when the transcript generator changes (cache key = repeat
# + generator version; a stale cache would silently bench old input)
TRANSCRIPT_CACHE = os.environ.get(
    "BENCH_TRANSCRIPTS", f"/tmp/unfurl_ray_bench/transcripts_v3_{REPEAT}"
)


def materialize_transcripts() -> str:
    """Write the amplified transcript table once (warm page cache too);
    both scaling runs then read identical input files."""
    import glob

    import ray.data as rd

    from unfurl_ray.sources.transcripts import build_transcripts

    marker = os.path.join(TRANSCRIPT_CACHE, "_DONE")
    if not os.path.exists(marker):
        # a crashed prior materialization leaves partial files that the
        # retry's (append-mode) write_parquet would double — start clean
        import shutil

        shutil.rmtree(TRANSCRIPT_CACHE, ignore_errors=True)
        ds = build_transcripts(SF_DIR, shuffled=False, repeat=REPEAT)
        ds.write_parquet(TRANSCRIPT_CACHE)
        open(marker, "w").write("ok")
    # warm the OS page cache so we measure compute, not first-read I/O
    for f in glob.glob(f"{TRANSCRIPT_CACHE}/*.parquet"):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    return TRANSCRIPT_CACHE


def run_headline() -> dict:
    """Extraction + (conv_id, turn_idx) ordering over the transcript
    table; consumed by count of materialized output (no driver loop)."""
    import ray.data as rd

    from unfurl_ray.engine.pipeline import extract_turns, order_by_turn

    path = materialize_transcripts()

    def one_trial() -> tuple[float, int]:
        # 4 blocks per ACTOR (not per CPU): tasks then fill the pool in
        # even waves — at 4*CPUs blocks the last 0.27-wave left most of
        # the pool idle for one full task at the tail (~6 s at 32 CPUs,
        # ~14 s at 8).  Block count also sets the sort partition count;
        # ~120 stays in the coarse-fragment regime (see order_by_turn)
        pool = max(2, NUM_CPUS - 2)
        ds = rd.read_parquet(path, override_num_blocks=4 * pool)
        t0 = time.time()
        # fixed-size pool: the autoscaling (1,N) ramp left the pool
        # ~57% utilized over a ~60 s stage (measured 59 s -> 36.5 s
        # extract, 69.4 -> 47.1 s headline at 32 CPUs, same window).
        # Safe here because this execution has exactly one actor-pool
        # stage; N-2 leaves CPUs for the read and the overlapped sort.
        extracted = extract_turns(
            ds, concurrency=(pool, pool), batch_size=256
        )
        ordered = order_by_turn(extracted)
        n = (
            ordered.select_columns(["conv_id", "turn_idx"])
            .materialize()
            .count()
        )
        return time.time() - t0, n

    trials = int(os.environ.get("BENCH_TRIALS", "2"))
    best, n = min(one_trial() for _ in range(trials))
    return {"seconds": best, "turns": n, "turns_per_sec": round(n / best, 1)}


def run_queries() -> dict:
    from unfurl_ray import pipelines as p

    timings = {}
    for name, fn in [
        ("q1_pricing_summary", p.q1_pricing_summary),
        ("q_order_lineitem_join", p.q_order_lineitem_join),
        ("q_events_window", p.q_events_window),
        ("q_exact_dedup", p.q_exact_dedup),
        ("q_minhash_dedup", p.q_minhash_dedup),
        ("q_dedup_clusters", p.q_dedup_clusters),
        ("q_curation", p.q_curation),
        ("q_training_prep", p.q_training_prep),
        ("q_knn_topk", p.q_knn_topk),
        ("q_extract_meta", p.q_extract_meta),
        ("q_vocab_spectrum", p.q_vocab_spectrum),
        ("q_ntile_curriculum", p.q_ntile_curriculum),
        ("q_kmeans_sample", p.q_kmeans_sample),
        ("q_chunk_docs", p.q_chunk_docs),
        ("q_resample_locf", p.q_resample_locf),
        ("q_percent_rank", p.q_percent_rank),
        ("q_window_join", p.q_window_join),
        ("q_mad", p.q_mad),
        ("q_bm25", p.q_bm25),
        ("q_sft_pairs", p.q_sft_pairs),
        ("q_upsert_merge", p.q_upsert_merge),
        ("q_mv_update", p.q_mv_update),
        ("q_running_total", p.q_running_total),
        ("q_ewma", p.q_ewma),
        ("q_sliding_mau", p.q_sliding_mau),
        ("q_winsorize", p.q_winsorize),
        ("q_bpe_merges", p.q_bpe_merges),
        ("q_pagerank", p.q_pagerank),
    ]:
        t0 = time.time()
        result = fn(SF_DIR)
        if hasattr(result, "to_pandas"):
            result.to_pandas()
        timings[name] = round(time.time() - t0, 2)
    return timings


def canary_sec() -> float:
    """Host-noise canary: single-process numpy HLL fold of 1M random
    int64 — the SAME input protocol as run_micro's historical fold
    timing (~0.05-0.3 s on a quiet host).  Measured at BOTH ends of
    every run (including BENCH_QUERIES=0 scaling runs) so
    co-tenancy-inflated wall times are identifiable like-for-like."""
    import numpy as np

    from unfurl_ray.ops.sketch import hll_fold

    vals = np.random.default_rng(0).integers(
        0, 500_000, size=1_000_000
    )
    hll_fold(vals[:1000], 12)  # warm
    t0 = time.time()
    hll_fold(vals, 12)
    return round(time.time() - t0, 3)


def run_micro() -> dict:
    """Kernel micro-benchmarks + IVF recall (single-process, no Ray)."""
    import numpy as np

    from unfurl_ray.ops.sketch import hll_estimate, hll_fold

    # timing delegates to canary_sec so the start/end canaries and
    # this historical field stay the same workload by construction
    fold_sec = canary_sec()
    vals = np.random.default_rng(0).integers(0, 500_000, size=1_000_000)
    regs = hll_fold(vals, 12)
    exact = len(np.unique(vals))
    err = abs(hll_estimate(regs) - exact) / exact
    out = {
        "hll_fold_1m_int64_sec": fold_sec,
        "hll_rel_err": round(err, 4),
    }

    # IVF recall vs brute on the sf embeddings (shares the Ray session)
    from unfurl_ray import pipelines as p

    brute = p.q_knn_topk(SF_DIR)
    ivf = p.q_knn_ivf(SF_DIR)
    recall = 0.0
    qids = sorted(set(brute["query_id"]))
    for qi in qids:
        b = set(brute[brute["query_id"] == qi]["vec_id"])
        g = set(ivf[ivf["query_id"] == qi]["vec_id"])
        recall += len(b & g) / max(1, len(b))
    out["ivf_recall_at_10"] = round(recall / len(qids), 3)
    return out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # push-based shuffle merges map fragments in intermediate stages —
    # measurably faster AND more stable for the wide-row ordering sort
    # (pull-based: 44-58 s at 32 CPUs; push-based: 41.4-41.6 s)
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    canary_start = canary_sec()
    headline = run_headline()
    run_q = os.environ.get("BENCH_QUERIES", "1") == "1"
    queries = run_queries() if run_q else {}
    micro = run_micro() if run_q else {}
    canary_end = canary_sec()
    ray.shutdown()

    print(
        json.dumps(
            {
                "metric": "transcript extraction + ordering wall time",
                "value": round(headline["seconds"], 2),
                "unit": "sec",
                "canary_start_sec": canary_start,
                "canary_end_sec": canary_end,
                "queries": queries,
                "micro": micro,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "turns": headline["turns"],
                "turns_per_sec": headline["turns_per_sec"],
            }
        )
    )


def scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_QUERIES="0",
            BENCH_TRANSCRIPTS=TRANSCRIPT_CACHE,
            # best-of-2 per level: this VM shows ±15% run-to-run noise
            # under load, and a single noisy fast-side run swings the
            # efficiency ratio by ±0.1 (~8 min total at defaults)
            BENCH_TRIALS=os.environ.get("BENCH_TRIALS", "2"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # SCALING_TRIALS paired (lo, hi) trials -> per-trial efficiencies +
    # median (single pairs swing ±0.1 under this VM's run-to-run noise)
    n_pairs = max(1, int(os.environ.get("SCALING_TRIALS", "1")))
    effs, pairs = [], []
    for _ in range(n_pairs):
        r_lo, r_hi = run(lo), run(hi)
        tput_lo = r_lo["turns_per_sec"]
        tput_hi = r_hi["turns_per_sec"]
        eff = (tput_hi / tput_lo) / (hi / lo)
        effs.append(round(eff, 3))
        pairs.append(
            {
                "sec_8": r_lo["value"],
                "sec_32": r_hi["value"],
                "turns_per_sec_8": tput_lo,
                "turns_per_sec_32": tput_hi,
            }
        )
    effs_sorted = sorted(effs)
    median = effs_sorted[len(effs_sorted) // 2]
    last = pairs[-1]
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (8 -> 32 CPUs)",
                "sec_8": last["sec_8"],
                "sec_32": last["sec_32"],
                "turns": r_lo["turns"],
                "turns_per_sec_8": last["turns_per_sec_8"],
                "turns_per_sec_32": last["turns_per_sec_32"],
                "scaling_efficiency": median,
                "trials": effs,
                "pairs": pairs,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
