"""Scaling-efficiency evidence for the north rule.

The rule requires throughput scaling efficiency >= 0.8 between N and 4N
executors. This sandbox has one machine, so the two "cluster sizes" are
local[8] and local[32] over the SAME generated token table (the
driver-sanctioned proxy). Measurement protocol (the sandbox host is a
shared Firecracker VM with bursty neighbor noise, and the first
execution of each plan pays ~60-90 s of JIT/codegen):

- the dataset is pre-read into the page cache (a cluster's data is
  served from distributed storage, not one cold local disk);
- input splits are 16 MB so local[32] gets ~128 scan tasks (the 64
  generated files would otherwise coalesce to ~14 partitions under the
  default 128 MB and cap parallelism below the core count);
- each configuration runs in its own subprocess (fresh JVM): one full
  warm-up pass, then ``TRIALS`` timed passes; the MIN is the capacity
  estimate (noise is strictly additive), the median is also reported.

The measured job is the full north-star validation pipeline
(pipeline.validate_tokens): one-scan slim projection + summaries +
4-constraint verdicts/violations + PSI/KS + kNN drift.

Usage:
  python tools/scaling_bench.py              # orchestrate both runs
  python tools/scaling_bench.py --run 8      # one measured run (internal)
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.environ.get("SPARK_GRAFT_SCALING_DATA", "/root/repo/.scratch/scaling_tokens")
_DEFAULT_ROWS = {"parquet": "4000000", "generate": "16000000"}
ROWS = int(
    os.environ.get("SPARK_GRAFT_SCALING_ROWS")
    or _DEFAULT_ROWS[os.environ.get("SPARK_GRAFT_SCALING_MODE", "parquet")]
)
TRIALS = int(os.environ.get("SPARK_GRAFT_SCALING_TRIALS", "3"))
# parquet: scan-bound (single local disk / memory bus — a per-node
#   hardware ceiling a real cluster does not share);
# generate: compute-bound (deterministic in-memory token table —
#   isolates executor-compute scaling).
MODE = os.environ.get("SPARK_GRAFT_SCALING_MODE", "parquet")
SPLIT = "16m"
# core pair for the paired protocol: "small,big" (efficiency =
# t_small / ((big/small) * t_big))
PAIR = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_PAIR", "8,32").split(",")
)


def ensure_data() -> None:
    if os.path.isdir(DATA) and os.path.exists(os.path.join(DATA, "_SUCCESS")):
        return
    from gate_spark.session import get_spark
    from gate_spark.datagen import write_token_table

    spark = get_spark("scaling_datagen", cores=32)
    write_token_table(
        spark, DATA, ROWS,
        partition_by_source=False,  # keep file sizes balanced; skew lives in values
        mismatch_frac=0.001, oov_frac=0.001, baddomain_frac=0.001, dup_frac=0.001,
        num_partitions=64,
    )
    spark.stop()


def precache() -> None:
    for f in glob.glob(os.path.join(DATA, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass


def _input_df(spark):
    if MODE == "generate":
        from gate_spark.datagen import token_table

        # deterministic & partitioning-invariant: identical input at
        # every core count (test_checkpoint_datagen.py pins this)
        return token_table(
            spark, ROWS, num_partitions=256,
            mismatch_frac=0.001, oov_frac=0.001,
            baddomain_frac=0.001, dup_frac=0.001,
        )
    return spark.read.parquet(DATA)


def validation_job(spark, df=None, stage_times: dict | None = None) -> int:
    """The measured pipeline (one-scan orchestration, pipeline.py);
    returns row count validated. Every output is fully materialized:
    the summary + PSI/KS + drift verdicts are computed eagerly inside
    validate_tokens (persisted summary / driver-side metadata math),
    verdicts + violations are forced through the noop sink.

    ``stage_times`` collects the per-stage wall-time breakdown
    (scan_slim / unique_agg / summary_agg / distribution / drift from
    the pipeline hooks, plus the verdicts+violations forces here) —
    the stage-level attribution BASELINE.md requires."""
    import time as _time

    from gate_spark.pipeline import validate_tokens

    if df is None:
        df = _input_df(spark)

    def force(d):
        d.write.format("noop").mode("overwrite").save()

    r = validate_tokens(
        df, domain=tuple(f"src{i}" for i in range(20)), compute_drift=True,
        truncate_lineage=True, stage_times=stage_times,
    )
    # violations first: it is the single full-frame action (its persist
    # populates as it writes); verdicts then derives from the persisted
    # violations table at metadata scale.
    t0 = _time.time()
    force(r.violations)
    force(r.verdicts)
    if stage_times is not None:
        stage_times["verdicts_violations"] = round(_time.time() - t0, 3)
    n = ROWS
    r.unpersist()
    return n


def measured_run(cores: int) -> None:
    from gate_spark.session import get_spark

    if MODE == "parquet":
        precache()
    spark = get_spark(
        f"scaling_{cores}", cores=cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": SPLIT,
            # every shuffle in this job is metadata-scale by design;
            # AQE's per-stage re-planning is pure serial latency here
            # (skew is handled by the engine's own salting/value-keyed
            # aggregation, not by AQE, in this pipeline)
            "spark.sql.adaptive.enabled": "false",
        },
    )
    df = _input_df(spark)  # one analyzed input plan per JVM (see single_trial)
    n = validation_job(spark, df)  # warm-up: JIT + codegen + page cache
    times = []
    for _ in range(TRIALS):
        t0 = time.time()
        validation_job(spark, df)
        times.append(time.time() - t0)
    times.sort()
    best, median = times[0], times[len(times) // 2]
    print(json.dumps({
        "cores": cores, "rows": n, "mode": MODE,
        "trials": [round(t, 2) for t in times],
        "best_sec": round(best, 2), "median_sec": round(median, 2),
        "best_rows_per_sec": round(n / best, 1),
    }))
    spark.stop()


def single_trial(cores: int, stages: bool = False) -> None:
    """One warm-up pass + ONE timed pass in a fresh JVM (used by the
    interleaved protocol). ``stages`` adds the per-stage wall-time
    breakdown to the JSON line."""
    from gate_spark.session import get_spark

    if MODE == "parquet":
        precache()
    spark = get_spark(
        f"scaling_{cores}", cores=cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": SPLIT,
            "spark.sql.adaptive.enabled": "false",
        },
    )
    # Build the input DataFrame ONCE per JVM: in generate mode the
    # datagen expression tree carries a large vocab-pool literal whose
    # re-construction + re-analysis cost ~12 s/pass when rebuilt inside
    # the timed region (measured by the round-3 residual probe) — an
    # artifact of the generator, not the engine; a real Iceberg/parquet
    # scan plan is tiny. Reusing the analyzed input plan makes the
    # timed pass measure the validation pipeline.
    df = _input_df(spark)
    validation_job(spark, df)  # warm-up
    st: dict | None = {} if stages else None
    cpu0 = _proc_stat()
    t0 = time.time()
    n = validation_job(spark, df, stage_times=st)
    dt = time.time() - t0
    rec = {"cores": cores, "rows": n, "sec": round(dt, 2)}
    steal = _steal_frac(cpu0, _proc_stat())
    if steal is not None:
        # fraction of the timed window's CPU jiffies the hypervisor
        # stole for neighbor VMs (/proc/stat field 8) — the kernel's
        # own measurement of external contention over EXACTLY this
        # trial's span, for epoch-conditioning the paired ratios
        rec["steal_frac"] = steal
    if stages:
        rec["stages"] = st
    print(json.dumps(rec))
    spark.stop()


def _proc_stat() -> list[int] | None:
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except Exception:
        return None


def _steal_frac(a: list[int] | None, b: list[int] | None) -> float | None:
    if not a or not b or len(b) < 8:
        return None
    total = sum(b) - sum(a)
    if total <= 0:
        return None
    return round((b[7] - a[7]) / total, 4)


def stage_breakdown(trials: int) -> None:
    """Interleaved per-stage scaling attribution: N trials per core
    count, per-stage MIN across trials (noise is additive per stage
    too), per-stage efficiency t8/(4*t32) — so the aggregate efficiency
    gap decomposes into which stages scale and which are pinned by
    host memory bandwidth."""
    if MODE == "parquet":
        ensure_data()
    per_stage: dict[int, dict[str, list[float]]] = {8: {}, 32: {}}
    totals: dict[int, list[float]] = {8: [], 32: []}
    for _ in range(trials):
        for cores in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--trial-stages", str(cores)],
                capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            rec = json.loads(line)
            totals[cores].append(rec["sec"])
            # the residual between the pass total and the sum of timed
            # Spark actions = driver-side planning/scheduling (lazy
            # build, optimization, small collects) — the fixed term
            # that caps efficiency at small inputs
            rec["stages"]["other_driver"] = round(
                rec["sec"] - sum(rec["stages"].values()), 3
            )
            for k, v in rec["stages"].items():
                per_stage[cores].setdefault(k, []).append(v)
            print(line)
    stages = sorted(per_stage[8])
    table = {}
    for k in stages:
        t8 = min(per_stage[8][k])
        t32 = min(per_stage[32][k])
        table[k] = {
            "local8_sec": t8,
            "local32_sec": t32,
            "speedup": round(t8 / t32, 2) if t32 > 0 else None,
            "efficiency_4x": round(t8 / (4 * t32), 3) if t32 > 0 else None,
        }
    summary = {
        "rows": ROWS, "mode": MODE,
        "total_local8_sec": min(totals[8]),
        "total_local32_sec": min(totals[32]),
        "total_efficiency_4x": round(min(totals[8]) / (4 * min(totals[32])), 3),
        "stages": table,
    }
    print(json.dumps(summary, indent=2))
    os.makedirs("/root/repo/.scratch", exist_ok=True)
    with open(f"/root/repo/.scratch/scaling_stages_{MODE}.json", "w") as f:
        json.dump(summary, f, indent=2)


def paired_protocol(pairs_n: int) -> None:
    """Round-5 estimator (VERDICT r4 item 1): the min-of-N RATIO is
    noise-bound on this shared VM (same-day runs gave 0.791 vs 0.623
    while absolute throughput improved at both core counts), because
    min(t_small)/min(t_big) composes two extremes sampled from
    different noise epochs. This protocol measures PAIRED trials:

    - one fresh-JVM trial at each core count back-to-back (adjacent in
      time, so the bursty neighbor noise of this VM hits both sides of
      a pair under near-identical conditions);
    - inner order alternates (small,big / big,small) so slow host
      drift cancels in expectation;
    - the estimate is the MEDIAN of per-pair ratios, reported WITH its
      spread (min/max and quartiles) — a ratio whose spread straddles
      0.8 is reported as exactly that, not as a point win;
    - per-stage ratios get the same treatment, so an efficiency
      shortfall is attributable to named stages (and comparable to the
      calibrated memory-bandwidth ceiling from tools/hw_calibrate.py).

    Core pair via SPARK_GRAFT_SCALING_PAIR (default "8,32"); use "2,8"
    with a proportionally smaller SPARK_GRAFT_SCALING_ROWS for the
    below-bandwidth-ceiling engine-scaling number.
    """
    if MODE == "parquet":
        ensure_data()
    small, big = PAIR
    factor = big / small
    pair_rows: list[dict] = []
    for i in range(pairs_n):
        order = (small, big) if i % 2 == 0 else (big, small)
        rec: dict = {}
        # tag the pair with the host's CURRENT aggregate memory
        # bandwidth + its 8->32-process scaling ratio (hw_calibrate):
        # a pair measured in a noisy-neighbor epoch (low bw, low ratio)
        # is reported as such, so the efficiency distribution can be
        # conditioned on host state instead of silently mixing epochs
        hw: dict = {}
        try:
            cal = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "hw_calibrate.py")],
                capture_output=True, text=True, timeout=600,
            )
            hw = json.loads(
                [l for l in cal.stdout.splitlines() if l.startswith("{")][-1]
            )
        except Exception:
            pass
        for cores in order:
            out = subprocess.run(
                [sys.executable, __file__, "--trial-stages", str(cores)],
                capture_output=True, text=True, timeout=5400,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            r["stages"]["other_driver"] = round(r["sec"] - sum(r["stages"].values()), 3)
            rec[cores] = r
            print(line, flush=True)
        eff = rec[small]["sec"] / (factor * rec[big]["sec"])
        stage_eff = {}
        for k in rec[small]["stages"]:
            ts, tb = rec[small]["stages"][k], rec[big]["stages"].get(k)
            if tb and tb > 0:
                stage_eff[k] = round(ts / (factor * tb), 3)
        pair_rows.append(
            {
                "pair": i,
                "order": list(order),
                f"t{small}_sec": rec[small]["sec"],
                f"t{big}_sec": rec[big]["sec"],
                "efficiency": round(eff, 3),
                "stage_efficiency": stage_eff,
                "hw_bw_GBps_32": hw.get("bw_GBps_32"),
                "hw_bw_ratio": hw.get("bw_GBps_ratio_32_over_8"),
                f"steal_{small}": rec[small].get("steal_frac"),
                f"steal_{big}": rec[big].get("steal_frac"),
            }
        )
        print(json.dumps(pair_rows[-1]), flush=True)

    def spread(vals: list[float]) -> dict:
        v = sorted(vals)
        n = len(v)
        return {
            "median": round(v[n // 2] if n % 2 else (v[n // 2 - 1] + v[n // 2]) / 2, 3),
            "min": round(v[0], 3),
            "max": round(v[-1], 3),
            "q1": round(v[max(0, n // 4)], 3),
            "q3": round(v[min(n - 1, (3 * n) // 4)], 3),
        }

    effs = [p["efficiency"] for p in pair_rows]
    stage_names = sorted(
        {k for p in pair_rows for k in p["stage_efficiency"]}
    )
    t_small = [p[f"t{small}_sec"] for p in pair_rows]
    t_big = [p[f"t{big}_sec"] for p in pair_rows]
    summary = {
        "rows": ROWS,
        "mode": MODE,
        "pair": [small, big],
        "pairs": pair_rows,
        "efficiency_spread": spread(effs),
        "min_based_efficiency": round(min(t_small) / (factor * min(t_big)), 3),
        f"best_t{small}_sec": min(t_small),
        f"best_t{big}_sec": min(t_big),
        f"best_rows_per_sec_{big}": round(ROWS / min(t_big), 1),
        "stage_efficiency_spread": {
            k: spread([p["stage_efficiency"][k] for p in pair_rows if k in p["stage_efficiency"]])
            for k in stage_names
        },
    }
    print(json.dumps(summary, indent=2))
    os.makedirs("/root/repo/.scratch", exist_ok=True)
    with open(
        f"/root/repo/.scratch/scaling_paired_{MODE}_{small}x{big}.json", "w"
    ) as f:
        json.dump(summary, f, indent=2)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        measured_run(int(sys.argv[2]))
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--trial":
        single_trial(int(sys.argv[2]))
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--trial-stages":
        single_trial(int(sys.argv[2]), stages=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--stage-breakdown":
        stage_breakdown(TRIALS)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--paired":
        paired_protocol(int(sys.argv[2]) if len(sys.argv) > 2 else 5)
        return
    if MODE == "parquet":
        ensure_data()
    # Interleave configurations (8, 32, 8, 32, ...) so this shared VM's
    # bursty neighbor noise hits both core counts equally in
    # expectation; the min per config estimates capacity (noise is
    # strictly additive).
    trials: dict[int, list[float]] = {8: [], 32: []}
    for _ in range(TRIALS):
        for cores in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--trial", str(cores)],
                capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            rec = json.loads(line)
            trials[cores].append(rec["sec"])
            print(line)
    t8, t32 = min(trials[8]), min(trials[32])
    eff = t8 / (4 * t32)
    summary = {
        "rows": ROWS,
        "mode": MODE,
        "trials_local8": trials[8],
        "trials_local32": trials[32],
        "best_local8_sec": t8,
        "best_local32_sec": t32,
        "best_local8_rows_per_sec": round(ROWS / t8, 1),
        "best_local32_rows_per_sec": round(ROWS / t32, 1),
        "scaling_efficiency_4x": round(eff, 3),
        "meets_north_rule_0.8": eff >= 0.8,
    }
    print(json.dumps(summary))
    with open(f"/root/repo/.scratch/scaling_result_{MODE}.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
