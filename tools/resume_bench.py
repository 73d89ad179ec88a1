"""Resume-at-bench-scale evidence (VERDICT r3 ask #7).

Exercises the lineage/resume path on a real parquet token table at
bench scale, with a hard kill mid-run:

1. generate a deterministic hive-partitioned token table (datagen
   knobs inject dup / mismatch / OOV / bad-domain violations and one
   drifted source);
2. invocation A: validate the first half of the partitions
   (``--max-partitions-per-run``) with lineage + sketch state — timed;
3. invocation B: continue, but SIGKILL the JVM mid-run — the batch in
   flight commits nothing (lineage commit is atomic per invocation);
4. invocation C: restart — the summary line must show only the
   remaining partitions pending (everything A committed is pruned out
   of the scan by the pushed-down partition filter) — timed;
5. reference: a from-scratch full run into a separate output dir;
   assert value-equality of verdicts / violations / summary for ALL
   partitions, and of the distribution (PSI/KS) rows for the resumed
   batch (whose pooled-histogram holdout must bit-match the full run's
   — the test_resume_global property at bench scale). Earlier batches'
   PSI rows were computed against the data available at their commit
   time (documented incremental semantics), so they are excluded.

Prints one JSON line with the wall times and equality results.

Usage: python tools/resume_bench.py  [--rows 16000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/root/repo/.scratch/resume_bench"
KILL_AFTER_S = 40.0  # SIGKILL invocation B once it is mid-pipeline
# (past session startup, well before the pipeline can commit)


def cli_cmd(data: str, out: str, lineage: str, extra: list[str]) -> list[str]:
    return [
        sys.executable, "-m", "gate_spark",
        "--input", data, "--output", out, "--lineage", lineage,
        "--local-cores", "32", "--sketch", "--quantile-mode", "nearest",
        "--domain", ",".join(f"src{i}" for i in range(20)),
        "--vocab", "0:50257",
    ] + extra


def run(cmd: list[str], timeout: int = 1200) -> tuple[float, dict]:
    t0 = time.perf_counter()
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    dt = time.perf_counter() - t0
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if p.returncode != 0 or not lines:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
        raise RuntimeError(f"cli failed rc={p.returncode}")
    return dt, json.loads(lines[-1])


def run_and_kill(cmd: list[str], after_s: float) -> float:
    t0 = time.perf_counter()
    p = subprocess.Popen(cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                         start_new_session=True)
    time.sleep(after_s)
    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
    p.wait()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--fresh", action="store_true", help="regenerate the input table")
    args = ap.parse_args()

    data = f"{SCRATCH}/tokens_{args.rows}"
    for d in ("out_resume", "out_full", "lineage_resume", "lineage_full"):
        shutil.rmtree(f"{SCRATCH}/{d}", ignore_errors=True)
    if args.fresh:
        shutil.rmtree(data, ignore_errors=True)

    if not os.path.exists(os.path.join(data, "_SUCCESS")):
        from gate_spark.datagen import write_token_table
        from gate_spark.session import get_spark

        spark = get_spark("resume_datagen", cores=32)
        write_token_table(
            spark, data, args.rows,
            dup_frac=0.001, mismatch_frac=0.001, oov_frac=0.001,
            baddomain_frac=0.0005, drift_source="src7",
        )
        spark.stop()

    out_r, lin_r = f"{SCRATCH}/out_resume", f"{SCRATCH}/lineage_resume"
    out_f, lin_f = f"{SCRATCH}/out_full", f"{SCRATCH}/lineage_full"

    t_a, line_a = run(cli_cmd(data, out_r, lin_r, ["--max-partitions-per-run", "10"]))
    assert line_a["status"] == "partial" and line_a["pending"] == 10, line_a

    t_kill = run_and_kill(cli_cmd(data, out_r, lin_r, []), KILL_AFTER_S)

    t_c, line_c = run(cli_cmd(data, out_r, lin_r, []))
    # the killed invocation committed nothing; A's 10 partitions are
    # pruned, the remaining ones (incl. srcUNKNOWN) are rescanned
    assert line_c["status"] == "completed", line_c
    assert line_c["pending"] == line_c["partitions"] - 10, line_c

    t_f, line_f = run(cli_cmd(data, out_f, lin_f, []))
    assert line_f["status"] == "completed" and line_f["pending"] == line_f["partitions"]

    # ---- output equality (separate session so CLI JVMs are gone)
    from gate_spark.session import get_spark

    spark = get_spark("resume_check", cores=8, shuffle_partitions=8)

    def table(base: str, name: str):
        return spark.read.parquet(f"{base}/{name}")

    eq = {}
    for name, keys in (
        ("verdicts", ["partition", "constraint"]),
        ("violations", ["partition", "constraint", "key"]),
        ("summary", ["source", "column"]),
    ):
        a = table(out_r, name).orderBy(*keys).collect()
        b = table(out_f, name).orderBy(*keys).collect()
        eq[name] = a == b
    # invocation A's batch is deterministic: the first 10 of the sorted
    # partition list (pending is sorted and truncated in order)
    all_parts = sorted(set(r["partition"] for r in table(out_f, "distribution").collect()))
    resumed_parts = all_parts[10:]
    # distribution rows for the RESUMED batch must bit-match the full
    # run (pooled-histogram holdout == full holdout)
    import pyspark.sql.functions as F

    da = (
        table(out_r, "distribution")
        .where(F.col("partition").isin(resumed_parts))
        .orderBy("partition")
        .collect()
    )
    db = (
        table(out_f, "distribution")
        .where(F.col("partition").isin(resumed_parts))
        .orderBy("partition")
        .collect()
    )
    eq["distribution_resumed_batch"] = da == db

    print(json.dumps({
        "rows": args.rows,
        "partitions": line_f["partitions"],
        "t_batchA_10parts_s": round(t_a, 1),
        "t_killed_s": round(t_kill, 1),
        "t_resume_s": round(t_c, 1),
        "t_full_s": round(t_f, 1),
        "resume_pending": line_c["pending"],
        "equality": eq,
    }))
    assert all(eq.values()), eq


if __name__ == "__main__":
    main()
