"""spark-submit job entry — the north-rule deployment path.

Production invocation (multi-executor cluster, N or 4N executors):

    spark-submit --master yarn --deploy-mode cluster \\
        --num-executors 256 --executor-cores 4 \\
        --py-files dist/gate_spark.zip \\
        tools/run_validation.py \\
        --input warehouse.tokens --output s3://.../out \\
        --lineage s3://.../lineage --partition-key source --sketch

The SparkSession is taken from spark-submit's conf (no master override
here); ``--local-cores N`` exists for ad-hoc ``python -m gate_spark``
runs outside spark-submit. The job:

1. reads the input (Iceberg table id or parquet path —
   ``iceberg.read_table`` dispatch) and stamps its snapshot;
2. with ``--lineage``, resumes: partitions already committed for this
   (run-spec, snapshot) are pruned OUT of the input scan (pushed-down
   isin filter → partition pruning), so a restarted 10^12-row run
   rescans nothing it already validated. Pruning does NOT narrow the
   global checks: doc_id uniqueness probes pending keys against the
   committed partitions' ids too (a column-pruned id-only scan — no
   token-array decode; ``--no-global-unique`` opts out), and with
   ``--sketch`` lineage, PSI/KS pools the committed partitions'
   checkpointed fixed-edge histograms into the holdout while drift
   scores pending partitions against ALL partitions via sketch-derived
   summary rows (restricted to the moments-exact statistic subset —
   see pipeline.SKETCH_STATS). Without sketch lineage, distribution /
   drift verdicts are pending-scoped (reported as ``global_checks`` in
   the JSON summary line);
3. runs the one-scan ``validate_tokens`` pipeline on the pending
   partitions and writes verdicts / violations / summary / PSI-KS /
   drift to ``--output`` — per-partition dirs with dynamic partition
   overwrite, so a resumed run replaces only the partitions it
   re-validated and the output always reflects the whole table;
4. commits per-partition lineage rows (snapshot-id, partition spec,
   metrics, and with ``--sketch`` the mergeable sketch state
   (gate_spark/sketches.py) that lets ``merged_stats_from_lineage``
   rebuild global statistics with zero rescan);
5. prints ONE machine-readable JSON summary line to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gate_spark", description="token-table validation job"
    )
    p.add_argument("--input", required=True, help="parquet path or Iceberg table id")
    p.add_argument("--output", required=True, help="output directory (parquet)")
    p.add_argument("--lineage", default=None, help="checkpoint store path (enables resume)")
    p.add_argument("--partition-key", default="source")
    p.add_argument("--doc-id-col", default="doc_id")
    p.add_argument("--tokens-col", default="tokens")
    p.add_argument("--n-tok-col", default="n_tok")
    p.add_argument("--domain", default=None, help="comma-separated source domain")
    p.add_argument("--vocab", default="0:50257", help="lo:hi token id bounds")
    p.add_argument("--distinct-mode", default="approx", choices=["approx", "exact"])
    p.add_argument("--quantile-mode", default="nearest", choices=["approx", "nearest"])
    p.add_argument("--no-drift", action="store_true")
    p.add_argument("--snapshot", default="auto", help="input snapshot id ('auto' = stamp)")
    p.add_argument("--sketch", action="store_true", help="commit mergeable sketch state")
    p.add_argument(
        "--no-global-unique", action="store_true",
        help="on resume, skip the id-only scan of committed partitions that"
        " keeps doc_id uniqueness global (falls back to pending-local)",
    )
    p.add_argument(
        "--max-partitions-per-run", type=int, default=None,
        help="bounded failure domain: validate at most M pending partitions"
        " per invocation and commit their lineage, leaving the rest pending"
        " (rerun until status=up-to-date). A kill mid-invocation loses only"
        " that invocation's uncommitted batch.",
    )
    p.add_argument("--app-name", default="gate_spark_validate")
    p.add_argument(
        "--local-cores", type=int, default=None,
        help="run without spark-submit on local[N] (ad-hoc/debug only)",
    )
    return p


def _drop_partition_dirs(
    spark: SparkSession, base: str, col: str, parts: list[str]
) -> None:
    """Delete ``{base}/{col}={p}`` for each partition — Hadoop
    FileSystem API, so it works on local paths, HDFS and s3a alike."""
    if not parts:
        return
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for p in parts:
        # Spark percent-escapes special characters in partition dir
        # names (Hive path convention) — build the same escaped name or
        # stale dirs for such values are silently left in place
        path = jvm.org.apache.hadoop.fs.Path(
            f"{base}/{_escape_path_name(spark, col)}={_escape_path_name(spark, p)}"
        )
        fs = path.getFileSystem(conf)
        if fs.exists(path):
            fs.delete(path, True)


# the character set Spark/Hive percent-escape in partition path names
# (ExternalCatalogUtils.charToEscape): ASCII control chars plus these
_ESCAPE_CHARS = set('"#%\'*/:=?\\\x7f{[]^')


def _escape_path_name(spark: SparkSession, value: str) -> str:
    """Escape a partition value exactly as Spark does when writing
    ``col=value`` directories. Prefers the JVM's own implementation
    (bit-exact by construction); falls back to a replica of
    ExternalCatalogUtils.escapePathName."""
    value = str(value)
    try:
        return str(
            spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(
                value
            )
        )
    except Exception:
        return "".join(
            f"%{ord(c):02X}" if (c in _ESCAPE_CHARS or ord(c) < 0x20) else c
            for c in value
        )


def _get_session(args) -> SparkSession:
    if args.local_cores:
        from gate_spark.session import get_spark

        return get_spark(args.app_name, cores=args.local_cores)
    # under spark-submit the master/deploy conf is already set
    return SparkSession.builder.appName(args.app_name).getOrCreate()


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from gate_spark.checkpoint import CheckpointStore, spec_hash
    from gate_spark.iceberg import current_snapshot_id, read_table
    from gate_spark.pipeline import validate_tokens
    from gate_spark import sketches as sk

    spark = _get_session(args)
    df = read_table(spark, args.input)
    from gate_spark.iceberg import partition_snapshot_stamps

    # per-partition stamps (hive-partitioned path input): an append to
    # one partition re-validates that partition alone
    stamps = (
        partition_snapshot_stamps(args.input, args.partition_key)
        if args.snapshot == "auto"
        else {}
    )
    snapshot = (
        current_snapshot_id(spark, args.input)
        if args.snapshot == "auto"
        else args.snapshot
    )
    lo, hi = (int(x) for x in args.vocab.split(":"))
    domain = tuple(args.domain.split(",")) if args.domain else None
    run_spec = spec_hash(
        {
            k: v
            for k, v in vars(args).items()
            # identity of the validation, not of this invocation;
            # no_global_unique only controls a resume-time probe, so
            # toggling it must not invalidate committed lineage
            if k not in (
                "output", "lineage", "snapshot", "app_name", "local_cores",
                "no_global_unique", "max_partitions_per_run",
            )
        }
    )

    store = CheckpointStore(spark, args.lineage) if args.lineage else None
    all_parts = [
        str(r[0])
        for r in df.select(args.partition_key).distinct().orderBy(args.partition_key).collect()
    ]
    if store is None:
        pending = all_parts
    elif stamps:
        pending = store.pending_by_stamps(
            {p: stamps[p] for p in all_parts if p in stamps}, run_spec
        )
        # partitions the reader sees but the dir listing does not
        # (non-hive layout edge) fall back to the global stamp
        pending += store.pending_partitions(
            [p for p in all_parts if p not in stamps], run_spec, snapshot
        )
    else:
        pending = store.pending_partitions(all_parts, run_spec, snapshot)
    deferred = 0
    if args.max_partitions_per_run and len(pending) > args.max_partitions_per_run:
        # deterministic batch choice (pending is sorted): the next
        # invocation picks up exactly where this one's commit ends
        deferred = len(pending) - args.max_partitions_per_run
        pending = pending[: args.max_partitions_per_run]
    summary_line = {
        "run_spec": run_spec,
        "snapshot": snapshot,
        "partitions": len(all_parts),
        "pending": len(pending),
        "deferred": deferred,
    }
    if not pending:
        summary_line["status"] = "up-to-date"
        print(json.dumps(summary_line))
        return 0

    external_keys = None
    history_sketches = None
    hist_edges = None
    n_history = 0  # partitions actually present in the sketch payload
    committed = [p for p in all_parts if p not in pending]
    if committed:
        # pushed-down membership filter -> partition pruning on a
        # source-partitioned table: completed partitions' ARRAYS are
        # never read (the optional global-uniqueness probe below scans
        # their id column only)
        full_df = df
        df = df.where(F.col(args.partition_key).isin(pending))
        if not args.no_global_unique:
            # global uniqueness across resume boundaries: pending keys
            # are checked against committed partitions' ids too
            external_keys = full_df.where(
                F.col(args.partition_key).isin(committed)
            ).select(args.doc_id_col)
        if store is not None and args.sketch:
            payload = store.sketch_state(
                run_spec, None if stamps else snapshot, stamps or None
            )
            payload = {p: s for p, s in payload.items() if p in committed}
            if payload:
                # the drift gate below must count the partitions the
                # sketch payload actually carries, not len(committed):
                # only a subset of committed partitions may have
                # committed sketch_json for this run_spec/stamp
                n_history = len(payload)
                history_sketches = sk.sketches_from_json(spark, payload)
                erow = (
                    history_sketches.where(
                        (F.col("column") == args.n_tok_col)
                        & F.col("edges").isNotNull()
                    )
                    .select("edges")
                    .first()
                )
                if erow is not None:
                    hist_edges = list(erow["edges"])

    result = validate_tokens(
        df,
        partition_key=args.partition_key,
        doc_id_col=args.doc_id_col,
        tokens_col=args.tokens_col,
        n_tok_col=args.n_tok_col,
        domain=domain,
        vocab=(lo, hi),
        distinct_mode=args.distinct_mode,
        quantile_mode=args.quantile_mode,
        compute_drift=not args.no_drift and (len(pending) + n_history) >= 6,
        external_dup_keys=external_keys,
        hist_edges=hist_edges,
        history_sketches=history_sketches,
    )
    # drift globality is claimed only when the history histograms were
    # ACTUALLY pooled into the PSI/KS holdout (result.history_pooled):
    # sketch rows can lack histograms or carry mismatched edges, in
    # which case the distribution verdicts silently fell back to
    # pending scope and reporting "drift" here would overstate them
    drift_global = history_sketches is not None and result.history_pooled
    summary_line["global_checks"] = (
        "full"
        if not committed
        else (
            "unique"
            if external_keys is not None and not drift_global
            else (
                "unique+drift"
                if external_keys is not None
                else ("drift" if drift_global else "pending-only")
            )
        )
    )
    out = args.output.rstrip("/")
    # per-partition dirs + dynamic overwrite: a resumed run replaces
    # ONLY the partitions it re-validated — previously committed
    # partitions' outputs survive (the --output contract reflects the
    # whole table after any resume, not the last pending subset)
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        result.verdicts.write.mode("overwrite").partitionBy("partition").parquet(
            f"{out}/verdicts"
        )
        result.violations.write.mode("overwrite").partitionBy("partition").parquet(
            f"{out}/violations"
        )
        result.summary.df.write.mode("overwrite").partitionBy(
            args.partition_key
        ).parquet(f"{out}/summary")
        result.distribution.write.mode("overwrite").partitionBy(
            "partition"
        ).parquet(f"{out}/distribution")
        if result.drift is not None:
            result.drift.write.mode("overwrite").partitionBy("partition").parquet(
                f"{out}/drift"
            )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    # per-partition metrics from the (metadata-scale) verdict table
    verdict_rows = result.verdicts.collect()
    if result.drift is None:
        # a resumed run that skipped drift must not leave the pending
        # partitions' OLD drift rows in place (they describe data this
        # run just re-validated)
        _drop_partition_dirs(spark, f"{out}/drift", "partition", pending)
    metrics: dict[str, dict] = {}
    failed = 0
    for r in verdict_rows:
        m = metrics.setdefault(
            r["partition"], {"row_count": r["row_count"], "violations": 0}
        )
        m["violations"] += int(r["violation_count"])
        failed += int(not r["passed"])
    summary_line["constraint_failures"] = failed
    # dynamic overwrite only replaces partitions PRESENT in the new
    # data: a re-validated partition whose violations dropped to zero
    # writes no rows, so its stale violation dir must be cleared
    # explicitly
    clean = [p for p in pending if metrics.get(p, {}).get("violations", 0) == 0]
    _drop_partition_dirs(spark, f"{out}/violations", "partition", clean)

    if store:
        payload = None
        if args.sketch:
            payload = sk.sketches_to_json(
                sk.column_sketches(
                    result.slim.select(
                        F.col("_pk").alias(args.partition_key),
                        F.col("n_tok").alias(args.n_tok_col),
                        F.col("tok_len").alias(args.tokens_col),
                        F.col("_key").alias(args.doc_id_col),
                    ),
                    [args.n_tok_col, args.tokens_col, args.doc_id_col],
                    args.partition_key,
                    # fixed-edge histogram in lineage: a future resume
                    # pools committed partitions into the PSI/KS holdout
                    # (mergeable only under shared edges, so the edges
                    # ride along in the sketch rows)
                    hist_edges={args.n_tok_col: result.hist_edges},
                )
            )
        store.mark_completed(
            pending,
            run_spec,
            snapshot,
            metrics,
            partition_spec=args.partition_key,
            sketches=payload,
            snapshots=stamps or None,
        )
    result.unpersist()
    summary_line["status"] = "partial" if deferred else "completed"
    print(json.dumps(summary_line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
