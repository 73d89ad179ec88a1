"""Per-stage isolation benchmarks for the headline queries (guide §1.4:
noop-sink isolation; §1.5: labelled jobs). NOT the driver's frozen
bench.py — this exists to attribute each query's time to its internal
stages so OPTIMIZATION_r06.md claims are reproducible.

Usage: python bench_extra.py [passes]   (default 3; prints one JSON line
with min-of-passes per labelled stage)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from gate_spark.session import get_spark
from gate_spark.operators.summarize import summarize, _occ_distinct_side
from gate_spark.operators.drift import drift_scores
from gate_spark.operators.distribution import (
    compute_bin_edges,
    distribution_drift,
    partition_histograms,
)
from gate_spark.operators import dedup as dd
from gate_spark.operators import similarity as sim
from gate_spark.operators import textstats as ts

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def stages(spark):
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")
    li_cols = ["l_quantity", "l_extendedprice", "l_discount", "l_linenumber", "l_linestatus"]

    def tokens_view():
        docs = t("documents")
        words = F.split(F.col("text"), r"\s+")
        size = F.size(words)
        return docs.select(
            "doc_id",
            F.transform(words, lambda w: F.length(w).cast("int")).alias("tokens"),
            F.when(F.col("doc_id") % 97 == 0, size + 1).otherwise(size)
            .cast("int").alias("n_tok"),
            "source",
        )

    # --- summarize_lineitem decomposition
    def s_fused_agg():
        s = summarize(t("lineitem"), columns=li_cols, partition_key="l_returnflag",
                      distinct_mode="approx", quantile_mode="approx", extras=True,
                      persist=False)
        # occ side is joined in; time the WHOLE thing here and the occ
        # side alone below — fused-only is whole minus occ.
        _force(s.df)

    def s_occ_side():
        wdf = t("lineitem").select("l_returnflag", "l_linenumber", "l_linestatus")
        side = _occ_distinct_side(
            wdf, "l_returnflag", {"l_linenumber", "l_linestatus"}, set(),
            "approx", "exact")
        _force(side)

    # --- token_validation stage_times (labels from pipeline._stage)
    tv_times: dict = {}

    def s_token_validation():
        from gate_spark.pipeline import validate_tokens
        st: dict = {}
        r = validate_tokens(
            tokens_view(), domain=tuple(f"src{i}" for i in range(16)),
            vocab=(1, 12), compute_drift=True, stage_times=st)
        _force(r.summary.df)
        _force(r.verdicts)
        _force(r.violations)
        _force(r.distribution)
        _force(r.drift)
        r.unpersist()
        for k, v in st.items():
            tv_times[f"tv_{k}"] = min(tv_times.get(f"tv_{k}", v), v)

    # --- psi_ks decomposition
    def s_psi_edges():
        compute_bin_edges(t("lineitem"), "l_quantity", 10, 10000)

    def s_psi_hist():
        edges = compute_bin_edges(t("lineitem"), "l_quantity", 10, 10000)
        partition_histograms(t("lineitem"), "l_returnflag", "l_quantity", edges).collect()

    def s_psi_full():
        _force(distribution_drift(t("lineitem"), "l_returnflag", "l_quantity"))

    # --- dedup_minhash decomposition
    def s_minhash_sigs():
        sigs = dd.minhash_signatures(t("documents"), "doc_id", "text", 32, 3, "xxhash")
        _force(sigs)

    def s_minhash_full():
        res = dd.minhash_dedup(t("documents"), "doc_id", "text",
                               num_perm=32, num_bands=8, threshold=0.7,
                               hash_mode="xxhash")
        _force(res.pairs)
        res.unpersist()

    # --- drift_events decomposition
    def s_drift_summarize():
        day = t("events").select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type", "value", "user_id")
        s = summarize(day, columns=["value", "user_id", "event_type"],
                      partition_key="day", distinct_mode="approx",
                      quantile_mode="approx", persist=False)
        _force(s.df)

    def s_drift_full():
        day = t("events").select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type", "value", "user_id")
        s = summarize(day, columns=["value", "user_id", "event_type"],
                      partition_key="day", distinct_mode="approx",
                      quantile_mode="approx")
        _force(drift_scores(s, k=3))
        s.unpersist()

    # --- textstats decomposition
    def s_text_quality():
        _force(ts.text_statistics(t("documents"), "doc_id", "text"))

    def s_text_langid():
        _force(ts.language_id(t("documents"), "doc_id", "text"))

    def s_text_tokcounts():
        _force(ts.token_counts(t("documents"), "doc_id", "text"))

    def s_knn():
        emb = t("embeddings")
        _force(sim.cosine_topk(
            emb, emb.where(F.col("vec_id") < 32),
            corpus_id="vec_id", corpus_vec="embedding",
            query_id="vec_id", query_vec="embedding", k=10))

    return {
        "summarize_full": s_fused_agg,
        "summarize_occ_side": s_occ_side,
        "token_validation": s_token_validation,
        "psi_edges": s_psi_edges,
        "psi_edges_plus_hist": s_psi_hist,
        "psi_full": s_psi_full,
        "minhash_sigs": s_minhash_sigs,
        "minhash_full": s_minhash_full,
        "drift_summarize": s_drift_summarize,
        "drift_full": s_drift_full,
        "text_quality": s_text_quality,
        "text_langid": s_text_langid,
        "text_tokcounts": s_text_tokcounts,
        "knn": s_knn,
    }, tv_times


def main():
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("gate_spark_bench_extra", cores=cores)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    fns, tv_times = stages(spark)
    out: dict[str, float] = {}
    for _ in range(passes):
        for name, fn in fns.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            dt = time.time() - t0
            out[name] = min(out.get(name, dt), dt)
            spark.sparkContext.setJobDescription(None)
    out.update(tv_times)
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
