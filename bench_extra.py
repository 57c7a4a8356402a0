"""Optimization-round measurement harness (round 6).

bench.py is FROZEN for measurement, so the guide-§1.4 isolation work
(noop sinks, per-stage splits, plan capture) lives here. Rows reproduce
bench.py's hot queries exactly, plus decomposed sub-stages so a change
can be attributed to the stage it touches.

Usage:
    python bench_extra.py --tag before --rows simhash,contamination,repetition
    python bench_extra.py --tag after  --rows all

Prints one JSON line per run; writes .explain("formatted") for each row
to plans/r06/<row>_<tag>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn, repeats=3, warmup=1):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times), sorted(times)[len(times) // 2]


def save_plan(df, name, tag):
    os.makedirs(PLANS_DIR, exist_ok=True)
    with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--rows", default="all")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    want = None if args.rows == "all" else set(args.rows.split(","))

    from sparkfuse.session import get_spark

    spark = get_spark("sparkfuse-bench-extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    med: dict[str, float] = {}

    def row(name, df_fn, repeats=None, plan=True):
        if want is not None and not any(name.startswith(w) for w in want):
            return
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = df_fn()
        if plan:
            save_plan(df, name, args.tag)
        t, m = timed(lambda: noop(df_fn()), repeats=repeats or args.repeats)
        out[name] = round(t, 3)
        med[name] = round(m, 3)
        spark.sparkContext.setJobDescription(None)

    docs_df = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # ---- simhash decomposition -------------------------------------------
    from sparkfuse.textops import simhash64, simhash_near_dups

    row("simhash_fp_only", lambda: simhash64(docs_df, "doc_id", "text"))
    row(
        "simhash_pairs",
        lambda: simhash_near_dups(docs_df, "doc_id", "text", max_hamming=6),
        repeats=2,
    )

    # ---- contamination decomposition -------------------------------------
    from sparkfuse.decontam import _gram_rows, contamination_check

    bench_docs = docs_df.filter(F.col("doc_id") < 100).select("text")
    row(
        "contam_grams_explode",
        lambda: _gram_rows(docs_df, "text", 13, "doc_id"),
    )
    row(
        "contam_grams_hashed",
        lambda: _gram_rows(docs_df, "text", 13, "doc_id").select(
            "doc_id", F.xxhash64("gram").alias("k")
        ),
    )
    row(
        "contamination_13gram",
        lambda: contamination_check(
            docs_df, "doc_id", "text", bench_docs, "text", n=13, spark=spark
        ),
    )

    # ---- repetition (bench.py construction) ------------------------------
    from sparkfuse.repetition import repetition_stats

    rep_docs = (
        docs_df.crossJoin(spark.range(40).select(F.col("id").alias("rep")))
        .select((F.col("doc_id") * 40 + F.col("rep")).alias("doc_id"), "text")
        .repartition(CPUS)
        .cache()
    )
    rep_docs.count()
    row(
        "repetition_scan",
        lambda: repetition_stats(rep_docs, "doc_id", "text", ngram_ns=(2, 3)).agg(
            F.sum("n_dup_lines"), F.sum("n_dup_grams_2"), F.sum("n_dup_grams_3"),
            F.count(F.lit(1)),
        ),
    )
    rep_docs.unpersist()

    # ---- ngram_jaccard scale preset (bench corpus shape) ------------------
    from sparkfuse.dedup import ngram_jaccard_pairs

    boiler = "click here to accept all cookies and continue browsing our site"
    uniques = spark.range(2_000).select(
        F.col("id").cast("long").alias("doc_id"),
        F.concat(
            F.lit(boiler + " unique content piece number "),
            F.col("id").cast("string"),
            F.lit(" alpha beta gamma delta"),
        ).alias("text"),
    )
    planted = spark.range(50).select(F.col("id").alias("j")).selectExpr(
        "explode(array("
        "  struct(1000000 + 2*j AS doc_id, concat('" + boiler + " rare document body ', j, ' with several distinctive tokens one') AS text),"
        "  struct(1000001 + 2*j AS doc_id, concat('" + boiler + " rare document body ', j, ' with several distinctive tokens two') AS text)"
        ")) AS r"
    ).select("r.doc_id", "r.text")
    corpus = uniques.unionByName(planted)
    row(
        "ngram_neardup_scale",
        lambda: ngram_jaccard_pairs(corpus, "doc_id", "text", scale=True),
    )

    # ---- transcripts curate ----------------------------------------------
    from sparkfuse.synth import synth_transcripts
    from sparkfuse.transcripts import curate_transcripts

    tr_cur = synth_transcripts(spark, 200_000).cache()
    tr_cur.count()
    cur_bench = tr_cur.filter(
        (F.col("conv_id") == "conv-00004321")
        & (F.size(F.split("text", " ")) >= 13)
    ).select("text")
    row(
        "transcripts_curate",
        lambda: curate_transcripts(
            tr_cur, bench_df=cur_bench, holdout_fraction=0.1, spark=spark
        ),
    )
    tr_cur.unpersist()

    # ---- sketch profile ---------------------------------------------------
    from sparkfuse.bloom import BloomParams
    from sparkfuse.sketchsink import (
        SketchSpec,
        build_sketch_states,
        finish_sketch_states,
    )

    events_df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_events = events_df.count()
    sk_specs = [
        SketchSpec("users_hll", "hll", "user_id"),
        SketchSpec("users_cms", "cms", "user_id"),
        SketchSpec("value_td", "tdigest", "value", quantiles=(0.5, 0.9, 0.99)),
        SketchSpec("value_kll", "kll", "value", quantiles=(0.5, 0.9, 0.99)),
        SketchSpec("users_bloom", "bloom", "user_id", BloomParams.for_capacity(n_events, 0.01)),
    ]
    row(
        "sketch_profile_5kind",
        lambda: finish_sketch_states(
            build_sketch_states(events_df, sk_specs, 5, "user_id"), sk_specs
        ),
    )

    # ---- heavy hitters ----------------------------------------------------
    from sparkfuse.sketches import heavy_hitters

    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + 1) / 1_000_000.0
    zipf = spark.range(20_000_000).select(
        F.when(u < 0.1, (F.lit(1.0) / u).cast("long"))
        .otherwise(
            F.lit(2_000_000) + F.pmod(F.xxhash64(F.col("id") + 3), F.lit(10_000_000))
        )
        .alias("user")
    )
    row(
        "heavy_hitters_20m",
        lambda: heavy_hitters(zipf, "user", min_count=1000, capacity=32768),
    )

    print(json.dumps({"tag": args.tag, "sf_dir": SF_DIR, "queries": out,
                      "queries_median": med}))
    spark.stop()


if __name__ == "__main__":
    main()
