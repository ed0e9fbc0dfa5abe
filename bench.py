#!/usr/bin/env python
"""Benchmark the headline operators at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: median_sec, ...}, "queries_min": {...},
   "n_runs": N, "sf": ...}

Workloads per BASELINE.md (B1-B4) + north-star extension headliners.
Results are forced with a noop write (full computation, no driver collect
of row data).

Protocol: every workload runs $SPARK_GRAFT_BENCH_RUNS times (default 5;
r5 raised it from 3 — this virtualized box swings ±30-50% run-to-run on
multi-second queries, and 3-run medians still wobbled) in interleaved
round-robin rounds — round 1 pays codegen/JIT warmup for everyone, later
rounds are warm — and the reported per-query number is the MEDIAN (plus
min for reference).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkglm_spark.session import get_spark, read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")), 1)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def force_all(*dfs) -> None:
    """Force several INDEPENDENT results with overlapped jobs (guide
    §2.6): the bundle lines (multimodal_decode, text_curation,
    timeseries_suite) group independent operators into one headline —
    submitting their actions from a small driver pool lets the next
    job's tasks back-fill executors freed by the current job's tail.
    Same computations, same noop sinks, same wall-clock semantics (the
    line still measures time-to-complete-all); 2-3 jobs in flight is the
    guide's recommendation. Each df may be a DataFrame or a zero-arg
    callable producing one (so plan construction also overlaps)."""
    from concurrent.futures import ThreadPoolExecutor

    def one(d):
        force(d() if callable(d) else d)

    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(one, dfs))


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    load_start = round(os.getloadavg()[0], 2)
    spark = get_spark("sparkglm-bench")

    li = read_table(spark, SF_DIR, "lineitem")
    orders = read_table(spark, SF_DIR, "orders")
    docs = read_table(spark, SF_DIR, "documents")
    emb = read_table(spark, SF_DIR, "embeddings")

    # JVM warmup (not timed)
    li.limit(10).count()

    workloads: list[tuple[str, object]] = []

    def W(name, fn):
        workloads.append((name, fn))

    # B1: model_matrix encode (2 categoricals + numerics)
    from sparkglm_spark.functions.encoding import model_matrix

    W("encode", lambda: force(model_matrix(li.drop("l_shipdate"))))

    # B2: LM fit, k=7 (intercept + 3 numerics + 3 dummies)
    from sparkglm_spark.operators.lm import lm

    model_holder = {}

    def fit_lm():
        model_holder["m"] = lm(
            li,
            "l_extendedprice ~ l_quantity + l_discount + l_tax"
            " + l_returnflag + l_linestatus",
        )

    W("lm_fit", fit_lm)

    # B3: LM predict (keeps rows, adds prediction)
    W("lm_predict", lambda: force(model_holder["m"].predict(li)))

    # B4: GLM binomial logit fit
    from sparkglm_spark.operators.glm import glm

    od = orders.withColumn(
        "is_f", F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)
    )
    W("glm_fit", lambda: glm(od, "is_f ~ o_totalprice + o_orderpriority"))

    # extension headliners
    from sparkglm_spark.operators.dedup import minhash_dedup_pairs
    from sparkglm_spark.operators.similarity import cosine_topk
    from sparkglm_spark.operators.text import fingerprint, text_stats

    W(
        "dedup_minhash",
        lambda: force(minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.8)),
    )
    W("similarity_topk", lambda: force(cosine_topk(emb, emb.limit(100), k=10)))
    W("text_stats", lambda: force(text_stats(docs)))
    W("text_fingerprint", lambda: force(fingerprint(docs)))

    from sparkglm_spark.operators.pipeline import prepare_training_corpus
    from sparkglm_spark.operators.similarity import ivf_topk

    W("corpus_prep", lambda: force(prepare_training_corpus(docs)))
    W(
        "similarity_ivf",
        lambda: force(ivf_topk(emb, emb.limit(100), k=10, n_lists=16, n_probe=4)),
    )

    # grouped modeling / search / linear algebra headliners
    from sparkglm_spark.operators.lm import lm_grouped
    from sparkglm_spark.operators.pca import pca_project
    from sparkglm_spark.operators.text import bm25_search

    W(
        "lm_grouped",
        lambda: force(
            lm_grouped(
                li, "l_extendedprice ~ l_quantity + l_discount", ["l_returnflag"]
            )
        ),
    )
    W(
        "text_bm25",
        lambda: force(bm25_search(docs, ["spark", "join", "window"], top_k=20)),
    )
    W(
        "pca_project",
        lambda: force(
            pca_project(
                li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"], 2
            )
        ),
    )

    # relational headliners
    import __spark_entry__ as E

    W("pricing_summary", lambda: force(E.q_pricing_summary(spark, SF_DIR)))
    W("top_orders", lambda: force(E.q_top_orders(spark, SF_DIR)))
    W("region_revenue", lambda: force(E.q_region_revenue(spark, SF_DIR)))
    W("events_hourly", lambda: force(E.q_events_hourly(spark, SF_DIR)))
    W("events_sessionize", lambda: force(E.q_events_sessionize(spark, SF_DIR)))

    # multimodal: synth real-format payloads (BMP + WAV + RVID) →
    # pure-python decode inside Arrow mapInPandas → feature tables
    from sparkglm_spark.operators.multimodal import (
        audio_features,
        image_features,
        synth_bmp_media_from_documents,
        synth_video_media_from_documents,
        synth_wav_media_from_documents,
        video_features,
    )

    W(
        "multimodal_decode",
        lambda: force_all(
            lambda: image_features(synth_bmp_media_from_documents(docs)),
            lambda: audio_features(synth_wav_media_from_documents(docs)),
            lambda: video_features(synth_video_media_from_documents(docs)),
        ),
    )

    # r3 operator families (r3/r4 verdict ask: give each a headline so
    # round-over-round deltas are attributable)
    from sparkglm_spark.operators.cluster import near_dup_clusters
    from sparkglm_spark.operators.corpus import contamination_scores
    from sparkglm_spark.operators.pack import pack_cumulative, pack_greedy
    from sparkglm_spark.operators.similarity import quantize_int8

    W(
        "near_dup_clusters",
        lambda: force(
            near_dup_clusters(
                docs,
                minhash_dedup_pairs(docs, "doc_id", "text", n=3, threshold=0.8),
                "doc_id",
            )
        ),
    )
    W(
        "pack_cumulative",
        lambda: force(pack_cumulative(docs, budget=512, n_buckets=4)),
    )
    W("pack_greedy", lambda: force(pack_greedy(docs, budget=512, n_buckets=4)))
    W(
        "contamination_scores",
        lambda: force(
            contamination_scores(
                docs.where(F.col("doc_id") % 23 != 0),
                docs.where(F.col("doc_id") % 23 == 0),
                n=5,
            )
        ),
    )
    W("quantize_int8", lambda: force(quantize_int8(emb)))

    # r6: global (cross-document) line dedup — the corpus is single-line,
    # so derive a multi-line twin the same way the driver oracle does
    from sparkglm_spark.operators.corpus import remove_global_duplicate_lines

    multi = docs.select(
        "doc_id", F.replace(F.col("text"), F.lit(" table "), F.lit("\n")).alias("text")
    )
    W("line_dedup_global", lambda: force(remove_global_duplicate_lines(multi)))

    # r6: the curation quartet — PII redaction, unigram-LM scoring, Gopher
    # gate, text normalization — one combined headline (all four are
    # scan-shaped ops; the multimodal_decode line uses the same grouping
    # convention)
    from sparkglm_spark.operators.corpus import unigram_logprob_scores
    from sparkglm_spark.operators.text import (
        gopher_quality_filter,
        normalize_text,
        redact_patterns,
    )

    W(
        "text_curation",
        lambda: force_all(
            lambda: redact_patterns(docs),
            lambda: unigram_logprob_scores(docs),
            lambda: gopher_quality_filter(
                docs, max_dup_token_ratio=0.95, max_top_token_ratio=0.5
            ),
            lambda: normalize_text(docs),
        ),
    )

    # r6: hashed-TF text vectors (production xxhash64 mode, L2-normalized
    # — the embedding-free bridge into the similarity suite)
    from sparkglm_spark.operators.text import hashed_tf_vectors

    W(
        "text_vectors",
        lambda: force(hashed_tf_vectors(docs, n_features=256)),
    )

    # r6: substring-window duplication signal (1.7 s warm at sf0.1)
    from sparkglm_spark.operators.corpus import substring_dup_stats

    W("substring_dup", lambda: force(substring_dup_stats(docs, window=8)))

    # r6: SemDeDup over the embeddings table (trained-centroid path: the
    # build-once/serve-many workflow pays the seeded sample k-means here)
    from sparkglm_spark.operators.similarity import semantic_dedup

    W(
        "semantic_dedup",
        lambda: force(semantic_dedup(emb, threshold=0.35, n_clusters=16)),
    )

    # r6: batch-vs-index near-dup matching (xxhash64 signatures — the
    # production mode; the portable mode exists for the oracle only).
    # bands=16 (r=8) here: this tiny-vocab corpus collides in nearly
    # every r=4 band, degenerating candidates toward all-pairs (measured
    # 47 s at the batch default 32 bands) — the regime the batch
    # planner's bitmap plan absorbs but an index-only matcher must tune
    # banding for (recall at j=0.8 is 0.95 with r=8, →1 above 0.9).
    from sparkglm_spark.operators.dedup import minhash_dedup_against, minhash_index

    W(
        "dedup_incremental",
        lambda: force(
            minhash_dedup_against(
                docs.where(F.col("doc_id") % 2 == 1),
                minhash_index(
                    docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text"
                ),
                "doc_id",
                "text",
                threshold=0.8,
                bands=16,
            )
        ),
    )

    # r7: the combined line above conflates index build and match (round-6
    # verdict) — attribute the halves. Build = the zero-shuffle signature
    # pass alone; match = minhash_dedup_against vs a PREBUILT parquet index
    # (built once, untimed — matching reads the index the way ingest does).
    import tempfile

    prebuilt_index_dir = tempfile.mkdtemp(prefix="bench_mh_idx_")
    minhash_index(
        docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text"
    ).write.mode("overwrite").parquet(prebuilt_index_dir)
    W(
        "minhash_index_build",
        lambda: force(
            minhash_index(docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text")
        ),
    )
    W(
        "dedup_incremental_match",
        lambda: force(
            minhash_dedup_against(
                docs.where(F.col("doc_id") % 2 == 1),
                spark.read.parquet(prebuilt_index_dir),
                "doc_id",
                "text",
                threshold=0.8,
                bands=16,
            )
        ),
    )

    # r7: TF-IDF (hashed TF + IDF weighting — one tokenize scan, bounded
    # idf aggs, driver-held O(n_features) weights; compare with the
    # text_vectors line to attribute the IDF cost)
    from sparkglm_spark.operators.text import tfidf_vectors

    W(
        "text_tfidf",
        lambda: force(tfidf_vectors(docs, n_features=256)),
    )

    # r7: duplicate-substring removal (the rewrite cousin of the
    # substring_dup line — ranking pass + Arrow interval-diff rewrite;
    # ~1.8 s warm at sf0.1)
    from sparkglm_spark.operators.corpus import remove_duplicate_substrings

    W(
        "substring_removal",
        lambda: force(remove_duplicate_substrings(docs, window=8)),
    )

    # r7: bigram-LM quality scoring (model = one nullable-prev pair agg,
    # scoring = three dim joins + partial-agg groupBy; ~2.3 s warm sf0.1)
    from sparkglm_spark.operators.corpus import bigram_logprob_scores

    W("text_bigram_lm", lambda: force(bigram_logprob_scores(docs)))

    # r7: the pyspark.ml wrapper must add no per-fit overhead vs bare lm()
    # (same formula as the lm_fit line — compare the two medians)
    from sparkglm_spark.ml import SparkLM

    W(
        "ml_pipeline_fit",
        lambda: SparkLM(
            formula="l_extendedprice ~ l_quantity + l_discount + l_tax"
            " + l_returnflag + l_linestatus"
        ).fit(li),
    )

    # r7b: classifier evaluation (tie-aware Mann-Whitney AUC via the
    # range-partitioned prefix sum + one fused confusion/log-loss agg +
    # calibration bins; ~2 s warm at sf0.1 over 150k orders)
    from sparkglm_spark.operators.evaluate import (
        binary_classification_eval,
        calibration_bins,
    )

    clf_scored = orders.select(
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
        (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.lit(-0.4) + F.lit(2e-6) * F.col("o_totalprice"))))
        ).alias("p"),
    )

    def run_clf_eval():
        binary_classification_eval(clf_scored, "y", "p").collect()
        calibration_bins(clf_scored, "y", "p", 10).collect()

    W("classification_eval", run_clf_eval)

    # r8: Cox PH — the heaviest iterative survival operator (per Newton
    # iteration: one groupBy over the distinct-time axis + the
    # range-partitioned prefix pass; 3 exact iterations + the final-state
    # recompute = 4 risk-set passes over ~150k distinct times at sf0.1,
    # deliberately UNbucketed so the prefix plan is stressed at full
    # cardinality — time_bucket is the production knob)
    from sparkglm_spark.operators.survival import coxph

    cox_in = orders.select(
        (F.col("o_totalprice") / 1000.0).alias("t"),
        (F.col("o_orderpriority") < "3").cast("double").alias("ev"),
        (F.col("o_custkey") % 100 / 100.0).alias("x"),
    )
    W("coxph", lambda: coxph(cox_in, "t", "ev", ["x"], exact_iterations=3))

    # r8: the hypothesis-test/profile trio as one line (each is one or two
    # bounded aggregation jobs; profile runs the approx_percentile sketch —
    # the at-scale mode)
    from sparkglm_spark.operators.stats import (
        chi2_independence,
        numeric_profile,
        welch_ttest,
    )

    two_status = orders.where(F.col("o_orderstatus") != "P")

    def run_stats_suite():
        welch_ttest(two_status, "o_orderstatus", "o_totalprice")
        chi2_independence(orders, "o_orderpriority", "o_orderstatus")
        numeric_profile(orders, ["o_totalprice"], approx_mode=True).collect()

    W("stats_suite", run_stats_suite)

    # r8: exact distributed Harrell's C over ~150k rows / ~75k event
    # times — the bucket-decomposition's probe grid (E×B compact rows
    # through per-bucket windows) plus B within-bucket Fenwick passes;
    # the heaviest new evaluation plan, benched so regressions in the
    # probe-grid stages are attributable. r9: buckets auto-size from the
    # row count (ceil(n/50k) clamped to [16, 4096] → 16 here, a 4×
    # narrower probe grid than the old fixed 64).
    from sparkglm_spark.operators.survival import concordance_index

    ci_scored = cox_in.withColumn(
        "risk_score", F.exp(F.lit(0.1) * F.col("x"))
    )

    def run_cindex():
        concordance_index(ci_scored, "t", "ev", "risk_score")

    W("cindex", run_cindex)

    # r9: the grouped-fitter family end-to-end — per-segment Huber IRLS
    # (one shuffle, numpy twin per Arrow batch) + grouped_predict scoring
    # (pivot + group-key join + codegen dot product). ~2 s warm at sf0.1;
    # guards regressions in the fit-twice / pivot-recompute class the r9
    # reviews caught.
    from sparkglm_spark.operators.lm import grouped_predict, huber_lm_grouped

    def run_robust_grouped():
        fits = huber_lm_grouped(
            li, "l_extendedprice ~ l_quantity", ["l_returnflag"],
            exact_iterations=2,
        ).persist()
        try:
            fits.collect()
            grouped_predict(
                li, fits, "l_extendedprice ~ l_quantity",
                ["l_returnflag"],
            ).groupBy("l_returnflag").agg(F.avg("prediction")).collect()
        finally:
            fits.unpersist()

    W("robust_grouped", run_robust_grouped)

    # r10: the applyInPandas smoothing/timeseries family tripwire —
    # Holt-Winters end state + intervals, Ljung-Box and seasonal
    # decomposition over events at sf0.1. The family is per-key-fold
    # heavy (exactly where interpreter-bound regressions hide) and had
    # no sf0.1 timing before this line.
    from sparkglm_spark.operators.timeseries import (
        holt_winters_forecast,
        ljung_box,
        seasonal_decompose,
    )

    events = read_table(spark, SF_DIR, "events")

    def run_timeseries_suite():
        force_all(
            lambda: holt_winters_forecast(
                events, "user_id", "ts", "value", 0.5, 0.25, 0.5,
                period=4, horizons=[3], tiebreak_col="event_id",
                interval=True,
            ),
            lambda: ljung_box(
                events, "user_id", "ts", "value", lags=10,
                tiebreak_col="event_id",
            ),
            lambda: seasonal_decompose(
                events, "user_id", "ts", "value", period=4,
                tiebreak_col="event_id",
            ),
        )

    W("timeseries_suite", run_timeseries_suite)

    # r10: the elastic-net family headline — a 3-λ × 3-fold CV grid
    # (ONE groupBy(fold) Gram job + driver coordinate descent) plus a
    # penalized-logistic fit (one zw-Gram job per IRLS solve). Guards
    # the one-pass-CV claim and the glmnet outer-loop cost.
    from sparkglm_spark.operators.enet import elastic_net_cv, glm_elastic_net

    def run_enet_suite():
        elastic_net_cv(
            li, "l_extendedprice ~ l_quantity + l_discount + l_tax",
            [0.5, 50.0, 5000.0],
            fold_expr=F.pmod(F.col("l_orderkey"), F.lit(3)).cast("int"),
            n_folds=3,
        ).collect()
        glm_elastic_net(
            od, "is_f ~ o_totalprice", reg_param=0.01,
            elastic_net_param=0.5,
        )

    W("enet_suite", run_enet_suite)

    # SPARK_GRAFT_BENCH_ONLY=a,b,c — optimization-loop convenience: time
    # just the named workloads (the driver never sets it; default = all,
    # so the driver's protocol is unchanged).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        if "lm_predict" in keep:
            keep.add("lm_fit")  # predict reads the model lm_fit produces
        workloads = [(n, f) for n, f in workloads if n in keep]

    runs: dict[str, list[float]] = {name: [] for name, _ in workloads}
    errors: dict[str, str] = {}
    for _ in range(N_RUNS):
        for name, fn in workloads:
            if name in errors:
                continue  # failed once -> don't retry, don't kill the run
            # isolate workloads: drop caches persisted by the previous
            # operator (minhash/corpus pipelines cache intermediates) so
            # later timings don't absorb their GC/memory pressure
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                fn()
            except Exception as e:  # one broken workload must not cost
                errors[name] = repr(e)[:200]  # the whole round's record
                continue
            runs[name].append(time.perf_counter() - t0)

    medians = {
        name: round(statistics.median(ts), 3)
        for name, ts in runs.items()
        if ts
    }
    mins = {name: round(min(ts), 3) for name, ts in runs.items() if ts}
    total = round(sum(medians.values()), 3)
    # r5 added 5 headline lines (near_dup_clusters, pack_*, contamination,
    # quantize) — value_r4_set keeps an apples-to-apples e2e over the query
    # set every round since r1-r4 has numbers for, so the e2e trend stays
    # attributable while "value" covers the full current surface.
    r5_new = {
        "near_dup_clusters",
        "pack_cumulative",
        "pack_greedy",
        "contamination_scores",
        "quantize_int8",
        "line_dedup_global",  # r6 additions, same exclusion rationale
        "text_curation",
        "text_vectors",
        "substring_dup",
        "semantic_dedup",
        "dedup_incremental",
        "minhash_index_build",  # r7 additions, same exclusion rationale
        "dedup_incremental_match",
        "ml_pipeline_fit",
        "text_tfidf",
        "substring_removal",
        "text_bigram_lm",
        "classification_eval",
        "coxph",  # r8 additions, same exclusion rationale
        "stats_suite",
        "cindex",
        # r9/r10 additions — robust_grouped was MISSING here in r9
        # (latent comparability bug: the driver's r9 value_r4_set
        # silently absorbed the new ~1.4-2.2 s line; clean-box records
        # in PLANS.md predate the line and stay comparable)
        "robust_grouped",
        "timeseries_suite",
        "enet_suite",
    }
    total_r4_set = round(
        sum(v for k, v in medians.items() if k not in r5_new), 3
    )
    summary = json.dumps(
        {
            "metric": "e2e_headline_seconds",
            "value": total,
            "value_r4_set": total_r4_set,
            "unit": "sec",
            "queries": medians,
            "queries_min": mins,
            "n_runs": N_RUNS,
            "sf": float(sf),
            # noise context: this box swings ±30-50% run-to-run (see
            # PLANS.md "Bench protocol note"); the 1-min load average
            # at start/end helps attribute outlier rounds
            "load_avg": [load_start, round(os.getloadavg()[0], 2)],
            **({"errors": errors} if errors else {}),
        }
    )
    # Robustness vs tail-scraping (BENCH_r12 recorded "parsed": null —
    # Spark shutdown chatter can trail the JSON line): (a) persist the
    # summary to BENCH_LAST.json next to this script, (b) print it once
    # here, and (c) print a FINAL stdout line after spark.stop() that is
    # guaranteed to fit the driver's scrape window.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LAST.json"), "w"
        ) as fh:
            fh.write(summary + "\n")
    except OSError:
        pass
    # FINAL line sizing (r15 contract fix): the driver parses the last
    # stdout line inside a 2000-BYTE tail window (measured: BENCH_r13
    # stored a 2000-byte tail whose single truncated line failed to
    # parse; BENCH_r14's 174-byte compact line parsed but carried no
    # per-query data, emptying PERF_r14.per_query). The final line must
    # therefore (a) carry the per-query maps and (b) stay under the
    # window. Compact separators put {metric, value, unit, sf, queries,
    # queries_min} at ~1990 bytes for the current 43 queries; if the
    # maps ever outgrow the budget, drop queries_min first, then fall
    # back to medians-only — "queries" is the core driver contract.
    _FINAL_LINE_BUDGET = 1998  # +"\n" = 1999 ≤ the 2000-byte tail window
    final_fields = {
        "metric": "e2e_headline_seconds",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "queries": medians,
        "queries_min": mins,
    }
    final_line = json.dumps(final_fields, separators=(",", ":"))
    if len(final_line) > _FINAL_LINE_BUDGET:
        del final_fields["queries_min"]
        final_line = json.dumps(final_fields, separators=(",", ":"))
    print(summary, flush=True)
    import shutil

    shutil.rmtree(prebuilt_index_dir, ignore_errors=True)
    spark.stop()
    print(summary, flush=True)
    print(final_line, flush=True)


if __name__ == "__main__":
    main()
