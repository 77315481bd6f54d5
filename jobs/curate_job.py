#!/usr/bin/env python
"""Cluster entrypoint for the training-data curation tier — the pass a
crawl corpus takes between extraction and tokenization:

    spark-submit --py-files dist/ragflow_spark.zip jobs/curate_job.py \
        --input  <docs parquet: id/text[/lang/host cols]> \
        --output <curated docs parquet> \
        [--id-col doc_id] [--text-col text] [--host-col host]
        [--langs en,de] [--gopher] [--c4-pages]
        [--charlm-tiers] [--drop-tail] [--charlm-train-frac 0.01]
        [--charlm-model <path>] [--save-charlm-model <path>]
        [--nb-clf] [--nb-model <path>] [--save-nb-model <path>]
        [--host-max-dup 0.5] [--host-max-qfail 0.5]
        [--tail-rate 0.1] [--summary <path>]
        [--dsir-target <parquet> | --dsir-model <path>] [--dsir-k N]
        [--dsir-buckets 10000] [--save-dsir-model <path>]

Stages (each optional, composed in the order a real pipeline runs them):

1. host gate — ``weburl.host_stats`` blocklist (drop every doc of a host
   whose dup-loser or quality-fail share exceeds the thresholds); needs
   ``--host-col``.
2. ``curate()`` — C4 quality + Gopher repetition (+ full Gopher/C4 page
   rules via --gopher/--c4-pages) + lang gate + PII audit + exact-dup
   demotion; rows failing get dropped here.
3. char-LM tier — train (or ``--charlm-model`` load) the bigram LM,
   score survivors, tag head/middle/tail (``--charlm-tiers``); with
   ``--drop-tail`` the tail is dropped outright, else with
   ``--tail-rate`` it is hash-downsampled (``weighted_sample``) the way
   CCNet keeps a tail slice for diversity.
4. NB classifier audit (``--nb-clf``) — score survivors with the
   distilled quality classifier (trained here or ``--nb-model`` loaded);
   kept as a column, not a gate, unless a loaded model is given AND
   ``--nb-gate`` is set.
5. DSIR selection (``--dsir-target``/``--dsir-model`` + ``--dsir-k``) —
   importance-resample the survivors toward a target distribution
   (Gumbel top-k over hashed-n-gram log ratios); the ratio model
   persists like the LM/NB models so crawl increments score against
   yesterday's target fit (unseen buckets get the smoothed default).

Writes the curated docs (original columns + audit columns) to --output
and, with --summary, a per-outcome docs/tokens audit table. Models train
once per run and can be persisted (--save-*-model) so the next increment
scores without retraining (the incremental-dedup store pattern).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--host-col", default=None)
    ap.add_argument("--langs", default=None,
                    help="comma-separated allowed langs (curate bad_lang gate)")
    ap.add_argument("--max-dup-word", type=float, default=0.3)
    ap.add_argument("--max-dup-bigram", type=float, default=0.2)
    ap.add_argument("--gopher", action="store_true")
    ap.add_argument("--c4-pages", action="store_true")
    ap.add_argument("--charlm-tiers", action="store_true")
    ap.add_argument("--drop-tail", action="store_true")
    ap.add_argument("--tail-rate", type=float, default=None,
                    help="keep this hash-deterministic fraction of tail docs")
    ap.add_argument("--charlm-train-frac", type=float, default=None)
    ap.add_argument("--charlm-model", default=None)
    ap.add_argument("--save-charlm-model", default=None)
    ap.add_argument("--nb-clf", action="store_true")
    ap.add_argument("--nb-model", default=None)
    ap.add_argument("--save-nb-model", default=None)
    ap.add_argument("--nb-gate", action="store_true",
                    help="drop pred=0 docs (only with a LOADED --nb-model: "
                         "gating on a model distilled from this same run's "
                         "heuristic would just re-apply the heuristic)")
    ap.add_argument("--host-max-dup", type=float, default=0.5)
    ap.add_argument("--host-max-qfail", type=float, default=0.5)
    ap.add_argument("--url-col", default=None,
                    help="opt the RefinedWeb-style URL word-score gate in "
                         "as the FIRST curation rule (drop_reason "
                         "'bad_url')")
    ap.add_argument("--url-fail-milli", type=int, default=1000)
    ap.add_argument("--dsir-target", default=None,
                    help="target-corpus parquet (same id/text col names): "
                         "fit a DSIR ratio model and keep the --dsir-k "
                         "Gumbel-top-k survivors closest to its "
                         "distribution")
    ap.add_argument("--dsir-model", default=None,
                    help="load a saved ratio model instead of fitting "
                         "(crawl increments score against yesterday's "
                         "model; unseen buckets get the smoothed default)")
    ap.add_argument("--save-dsir-model", default=None)
    ap.add_argument("--dsir-k", type=int, default=None)
    ap.add_argument("--dsir-buckets", type=int, default=10_000)
    ap.add_argument("--dsir-seed", type=int, default=42)
    ap.add_argument("--summary", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ragflow_spark.operators import clf, lm
    from ragflow_spark.operators.curate import curate, curation_summary
    from ragflow_spark.session import get_spark

    spark = get_spark(app_name="ragflow_spark_curate")
    docs = spark.read.parquet(args.input)
    idc, txt = args.id_col, args.text_col

    # 1. host-level blocklist
    if args.host_col:
        from ragflow_spark.operators.weburl import host_stats

        hs = host_stats(
            docs, args.host_col, idc, txt,
            max_dup_share=args.host_max_dup,
            max_quality_fail_share=args.host_max_qfail,
        )
        good_hosts = hs.filter(F.col("host_keep") == 1).select(
            F.col("host").alias(args.host_col)
        )
        # hosts are tiny next to docs — broadcast semi join, no shuffle
        # of the doc table
        docs = docs.join(F.broadcast(good_hosts), on=args.host_col,
                         how="left_semi")

    # 2. document-level curation
    flags = curate(
        docs, idc, txt,
        allowed_langs=(tuple(args.langs.split(",")) if args.langs else None),
        max_dup_word=args.max_dup_word,
        max_dup_bigram=args.max_dup_bigram,
        gopher_quality=args.gopher,
        c4_page_rules=args.c4_pages,
        url_col=args.url_col,
        url_fail_milli=args.url_fail_milli,
    )
    kept = docs.join(flags.filter(F.col("keep") == 1), on=idc)

    # 3. LM perplexity tier over the survivors
    if args.charlm_tiers:
        if args.charlm_model:
            model = lm.charlm_load(spark, args.charlm_model)
        else:
            counts = [
                (r["idx"], r["c"])
                for r in lm.charlm_bigram_counts(
                    kept, txt, train_frac=args.charlm_train_frac,
                    id_col=idc,
                ).collect()
            ]
            model = lm.charlm_model(counts)
        if args.save_charlm_model:
            lm.charlm_save(spark, model, args.save_charlm_model)
        scored = lm.ppl_tiers(
            lm.charlm_score(kept, idc, txt, model).select(
                idc, "ce_nats", "ppl"
            ),
            exact=False,  # sketch quantiles: the at-scale default
        )
        kept = kept.join(scored, on=idc)
        if args.drop_tail:
            kept = kept.filter(F.col("tier") != "tail")
        elif args.tail_rate is not None:
            from ragflow_spark.operators.sampling import weighted_sample

            rate = F.when(F.col("tier") == "tail", F.lit(args.tail_rate)) \
                .otherwise(F.lit(1.0))
            kept = weighted_sample(
                kept.withColumn("_rate", rate), idc, "_rate"
            ).drop("_rate")

    # 4. classifier audit / gate
    if args.nb_clf or args.nb_model:
        if args.nb_model:
            w, prior = clf.nb_load(spark, args.nb_model)
            nb = clf.nb_score(kept, idc, txt, w, prior).select(
                idc, F.col("score_micro").alias("nb_score_micro"),
                F.col("pred").alias("nb_pred"),
            )
        else:
            from ragflow_spark.operators.textstats import quality_features

            labeled = quality_features(
                kept, idc, txt, passthrough=(F.col(txt),)
            ).select(idc, txt, F.col("quality_keep").alias("_y"))
            w, prior = clf.nb_train(labeled, txt, "_y")
            if args.save_nb_model:
                clf.nb_save(spark, w, prior, args.save_nb_model)
            nb = clf.nb_score(kept, idc, txt, w, prior).select(
                idc, F.col("score_micro").alias("nb_score_micro"),
                F.col("pred").alias("nb_pred"),
            )
        kept = kept.join(nb, on=idc)
        if args.nb_gate:
            if not args.nb_model:
                raise SystemExit(
                    "--nb-gate requires a LOADED --nb-model (gating on a "
                    "same-run distilled model re-applies the heuristic)"
                )
            kept = kept.filter(F.col("nb_pred") == 1)

    # 5. DSIR selection toward a target distribution
    if args.dsir_target or args.dsir_model:
        if not args.dsir_k:
            raise SystemExit("--dsir-k is required with "
                             "--dsir-target/--dsir-model")
        from ragflow_spark.operators import dsir as dsir_ops

        if args.dsir_model:
            ratios, nb, default_lam = dsir_ops.dsir_load(
                spark, args.dsir_model)
            dbc = dsir_ops.doc_bucket_counts(kept, idc, txt, nb)
        else:
            nb, default_lam = args.dsir_buckets, None
            target = spark.read.parquet(args.dsir_target)
            # persisted: the model-fit collect materializes the
            # featurized frame, the weight pass reads the cache — one
            # corpus pass (dsir.py module docstring)
            dbc = dsir_ops.doc_bucket_counts(
                kept, idc, txt, nb).persist()
            ratios = dsir_ops.dsir_log_ratios(
                dsir_ops.bucket_counts(
                    dsir_ops.gram_buckets(target, idc, txt, nb)),
                dbc.groupBy("bucket").agg(F.sum("n").alias("n")),
                nb,
            )
        if args.save_dsir_model:
            dsir_ops.dsir_save(ratios, nb, args.save_dsir_model)
        w = dsir_ops.dsir_weights(
            dbc, ratios, idc, default_lambda_micro=default_lam,
        )
        sel = dsir_ops.dsir_resample(
            w, idc, args.dsir_k, seed=args.dsir_seed
        ).select(idc, "weight_micro", "key_micro")
        # k selected ids are tiny next to docs — broadcast semi shape
        kept = kept.join(F.broadcast(sel), on=idc)
        kept.write.mode("overwrite").parquet(args.output)
        dbc.unpersist()
    else:
        kept.write.mode("overwrite").parquet(args.output)
    if args.summary:
        curation_summary(flags).write.mode("overwrite").parquet(args.summary)
    spark.stop()


if __name__ == "__main__":
    main()
