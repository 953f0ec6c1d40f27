"""End-to-end training-corpus preparation on the engine's operator library.

The composition a pretraining data pipeline runs at 100 TB, demonstrated on
the test tables: admission validation gate -> (optional) bloom incremental
dedup against the prior snapshot -> clean -> Gopher composite quality
filter -> exact dedup -> near-dup clustering (keep one representative per
cluster) -> (optional) SemDeDup semantic dedup -> benchmark decontamination
-> mixture sampling -> split assignment -> epoch shuffle -> tokenize/encode
-> sequence packing.

Every stage is a DataFrame -> DataFrame operator, so the whole pipeline is
one lazy plan per output and Catalyst sees across stage boundaries (e.g.
the quality filter prunes before dedup ever tokenizes).  Run directly:

    python examples/corpus_prep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from kafka_connect_morphlines_spark.functions import bloom, dedup, evalmetrics, semantic, textclean, textstats, traindata
from kafka_connect_morphlines_spark.functions import validation as V


def prepare_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    vocab_size: int = 4096,
    embeddings: DataFrame | None = None,
    prior_corpus: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Returns the prepared corpus plus the intermediate audit frames.

    ``embeddings`` (vec_id aligned with doc_id) switches on the SemDeDup
    semantic-dedup stage; ``prior_corpus`` (a previously-ingested documents
    frame) switches on bloom incremental dedup so re-ingested batches drop
    already-seen content without joining the full prior corpus.
    """
    # 0. admission gate: malformed batches abort before any compute is
    #    spent on them (one aggregate pass; raises ConstraintViolation)
    V.expect(docs, [V.NotNull("doc_id"), V.Unique("doc_id"), V.NotNull("text")])

    # 0b. incremental ingest: drop documents whose content digest already
    #     exists in the prior snapshot (bloom prefilter + exact verify)
    if prior_corpus is not None:
        docs = bloom.incremental_dedup(
            docs, prior_corpus, F.md5(F.col("text")), F.md5(F.col("text")), fpp=0.01
        )
        # pin the ingest boundary: the dedup output is a two-branch union
        # and every downstream self-join would double it — without this the
        # corpus-prep DAG sends Catalyst into minutes of plan analysis
        docs = docs.localCheckpoint()

    # 1. clean: strip markup, redact PII (map-side column expressions)
    cleaned = docs.withColumn("text", textclean.redact_pii(textclean.strip_html(F.col("text"))))

    # 2. quality gate: drop empty/degenerate documents before anything
    #    tokenizes them twice (stopword/length heuristics, one map pass),
    #    then the perplexity-style filter — documents whose average unigram
    #    log-probability under the corpus's own LM sits far below the median
    #    are gibberish/boilerplate outliers
    q = textstats.quality_features_df(cleaned, text_col="text", id_col="doc_id")
    #    Gopher-style composite rules, relaxed to this corpus's scale; the
    #    per-doc failed-rule audit trail rides along in the output
    gopher = textclean.gopher_filter_df(
        cleaned,
        min_tokens=5,
        min_stopword_ratio=0.0,
        min_unique_ratio=0.2,
        max_dup_gram_frac=0.5,
    )
    filtered = cleaned.join(gopher.filter(F.col("passed")).select("doc_id"), "doc_id", "left_semi")
    lm = textstats.unigram_logprob_df(filtered, text_col="text", id_col="doc_id")
    lm_floor = lm.approxQuantile("logprob", [0.01], 0.001)[0]  # bottom 1% out
    filtered = filtered.join(
        lm.filter(F.col("logprob") >= lm_floor).select("doc_id"), "doc_id", "left_semi"
    )
    #    ... and the model-based gate: a hashed linear classifier scores
    #    each doc (here the derived pseudo-random model; production swaps
    #    in a trained (bucket, weight_milli) table via weights=)
    clf = textstats.hashed_linear_score_df(filtered, text_col="text", id_col="doc_id")
    filtered = filtered.join(
        clf.filter(F.col("score") > -0.1).select("doc_id"), "doc_id", "left_semi"
    )

    # 3. exact dedup first — near-dup pair output is quadratic in duplicate
    #    cluster size, so collapse byte-identical copies before MinHash
    distinct_docs = dedup.exact_dedup(filtered, text_col="text", id_col="doc_id")

    # 3b. span-level dedup: boilerplate repeated ACROSS surviving documents
    #     (headers, license blocks) is removed at span granularity while the
    #     documents themselves survive
    spans = traindata.remove_duplicate_spans(distinct_docs, span_tokens=16)
    distinct_docs = (
        distinct_docs.drop("text")
        .join(spans.filter(F.col("n_spans") > 0).select("doc_id", F.col("clean_text").alias("text")), "doc_id")
    )

    # 4. near-dup clustering: MinHash-LSH candidate pairs -> exact-Jaccard
    #    verify -> connected components -> keep the BEST-scoring doc per
    #    cluster (the classifier score from stage 2 rides along — plain
    #    min-id would keep an arbitrary copy)
    pairs = dedup.minhash_dedup_pairs(distinct_docs, threshold=0.8, num_hashes=48, bands=12)
    # (doc_id, component) feeds THREE consumers below (representative
    # selection, the doc semi-join, the split assignment) and its lineage
    # carries the whole upstream filter/dedup DAG — cut it once, it's two
    # longs per doc
    comps = traindata.connected_components(pairs, distinct_docs).localCheckpoint()
    scores = clf.select("doc_id", "score").localCheckpoint()
    best = dedup.keep_best_representative(comps, scores)
    deduped = distinct_docs.join(best.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi")

    # 4b. semantic dedup (SemDeDup): cluster the embedding space, drop docs
    #     with a lower-id same-cluster neighbor above the cosine threshold
    if embeddings is not None:
        cents = semantic.kmeans_fit(embeddings, k=32, n_iter=2, seed=0)
        sem_keep = semantic.semantic_dedup_keep(embeddings, cents, threshold=0.3)
        deduped = deduped.join(
            sem_keep.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
        )

    # 5. benchmark decontamination (GPT-3-style n-gram overlap rule)
    contam = traindata.decontaminate(deduped, benchmark, n=3)
    clean_ids = contam.filter(F.col("contamination") < 0.2).select("doc_id")
    decontaminated = deduped.join(clean_ids, "doc_id", "left_semi")

    # 5b. per-source cap (RefinedWeb-style domain limit): no source may
    #     dominate the mix — keep its best-scoring docs up to the cap
    capped = traindata.cap_per_group(
        decontaminated.join(scores, "doc_id"),
        group_col="source",
        cap=50,
        score_col="score",
    )
    decontaminated = decontaminated.join(
        capped.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )

    # the surviving corpus feeds five consumers (two audits + mixture +
    # cap rejoin + splits) and its lineage carries every dedup stage — cut
    # it once; it's (doc_id, source, text) for the survivors
    decontaminated = decontaminated.localCheckpoint()

    # 5c. dataset-card audits on the surviving corpus (pure reporting —
    #     nothing downstream consumes them): chunk-level redundancy via
    #     content-defined chunking, and the cross-source n-gram leakage
    #     matrix (r08 operators)
    cdc_audit = dedup.cdc_dedup_stats(decontaminated)
    overlap_audit = traindata.source_overlap_matrix(decontaminated, n=8)

    # 5d. metadata-reliability + tokenizer-cost audits (r08 session-2):
    #     Krippendorff's alpha across the stored lang label and two
    #     lang-id raters (the truncated rater abstains on short docs) —
    #     a low alpha means the lang metadata is too unreliable to
    #     stratify the mixture on; the fertility table prices each
    #     language in tokens BEFORE the budget is committed.
    lang_reliability = None
    fertility_audit = None
    if "lang" in decontaminated.columns:
        ra = decontaminated.select(F.col("doc_id").alias("u"), F.col("lang").alias("c"))
        rb = textstats.lang_id_exploded(decontaminated).select(
            F.col("doc_id").alias("u"), F.col("lang_pred").alias("c")
        )
        rc = textstats.lang_id_exploded(
            decontaminated.filter(F.length("text") >= 160).select(
                "doc_id", F.substring(F.col("text"), 1, 80).alias("text")
            )
        ).select(F.col("doc_id").alias("u"), F.col("lang_pred").alias("c"))
        lang_reliability = evalmetrics.krippendorff_alpha_nominal(
            ra.unionByName(rb).unionByName(rc), F.col("u"), F.col("c")
        )
        fertility_audit = (
            decontaminated.select(
                "lang",
                F.size(textstats.tokens(F.col("text"))).alias("w"),
                F.size(textstats.bpe_ish_tokens(F.col("text"))).alias("tk"),
                F.octet_length("text").alias("by"),
            )
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("docs"), F.sum("w").alias("words"),
                 F.sum("tk").alias("tokens"), F.sum("by").alias("bytes"))
        )

    # 6. mixture sampling + LEAKAGE-SAFE split assignment: the split hashes
    #    the near-dup component id (already computed in stage 4), so a doc
    #    and its surviving near-dup can never straddle train/test.
    #    (For an exact-k sqrt-temperature mix across sources use
    #    traindata.temperature_quota_sample(decontaminated, k_total=...)
    #    instead of the rate-based mixture.)
    mixed = traindata.mixture_sample(decontaminated, rates={"src0": 0.5}, default_rate=1.0)
    comp_split = traindata.hash_split(
        comps.withColumnRenamed("component", "_comp"),
        id_col="_comp",
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    ).select("doc_id", "split")
    split = mixed.join(comp_split, "doc_id")

    # 7. epoch shuffle order for the train split
    train = split.filter(F.col("split") == "train")
    shuffled = traindata.global_shuffle(train, seed="epoch0", shards=16)

    # 8. tokenize: corpus vocab + ordered token-id encoding
    vocab = traindata.build_vocab(train, vocab_size=vocab_size)
    encoded = traindata.encode_documents(train, vocab)

    # 9. pack into fixed token-budget bins per source shard (for RAG-style
    #    retrieval chunking use traindata.sliding_window_chunks(train,
    #    window=64, stride=32) instead — overlapping windows, not bins)
    packed = traindata.pack_sequences(train, budget=512)

    return {
        "quality": q,
        "gopher_audit": gopher,
        "deduped": deduped,
        "contamination": contam,
        "cdc_audit": cdc_audit,
        "overlap_audit": overlap_audit,
        **({"lang_reliability": lang_reliability} if lang_reliability is not None else {}),
        **({"fertility_audit": fertility_audit} if fertility_audit is not None else {}),
        "train_shuffled": shuffled,
        "vocab": vocab,
        "encoded": encoded,
        "packed": packed,
    }


if __name__ == "__main__":
    from kafka_connect_morphlines_spark import get_spark
    from kafka_connect_morphlines_spark.sources.files import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    benchmark = docs.orderBy("doc_id").limit(20)  # stand-in eval suite
    out = prepare_corpus(docs, benchmark, embeddings=emb)
    for name, frame in out.items():
        print(f"{name}: {frame.count()} rows")
