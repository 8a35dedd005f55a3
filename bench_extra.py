#!/usr/bin/env python3
"""Round-6 optimization profiling harness (guide §1.4: noop-sink isolation).

NOT the driver bench — ``bench.py`` stays frozen. This file isolates the
expensive bench rows into sub-stage timings (each stage materialized through
the noop sink so the computation, not the sink or a count()'s column
pruning, is what's timed) and prints per-stage seconds.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py <profile> [...]
Profiles: linkgraph pagerank corpus_clean jaccard minhash crawl bloom extract cdx knn
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("PROFILE_REPEAT", "2"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from bbcrawl_spark.plans.session import build_session

    spark = build_session(app_name="bbcrawl-profile", cores=CPUS)
    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        best = float("inf")
        for _ in range(REPEAT):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}s", flush=True)

    which = set(sys.argv[1:]) or {"linkgraph"}

    if "linkgraph" in which:
        from bbcrawl_spark.operators import linkgraph

        ev_lg = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "event_id", "user_id"
        )
        links_big = (
            ev_lg.withColumn("m", F.explode(F.sequence(F.lit(0), F.lit(19))))
            .select(
                F.concat(
                    F.lit("http://h"),
                    ((F.col("user_id") * 20 + F.col("m")) % 5000).cast("string"),
                    F.lit(".example.com/t/"),
                    (F.col("event_id") % 40).cast("string"),
                ).alias("page_url"),
                F.concat(
                    F.lit("http://h"),
                    ((F.col("event_id") + F.col("m") * 7919) % 5000).cast("string"),
                    F.lit(".example.com/u/"),
                    (F.col("event_id") % 9).cast("string"),
                ).alias("link_url"),
            )
        )
        timed("lg_1_gen_urls", lambda: noop(links_big))
        hosts = links_big.select(
            linkgraph.host_of_url("page_url").alias("src_host"),
            linkgraph.host_of_url("link_url").alias("dst_host"),
        )
        timed("lg_2_host_extract", lambda: noop(hosts))
        timed("lg_3_host_edges", lambda: noop(linkgraph.host_edges(links_big)))
        timed(
            "lg_4_full_build",
            lambda: noop(
                linkgraph.degree_stats(linkgraph.host_edges(links_big))
            ),
        )

    if "pagerank" in which:
        from bbcrawl_spark.operators import linkgraph

        ev_lg = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "event_id", "user_id"
        )
        links_big = (
            ev_lg.withColumn("m", F.explode(F.sequence(F.lit(0), F.lit(19))))
            .select(
                F.concat(
                    F.lit("http://h"),
                    ((F.col("user_id") * 20 + F.col("m")) % 5000).cast("string"),
                    F.lit(".example.com/t/"),
                    (F.col("event_id") % 40).cast("string"),
                ).alias("page_url"),
                F.concat(
                    F.lit("http://h"),
                    ((F.col("event_id") + F.col("m") * 7919) % 5000).cast("string"),
                    F.lit(".example.com/u/"),
                    (F.col("event_id") % 9).cast("string"),
                ).alias("link_url"),
            )
        )
        edges_big = linkgraph.host_edges(links_big).cache()
        edges_big.count()
        timed(
            "pr_5iter",
            lambda: noop(
                linkgraph.pagerank(edges_big, iterations=5, assume_distinct=True)
            ),
        )
        timed(
            "hits_5iter",
            lambda: noop(
                linkgraph.hits(edges_big, iterations=5, assume_distinct=True)
            ),
        )
        edges_big.unpersist()

    if "corpus_clean" in which:
        from bbcrawl_spark.operators import textops
        from pyspark.sql import Window
        import __spark_entry__ as entry

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        timed("cc_1_read", lambda: noop(d))
        timed("cc_2_quality", lambda: noop(textops.quality_score(d)))
        timed(
            "cc_3_quality_langid",
            lambda: noop(textops.langid(textops.quality_score(d))),
        )
        scored = textops.langid(textops.quality_score(d)).filter("q_keep")

        def _window():
            w = Window.partitionBy(
                F.xxhash64(textops.normalized("text"))
            ).orderBy("doc_id")
            noop(
                scored.withColumn("_rn", F.row_number().over(w)).filter(
                    F.col("_rn") == 1
                )
            )

        timed("cc_4_plus_window", _window)
        timed("cc_5_full", lambda: noop(entry.q_corpus_clean(spark, SF_DIR)))
        timed(
            "cc_6_full_count", lambda: entry.q_corpus_clean(spark, SF_DIR).count()
        )

    if "jaccard" in which:
        from bbcrawl_spark.operators import textops, graphops

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS)
        sh = docs.select(
            F.col("doc_id").alias("id"),
            F.explode(textops.shingles("text", 3)).alias("shingle"),
        ).select("id", F.xxhash64("shingle").alias("shingle"))
        timed("ng_1_shingles", lambda: noop(sh))
        timed(
            "ng_2_pairs",
            lambda: noop(
                textops.ngram_jaccard_pairs(
                    docs, threshold=0.5, max_shingle_df=50
                )
            ),
        )

        def _clusters():
            pairs = textops.ngram_jaccard_pairs(
                docs, threshold=0.5, max_shingle_df=50
            )
            bc: list = []
            graphops.dedup_clusters(docs, pairs, cache=bc).filter(
                "NOT keep"
            ).count()
            for h in bc:
                h.unpersist()

        timed("ng_3_clusters", _clusters)

    if "minhash" in which:
        from bbcrawl_spark.operators import textops

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS)
        udf = textops.make_minhash_udf()
        sig = docs.select(F.col("doc_id").alias("id"), udf(F.col("text")).alias("sig"))
        timed("mh_1_signatures", lambda: noop(sig))
        banded = textops._band_signatures(sig, 64, 16)
        timed("mh_2_banded", lambda: noop(banded))
        timed(
            "mh_3_pairs",
            lambda: noop(textops.minhash_lsh_pairs(docs, threshold=0.5)),
        )
        timed(
            "mh_4_dedup",
            lambda: textops.minhash_dedup(docs, threshold=0.5).count(),
        )

    if "crawl" in which:
        from bbcrawl_spark.functions import udfs
        from bbcrawl_spark.operators import dedup, politeness

        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        urls = (
            orders.select("o_orderkey", "o_custkey")
            .withColumn("_m", F.explode(F.sequence(F.lit(1), F.lit(10))))
            .select(
                F.concat(
                    F.lit("http://h"), (F.col("o_custkey") % 997).cast("string"),
                    F.lit(".example.com/t/"), F.col("o_orderkey").cast("string"),
                    F.lit("/page"), F.col("_m").cast("string"),
                ).alias("url"),
                (F.col("o_custkey") % 997).cast("string").alias("host"),
                F.lit(1).alias("priority"),
                F.col("_m").cast("int").alias("page_num"),
            )
            .withColumn("url_hash", udfs.url_hash_col("url"))
            .repartition(CPUS * 2)
        ).cache()
        urls.count()
        seen = urls.filter(F.col("page_num") <= 3).select("url_hash").cache()
        seen.count()
        timed(
            "cp_1_antijoin",
            lambda: noop(dedup.dedup_against_seen(urls, seen)),
        )
        timed(
            "cp_2_full",
            lambda: noop(
                politeness.rank_fetch_slots(
                    dedup.dedup_against_seen(urls, seen), budget=50
                )
            ),
        )
        urls.unpersist()
        seen.unpersist()

    if "bloom" in which:
        import tempfile

        from bbcrawl_spark.operators import dedup

        N = 20_000_000
        big_seen = (
            spark.range(0, N, 1, CPUS * 2)
            .select(F.xxhash64("id").alias("url_hash"))
            .cache()
        )
        big_seen.count()
        timed(
            "bl_1_rebuild_20m",
            lambda: dedup.build_partitioned_bloom(
                big_seen, tempfile.mkdtemp(prefix="prof_bloom_"), 64
            ),
        )
        big_delta = (
            spark.range(N, N + 100_000, 1, CPUS)
            .select(F.xxhash64("id").alias("url_hash"))
            .cache()
        )
        big_delta.count()
        base = tempfile.mkdtemp(prefix="prof_bloom_base_")
        dedup.build_partitioned_bloom(big_seen, base, 64)
        timed(
            "bl_2_incr",
            lambda: dedup.update_partitioned_bloom(
                big_delta, base, tempfile.mkdtemp(prefix="prof_bloom_i_"), 64,
                seen_full=big_seen,
            ),
        )
        big_seen.unpersist()
        big_delta.unpersist()

    if "extract" in which:
        from bbcrawl_spark.functions import udfs
        from bbcrawl_spark.sources.boardsite import make_board_site

        site = make_board_site(
            hosts=4, boards=4, threads=8, pages_per_thread=4,
            posts_per_page=25, words_per_post=60,
        )
        pages_df = (
            site.to_df(spark)
            .withColumn("_m", F.explode(F.sequence(F.lit(1), F.lit(40))))
            .drop("_m")
            .repartition(CPUS * 2)
            .cache()
        )
        pages_df.count()
        ct = F.lit(udfs.CT_DEFAULT)

        def split():
            noop(pages_df.select(
                F.length(udfs.extract_text_udf("html", ct)).alias("text_len"),
                F.size(udfs.extract_links_udf("html", "url", ct)).alias("n_links"),
            ))

        fusedu = udfs.make_extract_fused_udf("")

        def fused():
            noop(pages_df.select(fusedu("html", "url", F.lit(0), ct).alias("_ex")))

        timed("ex_1_split", split)
        timed("ex_2_fused", fused)
        pages_df.unpersist()

    if "knn" in which:
        from bbcrawl_spark.operators import similarity

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        queries_df = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        timed(
            "knn_brute",
            lambda: similarity.brute_force_knn(emb, queries_df, k=10).count(),
        )

    print(json.dumps({"sf": SF_DIR, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
