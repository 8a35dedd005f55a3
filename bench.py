#!/usr/bin/env python3
"""bbcrawl_spark benchmark — prints ONE JSON line.

Runs the engine's headline workloads at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32):

  frontier_gen           pure-codegen frontier generation + hash (5M urls)
  crawl_pipeline         the crawl-round relational core at ~10x orders
                         scale: urls -> seen anti-join -> single-pass
                         politeness -> BOTH sides materialized
  bloom_roundtrip        partitioned-Bloom build + map-side membership pass
  extract_pages          Arrow-batched html text+link extraction, SPLIT UDFs
                         (one decode+parse per consumer — the pre-round-3
                         shape, kept as the comparison row)
  extract_fused          fused text+links extraction (one decode+parse per
                         page — what the round loop runs)
  warc_ingest_stream     streamed WARC ingest from paths (16 gz segments x
                         500 pages; workers stream records, scan ships
                         paths only)
  wet_ingest_stream      streamed WET ingest (8 gz segments x 500 texts;
                         conversion records -> (url, ts, text))
  cdx_latest             CDX index pipeline: 20 captures/doc -> CDXJ parse
                         (limit-3 split + JSON) -> keep-newest-per-SURT
  exact_dedup_docs       hash-window dedup over documents
  minhash_dedup          MinHash+LSH near-dup dedup over documents
                         (round-3: transitively correct via cluster resolution)
  minhash_dedup_capped   same, at the production hot-bucket cap (2,000):
                         prices the always-paid WindowExec pre-filter
  dedup_clusters         pair list -> connected-components keep/drop manifest
  dedup_clusters_reuse   pairs persisted ONCE, consumed by both the pair list
                         and the manifest (the production chain shape)
  minhash_signatures     the vectorized signature kernel alone
  ngram_jaccard          exact shingle-join Jaccard pairs over documents
  strip_boilerplate      cross-corpus boilerplate-line removal (line-df pass)
  paragraph_dedup        cross-document keep-first segment dedup
  incremental_dedup      new-snapshot screen vs the standing corpus
  chunk_docs             fixed-window training-sequence chunking (map-only)
  pack_sequences         concatenate-and-split packing manifest (slice path)
  corpus_shuffle         deterministic global shuffle rank (two-level, no
                         global window)
  hashed_quality         hashing-trick linear quality model (JVM integer sum)
  unicode_nfc            NFC normalization (one Arrow stage)
  embedding_knn          brute-force cosine top-10, 5 queries x embeddings
  bloom_full_rebuild_20m / bloom_incr_update_20m
                         one round of seen-Bloom maintenance at 20M keys:
                         the round-1 full rebuild vs the round-2 incremental
                         delta update (cost ∝ |seen_new|)

Output: {"metric": "frontier URLs scheduled/sec (crawl_pipeline)",
         "value": <total headline seconds>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ..., "urls_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
#: multiplies the synthetic crawl workload sizes; scaling_bench sets this
#: high so the N-vs-4N comparison measures compute, not fixed overhead
SCALE = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1"))


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from bbcrawl_spark import pagers
    from bbcrawl_spark.functions import udfs
    from bbcrawl_spark.operators import dedup, politeness, textops, similarity
    from bbcrawl_spark.plans.session import build_session
    from bbcrawl_spark.sources.boardsite import make_board_site

    spark = build_session(app_name="bbcrawl-bench", cores=CPUS)
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # warm the Python UDF workers once so timings measure operators, not
    # per-worker interpreter startup
    from pyspark.sql.types import LongType
    import pandas as pd  # noqa: F401

    def _warm(s):
        return s

    warm_udf = F.pandas_udf(_warm, LongType())
    spark.range(0, CPUS * 4, 1, CPUS * 2).select(warm_udf("id")).count()

    def timed(name: str, fn) -> None:
        # best of 2: first run also warms caches/workers for this query,
        # keeping the per-round numbers the driver records stable
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # --- frontier_gen: 5M urls, pure whole-stage codegen ------------------
    N_FRONTIER = 5_000_000 * SCALE
    def frontier_gen():
        spec = pagers.CutterPagerSpec(
            url="http://www.example.net/1/test", start=1, end=N_FRONTIER, cut=(24, 1)
        )
        df = pagers.cutter_frontier(spark, spec, parallelism=CPUS * 2)
        n = df.select(F.xxhash64("url").alias("h")).agg(F.sum("h")).count()
        assert n == 1
    timed("frontier_gen", frontier_gen)
    extras["frontier_gen_urls_per_sec"] = round(N_FRONTIER / timings["frontier_gen"], 0)

    # --- crawl_pipeline: dedup + politeness at ~10x orders ----------------
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    MULT = 10 * SCALE
    urls = (
        orders.select("o_orderkey", "o_custkey")
        .withColumn("_m", F.explode(F.sequence(F.lit(1), F.lit(MULT))))
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
        .repartition(CPUS * 2)  # parquet read yields ~4 input splits
    ).cache()
    n_urls = urls.count()
    seen = urls.filter(F.col("page_num") <= 3).select("url_hash").cache()
    seen.count()

    def crawl_pipeline():
        # default (unsalted) politeness; materialize BOTH scheduled and
        # deferred sides like the real round loop does — filter("scheduled")
        # would let Catalyst prune the deferred branch and flatter the number
        cand = dedup.dedup_against_seen(urls, seen)
        ranked = politeness.rank_fetch_slots(cand, budget=50)
        row = ranked.agg(
            F.sum("fetch_rank"), F.sum(F.col("scheduled").cast("long")), F.count("*")
        ).first()
        assert row[1] > 0
    timed("crawl_pipeline", crawl_pipeline)
    extras["n_frontier_urls"] = n_urls
    extras["urls_per_sec"] = round(n_urls / timings["crawl_pipeline"], 0)

    # --- bloom build + membership -----------------------------------------
    bdir = tempfile.mkdtemp(prefix="bench_bloom_")
    def bloom_roundtrip():
        dedup.build_partitioned_bloom(seen, bdir, num_partitions=32)
        spec = dedup.BloomSpec(bdir, 32)
        flagged = dedup.bloom_maybe_seen(urls, spec)
        assert flagged.filter("maybe_seen").count() > 0
    timed("bloom_roundtrip", bloom_roundtrip)


    # --- extraction over synthetic board pages -----------------------------
    # replicate pages so per-task Arrow/worker overhead amortizes and the
    # number reflects sustained extraction throughput. Pages are sized like
    # real forum pages (25 posts x 60 words ~= 15-20 KB of HTML) — on the
    # tiny 2-post fixture, walk + Arrow overhead dominates and hides the
    # decode+parse cost the fused UDF exists to halve.
    site = make_board_site(
        hosts=4, boards=4, threads=8, pages_per_thread=4,
        posts_per_page=25, words_per_post=60,
    )
    PAGE_MULT = 40 * SCALE
    pages_df = (
        site.to_df(spark)
        .withColumn("_m", F.explode(F.sequence(F.lit(1), F.lit(PAGE_MULT))))
        .drop("_m")
        .repartition(CPUS * 2)
        .cache()
    )
    n_pages = pages_df.count()
    def extract_pages():
        ct = F.lit(udfs.CT_DEFAULT)
        out = pages_df.select(
            F.length(udfs.extract_text_udf("html", ct)).alias("text_len"),
            F.size(udfs.extract_links_udf("html", "url", ct)).alias("n_links"),
        )
        # aggregate BOTH outputs: summing only n_links lets Catalyst prune
        # the text UDF entirely and the 'split' row silently measures half
        # the work (the round-2 branch-pruning trap, resurfaced)
        row = out.agg(F.sum("text_len"), F.sum("n_links")).first()
        assert row[0] > 0 and row[1] > 0
    timed("extract_pages", extract_pages)
    extras["n_pages_extracted"] = n_pages
    extras["extract_pages_per_sec"] = round(n_pages / timings["extract_pages"], 1)

    # fused extraction (what the round loop now runs): ONE decode+parse per
    # page feeding text AND links — vs extract_pages' two separate UDFs
    def extract_fused():
        ct = F.lit(udfs.CT_DEFAULT)
        fused = udfs.make_extract_fused_udf("")
        out = pages_df.select(
            fused("html", "url", F.lit(0), ct).alias("_ex")
        ).select(
            F.length("_ex.text").alias("text_len"), F.size("_ex.links").alias("n_links")
        )
        row = out.agg(F.sum("text_len"), F.sum("n_links")).first()
        assert row[0] > 0 and row[1] > 0
    timed("extract_fused", extract_fused)
    extras["extract_fused_pages_per_sec"] = round(n_pages / timings["extract_fused"], 1)
    extras["extract_fused_speedup_vs_split"] = round(
        timings["extract_pages"] / max(timings["extract_fused"], 1e-9), 2
    )
    pages_df.unpersist()

    # --- WARC ingest, streamed from paths (the round-5 default shape) -----
    # 16 gzipped segments x 500 realistic forum pages; workers open each
    # segment themselves and stream records — the binaryFile scan ships
    # paths only. Fixture build (driver-side gzip) is outside the timing.
    from bbcrawl_spark.sources import warc as warc_src

    wdir = tempfile.mkdtemp(prefix="bench_warc_")
    bodies = list(site.pages.values())[:500]
    N_SEG = 16
    for i in range(N_SEG):
        recs = [
            (f"http://seg{i}.example.com/p/{j}", "2024-01-01T00:00:00Z", b,
             {"Content-Type": "text/html; charset=utf-8"})
            for j, b in enumerate(bodies)
        ]
        with open(os.path.join(wdir, f"seg{i}.warc.gz"), "wb") as fh:
            fh.write(warc_src.build_warc(recs, gzipped=True))
    n_warc_pages = N_SEG * len(bodies)

    def warc_ingest():
        assert warc_src.read_warc_pages(spark, wdir).count() == n_warc_pages

    timed("warc_ingest_stream", warc_ingest)
    extras["warc_ingest_pages_per_sec"] = round(
        n_warc_pages / timings["warc_ingest_stream"], 1
    )

    # --- WET ingest (pre-extracted text, conversion records) --------------
    # 8 gzipped WET segments x 500 documents-table texts; same streamed
    # path-pruned core as the WARC row, minus HTTP splitting.
    wet_dir = tempfile.mkdtemp(prefix="bench_wet_")
    wet_texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text").limit(500).collect()
    ]
    N_WET_SEG = 8
    for i in range(N_WET_SEG):
        recs = [
            (f"http://wet{i}.example.com/d/{j}", "2024-01-01T00:00:00Z", t)
            for j, t in enumerate(wet_texts)
        ]
        with open(os.path.join(wet_dir, f"seg{i}.warc.wet.gz"), "wb") as fh:
            fh.write(warc_src.build_wet(recs, gzipped=True))
    n_wet_docs = N_WET_SEG * len(wet_texts)

    def wet_ingest():
        assert warc_src.read_wet_text(spark, wet_dir).count() == n_wet_docs

    timed("wet_ingest_stream", wet_ingest)
    extras["wet_ingest_docs_per_sec"] = round(
        n_wet_docs / timings["wet_ingest_stream"], 1
    )

    # --- corpus ops over the sf tables -------------------------------------
    # single parquet file -> 1-2 input partitions; spread UDF work
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS)
    timed("exact_dedup_docs", lambda: textops.exact_dedup(docs).count())
    timed("minhash_dedup", lambda: textops.minhash_dedup(docs, threshold=0.5).count())
    # the PRODUCTION setting (hot-bucket cap 2,000, as the driver rows run
    # it): the cap's WindowExec pre-filter is an always-paid cost whose
    # (band,bucket) exchange Catalyst shares with the groupBy — this row
    # prices it against the uncapped row above (identical output on this
    # corpus; no bucket comes near the cap)
    timed(
        "minhash_dedup_capped",
        lambda: textops.minhash_dedup(
            docs, threshold=0.5, max_bucket_size=2_000
        ).count(),
    )
    # signature stage alone (the numpy whole-batch hash kernel; at web scale
    # this map-side stage is the bulk of minhash cost — the banded join
    # dominates only on small corpora like this one)
    _sig_udf = textops.make_minhash_udf()
    timed(
        "minhash_signatures",
        lambda: docs.select(F.size(_sig_udf("text")).alias("k")).agg(F.sum("k")).first(),
    )
    # scale path: df-capped shingle join (identical pairs on this corpus,
    # ~4.5x faster; cap makes jaccard a lower bound — never false pairs)
    timed(
        "ngram_jaccard",
        lambda: textops.ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=50).count(),
    )

    # cluster resolution: pair list -> transitive keep/drop manifest
    # (connected components, min-label + pointer jumping; round-3 operator)
    def dedup_clusters():
        from bbcrawl_spark.operators import graphops

        pairs = textops.ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=50)
        bc: list = []
        n = graphops.dedup_clusters(docs, pairs, cache=bc).filter("NOT keep").count()
        for h in bc:
            h.unpersist()
        return n

    timed("dedup_clusters", dedup_clusters)

    # production chain shape: when BOTH the pair list and the manifest are
    # consumed, materialize pairs ONCE and feed the same DF to both
    # consumers — dedup_clusters takes a precomputed pairs DF, so the
    # chain never pays shingle-join pair-finding twice. Compare this row
    # against ngram_jaccard + dedup_clusters (which each recompute pairs).
    def dedup_clusters_reuse():
        from bbcrawl_spark.operators import graphops

        pairs = textops.ngram_jaccard_pairs(
            docs, threshold=0.5, max_shingle_df=50
        ).persist()
        try:
            n_pairs = pairs.count()  # consumer 1: the pair list itself
            bc: list = []
            n_dropped = (
                graphops.dedup_clusters(docs, pairs, cache=bc)
                .filter("NOT keep")
                .count()
            )  # consumer 2: the keep/drop manifest
            for h in bc:
                h.unpersist()
            return n_pairs + n_dropped
        finally:
            pairs.unpersist()

    timed("dedup_clusters_reuse", dedup_clusters_reuse)

    # cross-corpus boilerplate-line removal (round-4 operator: posexplode ->
    # line-df agg -> broadcast hot-line anti-join -> ordered reassembly)
    def strip_boilerplate():
        import __spark_entry__ as entry

        return entry.q_strip_boilerplate(spark, SF_DIR).count()

    timed("strip_boilerplate", strip_boilerplate)

    # flagship curation chain: quality gate -> langid -> exact dedup ->
    # per-language rollup (oracle-checked in the driver gate)
    def corpus_clean():
        import __spark_entry__ as entry

        return entry.q_corpus_clean(spark, SF_DIR).count()

    timed("corpus_clean", corpus_clean)

    # cross-document keep-first paragraph dedup (round-5 operator: segment
    # hash groupBy-min -> instance join -> ordered reassembly)
    def paragraph_dedup():
        import __spark_entry__ as entry

        return entry.q_paragraph_dedup_docs(spark, SF_DIR).count()

    timed("paragraph_dedup", paragraph_dedup)

    # incremental snapshot screen (round-5 operator: new batch anti-joined
    # against the standing corpus's distinct text hashes; cost ∝ |delta|)
    def incremental_dedup():
        import __spark_entry__ as entry

        return entry.q_incremental_dedup(spark, SF_DIR).count()

    timed("incremental_dedup", incremental_dedup)

    # training-prep + model-filter passes (round-5 third pass). Each row
    # aggregates a COMPUTED column — a bare count() would let Catalyst prune
    # the chunk text / score / NFC output and measure nothing (the same
    # branch-pruning trap as extract_pages).
    timed(
        "chunk_docs",
        lambda: textops.chunk_documents(docs, chunk_tokens=64, overlap=8)
        .agg(F.sum(F.length("chunk_text")), F.count("*"))
        .first(),
    )
    timed(
        "hashed_quality",
        lambda: textops.hashed_linear_score(docs)
        .agg(F.sum("score_sum"), F.sum("keep_int"))
        .first(),
    )
    timed(
        "unicode_nfc",
        lambda: textops.normalize_unicode(docs)
        .agg(F.sum(F.length("nfc_text")), F.sum("nfc_text_changed_int"))
        .first(),
    )
    timed(
        "pack_sequences",
        lambda: textops.pack_sequences(docs, seq_tokens=512, slice_size=2048)
        .agg(F.sum("piece_tokens"), F.count("*"))
        .first(),
    )
    timed(
        "corpus_shuffle",
        lambda: textops.corpus_shuffle(docs.select("doc_id"), salt="bench")
        .agg(F.sum("shuffle_rank"), F.count("*"))
        .first(),
    )

    # --- CDX index pipeline: parse + recrawl dedup ------------------------
    # 20 synthetic captures per doc -> CDXJ lines built JVM-side (same
    # concat shape as frontier_gen), then the path under test: limit-3
    # split + JSON extraction + keep-newest-per-SURT window.
    from bbcrawl_spark.sources import cdx as cdx_src

    n_cdx_docs = docs.count()

    def cdx_latest():
        caps = docs.select("doc_id", "source").withColumn(
            "cap", F.explode(F.sequence(F.lit(0), F.lit(19)))
        )
        doc_id, cap = F.col("doc_id"), F.col("cap")
        url = F.concat(
            F.lit("http://www."), F.col("source"), F.lit(".example.com/doc/"),
            doc_id.cast("string"),
        )
        ts14 = F.concat(
            F.lit("2024"),
            F.lpad(((cap % 12) + 1).cast("string"), 2, "0"),
            F.lpad(((doc_id % 28) + 1).cast("string"), 2, "0"),
            F.lpad(((cap * 7) % 24).cast("string"), 2, "0"),
            F.lit("0000"),
        )
        line = F.concat(
            cdx_src.surt_key_col(url), F.lit(" "), ts14,
            F.lit(' {"url": "'), url,
            F.lit('", "status": "200", "offset": "'),
            (doc_id * 100 + cap).cast("string"),
            F.lit('", "filename": "crawl-'), F.col("source"),
            F.lit('.warc.gz"}'),
        )
        out = cdx_src.latest_captures(
            cdx_src.parse_cdx_lines(caps.select(line.alias("line")))
        )
        assert out.count() == n_cdx_docs

    timed("cdx_latest", cdx_latest)
    extras["cdx_lines_per_sec"] = round(
        n_cdx_docs * 20 / timings["cdx_latest"], 1
    )

    # --- link graph: URL pairs -> host edges/degrees, then 5-iter PageRank
    # 2M link extractions over a 5000-host space: link_graph_build measures
    # the parse+aggregate funnel (URL pairs -> weighted host edges -> degree
    # stats, all JVM regex + one exchange each); pagerank_hosts measures the
    # iterative loop (2 shuffles/round x 5 rounds, checkpoint-pinned edges)
    # on the resulting ~1.8M-distinct-edge graph.
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

    def link_graph_build():
        e = linkgraph.host_edges(links_big)
        assert linkgraph.degree_stats(e).count() > 0

    timed("link_graph_build", link_graph_build)

    edges_big = linkgraph.host_edges(links_big).cache()
    n_edges_lg = edges_big.count()

    def pagerank_hosts():
        # host_edges output is one row per pair by construction ->
        # assume_distinct skips the defensive full-exchange dedup
        assert linkgraph.pagerank(
            edges_big, iterations=5, assume_distinct=True
        ).count() > 0

    timed("pagerank_hosts", pagerank_hosts)
    extras["link_graph_edges"] = n_edges_lg
    extras["pagerank_edges_per_sec"] = round(
        n_edges_lg * 5 / timings["pagerank_hosts"], 0
    )
    edges_big.unpersist()

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed("embedding_knn", lambda: similarity.brute_force_knn(emb, queries_df, k=10).count())

    # --- incremental bloom: per-round cost must track |seen_new|, not |seen|
    # At a crawl-realistic seen size (20M keys) compare one round's
    # maintenance: full rebuild from the table (round-1 design) vs OR-ing a
    # 100k delta into the existing blobs (round-2). The sf-table bloom above
    # is too small to separate the two from fixed job overhead.
    N_SEEN_BIG = 20_000_000 * SCALE
    big_seen = (
        spark.range(0, N_SEEN_BIG, 1, CPUS * 2)
        .select(F.xxhash64("id").alias("url_hash"))
        .cache()
    )
    big_seen.count()
    big_delta = (
        spark.range(N_SEEN_BIG, N_SEEN_BIG + 100_000, 1, CPUS)
        .select(F.xxhash64("id").alias("url_hash"))
        .cache()
    )
    big_delta.count()
    bbase = tempfile.mkdtemp(prefix="bench_bloom_base_")
    dedup.build_partitioned_bloom(big_seen, bbase, num_partitions=64)

    def bloom_full_rebuild():
        d = tempfile.mkdtemp(prefix="bench_bloom_full_")
        dedup.build_partitioned_bloom(big_seen, d, num_partitions=64)
    timed("bloom_full_rebuild_20m", bloom_full_rebuild)

    def bloom_incr():
        d = tempfile.mkdtemp(prefix="bench_bloom_incr_")
        dedup.update_partitioned_bloom(big_delta, bbase, d, 64, seen_full=big_seen)
    timed("bloom_incr_update_20m", bloom_incr)
    extras["bloom_incr_delta_rows"] = 100_000
    extras["bloom_incr_vs_full_rebuild"] = round(
        timings["bloom_full_rebuild_20m"] / max(timings["bloom_incr_update_20m"], 1e-9), 1
    )
    # --- bucketed seen-set exact confirm: one-sided vs both-sides shuffle --
    # same 20M-key seen set, stored two ways: plain parquet (anti-join must
    # shuffle BOTH sides) vs hash-bucketed table (seen side read in place,
    # only the probe frontier crosses an exchange — sources/bucketed.py).
    # Broadcast disabled: at the north-rule's 10^10 keys the seen side can
    # never broadcast, so the SMJ regime is the one that matters.
    from bbcrawl_spark.sources import bucketed as bucketed_mod

    bktdir = tempfile.mkdtemp(prefix="bench_bkt_seen_")
    plain_path = os.path.join(bktdir, "plain")
    big_seen.write.mode("overwrite").parquet(plain_path)
    bucketed_mod.write_bucketed(
        big_seen, "bench_seen_bkt", os.path.join(bktdir, "bkt"), CPUS
    )
    N_PROBE = 2_000_000 * SCALE
    probe = (
        spark.range(N_SEEN_BIG - N_PROBE // 2, N_SEEN_BIG + N_PROBE // 2, 1, CPUS)
        .select(F.xxhash64("id").alias("url_hash"))
        .cache()
    )
    probe.count()
    _thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def antijoin_plain():
        n = probe.join(
            spark.read.parquet(plain_path), "url_hash", "left_anti"
        ).count()
        assert n == N_PROBE // 2

    timed("seen_antijoin_plain_20m", antijoin_plain)

    def antijoin_bucketed():
        n = bucketed_mod.anti_join_new(probe, spark, "bench_seen_bkt").count()
        assert n == N_PROBE // 2

    timed("seen_antijoin_bucketed_20m", antijoin_bucketed)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _thr)
    extras["seen_antijoin_bucketed_speedup"] = round(
        timings["seen_antijoin_plain_20m"]
        / max(timings["seen_antijoin_bucketed_20m"], 1e-9),
        2,
    )
    probe.unpersist()
    big_seen.unpersist()
    big_delta.unpersist()

    spark.stop()
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline crawl+corpus workload wall seconds (lower is better)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        **extras,
    }
    # N->4N scaling evidence (scripts/scaling_bench.py writes BENCH.md with a
    # raw-JSON tail; full rerun takes ~20 min so it is not recomputed per
    # bench invocation). Round-2 lesson: embedding the whole blob overflowed
    # the driver's tail capture and made the bench line unparseable — only
    # compact headline scalars go inline; the full detail lands in
    # BENCH_SCALING.json next to this script.
    here = os.path.dirname(os.path.abspath(__file__))
    bench_md = os.path.join(here, "BENCH.md")
    if os.path.exists(bench_md):
        try:
            # BENCH.md may carry several ```json blocks (per-operator scaling
            # sections) — take the LAST one that holds the headline key, not
            # blindly the last block
            scaling = None
            for block in open(bench_md).read().split("```json")[1:]:
                cand = json.loads(block.split("```")[0])
                if "headline_efficiency_2_to_8" in cand:
                    scaling = cand
            if scaling is None:
                raise ValueError("no headline scaling block in BENCH.md")
            with open(os.path.join(here, "BENCH_SCALING.json"), "w") as fh:
                json.dump(
                    {
                        "headline_efficiency_N2_to_4N8": scaling.get(
                            "headline_efficiency_2_to_8"
                        ),
                        "per_stage_efficiency": scaling.get("efficiency"),
                        "throughput_by_cores": scaling.get("throughput"),
                    },
                    fh,
                    indent=1,
                )
            out["scaling_headline_eff_N2_to_4N8"] = scaling.get(
                "headline_efficiency_2_to_8"
            )
            out["scaling_detail_file"] = "BENCH_SCALING.json"
        except Exception:
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
