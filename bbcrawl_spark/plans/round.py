"""The crawl loop: per-round batch DataFrame jobs over warehouse tables.

Spark-native re-expression of the reference's sequential loop
(``/root/reference/libcrawl/api.go:101-114``) per the normative round
contract in ``bbcrawl_spark.oracle`` (the two must match exactly — tested in
tests/test_crawl_e2e.py):

    frontier_r --anti-join--> gates (excludes, robots, seen w/ Bloom)
              --window------> politeness budget per host (scheduled/deferred)
              --join--------> pages (the "fetch"; pre-crawled Common-Crawl-
                              style table replaces live HTTP)
              --pandas UDF--> link + text extraction (Arrow batches)
              --explode-----> score / canonicalize / hash -> new frontier
              --write-------> fetched_r, fetch_log_r, frontier_{r+1},
                              seen ∪ scheduled, metrics_r   [round commit]

Shuffle profile per round (the 100-TB design):
  1. politeness window: ONE sort exchange on host (single-pass flag-style
     ranking — no anti-join reconstructing the deferred complement;
     optional salted pre-rank kills hot-host reducer skew)
  2. pages join: sort-merge on url (frontier side already deduped; AQE may
     demote to broadcast when a round is small)
  3. new-link dedup: hash exchange on url_hash
  Everything else is map-side: Bloom seen-check (mapInPandas), excludes +
  robots (broadcast), extraction (ArrowEvalPython).

State writes are snapshot commits; the round barrier (``commit_round``) is
written last, making a crashed round invisible and the resume path
deterministic (north_rule: "resumable from checkpoint with per-partition
lineage + metrics").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.udfs import (
    header_filename_col,
    header_filename_field_col,
    header_filename_raw_field_col,
    host_of,
    make_extract_fused_udf,
    url_hash_col,
)
from .. import extract as extract_mod
from ..operators import dedup
from ..operators.politeness import rank_fetch_slots
from ..operators.priority import priority_score_col
from ..operators.robots import (
    crawl_delay_budgets,
    robots_gate,
    robots_gate_full,
    robots_rules_table,
    robots_table,
)
from ..sources.warehouse import Warehouse

FRONTIER_SCHEMA = (
    "url string, url_hash long, host string, priority int, page_num int, "
    "seed_id long, discovered_in int"
)
FRONTIER_COLS = ["url", "url_hash", "host", "priority", "page_num", "seed_id", "discovered_in"]


@dataclass
class CrawlConfig:
    pages_path: str  # parquet dir of the pages table (Iceberg table on a cluster)
    warehouse_root: str
    # (url, seed_id, priority) or (url, seed_id, priority, page_num).
    # Pager-generated seeds MUST carry the pager's PageNum() (pagers.go:
    # 49-51,133-135) — re-deriving it from a '/pageN' suffix is wrong for the
    # query and cutter pagers (page_num would be 0 for every seed, breaking
    # crawler output names and per-host seed order).
    seeds: list[tuple] = field(default_factory=list)
    budget: int = 5  # per-host fetches per round (reference DEFAULT_DL_JOBS)
    # >0: honor robots Crawl-delay — a host asking for D seconds between
    # fetches gets crawl_delay_round_seconds // D fetches per round (capped
    # at budget). Requires salt_partitions <= 1 (per-host budget columns are
    # exact only in the flag-style unsalted ranker).
    crawl_delay_round_seconds: float = 0.0
    max_rounds: int = 100
    follow_links: bool = True
    salt_partitions: int = 0  # >1 enables two-phase salted politeness top-k
    bloom_partitions: int = 0  # >0 enables the persistent Bloom prefilter
    bloom_bits_per_key: int = 10
    excludes: tuple[str, ...] = ()
    robots: dict[str, str] = field(default_factory=dict)  # host -> robots.txt body
    # False (default) = Disallow-prefix core; True = full RFC-9309 matching
    # (Allow lines, longest-match precedence, '*'/'$' wildcards)
    robots_full: bool = False
    user_agent: str = "*"
    metrics_partitions: int = 16  # per-partition lineage granularity
    # crawler family (reference -crawler flag): '' = text+links only;
    # 'vb-attachments' / 'src' additionally emit the downloads table the
    # reference would have fetched (its primary output)
    crawler: str = ""
    headernames: bool = False  # vb -names-from-header
    # reference -redirect flag (crawlers.go:155-162): True -> redirect.Log
    # (error past 10 redirects), False -> redirect.Deny (error on any);
    # consulted when the pages table carries an n_redirects column
    allow_redirect: bool = True
    tags: tuple[str, ...] = ("audio", "img", "video")  # src -tags
    attrs: tuple[tuple[str, str], ...] = ()  # src -attrs pairs
    # warehouse maintenance (Iceberg rewrite_data_files / expire_snapshots).
    # Without them an append-per-round chain reads through O(rounds) parquet
    # dirs — at hundreds of rounds the dir list + file-open fan-out, not the
    # data, becomes the reader bottleneck.
    compact_every: int = 0  # >0: every K rounds rewrite append chains to 1 dir
    expire_keep_rounds: int = 0  # >0: keep only the last K rounds' snapshots


def page_num_col(url) -> F.Column:
    """Discovered-link page number: trailing '/pageN' else 0 (oracle twin:
    ``oracle.link_page_num``)."""
    url = F.col(url) if isinstance(url, str) else url
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    n = F.regexp_extract(path, r"/page([0-9]+)$", 1)
    # try_cast: '' -> NULL under ANSI mode (Spark 4 default) instead of error
    return F.coalesce(n.try_cast("int"), F.lit(0))


def frontier_from_urls(df: DataFrame, discovered_in: int) -> DataFrame:
    """Project (url, seed_id, priority[, page_num]) rows into the frontier
    schema using JVM column expressions only.

    If the input carries a non-negative ``page_num`` (a pager emission) it is
    kept verbatim; otherwise (discovered links, plain ``--seed`` URLs) the
    trailing-'/pageN' heuristic derives it.
    """
    if "page_num" in df.columns:
        pn = (
            F.when(F.col("page_num") >= 0, F.col("page_num"))
            .otherwise(page_num_col("url"))
            .cast("int")
        )
    else:
        pn = page_num_col("url")
    return df.select(
        F.col("url"),
        url_hash_col("url").alias("url_hash"),
        host_of("url").alias("host"),
        F.col("priority").cast("int").alias("priority"),
        pn.alias("page_num"),
        F.col("seed_id").cast("long").alias("seed_id"),
        F.lit(discovered_in).cast("int").alias("discovered_in"),
    )


def complete_headernames(downloads: DataFrame, pages: DataFrame) -> DataFrame:
    """K2: complete ``{postid}-{attid}`` prefixes from each attachment URL's
    Content-Disposition header — the batch re-expression of
    ``ADNameFromHeader`` (afterdownload.go:27-46; header read from the
    download response, downloader.go:121-143).

    Plain equi-join on the attachment URL: the per-round downloads side is
    small, so AQE broadcasts it against the big pages table. Reference error
    parity: no header/field -> "No Content-disposition header field found";
    matched-but-bad field -> "malformed filename ..." (both surface as err
    rows like the reference's RenameError, with out_name='').
    """
    if "content_disposition" in pages.columns:
        hdrs = pages.select(
            F.col("url").alias("abs_url"), F.col("content_disposition").alias("_cd")
        )
    else:  # pages table carries no headers: every completion fails loudly
        hdrs = pages.select(
            F.col("url").alias("abs_url"), F.lit(None).cast("string").alias("_cd")
        )
    cols = downloads.columns
    joined = downloads.join(hdrs, "abs_url", "left")
    field = header_filename_field_col("_cd")
    raw_field = header_filename_raw_field_col("_cd")
    name = header_filename_col("_cd")
    had_err = F.col("err") != ""
    err = (
        F.when(had_err, F.col("err"))
        .when(field.isNull(), F.lit(extract_mod.NO_HEADER_FIELD_ERR))
        .when(
            name == "",
            # UNTRIMMED field in the message (downloader.go:133 parity)
            F.concat(
                F.lit("malformed filename in Content-disposition header: "),
                raw_field,
            ),
        )
        .otherwise(F.lit(""))
    )
    out_name = F.when(had_err | field.isNull() | (name == ""), F.lit("")).otherwise(
        F.concat(F.col("out_name"), F.lit("-"), name)
    )
    return (
        joined.withColumn("out_name", out_name)
        .withColumn("err", err)
        .select(*cols)
    )


class CrawlDriver:
    """Multi-round crawl driver with deterministic resume.

    All state lives in the warehouse; the driver instance is stateless —
    constructing a new driver over the same warehouse root continues the
    crawl exactly where the last committed round left it.
    """

    def __init__(self, spark: SparkSession, cfg: CrawlConfig):
        self.spark = spark
        self.cfg = cfg
        self.wh = Warehouse(spark, cfg.warehouse_root)
        if not cfg.robots:
            self._robots_df = None
        elif cfg.robots_full:
            self._robots_df = robots_rules_table(spark, cfg.robots, cfg.user_agent)
        else:
            self._robots_df = robots_table(spark, cfg.robots, cfg.user_agent)
        self._host_budgets_df = None
        if cfg.crawl_delay_round_seconds > 0 and cfg.robots:
            # composes with salt_partitions > 1: the salted single-pass
            # ranker takes per-host budget columns exactly (politeness.py
            # phase-1 prune / phase-2 regroup are per-host expressions), so
            # a crawl-delayed hot host keeps both its tiny budget and the
            # skew defense
            hb = crawl_delay_budgets(
                spark, cfg.robots, cfg.budget,
                cfg.crawl_delay_round_seconds, cfg.user_agent,
            )
            self._host_budgets_df = hb if hb.count() else None
        self._excludes_df = (
            spark.createDataFrame([(u,) for u in cfg.excludes], "url string")
            if cfg.excludes
            else None
        )

    # -- state access (always via round-log-pinned snapshots) -------------
    def _pinned(self, round_no: int, table: str) -> DataFrame:
        sid = self.wh.round_snapshot(round_no, table)
        return self.wh.read(table, sid)

    def bootstrap(self) -> None:
        if self.wh.last_committed_round() is not None:
            return
        seeds_df = self.spark.createDataFrame(
            [(t[0], t[1], t[2], t[3] if len(t) > 3 else -1) for t in self.cfg.seeds],
            "url string, seed_id long, priority int, page_num int",
        )
        f_sid = self.wh.write("frontier", frontier_from_urls(seeds_df, -1))
        s_sid = self.wh.write(
            "seen", self.spark.createDataFrame([], "url_hash long")
        )
        self.wh.commit_round(-1, {"frontier": f_sid, "seen": s_sid}, {"bootstrap": True})

    def run(self, max_rounds: int | None = None) -> dict[str, Any]:
        """Run (or resume) the crawl until the frontier drains or the round
        cap is hit. Returns a summary dict."""
        self.bootstrap()
        cap = max_rounds if max_rounds is not None else self.cfg.max_rounds
        last = self.wh.last_committed_round()
        log = self.wh.round_log()
        if last is not None and log.get(str(last), {}).get("meta", {}).get("done"):
            return self._summary()
        start = (last if last is not None else -1) + 1
        for r in range(start, cap):
            meta = self.run_round(r)
            if meta["done"]:
                break
        return self._summary()

    def run_round(self, r: int) -> dict[str, Any]:
        cfg = self.cfg
        frontier = self._pinned(r - 1, "frontier")
        seen = self._pinned(r - 1, "seen")

        # --- gates (P1 excludes, P7 robots, P2/J1 seen) -------------------
        cand = frontier
        if self._excludes_df is not None:
            cand = cand.join(F.broadcast(self._excludes_df), "url", "left_anti")
        if self._robots_df is not None:
            gate = robots_gate_full if cfg.robots_full else robots_gate
            cand = gate(cand, self._robots_df)
        bloom_spec = None
        if cfg.bloom_partitions > 0 and self.wh.round_snapshot(r - 1, "bloom_dir"):
            bloom_spec = dedup.BloomSpec(
                self.wh.round_snapshot(r - 1, "bloom_dir"), cfg.bloom_partitions
            )
        # persist: the Bloom-gated frontier is consumed by the politeness
        # window (twice under salted single_pass — survivor/loser branches);
        # _bloom_cache additionally pins the FLAGGED frontier so the Bloom
        # membership UDF evaluates once, not once per split branch
        _bloom_cache: list = []
        cand = dedup.dedup_against_seen(
            cand, seen, bloom_spec, cache=_bloom_cache
        ).persist()

        # --- politeness window (W1) ---------------------------------------
        ranked = rank_fetch_slots(
            cand, cfg.budget, salt_partitions=cfg.salt_partitions,
            host_budgets=self._host_budgets_df,
        ).persist()
        scheduled = ranked.filter(F.col("scheduled"))
        deferred = ranked.filter(~F.col("scheduled")).select(*FRONTIER_COLS)

        # --- fetch = join pages (J3) + extraction (H9/H10) ----------------
        pages = self.spark.read.parquet(cfg.pages_path)
        has_ct = "content_type" in pages.columns
        has_rd = "n_redirects" in pages.columns
        pcols = ["url", "html"]
        pcols += ["content_type"] if has_ct else []
        pcols += ["n_redirects"] if has_rd else []
        joined = scheduled.join(pages.select(*pcols), "url", "inner")
        if has_rd:
            # P6 redirect policy (redirect.go:16-33): Deny errors on ANY
            # redirect, Log past the cap of 10 — a failed GET means the page
            # is NOT fetched (no text, no links, no downloads) but the url
            # stays seen: the attempt happened.
            joined = joined.filter(
                F.col("n_redirects") <= (10 if cfg.allow_redirect else 0)
            )
        # Fused extraction: ONE ArrowEvalPython stage decodes + parses each
        # page once and emits struct(text, links, files); the text sink, the
        # frontier link growth and the crawler-family downloads are three
        # selects over the SAME persisted result (pre-fusion each ran its own
        # UDF = 2-3 decode+parse passes per page — the dominant 100-TB CPU
        # multiplier). html is dropped before the persist: nothing downstream
        # needs the raw blob once _ex is computed.
        ct = F.col("content_type") if has_ct else F.lit("text/html; charset=utf-8")
        fused = make_extract_fused_udf(
            cfg.crawler,
            cfg.headernames,
            cfg.tags,
            list(cfg.attrs) or None,
            want_links=cfg.follow_links,
        )
        fetched = (
            joined.withColumn("_ex", fused("html", "url", "page_num", ct))
            .drop("html")
            .persist()
        )
        fetched_out = fetched.select(
            F.lit(r).alias("round"),
            "url",
            "url_hash",
            "host",
            F.col("_ex.text").alias("text"),
        )

        seen_new = scheduled.select("url_hash")
        if cfg.follow_links:
            links = fetched.select(
                F.col("url").alias("page_url"),
                F.col("seed_id"),
                F.explode("_ex.links").alias("l"),
            ).select("page_url", "seed_id", F.col("l.abs_url").alias("url"))
            new_entries = links.select(
                "url",
                url_hash_col("url").alias("url_hash"),
                host_of("url").alias("host"),
                priority_score_col("page_url", "url").alias("priority"),
                page_num_col("url").alias("page_num"),
                F.col("seed_id"),
                F.lit(r).cast("int").alias("discovered_in"),
            )
            # not in seen' = seen ∪ scheduled-this-round
            new_entries = new_entries.join(
                seen.select("url_hash").unionByName(seen_new), "url_hash", "left_anti"
            ).persist()
        else:
            new_entries = self.spark.createDataFrame([], FRONTIER_SCHEMA)

        # --- crawler-family downloads (the reference's primary output) ----
        downloads = None
        if cfg.crawler in ("vb-attachments", "src"):
            downloads = fetched.select(
                F.lit(r).alias("round"), F.col("url").alias("page_url"),
                "page_num", F.explode("_ex.files").alias("f"),
            ).select("round", "page_url", "page_num", "f.*")
            if cfg.crawler == "vb-attachments" and cfg.headernames:
                downloads = complete_headernames(downloads, pages)
        elif cfg.crawler == "file":
            # every frontier url IS the download (crawlers.go:191-212)
            downloads = scheduled.select(
                F.lit(r).alias("round"), F.col("url").alias("page_url"),
                "page_num", F.lit("file").alias("kind"), F.col("url").alias("link"),
                F.col("url").alias("abs_url"),
                # "{page} - {name}"; empty name -> dispatcher temp-name case
                # (downloader.go:261-264), marked by an empty out_name here
                F.when(
                    F.regexp_extract(
                        F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("")),
                        r"/([^/]+)$", 1) == "",
                    F.lit(""),
                ).otherwise(
                    F.concat(
                        F.col("page_num").cast("string"), F.lit(" - "),
                        F.regexp_extract(
                            F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("")),
                            r"/([^/]+)$", 1),
                    )
                ).alias("out_name"),
                F.lit("").alias("dir_rel"), F.lit("").alias("post_id"),
                F.lit(0).alias("att_id"), F.lit(-1).alias("element_index"),
                F.lit("").alias("err"),
            )

        # --- merge deferred ∪ new, dedup by url_hash (oracle step 6) ------
        merged = deferred.unionByName(new_entries)
        # 'url' completes the tiebreak: two raw urls can share a url_hash
        # (':80' / '#frag' variants canonicalize identically) and tie on the
        # other keys; without a total order the surviving raw url — which
        # drives the pages join and crawl_order output — is nondeterministic
        dw = Window.partitionBy("url_hash").orderBy(
            "priority", "page_num", "discovered_in", "seed_id", "url"
        )
        frontier_next = (
            merged.withColumn("_rn", F.row_number().over(dw))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        # --- per-partition lineage metrics (A5) ---------------------------
        P = cfg.metrics_partitions
        pid = lambda c: F.pmod(F.col(c), F.lit(P)).cast("int").alias("partition_id")
        m_sched = scheduled.groupBy(pid("url_hash")).agg(F.count("*").alias("n_scheduled"))
        m_fetch = fetched.groupBy(pid("url_hash")).agg(F.count("*").alias("n_fetched"))
        m_new = new_entries.groupBy(pid("url_hash")).agg(F.count("*").alias("n_new_links"))
        metrics = (
            m_sched.join(m_fetch, "partition_id", "full")
            .join(m_new, "partition_id", "full")
            .na.fill(0)
            .select(
                F.lit(r).alias("round"),
                "partition_id",
                "n_scheduled",
                "n_fetched",
                "n_new_links",
            )
        )

        # --- snapshot writes, then the round commit barrier ---------------
        # pin appends to the round-log parent ("" = fresh chain) so a crashed
        # round's orphan snapshots never enter the lineage on resume
        pin = lambda t: self.wh.round_snapshot(r - 1, t) or ""
        fetch_log_r = scheduled.select(
            F.lit(r).alias("round"), "url", "url_hash", "host", "priority",
            "page_num", "seed_id", "fetch_rank", "slot", "wave",
        )
        sids = {
            "frontier": self.wh.write("frontier", frontier_next),
            "seen": self.wh.append("seen", seen_new, parent_snapshot=pin("seen")),
            "fetch_log": self.wh.append(
                "fetch_log", fetch_log_r, parent_snapshot=pin("fetch_log")
            ),
            "fetched": self.wh.append(
                "fetched", fetched_out, parent_snapshot=pin("fetched")
            ),
            "metrics": self.wh.append(
                "metrics", metrics, parent_snapshot=pin("metrics")
            ),
        }
        if downloads is not None:
            sids["downloads"] = self.wh.append(
                "downloads", downloads, parent_snapshot=pin("downloads")
            )
        ranked.unpersist()
        cand.unpersist()
        for df in _bloom_cache:
            df.unpersist()
        fetched.unpersist()
        if cfg.follow_links:
            new_entries.unpersist()

        # --- incremental Bloom maintenance over the round's NEW hashes ----
        # OR-in only this round's delta; untouched partitions carry forward
        # as manifest pointers (per-round cost ∝ |seen_new|, not |seen| —
        # the O(R·N) full-rebuild pattern was the one true 100x-scale
        # killer). Overflowing partitions alone rebuild from the full table.
        if cfg.bloom_partitions > 0:
            bloom_dir = f"{cfg.warehouse_root}/bloom/r{r:05d}"
            dedup.update_partitioned_bloom(
                self.wh.read_delta("seen", sids["seen"]),
                self.wh.round_snapshot(r - 1, "bloom_dir"),
                bloom_dir,
                cfg.bloom_partitions,
                cfg.bloom_bits_per_key,
                seen_full=self.wh.read("seen", sids["seen"]),
            )
            sids["bloom_dir"] = bloom_dir

        # --- small-file compaction (must run AFTER Bloom maintenance: the
        # delta read needs the APPEND snapshot — a compacted snapshot's own
        # dir is the whole table). The round log then pins the compacted
        # snapshot, so reads and resumes see O(compact_every) dirs.
        if cfg.compact_every > 0 and (r + 1) % cfg.compact_every == 0:
            for t in ("seen", "fetch_log", "fetched", "metrics", "downloads"):
                if t in sids:  # frontier is a full overwrite (1 dir) already
                    # round-partitioned rewrite: the append chain is already
                    # round-clustered (one dir per round); partitioning the
                    # merged rewrite keeps per-round FILE pruning for round-
                    # filtered readers (result readers, resume paths) after
                    # compaction erases the dir-per-round layout. Tables
                    # without a round column compact unpartitioned.
                    sids[t] = self.wh.compact(
                        t, sids[t], meta={"round": r}, partition_by=("round",)
                    )

        n_next = self.wh.read("frontier", sids["frontier"]).count()
        n_sched = self.wh.read("fetch_log", sids["fetch_log"]).filter(
            F.col("round") == r
        ).count()
        meta = {"round": r, "n_scheduled": n_sched, "n_frontier_next": n_next,
                "done": n_next == 0 or n_sched == 0}
        self.wh.commit_round(r, sids, meta)
        # --- snapshot expiry AFTER the commit barrier: the round log always
        # points at live snapshots; a crash mid-expiry leaves garbage dirs,
        # never a pinned-but-deleted snapshot.
        if cfg.expire_keep_rounds > 0:
            self._expire_old_rounds(r)
        return meta

    def _expire_old_rounds(self, r: int) -> None:
        """Keep only the last ``expire_keep_rounds`` rounds' snapshots (plus
        each table's current) and the Bloom dirs they reference.

        Bloom round dirs need reference counting, not age: an incrementally
        maintained manifest FORWARDS untouched partitions to earlier rounds'
        blob files (pointer-carry), so an old dir is deletable only when no
        kept round's manifest resolves a blob inside it.
        """
        import os
        import shutil

        cutoff = r - self.cfg.expire_keep_rounds + 1
        log = self.wh.round_log()
        kept = [k for k in log if int(k) >= cutoff]
        per_table: dict[str, set] = {}
        for k in kept:
            for t, sid in log[k]["tables"].items():
                if t != "bloom_dir":
                    per_table.setdefault(t, set()).add(sid)
        for t, keep in per_table.items():
            self.wh.expire_snapshots(t, keep)
        if self.cfg.bloom_partitions > 0:
            kept_dirs = {
                log[k]["tables"]["bloom_dir"]
                for k in kept
                if "bloom_dir" in log[k]["tables"]
            }
            live = {os.path.abspath(d) for d in kept_dirs}
            for d in kept_dirs:
                for entry in dedup._read_manifest(d).values():
                    live.add(os.path.abspath(os.path.dirname(entry["path"])))
            base = os.path.join(self.cfg.warehouse_root, "bloom")
            if os.path.isdir(base):
                for name in os.listdir(base):
                    p = os.path.abspath(os.path.join(base, name))
                    if os.path.isdir(p) and p not in live:
                        shutil.rmtree(p, ignore_errors=True)

    # -- result readers ----------------------------------------------------
    def _last(self, table: str) -> DataFrame:
        return self._pinned(self.wh.last_committed_round(), table)

    def crawl_order(self) -> DataFrame:
        """Exact global crawl order (W2): (rank, round, url).

        Scalable global numbering — the former ``Window.orderBy`` with no
        partition key forced every fetch_log row through ONE task (the
        driver-bottleneck shape the engine bans; dead at 10^10 rows). Now:
        range-partition + sort within partitions (a normal parallel sort),
        take per-partition counts (one tiny agg — P rows to the driver),
        and add each partition's cumulative offset to a per-partition local
        row number computed by a streaming ``mapInPandas`` counter (no
        further exchange; batch order inside a partition is the sorted
        order). ``localCheckpoint`` pins the sorted layout so the count and
        numbering passes see identical partitions; its blocks free on GC.
        """
        from pyspark.sql.types import LongType, StructField, StructType

        keys = ["round", "priority", "page_num", "url_hash"]
        base = self._last("fetch_log").select(
            "round", "url", "priority", "page_num", "url_hash"
        )
        ranged = (
            base.repartitionByRange(*[F.col(k) for k in keys])
            .sortWithinPartitions(*keys)
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint()
        )
        counts = {
            r["_pid"]: r["n"]
            for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off_map = (
            F.create_map(
                *[x for p, o in offsets.items() for x in (F.lit(p), F.lit(o))]
            )
            if offsets
            else F.create_map()
        )
        schema = StructType(
            list(ranged.schema.fields) + [StructField("_lrn", LongType())]
        )

        def _number(batches):
            i = 0
            for pdf in batches:
                pdf = pdf.copy()
                pdf["_lrn"] = range(i + 1, i + 1 + len(pdf))
                i += len(pdf)
                yield pdf

        return ranged.mapInPandas(_number, schema).select(
            # long, not int: the whole point of this rewrite is 10^10-row
            # fetch logs, where offset+_lrn exceeds 2^31 and an int cast
            # silently wraps to wrong/negative ranks.
            (F.coalesce(off_map[F.col("_pid")], F.lit(0)) + F.col("_lrn"))
            .cast("long")
            .alias("rank"),
            "round", "url", "priority", "page_num", "url_hash",
        )

    def seen_set(self) -> DataFrame:
        return self._last("seen")

    def fetched_texts(self) -> DataFrame:
        return self._last("fetched").select("url", "text")

    def downloads(self) -> DataFrame:
        """The crawler family's download rows (reference primary output)."""
        return self._last("downloads")

    def metrics(self) -> DataFrame:
        return self._last("metrics")

    def _summary(self) -> dict[str, Any]:
        log = self.wh.round_log()
        rounds = sorted(int(k) for k in log if int(k) >= 0)
        return {
            "rounds": len(rounds),
            "last_round": rounds[-1] if rounds else None,
            "n_seen": self._last("seen").count() if rounds else 0,
            "done": bool(rounds) and log[str(rounds[-1])]["meta"].get("done", False),
        }
