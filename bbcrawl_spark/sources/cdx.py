"""Common Crawl CDX(J) index source — seed frontiers and pick captures
without touching a single WARC byte.

Common Crawl publishes a per-dump URL index (``cc-index``): ~300 gzipped
text shards of CDXJ lines, each line

    ``<SURT key> <14-digit timestamp> <JSON payload>``

e.g. ``com,example)/path?q=1 20240101123000 {"url": "http://example.com/
path?q=1", "mime": "text/html", "status": "200", "digest": "sha1:...",
"length": "1234", "offset": "5678", "filename": "...warc.gz"}``.

At 100-TB scale the index is how a crawl plans: dedup recrawls by SURT,
filter by status/mime, then fetch only the chosen ``(filename, offset,
length)`` ranges. Everything here is pure JVM column expressions —
``split`` with a limit for the two space-delimited head fields,
``get_json_object`` for the payload, ``try_to_timestamp`` for the
timestamp — so parsing ~10^10 index lines stays inside whole-stage
codegen with zero Python.

Reference tie-in: the reference engine seeds from explicit URL lists
(`/root/reference/libcrawl/dispatcher.go` consumes seed addresses); this
module is the Common-Crawl-native seeding path the ``input_hint``'s
"Common-Crawl-style pages" table implies, feeding the same frontier
operators (canonicalize → url_hash → seen/politeness).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "surt_key_col",
    "parse_cdx_lines",
    "read_cdx",
    "latest_captures",
    "recrawl_schedule",
    "fetch_plan",
]

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*):"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATHQ_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)"


def surt_key_col(url: Column | str) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of a URL as a pure
    JVM column expression: lowercased host split on ``.`` and reversed into
    a comma-joined key, non-default port kept after a ``:``, then ``)`` +
    path?query with the fragment dropped and an empty path folded to ``/``.

    ``http://www.Example.com/a/b?q=1#f`` → ``com,example,www)/a/b?q=1``
    ``https://example.com:8443/`` → ``com,example:8443)/``

    Scheme and userinfo are dropped and default ports (http:80, https:443)
    removed, per the CDX convention — so http/https recrawls of the same
    page share a key. The regexes are in the Java∩RE2 dialect (the
    ``redact_pii`` rule) so a DuckDB oracle can replay them verbatim.
    """
    url = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    # userinfo ("user:pass@host") dropped
    hostport = F.regexp_replace(hostport, r"^[^/?#@]*@", "")
    host = F.regexp_replace(hostport, r":\d+$", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port = (
        F.when((scheme == "http") & (port == "80"), F.lit(""))
        .when((scheme == "https") & (port == "443"), F.lit(""))
        .otherwise(port)
    )
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    pathq = F.regexp_extract(url, _PATHQ_RE, 1)
    # empty path folds to "/" — also when a query follows the authority
    # directly ("http://h?q=1" → ")/?q=1"), per the CDX convention
    pathq = (
        F.when(pathq == "", F.lit("/"))
        .when(pathq.startswith("?"), F.concat(F.lit("/"), pathq))
        .otherwise(pathq)
    )
    return F.concat(
        rev_host,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        F.lit(")"),
        pathq,
    )


def parse_cdx_lines(df: DataFrame, col: str = "line") -> DataFrame:
    """Parse CDXJ index lines into typed capture rows.

    Output: ``(surt, fetch_ts, url, status, mime, digest, warc_filename,
    warc_offset, warc_length)``. The head is split with a LIMIT of 3 so
    spaces inside the JSON payload (every CDXJ line has them after the
    ``": "`` separators) stay intact; the payload fields come out via
    ``get_json_object``; malformed timestamps / numerics become NULL via
    the ``try_``/safe-cast forms rather than failing a 10^10-line scan
    under ANSI mode. All JVM, no Python.
    """
    parts = F.split(F.col(col), " ", 3)
    # try_element_at, not element_at: a malformed line with <3 fields must
    # become a NULL row, not an ANSI INVALID_ARRAY_INDEX abort of the scan
    js = F.try_element_at(parts, F.lit(3))
    # ONE from_json parse instead of seven get_json_object calls — each of
    # those re-parsed the payload from scratch (r6 profile: the parse
    # stage dominated cdx_latest). String-typed fields keep
    # get_json_object's text semantics (numeric tokens read as their
    # literal text, missing keys -> NULL, malformed payload -> all-NULL
    # struct == all-NULL columns); the numeric columns try_cast exactly
    # as before.
    obj = F.from_json(
        js,
        "url string, status string, mime string, digest string, "
        "filename string, offset string, length string",
    )
    return df.select(
        F.try_element_at(parts, F.lit(1)).alias("surt"),
        F.try_to_timestamp(
            F.try_element_at(parts, F.lit(2)), F.lit("yyyyMMddHHmmss")
        ).alias("fetch_ts"),
        obj["url"].alias("url"),
        obj["status"].try_cast("int").alias("status"),
        obj["mime"].alias("mime"),
        obj["digest"].alias("digest"),
        obj["filename"].alias("warc_filename"),
        obj["offset"].try_cast("long").alias("warc_offset"),
        obj["length"].try_cast("long").alias("warc_length"),
    )


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Read CDX(J) index shards under ``path`` (plain or ``.gz`` — Spark's
    text source decompresses by extension) into parsed capture rows.

    Gzipped shards are not splittable, but Common Crawl ships ~300 shards
    per dump (~1 GB each), so file-level parallelism is the natural
    partitioning — the same shape as the WARC segment readers. Blank lines
    are dropped; anything else flows through :func:`parse_cdx_lines`'s
    NULL-on-malformed contract.
    """
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    return parse_cdx_lines(lines.filter(F.col("line") != ""), "line")


def latest_captures(df: DataFrame) -> DataFrame:
    """Keep the newest capture per SURT key — the standard CDX recrawl
    dedup that decides which single WARC range to fetch per page. Ties
    (same ``fetch_ts``) break on ``warc_offset`` then ``warc_filename``
    descending so reruns are deterministic. ONE hash exchange on the
    8-to-~60-byte surt key; at 10^10 captures per dump this is the
    index-side analogue of ``read_warc_pages``'s keep-last window and
    shares its skew profile (hot SURTs are single pages recrawled often —
    bounded per-dump, no salting needed).
    """
    w = Window.partitionBy("surt").orderBy(
        F.col("fetch_ts").desc_nulls_last(),
        F.col("warc_offset").desc_nulls_last(),
        F.col("warc_filename").desc_nulls_last(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def recrawl_schedule(
    df: DataFrame,
    now: str,
    min_interval_s: int = 86_400,
    max_interval_s: int = 30 * 86_400,
) -> DataFrame:
    """Plan which pages are due for a refetch from their capture history —
    the index-driven recrawl scheduler that decides the NEXT round's
    frontier for pages the crawl already has.

    Per SURT key over ``(surt, fetch_ts, digest)`` capture rows:

    * ``n_versions`` = distinct content digests — how often the page
      actually changed across captures (same-digest recrawls are free
      information: the page did NOT change);
    * estimated change interval = observed span ÷ (versions − 1), the
      maximum-likelihood mean time between observed changes; pages never
      seen to change get ``max_interval_s``;
    * ``interval_s`` clamps that into ``[min_interval_s, max_interval_s]``
      (a page that changed twice in one crawl burst must not schedule an
      hourly refetch forever; a dead page is still re-checked eventually);
    * ``due`` = last capture + interval ≤ ``now``.

    This is the classic uniform-change-rate estimator (Cho & Garcia-Molina's
    freshness model, simplified to the observable span/changes ratio) — the
    per-key state is four integers.  The distinct-digest count makes
    Catalyst expand the aggregation into its standard two-phase shape (one
    exchange on ``(surt, digest)``, one on ``surt`` — BOTH map-side
    partial-aggregated, so each ships one row per distinct pair / key, not
    per capture; pinned in tests).  No window, no join, no Python: at
    10^10 SURT keys the pass is two combine-reduced exchanges on short
    keys, and the due set feeds straight into the frontier union.

    All arithmetic is integer seconds (``unix_timestamp`` → ``div`` →
    ``greatest/least``), so a DuckDB oracle replays it exactly
    (``epoch()`` / ``//``); ``now`` is a ``'yyyy-MM-dd HH:mm:ss'`` string
    parsed in the session timezone, the same zone the capture timestamps
    were parsed in, so offsets cancel in the ``due`` comparison.
    """
    last_s = F.unix_timestamp(F.max("fetch_ts"))
    first_s = F.unix_timestamp(F.min("fetch_ts"))
    agg = df.groupBy("surt").agg(
        F.count("*").alias("n_captures"),
        F.count_distinct("digest").alias("n_versions"),
        first_s.alias("_first_s"),
        last_s.alias("_last_s"),
        F.max("fetch_ts").alias("last_ts"),
    )
    est = F.when(
        F.col("n_versions") > 1,
        F.expr("(_last_s - _first_s) div (n_versions - 1)"),
    ).otherwise(F.lit(max_interval_s).cast("long"))
    interval_s = F.greatest(
        F.lit(min_interval_s).cast("long"),
        F.least(F.lit(max_interval_s).cast("long"), est),
    )
    now_s = F.unix_timestamp(F.to_timestamp(F.lit(now)))
    return (
        agg.withColumn("interval_s", interval_s)
        .withColumn("next_due_ts", F.timestamp_seconds(F.col("_last_s") + F.col("interval_s")))
        .withColumn("due", F.col("_last_s") + F.col("interval_s") <= now_s)
        .drop("_first_s", "_last_s")
    )


def fetch_plan(
    df: DataFrame,
    ranges_per_task: int = 256,
    coalesce_gap: int | None = None,
) -> DataFrame:
    """Turn chosen captures into a segment-local sequential fetch plan —
    the last step of index-driven crawling: having picked WHICH captures
    to take (``latest_captures`` / ``recrawl_schedule``), decide HOW to
    read their ``(warc_filename, warc_offset, warc_length)`` ranges.

    Ranges of one WARC segment are ordered by offset and cut into runs of
    ``ranges_per_task``, so each fetch task issues monotonically-forward
    range reads against ONE segment file — a sequential sweep instead of
    random GETs scattered across ~300 × 1 GB files (object stores and
    spinning HDFS both reward this by an order of magnitude; it is also
    what lets a task coalesce adjacent ranges into single requests).

    Adds per capture: ``read_seq`` (0-based offset order within the file),
    ``task_id`` (``read_seq div ranges_per_task`` — contiguous runs share a
    task), ``n_file_ranges`` and ``file_bytes`` (per-segment totals, the
    skew signal a scheduler balances waves by).  With ``coalesce_gap``
    set, also ``request_id``: consecutive ranges whose gap (next offset −
    previous end) is ≤ the threshold share one id — the unit a fetcher
    turns into a SINGLE HTTP range request, reading the small gap bytes
    and discarding them (cheaper than a second round-trip; offset-ordering
    exists precisely to make these runs visible).  ONE hash exchange on
    ``warc_filename``; every window frame reuses that single partitioning,
    and a segment holds at most ~10^5 records (bounded by its 1 GB size),
    so no per-file partition can blow up.  Deterministic: ties break on
    (offset, length, url).
    """
    order = [
        F.col("warc_offset").asc_nulls_last(),
        F.col("warc_length").asc_nulls_last(),
    ]
    if "url" in df.columns:
        order.append(F.col("url").asc_nulls_last())
    wseq = Window.partitionBy("warc_filename").orderBy(*order)
    wfile = Window.partitionBy("warc_filename")
    out = (
        df.withColumn("read_seq", F.row_number().over(wseq) - 1)
        .withColumn("task_id", F.expr(f"read_seq div {int(ranges_per_task)}"))
        .withColumn("n_file_ranges", F.count("*").over(wfile))
        .withColumn(
            "file_bytes",
            F.sum(F.coalesce(F.col("warc_length"), F.lit(0))).over(wfile),
        )
    )
    if coalesce_gap is not None:
        prev_end = F.lag(
            F.col("warc_offset") + F.coalesce(F.col("warc_length"), F.lit(0))
        ).over(wseq)
        # a NULL prev_end (first range of the file) starts request 0; a gap
        # over the threshold starts the next request — running sum of breaks
        brk = F.when(
            prev_end.isNull()
            | (F.col("warc_offset") - prev_end > F.lit(int(coalesce_gap))),
            F.lit(1),
        ).otherwise(F.lit(0))
        running = wseq.rowsBetween(Window.unboundedPreceding, 0)
        out = out.withColumn("request_id", F.sum(brk).over(running) - 1)
    return out
