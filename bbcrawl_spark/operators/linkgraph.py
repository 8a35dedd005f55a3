"""Host-level link-graph analytics over crawl link extractions.

The crawl loop (plans/round.py) extracts per-page outlinks; the reference
stops at fetching them (libcrawl/crawlers.go walks the tree, exports URLs).
A web-scale corpus pipeline additionally needs the GRAPH view of those
links: which hosts accumulate in-links (a quality prior for curation and a
priority signal for scheduling), which hosts are crawler traps (URL-space
explosions that waste fetch budget), and what anchor text the web uses for
a target (a classic relevance signal). This module provides that family as
DataFrame-native operators:

* :func:`host_edges` — URL-pair link extractions -> weighted host edges.
* :func:`degree_stats` — in/out degree + link volume per host, one shuffle.
* :func:`pagerank` — fixed-iteration PageRank with INTEGER arithmetic so
  the result is bit-exactly reproducible across engines (the DuckDB oracle
  replays the same recurrence; float PageRank would diverge in the last
  ulp and break value-hash comparison).
* :func:`crawl_trap_stats` — per-host URL-template compression ratio; a
  host with thousands of distinct URLs collapsing onto a handful of
  digit-normalized templates is a pagination/calendar trap.
* :func:`top_anchor` — most frequent anchor text per target host with a
  deterministic tie-break.

100-TB shape: every operator is pure JVM column expressions + hash
aggregations (no Python in the hot path). Host-level tables are ~1e8 rows
for a 1e10-URL frontier — far smaller than the URL tables but still far
too large to collect; everything here stays distributed. The PageRank loop
is the same iterative-DataFrame pattern as
:func:`bbcrawl_spark.operators.graphops.connected_components`: the edge
list is localCheckpoint-pinned once (joined every round), each round's
rank table is eagerly checkpointed and the previous round's blocks are
freed immediately, so lineage never replays earlier rounds and at most one
extra rank-table copy is pinned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from bbcrawl_spark.operators.graphops import (
    _CheckpointHandle,
    _persistent_ids,
    _sized_coalesce,
    _spread,
)

__all__ = [
    "host_of_url",
    "registrable_domain",
    "host_edges",
    "degree_stats",
    "pagerank",
    "hits",
    "k_hop_hosts",
    "crawl_trap_stats",
    "top_anchor",
]


def host_of_url(url: Column | str) -> Column:
    """Lowercased host (port stripped) via the canonical authority regex.

    Twin of the ``_CANON_SQL`` authority extraction used by the URL
    canonicalizer — kept as a REGEX (not ``F.parse_url``) so the DuckDB
    oracle can replay the identical pattern; both dialects (Java regex and
    RE2) parse these patterns the same way.
    """
    url = F.col(url) if isinstance(url, str) else url
    auth = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    return F.lower(F.regexp_replace(auth, r":[0-9]+$", ""))


#: DuckDB twin of :func:`host_of_url` — ``{col}`` formatted in.
HOST_SQL = (
    "lower(regexp_replace("
    "regexp_extract({col}, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1), "
    "':[0-9]+$', ''))"
)


#: second-level labels that act as public suffixes under a 2-letter ccTLD
#: ("co" in bbc.co.uk, "com" in smh.com.au …) — the compact heuristic core
#: of the Public Suffix List. The real PSL is ~9k rules and updated
#: continuously; a production cluster loads it into ``extra_slds`` (the
#: pluggable seam below) the same way the HTML parser / media codecs plug
#: in. This default covers the dominant second-level registries.
PSL_SLDS = (
    "co", "com", "org", "net", "gov", "ac", "edu", "or", "ne", "mil",
    "sch", "gob", "gouv", "asn", "id", "ltd", "plc",
)

_IP_RE = r"^[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}$"


def _domain_regexes(extra_slds: tuple[str, ...]) -> tuple[str, str]:
    slds = "|".join(PSL_SLDS + tuple(extra_slds))
    # eTLD+1 when the suffix is "<sld>.<2-letter ccTLD>": one label + the
    # two-level suffix, anchored at the end of the host
    multi = rf"([^.]+\.(?:{slds})\.[a-z][a-z])$"
    two = r"([^.]+\.[^.]+)$"
    return multi, two


def registrable_domain(
    host: Column | str, extra_slds: tuple[str, ...] = ()
) -> Column:
    """Registrable domain (eTLD+1) of a lowercased host — the key
    per-domain policies group on: C4-style volume caps (``quota_cap``),
    RefinedWeb-style source reputation, and politeness budgets that must
    treat ``a.example.com`` and ``b.example.com`` as one registrant.

    Heuristic PSL: ``<label>.<sld>.<cc>`` when the second-level label is a
    known public registry under a 2-letter ccTLD (``bbc.co.uk`` →
    ``bbc.co.uk``), else the last two labels (``a.b.example.com`` →
    ``example.com``); IPv4 literals and single-label hosts pass through
    whole. Pure regex in the Java ∩ RE2 dialect so :data:`DOMAIN_SQL` can
    replay it verbatim in the DuckDB oracle; ``extra_slds`` widens the
    registry set (e.g. from a loaded Public Suffix List) without touching
    callers.
    """
    host = F.col(host) if isinstance(host, str) else host
    multi, two = _domain_regexes(extra_slds)
    return F.when(host.rlike(_IP_RE), host).otherwise(
        F.coalesce(
            F.nullif(F.regexp_extract(host, multi, 1), F.lit("")),
            F.nullif(F.regexp_extract(host, two, 1), F.lit("")),
            host,
        )
    )


def domain_sql(col: str, extra_slds: tuple[str, ...] = ()) -> str:
    """DuckDB twin of :func:`registrable_domain` over a host expression —
    the identical regexes, replayed with DuckDB's primitives."""
    multi, two = _domain_regexes(extra_slds)
    return (
        f"CASE WHEN regexp_matches({col}, '{_IP_RE}') THEN {col} "
        f"ELSE coalesce(nullif(regexp_extract({col}, '{multi}', 1), ''), "
        f"nullif(regexp_extract({col}, '{two}', 1), ''), {col}) END"
    )


def _fenced_select(df: DataFrame, **cols: Column) -> DataFrame:
    """Project computed columns behind an optimizer fence so downstream
    filters do NOT re-evaluate them.

    Catalyst pushes filters through projections by substituting the aliased
    expression into the predicate; for expensive expressions (the host
    regexes here) that evaluates the chain once in the pushed-down Filter
    and AGAIN in the Project — measured 2.4x the projection cost on the
    link-graph funnel (r6 profile). Filters cannot be pushed below a
    Generate on the generator's output, so emitting the computed struct
    through ``explode(array(struct(...)))`` — exactly one output row per
    input row, values unchanged — pins every expression to a single
    evaluation. The Generate itself is O(1) per row (a 1-element array).
    """
    fence = F.explode(F.array(F.struct(*[c.alias(n) for n, c in cols.items()])))
    return df.select(fence.alias("_fence")).select(
        *[F.col(f"_fence.{n}").alias(n) for n in cols]
    )


def host_edges(
    links: DataFrame,
    src: str = "page_url",
    dst: str = "link_url",
    keep_self: bool = False,
    host_fn=None,
) -> DataFrame:
    """URL-pair link extractions -> weighted host-level edges.

    Returns ``(src_host, dst_host, weight)`` where weight = number of link
    occurrences between the host pair. Rows whose source or target host is
    empty (relative/opaque URLs that slipped past resolution) are dropped;
    intra-host edges (pagination, navigation — the bulk of forum links) are
    dropped unless ``keep_self`` because they drown the cross-host signal
    every downstream consumer (PageRank, degrees) wants.

    One shuffle (the groupBy on the host pair), with map-side partial
    aggregation collapsing the per-page fan-out before the exchange — at
    100 TB the exchange carries host pairs, not URL pairs.

    ``host_fn`` swaps the host extractor: default :func:`host_of_url`
    (regex — the DuckDB oracle replays the identical pattern); pass
    ``udfs.host_of`` (``F.parse_url``-backed) for a measured ~1.4x faster
    extraction stage when cross-engine replay isn't needed — the two agree
    on well-formed URLs, diverging only on userinfo/invalid-authority
    edge cases.
    """
    host_fn = host_fn or host_of_url
    # fence: the two host-regex chains are evaluated exactly ONCE per row;
    # without it the pushed-down empty/self filters re-evaluate both chains
    # (r6 profile: 11.8s -> 5.7s on the 2M-link build at sf0.1)
    e = _fenced_select(
        _spread(links, src, dst), src_host=host_fn(src), dst_host=host_fn(dst)
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if not keep_self:
        e = e.filter(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(F.count("*").alias("weight"))


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-host degree/volume stats from :func:`host_edges` output.

    Returns ``(host, out_degree, in_degree, out_links, in_links)`` —
    degree = distinct peer hosts, links = summed link weight. Built as a
    projection union + ONE hash aggregation (not two groupBys + an outer
    join): each edge contributes an out-row for its source and an in-row
    for its target, then one groupBy sums the four counters. Map-side
    partials mean the single exchange carries one row per (host, side)
    pair per map partition.
    """
    outs = edges.select(
        F.col("src_host").alias("host"),
        F.lit(1).cast("long").alias("out_degree"),
        F.lit(0).cast("long").alias("in_degree"),
        F.col("weight").cast("long").alias("out_links"),
        F.lit(0).cast("long").alias("in_links"),
    )
    ins = edges.select(
        F.col("dst_host").alias("host"),
        F.lit(0).cast("long").alias("out_degree"),
        F.lit(1).cast("long").alias("in_degree"),
        F.lit(0).cast("long").alias("out_links"),
        F.col("weight").cast("long").alias("in_links"),
    )
    return (
        outs.unionByName(ins)
        .groupBy("host")
        .agg(
            F.sum("out_degree").alias("out_degree"),
            F.sum("in_degree").alias("in_degree"),
            F.sum("out_links").alias("out_links"),
            F.sum("in_links").alias("in_links"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    assume_distinct: bool = False,
    broadcast_max_nodes: int = 1_000_000,
    cache: list | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over host edges, in INTEGER arithmetic.

    Returns ``(host, rank_scaled)`` where rank_scaled ~= pagerank * scale
    (bigint). The recurrence, applied ``iterations`` times from a uniform
    start ``base = scale div N``::

        contrib(h) = sum over in-edges (s -> h) of  r(s) div outdeg(s)
        dangling   = sum of r(s) over hosts with no out-edges
        r'(h) = ((den-num)*base + num*(contrib(h) + dangling div N)) div den

    Every step is integer division (Spark ``div`` == DuckDB ``//`` on
    non-negative bigints), so the result is BIT-EXACT across engines and
    runs — which is what lets the driver's value-hash oracle check a graph
    algorithm at all. Each truncation discards < 1 unit of 1e-12-scale
    mass per term; after 5 iterations ranks are within ~1e-9 relative of
    float PageRank while being deterministic. Dangling mass is
    redistributed uniformly (the standard treatment), via an in-plan 1-row
    aggregate that Catalyst broadcasts — no driver round-trip per
    iteration.

    Scale notes: 2 shuffles per iteration (ranks ⋈ edges on src — AQE
    broadcasts the rank table while it fits, partitioned join beyond —
    then the map-side-combined groupBy on dst) plus the broadcast dangling
    scalar; same shape as connected_components. The edge list (joined
    every round) and node list (left side of every round's final join)
    are checkpoint-pinned once; each round's rank table is eagerly
    checkpointed and the previous round's blocks freed, so lineage stays
    O(1) deep. Set ``assume_distinct=True`` when ``edges`` is
    :func:`host_edges` output (one row per pair by construction) — it
    skips the defensive dedup, which is otherwise a full exchange of the
    edge list paid before the first iteration. When every node has
    out-edges (checked once, up front), the per-iteration dangling
    aggregate is provably zero and its anti-join + broadcast job is
    skipped entirely. ``N`` comes from one driver-side count on the node
    table — control-plane, once, like the CC convergence counter.
    Overflow: num * total_mass <= 100 * scale ~= 1e14, far inside int64.
    Pass ``cache`` (a list) to receive the final checkpoint handle and
    free it after consuming the result.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not (0 < damping_num < damping_den):
        raise ValueError("need 0 < damping_num < damping_den")
    jsc = edges.sparkSession.sparkContext._jsc
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not assume_distinct:
        e = e.distinct()
    # dense LONG vertex ids for the loop: host strings never cross a
    # per-iteration exchange (measured 1.7-2.4x on the 12M-edge loop — the
    # iteration cost is join-probe + shuffle BANDWIDTH, and an 8-byte key
    # beats a ~15-byte string on both). Ids come from
    # monotonically_increasing_id on the checkpoint-PINNED node dim, so
    # they are assigned once and stable for the whole run — and the rank
    # recurrence never orders or ties on id values, so the (host, rank)
    # result is identical to the string-keyed loop bit for bit (test
    # pinned against the pure-Python reference + the DuckDB oracle, both
    # of which know nothing about the internal keying).
    pre = _persistent_ids(jsc)
    # ONE scan of the edge list builds the whole node dimension: each edge
    # contributes its src endpoint (counted) and its dst endpoint (count
    # 0); the groupBy collapses map-side to <= 2n rows and yields every
    # distinct host WITH its out-degree. This replaces the former separate
    # distinct-hosts pass + ei-groupBy(sid) out-degree pass + has_out
    # distinct scan (3 passes over the edge list) with a single pass.
    endpoints = e.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("h"), F.lit(1).alias("c")),
                F.struct(F.col("d").alias("h"), F.lit(0).alias("c")),
            )
        ).alias("x")
    )
    dim = (
        endpoints.groupBy(F.col("x.h").alias("h"))
        .agg(F.sum("x.c").cast("long").alias("od"))
        .select("h", "od", F.monotonically_increasing_id().alias("nid"))
        .localCheckpoint()
    )
    dim_pinned = _CheckpointHandle(jsc, _persistent_ids(jsc) - pre)
    n = dim.count()
    if n == 0:
        if cache is not None:
            cache.append(dim_pinned)
        return dim.select(
            F.col("h").alias("host"), F.lit(0).cast("long").alias("rank_scaled")
        )
    # merge the checkpoint's inherited (often shuffle-width) partitioning
    # down to the table's actual size: the loop re-reads these tables
    # every round and per-task fixed costs dominate small stages
    dim = _sized_coalesce(dim, n, 2_000_000)
    # no host lacks out-edges -> the dangling term is identically zero in
    # every iteration; one up-front count (over the tiny pinned dim, not
    # the edge list) removes an anti-join + broadcast job from each round
    # (the common case for link graphs aggregated from a full crawl,
    # where every observed host linked out at least once)
    no_dangling = dim.filter(F.col("od") > 0).count() == n
    # out-degree rides the src dim so the edge re-key + od attach is ONE
    # pass over e through two (broadcast when small) hash joins; dst-only
    # hosts carry od=0 but never match e's src side, so they are inert
    sdim = dim.select(F.col("h").alias("_sh"), F.col("nid").alias("sid"), "od")
    ddim = dim.select(F.col("h").alias("_dh"), F.col("nid").alias("did"))
    # the checkpointed dim is a LogicalRDD with no size statistics — the
    # planner would sort-merge the re-key joins (shuffling the whole edge
    # list twice) even when the dim is tiny, and AQE can only rescue joins
    # that sit on shuffle boundaries. n is known EXACTLY from the count
    # above, so broadcast the dim sides whenever they provably fit
    # (~40 MB at the 1M default); beyond that the partitioned join is the
    # intended plan anyway.
    if n <= broadcast_max_nodes:
        sdim, ddim = F.broadcast(sdim), F.broadcast(ddim)
    pre = _persistent_ids(jsc)
    ej = (
        e.join(sdim, e["s"] == sdim["_sh"])
        .join(ddim, e["d"] == ddim["_dh"])
        .select("sid", "did", "od")
        .localCheckpoint()
    )
    pinned = _CheckpointHandle(jsc, _persistent_ids(jsc) - pre)
    ej = _sized_coalesce(ej, ej.count(), 1_500_000)
    nodes = dim.select(F.col("nid").alias("v"))
    base = scale // n
    # hosts WITH out-edges, in sid space — read off the pinned dim
    has_out = dim.filter(F.col("od") > 0).select(F.col("nid").alias("v"))
    ranks = nodes.select("v", F.lit(base).cast("long").alias("r"))
    backing = _CheckpointHandle(jsc, set())
    # while the rank/contrib tables provably fit (n known exactly from the
    # count above), broadcast them: the per-iteration plan then never
    # exchanges the edge list at all — ej streams from its checkpoint into
    # a broadcast hash join, and the only shuffle left is the map-side-
    # combined groupBy(did) whose partials collapse to <= n rows per task.
    # Beyond broadcast_max_nodes the partitioned joins are the intended
    # plan. Join strategy does not change the integer recurrence: results
    # are bit-identical either way.
    small = n <= broadcast_max_nodes
    for _ in range(iterations):
        r_side = F.broadcast(ranks) if small else ranks
        contrib = (
            ej.join(r_side, ej["sid"] == ranks["v"])
            .select(F.col("did"), F.expr("r div od").alias("c"))
            .groupBy("did")
            .agg(F.sum("c").alias("sum_c"))
        )
        c_side = F.broadcast(contrib) if small else contrib
        stepped = nodes.join(c_side, nodes["v"] == contrib["did"], "left")
        if no_dangling:
            dang_term = "0L"
        else:
            dang = (
                ranks.join(has_out, "v", "left_anti")
                .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
            )
            stepped = stepped.crossJoin(F.broadcast(dang))
            dang_term = f"(dang div {n}L)"
        new_ranks = stepped.select(
            "v",
            F.expr(
                f"(({damping_den - damping_num}L * {base}L) + "
                f"{damping_num}L * (coalesce(sum_c, 0L) + {dang_term}))"
                f" div {damping_den}L"
            ).alias("r"),
        )
        pre = _persistent_ids(jsc)
        new_ranks = new_ranks.localCheckpoint()  # eager; truncates lineage
        new_backing = _CheckpointHandle(jsc, _persistent_ids(jsc) - pre)
        backing.unpersist()  # previous round's rank blocks are dead now
        backing = new_backing
        ranks = new_ranks
    pinned.unpersist()  # int edge list done once final ranks materialized
    out_dim = F.broadcast(dim) if n <= broadcast_max_nodes else dim
    out = (
        ranks.join(out_dim, ranks["v"] == out_dim["nid"])
        .select(F.col("h").alias("host"), F.col("r").alias("rank_scaled"))
    )
    # the host dim backs the RETURNED frame (final re-join) — hand it to
    # the caller's cache list alongside the final rank checkpoint
    if cache is not None:
        cache.append(backing)
        cache.append(dim_pinned)
    return out


#: digit-run normalization shared by trap detection in BOTH engines:
#: the template of /thread/12345/page6 is /thread/N/pageN.
TEMPLATE_PATTERN = "[0-9]+"


def hits(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src_host",
    dst: str = "dst_host",
    scale: int = 1_000_000_000,
    assume_distinct: bool = False,
    broadcast_max_nodes: int = 1_000_000,
    cache: list | None = None,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg hubs & authorities) in INTEGER
    arithmetic — the complementary link signal to :func:`pagerank`: an
    AUTHORITY is a page good hosts link TO (a curation quality prior); a
    HUB is a host that links to good authorities (a crawl-frontier
    expansion prior — schedule hub hosts first and the frontier finds the
    authorities).  Returns ``(host, hub_scaled, auth_scaled)``.

    Recurrence per iteration, L1-normalized to ``scale`` each half-step:
    ``a_j = Σ_{i→j} h_i``, rescaled to sum ≈ ``scale``; then
    ``h_i = Σ_{i→j} a_j``, rescaled likewise.  Every rescale is
    ``raw * scale div total`` — integer floor division, identical in
    Spark (``div``) and DuckDB (``//``), so the whole algorithm is
    bit-exact cross-engine and value-hash-checkable like ``pagerank``.

    ``scale`` is 10^9 (not pagerank's 10^12) BECAUSE of the rescale
    product: normalization bounds every score AND every raw sum by
    ``scale``, so ``raw * scale ≤ 10^18`` stays inside int64 under ANSI
    mode; the totals are ≤ ``scale × max-degree`` — safe to ~10^9 hosts.
    Unweighted edge semantics (dedup unless ``assume_distinct=True``,
    same contract as pagerank).

    Loop shape (r6 rewrite, = pagerank's): the node dim is built in ONE
    pass over the edge list and carries BOTH degrees, so each half-step's
    L1 total is the n-row aggregate ``Σ score(v)·deg(v)`` — exactly equal
    to the former ``Σ raw`` (every edge contributes its endpoint score
    once) but computed WITHOUT re-evaluating the edge join; each
    half-step therefore scans the (checkpointed, size-coalesced) edge
    list exactly once, through a broadcast hash join while the score
    table provably fits.  Both half-step outputs are eagerly
    checkpointed, previous round's blocks freed — the former shape
    checkpointed only hubs, so the un-pinned authorities subtree was
    re-evaluated (with its edge scans) inside every hub half-step.  The
    rescale divisor is guarded ``greatest(tot, 1)``: with ``n > scale``
    the uniform start floors to 0 and an unguarded total would
    divide-by-zero under ANSI instead of converging to all-zero scores
    (unreachable at the 10^9-host bound above; scores are unchanged
    whenever any score is nonzero).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    jsc = edges.sparkSession.sparkContext._jsc
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not assume_distinct:
        e = e.distinct()
    pre = _persistent_ids(jsc)
    e = e.localCheckpoint()
    # one scan of e: every distinct host + its out/in degree (pagerank's
    # endpoint-explode shape)
    ndim = (
        e.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("s").alias("v"),
                        F.lit(1).alias("_o"), F.lit(0).alias("_i"),
                    ),
                    F.struct(
                        F.col("d").alias("v"),
                        F.lit(0).alias("_o"), F.lit(1).alias("_i"),
                    ),
                )
            ).alias("x")
        )
        .groupBy(F.col("x.v").alias("v"))
        .agg(
            F.sum("x._o").cast("long").alias("od"),
            F.sum("x._i").cast("long").alias("ind"),
        )
        .localCheckpoint()
    )
    pinned = _CheckpointHandle(jsc, _persistent_ids(jsc) - pre)
    n = ndim.count()
    if n == 0:
        if cache is not None:
            cache.append(pinned)
        return ndim.select(
            F.col("v").alias("host"),
            F.lit(0).cast("long").alias("hub_scaled"),
            F.lit(0).cast("long").alias("auth_scaled"),
        )
    ndim = _sized_coalesce(ndim, n, 2_000_000)
    # |E| read off the pinned dim (Σ out-degree) — no extra edge scan
    n_edges = ndim.agg(F.sum("od")).first()[0] or 0
    e = _sized_coalesce(e, int(n_edges), 1_500_000)
    small = n <= broadcast_max_nodes

    def _half(
        score_df: DataFrame, score_col: str, join_key: str, deg_col: str,
        out: str,
    ) -> DataFrame:
        sc = score_df.select(F.col("v").alias("_v"), F.col(score_col).alias("_s"))
        s_side = F.broadcast(sc) if small else sc
        other = "d" if join_key == "s" else "s"
        raw = (
            e.join(s_side, e[join_key] == sc["_v"])
            .groupBy(F.col(other).alias("_k"))
            .agg(F.sum("_s").alias("raw"))
        )
        # L1 total as an n-row aggregate: Σ_v score(v)·deg(v) == Σ raw
        # exactly (integer sums reorder freely; bounds keep it in int64)
        tot = score_df.agg(
            F.coalesce(F.sum(F.col(score_col) * F.col(deg_col)), F.lit(0))
            .cast("long")
            .alias("tot")
        )
        r_side = F.broadcast(raw) if small else raw
        return (
            ndim.join(r_side, ndim["v"] == raw["_k"], "left")
            .crossJoin(F.broadcast(tot))
            .select(
                ndim["v"],
                ndim["od"],
                ndim["ind"],
                F.expr(
                    f"coalesce(raw, 0L) * {int(scale)}L div greatest(tot, 1L)"
                ).alias(out),
            )
        )

    h = ndim.select("v", "od", "ind", F.lit(scale // n).cast("long").alias("hs"))
    backing = _CheckpointHandle(jsc, set())
    for _ in range(iterations):
        pre = _persistent_ids(jsc)
        # a_j = Σ_{i→j} h_i (tot over out-degrees); h_i = Σ_{i→j} a_j
        # (tot over in-degrees)
        a = _half(h, "hs", "s", "od", "au").localCheckpoint()
        new_h = _half(a, "au", "d", "ind", "hs").localCheckpoint()
        new_backing = _CheckpointHandle(jsc, _persistent_ids(jsc) - pre)
        backing.unpersist()
        h, backing = new_h, new_backing
    a = _half(h, "hs", "s", "od", "au").select("v", "au")
    out = h.join(  # final auths from the FINAL hubs
        F.broadcast(a) if small else a, "v"
    ).select(
        F.col("v").alias("host"),
        F.col("hs").alias("hub_scaled"),
        F.col("au").alias("auth_scaled"),
    )
    if cache is not None:
        cache.append(backing)
        cache.append(pinned)
    return out


def k_hop_hosts(
    edges: DataFrame,
    seeds: DataFrame | list,
    k: int,
    src: str = "src_host",
    dst: str = "dst_host",
    cache: list | None = None,
) -> DataFrame:
    """Directed bounded reachability: every host within ``k`` link hops of
    a seed set, labeled with its minimum hop distance (BFS levels).
    Returns ``(host, hop)`` — hop 0 is the seed list itself.

    Crawl planning: a focused crawl budgets by DEPTH from its seed list
    (the reference crawls a seed's own pagination; the cross-SITE frontier
    a seed list implies is its host neighborhood). The min-hop label is
    what a depth-limited scheduler keys its budget on, and the hop-k ring
    is the candidate set for the next crawl expansion.

    Per round: frontier ⋈ edges on the host key (ONE hash join), distinct,
    anti-join the visited set — so a round's cost is proportional to the
    frontier's out-neighborhood, never to the full reachable set. Visited
    is checkpoint-pinned per round with eager release of the previous
    round's blocks (the connected_components / pagerank hygiene): lineage
    stays O(1) deep however large ``k`` is. The loop exits early when a
    round discovers nothing new (one control-plane count per round — the
    CC convergence-counter precedent). Pass ``cache`` (a list) to receive
    the final checkpoint handle and free it after consuming the result.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    spark = edges.sparkSession
    jsc = spark.sparkContext._jsc
    if isinstance(seeds, (list, tuple)):
        seeds_df = spark.createDataFrame([(s,) for s in seeds], "host string")
    else:
        seeds_df = seeds.select(F.col(seeds.columns[0]).alias("host"))
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    pre = _persistent_ids(jsc)
    e = e.localCheckpoint()
    e_pinned = _CheckpointHandle(jsc, _persistent_ids(jsc) - pre)

    pre = _persistent_ids(jsc)
    visited = (
        seeds_df.distinct()
        .select("host", F.lit(0).cast("int").alias("hop"))
        .localCheckpoint()
    )
    backing = _CheckpointHandle(jsc, _persistent_ids(jsc) - pre)
    n_visited = visited.count()
    frontier = visited.select("host")
    for h in range(1, k + 1):
        nxt = (
            frontier.join(e, frontier["host"] == e["_s"])
            .select(F.col("_d").alias("host"))
            .distinct()
            .join(visited.select("host"), "host", "left_anti")
            .select("host", F.lit(h).cast("int").alias("hop"))
        )
        pre = _persistent_ids(jsc)
        new_visited = visited.unionByName(nxt).localCheckpoint()
        new_backing = _CheckpointHandle(jsc, _persistent_ids(jsc) - pre)
        n_new = new_visited.count()
        backing.unpersist()
        visited, backing = new_visited, new_backing
        if n_new == n_visited:  # frontier dried up before hop k
            break
        n_visited = n_new
        frontier = visited.filter(F.col("hop") == h).select("host")
    e_pinned.unpersist()
    if cache is not None:
        cache.append(backing)
    return visited


def crawl_trap_stats(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 50,
    ratio_e4_threshold: int = 100_000,
    host_fn=None,
) -> DataFrame:
    """Per-host URL-template compression — the crawler-trap detector.

    A trap host (calendar pages, session ids, faceted search) produces
    unbounded distinct URLs that all collapse onto a few digit-normalized
    templates. For each host this computes ``n_urls`` (distinct URLs),
    ``n_templates`` (distinct templates, digits -> 'N' over the
    path+query), their ratio scaled e4 (integer division — exact in both
    engines), and ``is_trap``: at least ``min_urls`` distinct URLs AND a
    compression ratio of at least ``ratio_e4_threshold`` (default 10x).
    The crawl scheduler demotes or caps flagged hosts.

    One hash aggregation on host (two distinct-counts share the exchange);
    at frontier scale the exchange carries (host, url-ish) rows — the same
    key politeness already shuffles on, so in the production chain this
    reuses that partitioning.
    """
    url = F.col(url_col)
    host = (host_fn or host_of_url)(url)
    rest = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)", 1)
    template = F.regexp_replace(rest, TEMPLATE_PATTERN, "N")
    return (
        _fenced_select(_spread(urls, url_col), host=host, _u=url, _t=template)
        .filter(F.col("host") != "")
        .groupBy("host")
        .agg(
            F.count_distinct(F.col("_u")).alias("n_urls"),
            F.count_distinct(F.col("_t")).alias("n_templates"),
        )
        .select(
            "host",
            "n_urls",
            "n_templates",
            F.expr("n_urls * 10000L div n_templates").alias("ratio_e4"),
        )
        .withColumn(
            "is_trap",
            (F.col("n_urls") >= min_urls)
            & (F.col("ratio_e4") >= ratio_e4_threshold),
        )
    )


def top_anchor(
    links: DataFrame,
    dst: str = "link_url",
    anchor: str = "anchor_text",
    host_fn=None,
) -> DataFrame:
    """Most frequent anchor text per TARGET host.

    Returns ``(dst_host, top_anchor, n_links, n_top)`` — n_links = total
    anchored links into the host, n_top = occurrences of the winning
    anchor. Ties break deterministically: higher count first, then
    lexicographically smallest anchor. Empty anchors are dropped.

    Shape: one groupBy on (host, anchor) with map-side partials, then a
    rank-1 window per host — ``row_number() <= 1`` compiles to
    WindowGroupLimit with a map-side Partial phase (hot-host defense
    built in, pinned for the politeness top-k in tests/test_operators.py).
    """
    from pyspark.sql import Window

    grouped = (
        _fenced_select(
            _spread(links, dst, anchor),
            dst_host=(host_fn or host_of_url)(dst),
            anchor=F.col(anchor),
        )
        .filter((F.col("dst_host") != "") & (F.col("anchor") != ""))
        .groupBy("dst_host", "anchor")
        .agg(F.count("*").alias("n_top"))
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n_top").desc(), F.col("anchor").asc()
    )
    totals = F.sum("n_top").over(Window.partitionBy("dst_host"))
    return (
        grouped.withColumn("n_links", totals)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "dst_host",
            F.col("anchor").alias("top_anchor"),
            "n_links",
            "n_top",
        )
    )
