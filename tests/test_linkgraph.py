"""Link-graph operators (operators/linkgraph.py): host edges, degrees,
integer-exact PageRank, crawler-trap detection, anchor aggregation.

PageRank is checked against an INDEPENDENT pure-Python re-derivation of
the integer recurrence (not against the operator's own building blocks),
the same way the driver's DuckDB oracle replays it with unrolled CTEs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bbcrawl_spark.operators import linkgraph


def _links_df(spark, rows):
    return spark.createDataFrame(
        rows, "page_url string, link_url string, anchor_text string"
    )


def _edges_df(spark, rows):
    return spark.createDataFrame(
        [(s, d, int(w)) for s, d, w in rows],
        "src_host string, dst_host string, weight long",
    )


def _ref_pagerank(edges, iterations, scale=10**12, num=85, den=100):
    """Pure-Python integer PageRank — the reference recurrence."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    base = scale // n
    out: dict[str, int] = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {h: base for h in nodes}
    for _ in range(iterations):
        contrib = {h: 0 for h in nodes}
        for s, d in edges:
            contrib[d] += r[s] // out[s]
        dang = sum(r[h] for h in nodes if h not in out)
        r = {
            h: ((den - num) * base + num * (contrib[h] + dang // n)) // den
            for h in nodes
        }
    return r


# ---------------------------------------------------------------------------
# host_edges
# ---------------------------------------------------------------------------


def test_host_edges_folds_case_port_and_drops_self_and_empty(spark):
    links = _links_df(
        spark,
        [
            # same host through case + default-port variation -> self, dropped
            ("http://a.example.com/x", "HTTP://A.Example.com:80/y", "t"),
            # cross-host, counted twice
            ("http://a.example.com/x", "http://b.example.com/", "t"),
            ("http://a.example.com/z", "http://b.example.com/w", "t"),
            # relative link that slipped past resolution -> empty host, dropped
            ("http://a.example.com/x", "/relative/only", "t"),
            # reverse direction is a separate edge
            ("http://b.example.com/", "http://a.example.com/", "t"),
        ],
    )
    got = {
        (r.src_host, r.dst_host): r.weight
        for r in linkgraph.host_edges(links).collect()
    }
    assert got == {
        ("a.example.com", "b.example.com"): 2,
        ("b.example.com", "a.example.com"): 1,
    }


def test_host_edges_keep_self(spark):
    links = _links_df(
        spark, [("http://a.example.com/x", "http://a.example.com/y", "t")]
    )
    assert linkgraph.host_edges(links, keep_self=True).count() == 1
    assert linkgraph.host_edges(links).count() == 0


def test_host_edges_parse_url_host_fn_agrees(spark):
    """The fast-path extractor (udfs.host_of, parse_url-backed) and the
    oracle-replayable regex default agree on well-formed URLs."""
    from bbcrawl_spark.functions import udfs

    links = _links_df(
        spark,
        [
            ("HTTP://A.Example.com:80/x", "https://B.example.org:443/y", "t"),
            ("http://c.example.net:8080/z", "http://d.example.com/", "t"),
            ("http://e.example.com/q?page=1#f", "http://f.example.com", "t"),
        ],
    )
    a = sorted(map(tuple, linkgraph.host_edges(links).collect()))
    b = sorted(
        map(tuple, linkgraph.host_edges(links, host_fn=udfs.host_of).collect())
    )
    assert a == b and len(a) == 3


# ---------------------------------------------------------------------------
# degree_stats
# ---------------------------------------------------------------------------


def test_degree_stats_hand_computed(spark):
    e = _edges_df(spark, [("a", "b", 3), ("a", "c", 1), ("b", "c", 2)])
    got = {r.host: r for r in linkgraph.degree_stats(e).collect()}
    assert (got["a"].out_degree, got["a"].in_degree) == (2, 0)
    assert (got["a"].out_links, got["a"].in_links) == (4, 0)
    assert (got["b"].out_degree, got["b"].in_degree) == (1, 1)
    assert (got["b"].out_links, got["b"].in_links) == (2, 3)
    assert (got["c"].out_degree, got["c"].in_degree) == (0, 2)
    assert (got["c"].out_links, got["c"].in_links) == (0, 3)


def test_degree_stats_single_shuffle(spark):
    """The union-then-aggregate shape pays ONE exchange, not two groupBys
    plus an outer join."""
    e = _edges_df(spark, [("a", "b", 1)])
    plan = linkgraph.degree_stats(e)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------


def test_pagerank_matches_python_reference(spark):
    dangling = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
        ("a", "d"),  # d has no out-edges -> dangling
        ("e", "a"), ("e", "b"),
    ]
    # ring + chords: EVERY node has out-edges -> exercises the
    # skip-the-dangling-job fast path against the same reference
    no_dangling = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
        ("a", "c"), ("c", "a"), ("d", "b"),
    ]
    for edges in (dangling, no_dangling):
        e = _edges_df(spark, [(s, d, 1) for s, d in edges])
        for iters in (1, 3):
            want = _ref_pagerank(edges, iters)
            got = {
                r.host: r.rank_scaled
                for r in linkgraph.pagerank(e, iterations=iters).collect()
            }
            assert got == want, f"edges={edges} iterations={iters}"


def test_pagerank_assume_distinct_identity_on_unique_edges(spark):
    """On an already-unique edge list (host_edges output) the
    assume_distinct fast path returns the identical ranks."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    e = _edges_df(spark, [(s, d, 1) for s, d in edges])
    slow = {r.host: r.rank_scaled for r in linkgraph.pagerank(e, iterations=3).collect()}
    fast = {
        r.host: r.rank_scaled
        for r in linkgraph.pagerank(e, iterations=3, assume_distinct=True).collect()
    }
    assert slow == fast


def test_pagerank_hub_ranks_highest_and_mass_is_conserved(spark):
    spokes = [f"s{i}" for i in range(10)]
    # bidirectional star: hub redistributes over all spokes, so its rank is
    # the stable maximum (a single hub->s0 edge would dump hub's whole mass
    # on s0 each round and oscillate above it)
    edges = [(s, "hub") for s in spokes] + [("hub", s) for s in spokes]
    e = _edges_df(spark, [(s, d, 1) for s, d in edges])
    rows = linkgraph.pagerank(e, iterations=4).collect()
    ranks = {r.host: r.rank_scaled for r in rows}
    assert max(ranks, key=ranks.get) == "hub"
    total = sum(ranks.values())
    # integer truncation only ever DISCARDS sub-unit mass; with dangling
    # redistribution the total stays within a fraction of a percent of scale
    assert 0.99 * 10**12 < total <= 10**12
    assert all(v > 0 for v in ranks.values())


def test_pagerank_duplicate_edges_collapse(spark):
    """pagerank de-duplicates the edge list: repeated extractions of the
    same host pair must not double a source's vote."""
    e1 = _edges_df(spark, [("a", "b", 1), ("a", "c", 1)])
    e2 = _edges_df(
        spark, [("a", "b", 1), ("a", "b", 9), ("a", "c", 1), ("a", "c", 1)]
    )
    r1 = {r.host: r.rank_scaled for r in linkgraph.pagerank(e1, iterations=2).collect()}
    r2 = {r.host: r.rank_scaled for r in linkgraph.pagerank(e2, iterations=2).collect()}
    assert r1 == r2


def test_pagerank_rejects_bad_params(spark):
    e = _edges_df(spark, [("a", "b", 1)])
    with pytest.raises(ValueError):
        linkgraph.pagerank(e, iterations=0)
    with pytest.raises(ValueError):
        linkgraph.pagerank(e, damping_num=100, damping_den=100)


def test_pagerank_jvm_only(spark):
    """The whole loop is JVM column expressions — no Python eval in plan."""
    e = _edges_df(spark, [("a", "b", 1), ("b", "a", 1)])
    df = linkgraph.pagerank(e, iterations=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pagerank_prior_composes_with_politeness_budgets(spark):
    """Integration: link-graph ranks become per-host fetch budgets — the
    signal path a production scheduler wires (reputation-weighted
    politeness): pagerank -> (host, budget) dim -> rank_fetch_slots
    host_budgets override."""
    from pyspark.sql import Window, functions as F

    from bbcrawl_spark.operators import politeness

    spokes = [f"s{i}" for i in range(4)]
    edges = _edges_df(
        spark,
        [(s, "hub", 1) for s in spokes] + [("hub", s, 1) for s in spokes],
    )
    pr = linkgraph.pagerank(edges, iterations=3)
    w = Window.orderBy(F.col("rank_scaled").desc(), F.col("host"))
    budgets = pr.select(
        "host",
        F.when(F.row_number().over(w) == 1, F.lit(3)).otherwise(F.lit(1)).alias("budget"),
    )
    frontier = spark.createDataFrame(
        [
            (h, 1, i, i * 17)
            for h in ["hub"] + spokes
            for i in range(1, 6)
        ],
        "host string, priority int, page_num int, url_hash long",
    )
    ranked = politeness.rank_fetch_slots(frontier, budget=1, host_budgets=budgets)
    got = {
        r.host: r.cnt
        for r in ranked.filter("scheduled")
        .groupBy("host")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got["hub"] == 3  # highest-rank host gets the larger budget
    assert all(got[s] == 1 for s in spokes)


# ---------------------------------------------------------------------------
# crawl_trap_stats
# ---------------------------------------------------------------------------


def test_crawl_trap_stats_flags_template_explosion(spark):
    rows = [(f"http://trap.example.com/cal?y=2020&m={i}&d={j}",)
            for i in range(12) for j in range(5)]
    rows += [(f"http://ok.example.com/{name}",)
             for name in ("about", "contact", "faq", "pricing")]
    urls = spark.createDataFrame(rows, "url string")
    got = {
        r.host: r
        for r in linkgraph.crawl_trap_stats(
            urls, min_urls=10, ratio_e4_threshold=100_000
        ).collect()
    }
    trap = got["trap.example.com"]
    assert (trap.n_urls, trap.n_templates) == (60, 1)
    assert trap.ratio_e4 == 600_000 and trap.is_trap
    ok = got["ok.example.com"]
    assert (ok.n_urls, ok.n_templates) == (4, 4)
    assert ok.ratio_e4 == 10_000 and not ok.is_trap


def test_crawl_trap_min_urls_guard(spark):
    """A tiny host with one template is NOT a trap below the volume floor."""
    urls = spark.createDataFrame(
        [(f"http://small.example.com/p{i}",) for i in range(3)], "url string"
    )
    r = linkgraph.crawl_trap_stats(urls, min_urls=10).collect()[0]
    assert r.n_urls == 3 and not r.is_trap


def test_crawl_trap_template_excludes_fragment_keeps_query(spark):
    urls = spark.createDataFrame(
        [("http://h.example.com/f/1.jpg#frag",),
         ("http://h.example.com/f/2.jpg#other",)],
        "url string",
    )
    r = linkgraph.crawl_trap_stats(urls, min_urls=1, ratio_e4_threshold=1).collect()[0]
    assert r.n_templates == 1  # digits normalized, fragments ignored


# ---------------------------------------------------------------------------
# top_anchor
# ---------------------------------------------------------------------------


def test_top_anchor_counts_and_tie_break(spark):
    links = _links_df(
        spark,
        [
            ("http://x/", "http://t.example.com/a", "zeta"),
            ("http://x/", "http://t.example.com/b", "zeta"),
            ("http://x/", "http://t.example.com/c", "alpha"),
            ("http://x/", "http://t.example.com/d", "alpha"),
            ("http://x/", "http://t.example.com/e", "mid"),
            ("http://x/", "http://u.example.com/", "only"),
            ("http://x/", "http://u.example.com/", ""),  # empty anchor dropped
        ],
    )
    got = {r.dst_host: r for r in linkgraph.top_anchor(links).collect()}
    t = got["t.example.com"]
    # alpha and zeta tie at 2 -> lexicographically smaller anchor wins
    assert (t.top_anchor, t.n_top, t.n_links) == ("alpha", 2, 5)
    u = got["u.example.com"]
    assert (u.top_anchor, u.n_top, u.n_links) == ("only", 1, 1)


# ---------------------------------------------------------------------------
# registrable_domain (eTLD+1)
# ---------------------------------------------------------------------------


DOMAIN_CASES = [
    ("www.bbc.co.uk", "bbc.co.uk"),          # sld.cc suffix
    ("a.b.smh.com.au", "smh.com.au"),        # deep subdomain under sld.cc
    ("example.gob.mx", "example.gob.mx"),    # non-English registry label
    ("a.b.example.com", "example.com"),      # plain gTLD -> last two labels
    ("example.com", "example.com"),
    ("web.archive.org", "archive.org"),      # .org is not a 2-letter cc
    ("a.b.co", "b.co"),                      # "co" ccTLD itself, not a suffix
    ("10.0.42.7", "10.0.42.7"),              # IPv4 literal passes whole
    ("localhost", "localhost"),              # single label passes whole
]


def test_registrable_domain_cases(spark):
    df = spark.createDataFrame([(h,) for h, _ in DOMAIN_CASES], "host string")
    got = [
        r["d"]
        for r in df.select(
            linkgraph.registrable_domain("host").alias("d")
        ).collect()
    ]
    assert got == [want for _, want in DOMAIN_CASES]


def test_registrable_domain_extra_slds_widen_the_registry(spark):
    # "web" is not a default registry label; plugging it in (the PSL-load
    # seam) turns web.example.za-style hosts into three-label domains
    df = spark.createDataFrame([("x.web.za",), ("a.x.web.za",)], "host string")
    default = [
        r["d"] for r in df.select(
            linkgraph.registrable_domain("host").alias("d")).collect()
    ]
    widened = [
        r["d"] for r in df.select(
            linkgraph.registrable_domain("host", ("web",)).alias("d")).collect()
    ]
    assert default == ["web.za", "web.za"]
    assert widened == ["x.web.za", "x.web.za"]


def test_domain_sql_is_an_exact_cross_engine_twin(spark):
    # the DuckDB replay of the same regexes must agree host-for-host —
    # this is what lets driver oracles group by domain non-circularly
    import duckdb

    con = duckdb.connect()
    hosts = "[" + ", ".join(f"'{h}'" for h, _ in DOMAIN_CASES) + "]"
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {linkgraph.domain_sql('host')} "
            f"FROM (SELECT unnest({hosts}) AS host)"
        ).fetchall()
    ]
    assert duck == [want for _, want in DOMAIN_CASES]


def test_quota_cap_composes_with_registrable_domain(spark):
    # the C4 per-domain cap keyed on eTLD+1: sibling hosts of one
    # registrant share a single quota instead of getting one each
    from pyspark.sql import functions as F

    from bbcrawl_spark.operators import textops

    rows = [(i, f"h{i % 4}.example.com" if i % 2 == 0 else f"s{i % 4}.bbc.co.uk")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    capped = textops.quota_cap(
        df.withColumn("domain", linkgraph.registrable_domain("host")),
        quota=5, group_col="domain",
    )
    got = {
        r["domain"]: r["n"]
        for r in capped.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert got == {"example.com": 5, "bbc.co.uk": 5}


# ---------------------------------------------------------------------------
# k_hop_hosts (seed expansion)
# ---------------------------------------------------------------------------


def _khop(spark, edges, seeds, k):
    e = _edges_df(spark, [(s, d, 1) for s, d in edges])
    return {
        r["host"]: r["hop"]
        for r in linkgraph.k_hop_hosts(e, seeds, k).collect()
    }


def test_k_hop_levels_and_bound(spark):
    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    assert _khop(spark, chain, ["a"], 2) == {"a": 0, "b": 1, "c": 2}
    assert _khop(spark, chain, ["a"], 0) == {"a": 0}


def test_k_hop_min_distance_on_diamond(spark):
    # d is reachable via two paths of length 2 -> ONE row, hop 2
    diamond = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    got = _khop(spark, diamond, ["a"], 3)
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_k_hop_cycle_terminates_early(spark):
    # a->b->a: everything is visited by hop 1; k=50 must early-exit, not spin
    got = _khop(spark, [("a", "b"), ("b", "a")], ["a"], 50)
    assert got == {"a": 0, "b": 1}


def test_k_hop_respects_direction_and_multi_seeds(spark):
    edges = [("z", "a"), ("a", "b"), ("q", "r")]
    # in-link z->a does NOT pull z in; second seed expands independently
    got = _khop(spark, edges, ["a", "q"], 2)
    assert got == {"a": 0, "q": 0, "b": 1, "r": 1}


def test_k_hop_seed_dataframe_and_cache_release(spark):
    e = _edges_df(spark, [("a", "b", 1)])
    seeds = spark.createDataFrame([("a",)], "host string")
    cache: list = []
    got = linkgraph.k_hop_hosts(e, seeds, 1, cache=cache)
    assert {(r["host"], r["hop"]) for r in got.collect()} == {("a", 0), ("b", 1)}
    assert len(cache) == 1
    cache[0].unpersist()


def test_trap_hosts_demote_via_politeness_budget_override(spark):
    """Integration: the trap detector ends in the scheduler too — flagged
    hosts get a floor budget through the SAME host_budgets override seam
    the pagerank prior uses, so a URL-space explosion stops eating the
    round's fetch slots while clean hosts keep the default."""
    from bbcrawl_spark.operators import politeness

    urls = spark.createDataFrame(
        # trap.example.com: 60 distinct URLs, ONE digit template
        [(f"http://trap.example.com/cal/2024/{i}",) for i in range(60)]
        # clean.example.com: 60 distinct URLs, 60 distinct templates
        + [(f"http://clean.example.com/{'x' * (i % 60 + 1)}",) for i in range(60)],
        "url string",
    )
    traps = linkgraph.crawl_trap_stats(urls, min_urls=50, ratio_e4_threshold=100_000)
    budgets = traps.filter("is_trap").select(
        "host", F.lit(1).alias("budget")
    )
    frontier = spark.createDataFrame(
        [(h, 1, i, i * 31) for h in ("trap.example.com", "clean.example.com")
         for i in range(1, 9)],
        "host string, priority int, page_num int, url_hash long",
    )
    ranked = politeness.rank_fetch_slots(frontier, budget=5, host_budgets=budgets)
    got = {
        r.host: r.cnt
        for r in ranked.filter("scheduled")
        .groupBy("host").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == {"trap.example.com": 1, "clean.example.com": 5}


# ---------------------------------------------------------------------------
# hits (hubs & authorities)
# ---------------------------------------------------------------------------


def _ref_hits(edges, iterations, scale=10**9):
    """Pure-Python integer HITS — the reference recurrence."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)

    def auth(h):
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[d] += h[s]
        tot = sum(raw.values())
        return {v: raw[v] * scale // tot for v in nodes}

    def hub(a):
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[s] += a[d]
        tot = sum(raw.values())
        return {v: raw[v] * scale // tot for v in nodes}

    h = {v: scale // n for v in nodes}
    for _ in range(iterations):
        h = hub(auth(h))
    return h, auth(h)


def test_hits_matches_python_reference(spark):
    edges = [
        ("x", "p"), ("x", "q"), ("y", "q"), ("y", "r"),
        ("p", "r"),  # p is both authority and (weak) hub
        ("z", "q"),
    ]
    e = _edges_df(spark, [(s, d, 1) for s, d in edges])
    for iters in (1, 3):
        want_h, want_a = _ref_hits(edges, iters)
        rows = linkgraph.hits(e, iterations=iters).collect()
        got_h = {r["host"]: r["hub_scaled"] for r in rows}
        got_a = {r["host"]: r["auth_scaled"] for r in rows}
        assert got_h == want_h, f"hubs, iterations={iters}"
        assert got_a == want_a, f"auths, iterations={iters}"


def test_hits_bipartite_separates_roles(spark):
    # pure hubs link, pure authorities are linked: each side's other score
    # is exactly zero, and q (2 in-links) out-ranks p and r (1 each)
    edges = [("x", "p"), ("x", "q"), ("y", "q"), ("y", "r")]
    e = _edges_df(spark, [(s, d, 1) for s, d in edges])
    rows = {r["host"]: r for r in linkgraph.hits(e, iterations=3).collect()}
    assert rows["x"]["auth_scaled"] == 0 and rows["p"]["hub_scaled"] == 0
    assert rows["q"]["auth_scaled"] > rows["p"]["auth_scaled"]
    assert rows["q"]["auth_scaled"] > rows["r"]["auth_scaled"]
    assert rows["x"]["hub_scaled"] == rows["y"]["hub_scaled"]  # symmetric hubs


def test_hits_assume_distinct_identity_and_dup_collapse(spark):
    edges = [("a", "b"), ("b", "c"), ("a", "c")]
    e1 = _edges_df(spark, [(s, d, 1) for s, d in edges])
    e2 = _edges_df(spark, [(s, d, 1) for s, d in edges + edges])  # dups
    base = {
        (r["host"], r["hub_scaled"], r["auth_scaled"])
        for r in linkgraph.hits(e1, iterations=2).collect()
    }
    fast = {
        (r["host"], r["hub_scaled"], r["auth_scaled"])
        for r in linkgraph.hits(e1, iterations=2, assume_distinct=True).collect()
    }
    dedup = {
        (r["host"], r["hub_scaled"], r["auth_scaled"])
        for r in linkgraph.hits(e2, iterations=2).collect()
    }
    assert base == fast == dedup
