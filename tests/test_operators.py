"""Dedup (bloom + anti-join), politeness windows, robots, priority
(SURVEY.md §2.3-2.7)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bbcrawl_spark import urlkit
from bbcrawl_spark.operators import dedup, politeness, priority, robots


@pytest.fixture(scope="module")
def tmp_bloom_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("bloom"))


def _url_df(spark, urls):
    return spark.createDataFrame(
        [(u, urlkit.url_hash(u)) for u in urls], "url string, url_hash long"
    )


class TestBloomDedup:
    def test_exact_and_no_false_negatives(self, spark, tmp_bloom_dir):
        rng = random.Random(42)
        seen_urls = [f"http://h{rng.randrange(20)}.ex/t/{i}" for i in range(2000)]
        new_urls = [f"http://h{rng.randrange(20)}.ex/new/{i}" for i in range(500)]
        seen = _url_df(spark, seen_urls)
        cands = _url_df(spark, seen_urls[:300] + new_urls)

        manifest = dedup.build_partitioned_bloom(seen, tmp_bloom_dir, num_partitions=8)
        assert manifest.count() == 8
        spec = dedup.BloomSpec(tmp_bloom_dir, 8)

        # bloom never misses a genuinely-seen url (zero false negatives)
        flagged = dedup.bloom_maybe_seen(cands, spec)
        missed = flagged.filter(
            (~F.col("maybe_seen")) & F.col("url_hash").isin(
                [urlkit.url_hash(u) for u in seen_urls[:300]]
            )
        )
        assert missed.count() == 0

        # end-to-end dedup is EXACT (bloom + confirm == plain anti-join)
        got = sorted(r["url"] for r in dedup.dedup_against_seen(cands, seen, spec).collect())
        want = sorted(set(new_urls))
        assert got == want

    def test_dedup_without_bloom_matches(self, spark):
        seen = _url_df(spark, [f"http://h/{i}" for i in range(100)])
        cands = _url_df(spark, [f"http://h/{i}" for i in range(50, 150)])
        got = sorted(r["url"] for r in dedup.dedup_against_seen(cands, seen).collect())
        assert got == sorted(f"http://h/{i}" for i in range(100, 150))

    def test_union_seen_exactly_once(self, spark):
        seen = _url_df(spark, ["http://h/a", "http://h/b"])
        new = _url_df(spark, ["http://h/b", "http://h/c"])
        assert dedup.union_seen(seen, new).count() == 3


class TestIncrementalBloom:
    P = 8

    def _split_by_pid(self, urls):
        by_pid = {}
        for u in urls:
            by_pid.setdefault(urlkit.url_hash(u) % self.P, []).append(u)
        return by_pid

    def test_update_touches_only_delta_partitions(self, spark, tmp_path):
        """Per-round Bloom cost must be ∝ |seen_new|: partitions with no new
        keys are carried as manifest POINTERS to the previous dir's files —
        nothing read, nothing written for them."""
        import os

        base = [f"http://h{i % 16}.ex/t/{i}" for i in range(800)]
        d0, d1 = str(tmp_path / "r0"), str(tmp_path / "r1")
        dedup.build_partitioned_bloom(_url_df(spark, base), d0, self.P)

        # new urls confined to exactly 2 partitions, sized within those
        # partitions' remaining fill budget (pow2 sizing -> variable headroom;
        # exceeding it is the separate rebuild path tested below)
        m0 = dedup._read_manifest(d0)
        headroom = {p: e["m_bits"] // 10 - e["n_items"] for p, e in m0.items()}
        keep_pids = sorted(headroom, key=lambda p: -headroom[p])[:2]
        by_pid = self._split_by_pid([f"http://h9.ex/new/{i}" for i in range(600)])
        delta_urls = [
            u
            for p in keep_pids
            for u in by_pid[p][: max(1, min(len(by_pid[p]), headroom[p] - 1))]
        ]
        keep_pids = sorted(keep_pids)
        stats = dedup.update_partitioned_bloom(
            _url_df(spark, delta_urls), d0, d1, self.P
        )
        assert sorted(stats["updated"] + stats["built"]) == keep_pids
        assert not stats["rebuilt"]
        assert sorted(stats["carried"]) == [p for p in range(self.P) if p not in keep_pids]

        spec = dedup.BloomSpec(d1, self.P)
        for pid in stats["carried"]:
            assert spec.blob_path(pid).startswith(d0)  # pointer, not a copy
            assert not os.path.exists(os.path.join(d1, f"bloom_{pid:05d}.npy"))
        for pid in keep_pids:
            assert spec.blob_path(pid).startswith(d1)

        # zero false negatives over base ∪ delta through the updated spec
        flagged = dedup.bloom_maybe_seen(_url_df(spark, base + delta_urls), spec)
        assert flagged.filter("NOT maybe_seen").count() == 0

    def test_overflow_triggers_partition_rebuild(self, spark, tmp_path):
        """Exceeding the bits_per_key fill budget rebuilds (and doubles) only
        the overflowing partitions from the full seen table."""
        d0, d1 = str(tmp_path / "r0"), str(tmp_path / "r1")
        small = [f"http://s.ex/{i}" for i in range(24)]  # tiny blobs (64-128 bits)
        dedup.build_partitioned_bloom(_url_df(spark, small), d0, self.P)
        m0 = {p: e["m_bits"] for p, e in dedup._read_manifest(d0).items()}

        grow = [f"http://g.ex/big/{i}" for i in range(3000)]
        full = _url_df(spark, small + grow)
        stats = dedup.update_partitioned_bloom(
            _url_df(spark, grow), d0, d1, self.P, seen_full=full
        )
        assert stats["rebuilt"], "fixture failed to overflow any partition"
        m1 = dedup._read_manifest(d1)
        for pid in stats["rebuilt"]:
            assert m1[pid]["m_bits"] > m0.get(pid, 0)

        spec = dedup.BloomSpec(d1, self.P)
        flagged = dedup.bloom_maybe_seen(full, spec)
        assert flagged.filter("NOT maybe_seen").count() == 0
        # end-to-end dedup through the incrementally-maintained spec is EXACT
        cands = _url_df(spark, small + [f"http://n.ex/{i}" for i in range(200)])
        got = sorted(
            r["url"] for r in dedup.dedup_against_seen(cands, full, spec).collect()
        )
        assert got == sorted(f"http://n.ex/{i}" for i in range(200))

    def test_manifestless_prev_dir_refused(self, spark, tmp_path):
        """Blobs without a manifest must be refused — updating blind would
        drop the old keys (false negatives)."""
        import numpy as np

        d0, d1 = str(tmp_path / "r0"), str(tmp_path / "r1")
        import os

        os.makedirs(d0)
        np.save(os.path.join(d0, "bloom_00000.npy"), np.zeros(8, dtype=np.uint8))
        with pytest.raises(ValueError, match="no manifest"):
            dedup.update_partitioned_bloom(
                _url_df(spark, ["http://x.ex/1"]), d0, d1, self.P
            )

    def test_rebuild_without_seen_full_raises(self, spark, tmp_path):
        d0, d1 = str(tmp_path / "r0"), str(tmp_path / "r1")
        small = [f"http://s.ex/{i}" for i in range(24)]
        dedup.build_partitioned_bloom(_url_df(spark, small), d0, self.P)
        grow = [f"http://g.ex/big/{i}" for i in range(3000)]
        with pytest.raises(ValueError, match="fill budget"):
            dedup.update_partitioned_bloom(_url_df(spark, grow), d0, d1, self.P)

    def test_rebuild_into_pointer_dir_never_writes_through_pointers(
        self, spark, tmp_path
    ):
        """Regression: a dir produced by update_partitioned_bloom holds a
        manifest whose untouched entries POINT to earlier rounds' blob files.
        Rebuilding into that dir used to resolve write paths through those
        pointers — silently overwriting the older rounds' blobs. Blobs must
        always land dir-local."""
        import os

        base = [f"http://h{i % 16}.ex/t/{i}" for i in range(400)]
        delta = ["http://h9.ex/new/0"]
        d0, d1 = str(tmp_path / "r0"), str(tmp_path / "r1")
        dedup.build_partitioned_bloom(_url_df(spark, base), d0, self.P)
        dedup.update_partitioned_bloom(_url_df(spark, delta), d0, d1, self.P)
        # d1's manifest carries pointers into d0 for untouched partitions
        assert any(
            e["path"].startswith(d0) for e in dedup._read_manifest(d1).values()
        )
        before = {
            f: open(os.path.join(d0, f), "rb").read()
            for f in os.listdir(d0)
            if f.endswith(".npy")
        }
        rebuilt_from = [f"http://other{i}.ex/x/{i}" for i in range(300)]
        dedup.build_partitioned_bloom(_url_df(spark, rebuilt_from), d1, self.P)
        after = {
            f: open(os.path.join(d0, f), "rb").read()
            for f in os.listdir(d0)
            if f.endswith(".npy")
        }
        assert before == after, "rebuild wrote through manifest pointers into d0"
        # d1 now stands alone: local paths only, correct membership
        m1 = dedup._read_manifest(d1)
        assert all(e["path"].startswith(d1) for e in m1.values())
        spec = dedup.BloomSpec(d1, self.P)
        flagged = dedup.bloom_maybe_seen(_url_df(spark, rebuilt_from), spec)
        assert flagged.filter("NOT maybe_seen").count() == 0


class TestPoliteness:
    def _frontier(self, spark):
        rows = []
        # hot host with 40 urls, two small hosts with 3 urls each
        for i in range(40):
            rows.append((f"http://hot.ex/t/{i}", "hot.ex", 1, i))
        for h in ("a.ex", "b.ex"):
            for i in range(3):
                rows.append((f"http://{h}/t/{i}", h, 1, i))
        return spark.createDataFrame(
            [(u, h, p, pn, urlkit.url_hash(u)) for u, h, p, pn in rows],
            "url string, host string, priority int, page_num int, url_hash long",
        )

    def test_budget_respected(self, spark):
        ranked = politeness.rank_fetch_slots(self._frontier(spark), budget=5)
        sched = ranked.filter("scheduled").groupBy("host").count().collect()
        counts = {r["host"]: r["count"] for r in sched}
        assert counts == {"hot.ex": 5, "a.ex": 3, "b.ex": 3}

    def test_deterministic_order_within_host(self, spark):
        ranked = politeness.rank_fetch_slots(self._frontier(spark), budget=5)
        rows = ranked.filter("host = 'hot.ex' and scheduled").orderBy("fetch_rank").collect()
        # order key is (priority, page_num, url_hash): page_num ascending here
        assert [r["page_num"] for r in rows] == [0, 1, 2, 3, 4]

    def test_modes_identical(self, spark):
        # single_pass (default), salted single_pass, group_limit (anti-join
        # deferred) and full_rank all produce the same scheduled set/ranks
        # and the same unscheduled membership
        f = self._frontier(spark)
        variants = {
            "single_pass": politeness.rank_fetch_slots(f, budget=5),
            "single_pass_salted": politeness.rank_fetch_slots(
                f, budget=5, salt_partitions=4
            ),
            "group_limit": politeness.rank_fetch_slots(f, budget=5, mode="group_limit"),
            "full_rank": politeness.rank_fetch_slots(f, budget=5, mode="full_rank"),
            "broadcast_topk": politeness.rank_fetch_slots(
                f, budget=5, mode="broadcast_topk"
            ),
        }
        sched = lambda df: sorted(
            (r["url"], r["fetch_rank"], r["slot"], r["wave"])
            for r in df.filter("scheduled").collect()
        )
        unsched = lambda df: sorted(
            r["url"] for r in df.filter("NOT scheduled").collect()
        )
        want_s, want_u = sched(variants["full_rank"]), unsched(variants["full_rank"])
        for name, df in variants.items():
            assert sched(df) == want_s, name
            assert unsched(df) == want_u, name
            assert df.count() == f.count(), name

    def test_salted_identical_schedule(self, spark):
        f = self._frontier(spark)
        plain = politeness.rank_fetch_slots(f, budget=5)
        salted = politeness.rank_fetch_slots(f, budget=5, salt_partitions=8)
        a = sorted(
            (r["url"], r["fetch_rank"]) for r in plain.filter("scheduled").collect()
        )
        b = sorted(
            (r["url"], r["fetch_rank"]) for r in salted.filter("scheduled").collect()
        )
        assert a == b

    def test_slots_and_waves(self, spark):
        ranked = politeness.rank_fetch_slots(self._frontier(spark), budget=12)
        rows = ranked.filter("host = 'hot.ex' and scheduled").orderBy("fetch_rank").collect()
        assert [r["slot"] for r in rows[:7]] == [0, 1, 2, 3, 4, 0, 1]
        assert [r["wave"] for r in rows[:7]] == [0, 0, 0, 0, 0, 1, 1]

    def test_window_group_limit_in_plan(self, spark):
        # Spark >=3.5 turns row_number<=k filters into WindowGroupLimit with
        # a map-side Partial mode — group_limit mode's hot-host defense.
        ranked = politeness.rank_fetch_slots(
            self._frontier(spark), budget=5, mode="group_limit"
        )
        plan = ranked.filter("fetch_rank <= 5")._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan

    def test_single_pass_plan_has_one_exchange_no_join(self, spark):
        """The default mode's whole point: ONE shuffle over the frontier,
        no anti-join reconstructing the deferred complement."""
        ranked = politeness.rank_fetch_slots(self._frontier(spark), budget=5)
        plan = ranked._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "Join" not in plan, plan

    def test_salted_single_pass_plan_has_no_join(self, spark):
        ranked = politeness.rank_fetch_slots(
            self._frontier(spark), budget=5, salt_partitions=8
        )
        plan = ranked._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, plan

    def test_broadcast_topk_plan_never_shuffles_frontier(self, spark):
        """broadcast_topk's whole point: the only shuffle Exchange carries
        the NARROW projection (through a WindowGroupLimit partial), and the
        frontier re-attaches via a broadcast hash join — the wide rows never
        cross an exchange."""
        ranked = politeness.rank_fetch_slots(
            self._frontier(spark), budget=5, mode="broadcast_topk"
        )
        plan = ranked._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        # exactly one shuffle exchange (the narrow rank); the broadcast
        # exchange is not a shuffle
        import re

        assert len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning", plan)) <= 1, plan
        # the shuffle exchange must not carry the url string column: only the
        # narrow projection (host/priority/page_num/url_hash) is ranked
        shuffle_lines = [
            l for l in plan.splitlines() if "Exchange" in l and "Broadcast" not in l
        ]
        assert shuffle_lines and all("url#" not in l for l in shuffle_lines), plan


class TestRobots:
    def test_parse(self):
        txt = """# comment
User-agent: *
Disallow: /private/
Disallow: /tmp
User-agent: evilbot
Disallow: /
"""
        assert robots.parse_robots_txt(txt) == ["/private/", "/tmp"]
        assert robots.parse_robots_txt(txt, "evilbot") == ["/"]

    def test_empty_disallow_allows_all(self):
        assert robots.parse_robots_txt("User-agent: *\nDisallow:\n") == []

    def test_nonrule_records_close_group(self):
        # An Allow or Crawl-delay record must end a user-agent run: agent
        # 'a' must NOT inherit b's Disallow (all three parsers agree).
        txt = "User-agent: a\nCrawl-delay: 5\nUser-agent: b\nDisallow: /x\n"
        assert robots.parse_robots_txt(txt, "a") == []
        assert robots.parse_robots_txt(txt, "b") == ["/x"]
        assert robots.parse_robots_rules(txt, "a") == []
        assert robots.parse_robots_rules(txt, "b") == [("/x", False)]
        assert robots.parse_crawl_delay(txt, "a") == 5
        assert robots.parse_crawl_delay(txt, "b") is None
        txt2 = "User-agent: a\nAllow: /ok\nUser-agent: b\nDisallow: /x\n"
        assert robots.parse_robots_txt(txt2, "a") == []
        assert robots.parse_robots_txt(txt2, "b") == ["/x"]

    def test_pathless_url_blocked_by_root_disallow(self, spark):
        # F.parse_url yields '' (not NULL) for http://host — the gates must
        # normalize both to '/' so 'Disallow: /' blocks pathless URLs,
        # matching the python twins (u.path or '/').
        frontier = _url_df(
            spark, ["http://a.ex", "http://a.ex/", "http://b.ex"]
        )
        rules = robots.robots_table(spark, {"a.ex": "User-agent: *\nDisallow: /"})
        got = sorted(r["url"] for r in robots.robots_gate(frontier, rules).collect())
        assert got == ["http://b.ex"]
        assert not robots.robots_allowed_py("http://a.ex", {"a.ex": ["/"]})
        full = robots.robots_rules_table(
            spark, {"a.ex": "User-agent: *\nDisallow: /"}
        )
        got_full = sorted(
            r["url"] for r in robots.robots_gate_full(frontier, full).collect()
        )
        assert got_full == ["http://b.ex"]
        assert not robots.robots_allowed_full_py(
            "http://a.ex", {"a.ex": [("/", False)]}
        )

    def test_gate(self, spark):
        frontier = _url_df(
            spark,
            [
                "http://a.ex/ok/1",
                "http://a.ex/private/2",
                "http://b.ex/private/3",  # b.ex has no rules -> allowed
            ],
        )
        rules = robots.robots_table(spark, {"a.ex": "User-agent: *\nDisallow: /private/"})
        got = sorted(r["url"] for r in robots.robots_gate(frontier, rules).collect())
        assert got == ["http://a.ex/ok/1", "http://b.ex/private/3"]
        # python twin agrees
        rdict = {"a.ex": ["/private/"]}
        assert robots.robots_allowed_py("http://a.ex/ok/1", rdict)
        assert not robots.robots_allowed_py("http://a.ex/private/2", rdict)
        assert robots.robots_allowed_py("http://b.ex/private/3", rdict)


class TestRobotsFullREP:
    """RFC 9309 / Google-spec matching: Allow precedence by longest match
    (allow wins ties), '*' any-sequence, trailing '$' end anchor."""

    TXT = """User-agent: *
Disallow: /shop
Allow: /shop/public
Disallow: /*.pdf
Disallow: /exact$
Allow: /dual
Disallow: /dual
"""

    def test_parse_keeps_allow_and_order(self):
        rules = robots.parse_robots_rules(self.TXT)
        assert ("/shop", False) in rules and ("/shop/public", True) in rules
        assert ("/*.pdf", False) in rules and ("/exact$", False) in rules

    @pytest.mark.parametrize(
        "path,allowed",
        [
            ("/shop/item1", False),  # Disallow /shop
            ("/shop/public/item", True),  # longer Allow carve-out wins
            ("/docs/file.pdf", False),  # '*' wildcard
            ("/docs/file.pdf.html", False),  # unanchored: matches anywhere
            ("/exact", False),  # '$' anchor hits exactly
            ("/exactly", True),  # ...but not a longer path
            ("/dual/x", True),  # equal-length tie -> allow wins
            ("/elsewhere", True),  # no rule -> allowed
        ],
    )
    def test_matching_py_twin(self, path, allowed):
        rules = {"a.ex": robots.parse_robots_rules(self.TXT)}
        assert robots.robots_allowed_full_py(f"http://a.ex{path}", rules) == allowed

    def test_gate_full_spark_agrees_with_twin(self, spark):
        paths = [
            "/shop/item1", "/shop/public/item", "/docs/file.pdf",
            "/exact", "/exactly", "/dual/x", "/elsewhere",
        ]
        frontier = _url_df(spark, [f"http://a.ex{p}" for p in paths])
        rules = robots.robots_rules_table(
            spark, {"a.ex": self.TXT}
        )
        got = sorted(
            r["url"] for r in robots.robots_gate_full(frontier, rules).collect()
        )
        pyrules = {"a.ex": robots.parse_robots_rules(self.TXT)}
        want = sorted(
            u for u in (f"http://a.ex{p}" for p in paths)
            if robots.robots_allowed_full_py(u, pyrules)
        )
        assert got == want
        assert "http://a.ex/shop/public/item" in got
        assert "http://a.ex/shop/item1" not in got

    def test_gate_full_plan_broadcasts_rules(self, spark):
        frontier = _url_df(spark, ["http://a.ex/x"])
        rules = robots.robots_rules_table(spark, {"a.ex": self.TXT})
        plan = (
            robots.robots_gate_full(frontier, rules)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


PRIORITY_CASES = [
    # (page, link, expected score)
    ("http://f.ex/threads/42/page3", "http://f.ex/threads/42/page4", 0),  # vb next
    ("http://f.ex/threads/42", "http://f.ex/threads/42/page2", 0),  # bare -> page2
    ("http://f.ex/board?page=2", "http://f.ex/board?page=3", 0),  # query next
    ("http://f.ex/board?a=1&page=2", "http://f.ex/board?a=1&page=9", 0),
    ("http://f.ex/threads/42/page3", "http://f.ex/threads/99", 1),  # same host
    ("http://f.ex/board?page=2", "http://f.ex/board?a=1&page=3", 1),  # query differs
    ("http://f.ex/t/1", "http://other.ex/t/1", 2),  # cross host
    ("http://f.ex/threads/42/page3", "http://f.ex/threads/42/page3", 1),  # self
]


class TestPriority:
    @pytest.mark.parametrize("page,link,score", PRIORITY_CASES)
    def test_python(self, page, link, score):
        assert priority.priority_score_py(page, link) == score

    def test_col_matches_python(self, spark):
        df = spark.createDataFrame(
            [(p, l) for p, l, _ in PRIORITY_CASES], "page string, link string"
        )
        rows = df.select(
            "page", "link", priority.priority_score_col("page", "link").alias("s")
        ).collect()
        for r in rows:
            assert r["s"] == priority.priority_score_py(r["page"], r["link"]), (
                r["page"], r["link"])


class TestHostBudgets:
    """Per-host budget overrides (Crawl-delay mapping) through the
    flag-style ranker."""

    def test_crawl_delay_parse(self):
        txt = "User-agent: *\nDisallow: /x\nCrawl-delay: 2.5\n"
        assert robots.parse_crawl_delay(txt) == 2.5
        assert robots.parse_crawl_delay("User-agent: *\nDisallow: /x\n") is None
        two = "User-agent: fast\nCrawl-delay: 1\nUser-agent: *\nCrawl-delay: 10\n"
        assert robots.parse_crawl_delay(two, "fast") == 1
        assert robots.parse_crawl_delay(two) == 10

    def test_crawl_delay_budgets_mapping(self, spark):
        txts = {
            "slow.ex": "User-agent: *\nCrawl-delay: 30\n",   # 60//30 = 2
            "glacial.ex": "User-agent: *\nCrawl-delay: 90\n",  # 60//90 = 0
            "fast.ex": "User-agent: *\nDisallow: /x\n",      # no delay: omitted
        }
        got = {
            r["host"]: r["budget"]
            for r in robots.crawl_delay_budgets(spark, txts, 5, 60.0).collect()
        }
        assert got == {"slow.ex": 2, "glacial.ex": 0}

    def test_override_changes_schedule_only_for_listed_hosts(self, spark):
        rows = [
            (h, 0, 0, i * 10 + j)
            for i, h in enumerate(["a.ex", "b.ex", "c.ex"])
            for j in range(4)
        ]
        f = spark.createDataFrame(
            rows, "host string, priority int, page_num int, url_hash long"
        )
        budgets = spark.createDataFrame(
            [("a.ex", 1), ("c.ex", 0)], "host string, budget int"
        )
        out = politeness.rank_fetch_slots(f, budget=2, host_budgets=budgets)
        sched = {
            h: sorted(r["url_hash"] for r in rs)
            for h, rs in __import__("itertools").groupby(
                sorted(out.filter("scheduled").collect(), key=lambda r: r["host"]),
                key=lambda r: r["host"],
            )
        }
        assert sched.get("a.ex") == [0]          # override 1
        assert sched.get("b.ex") == [10, 11]     # default 2
        assert "c.ex" not in sched               # override 0: fully deferred
        assert "_hb_budget" not in out.columns

    def test_override_rejected_outside_flag_modes(self, spark):
        f = spark.createDataFrame(
            [("a.ex", 0, 0, 1)], "host string, priority int, page_num int, url_hash long"
        )
        budgets = spark.createDataFrame([("a.ex", 1)], "host string, budget int")
        with pytest.raises(ValueError, match="flag-style"):
            politeness.rank_fetch_slots(
                f, budget=2, mode="broadcast_topk", host_budgets=budgets
            )
        with pytest.raises(ValueError, match="flag-style"):
            politeness.rank_fetch_slots(
                f, budget=2, mode="group_limit", host_budgets=budgets
            )

    def test_override_composes_with_salting(self, spark):
        # Crawl-delay × skew defense (round-3 verdict item 5): the salted
        # single-pass ranker with per-host budget columns is byte-identical
        # to the unsalted one — b(h) is constant within a host, so the
        # phase-1 pigeonhole prune stays exact with the broadcast column.
        # Overrides both BELOW (1, 0) and ABOVE (4) the default budget: an
        # above-default override is the case a default-literal prune in
        # phase 1 would get wrong.
        rows = [
            (h, 0, j % 3, i * 100 + j)
            for i, h in enumerate(["a.ex", "b.ex", "c.ex", "d.ex"])
            for j in range(9)
        ]
        f = spark.createDataFrame(
            rows, "host string, priority int, page_num int, url_hash long"
        )
        budgets = spark.createDataFrame(
            [("a.ex", 1), ("c.ex", 0), ("d.ex", 4)], "host string, budget int"
        )

        def key(df):
            return sorted(
                (r["host"], r["url_hash"], r["fetch_rank"], r["scheduled"],
                 r["slot"], r["wave"])
                for r in df.collect()
            )

        plain = key(politeness.rank_fetch_slots(f, budget=2, host_budgets=budgets))
        for s in (2, 4, 16):
            salted = key(politeness.rank_fetch_slots(
                f, budget=2, salt_partitions=s, host_budgets=budgets
            ))
            assert salted == plain, f"salt_partitions={s} diverged"
        n_by_host = {
            h: len([k for k in plain if k[0] == h and k[3]]) for h in
            ("a.ex", "b.ex", "c.ex", "d.ex")
        }
        assert n_by_host == {"a.ex": 1, "b.ex": 2, "c.ex": 0, "d.ex": 4}
