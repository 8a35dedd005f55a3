"""End-to-end crawl equivalence: Spark round loop vs sequential oracle
(FIXTURES.md §D; north_star equality criteria — exact crawl order, final
seen set, byte-identical text — plus deterministic resume)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bbcrawl_spark import oracle
from bbcrawl_spark.operators.robots import parse_robots_txt
from bbcrawl_spark.plans.round import CrawlConfig, CrawlDriver
from bbcrawl_spark.sources.boardsite import make_board_site


@pytest.fixture(scope="module")
def site():
    return make_board_site(hosts=2, boards=2, threads=3, pages_per_thread=3)


@pytest.fixture(scope="module")
def pages_path(site, tmp_path_factory, spark):
    p = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    site.to_df(spark).write.mode("overwrite").parquet(p)
    return p


@pytest.fixture(scope="module")
def want(site):
    robots = {h: parse_robots_txt(t) for h, t in site.robots.items()}
    return oracle.crawl_oracle(
        pages=site.pages,
        seeds=site.seeds,
        budget=2,
        robots=robots,
        excludes=set(site.excludes),
        max_rounds=20,
    )


def _driver(spark, site, pages_path, wh_root, **kw):
    cfg = CrawlConfig(
        pages_path=pages_path,
        warehouse_root=str(wh_root),
        seeds=site.seeds,
        budget=kw.pop("budget", 2),
        max_rounds=kw.pop("max_rounds", 20),
        excludes=tuple(site.excludes),
        robots=site.robots,
        **kw,
    )
    return CrawlDriver(spark, cfg)


@pytest.fixture(scope="module")
def run(spark, site, pages_path, tmp_path_factory):
    """One full default-config crawl, shared by all read-back assertions."""
    drv = _driver(spark, site, pages_path, tmp_path_factory.mktemp("wh_main"))
    summary = drv.run()
    return drv, summary


def _order(drv):
    return [(r["round"], r["url"]) for r in drv.crawl_order().orderBy("rank").collect()]


class TestCrawlEquivalence:
    def test_done(self, run):
        assert run[1]["done"]

    def test_crawl_order_matches_oracle(self, run, want):
        assert _order(run[0]) == want.crawl_order

    def test_crawl_order_rank_is_long(self, run):
        # 10^10-row fetch logs overflow int32 — the rank must be a long or
        # offset+local-row-number silently wraps negative past 2^31.
        assert dict(run[0].crawl_order().dtypes)["rank"] == "bigint"

    def test_crawl_order_plan_has_no_global_window(self, run):
        # the former implementation ranked with Window.orderBy(...) and NO
        # partition key — every fetch_log row through one task; dead at scale
        plan = run[0].crawl_order()._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan
        assert "SinglePartition" not in plan, plan

    def test_seen_set_matches_oracle(self, run, want):
        got_seen = {r["url_hash"] for r in run[0].seen_set().collect()}
        assert got_seen == want.seen

    def test_text_byte_identical(self, run, want):
        got_texts = {r["url"]: r["text"] for r in run[0].fetched_texts().collect()}
        assert got_texts == want.texts

    def test_robots_and_excludes_enforced(self, run, site):
        urls = [r["url"] for r in run[0].crawl_order().collect()]
        assert all("/b0/secret" not in u for u in urls)
        assert all(u not in site.excludes for u in urls)

    def test_crawl_output_feeds_curation_chain(self, run):
        """System integration: the crawl's fetched texts flow straight into
        the training-data curation operators — the 100-TB pipeline this
        engine exists for (crawl -> quality -> langid -> dedup -> repetition
        signals) runs end-to-end on real crawl output, not synthetic docs."""
        from bbcrawl_spark.operators import textops

        texts = run[0].fetched_texts().withColumnRenamed("url", "doc_url")
        docs = texts.selectExpr("xxhash64(doc_url) AS doc_id", "text")
        n = docs.count()
        assert n > 0
        scored = textops.repetition_stats(
            textops.langid(textops.quality_score(docs))
        )
        rows = scored.collect()
        assert len(rows) == n
        assert {"q_keep", "lang_pred", "r_n_lines"} <= set(rows[0].asDict())
        deduped = textops.exact_dedup(docs).count()
        assert 0 < deduped <= n
        cleaned = textops.strip_boilerplate_lines(docs, max_line_df=n)
        assert cleaned.count() == n  # cap above corpus size: nothing stripped

    def test_budget_enforced_every_round(self, run):
        per = (
            run[0]._last("fetch_log")
            .groupBy("round", "host")
            .agg(F.count("*").alias("n"))
            .agg(F.max("n"))
            .first()[0]
        )
        assert per <= 2

    def test_metrics_lineage(self, run, want):
        m = run[0].metrics().toPandas()
        assert set(m.columns) == {
            "round", "partition_id", "n_scheduled", "n_fetched", "n_new_links"
        }
        per_round = m.groupby("round")["n_scheduled"].sum().to_dict()
        for om in want.metrics:
            assert per_round.get(om["round"], 0) == om["n_scheduled"]

    def test_bloom_path_identical(self, spark, site, pages_path, tmp_path, want):
        drv = _driver(spark, site, pages_path, tmp_path / "whb", bloom_partitions=4)
        drv.run()
        assert _order(drv) == want.crawl_order
        assert {r["url_hash"] for r in drv.seen_set().collect()} == want.seen

    def test_salted_politeness_identical(self, spark, site, pages_path, tmp_path, want):
        drv = _driver(spark, site, pages_path, tmp_path / "whs", salt_partitions=4)
        drv.run()
        assert _order(drv) == want.crawl_order


class TestCrawlerFamilies:
    def test_vb_downloads_table(self, spark, site, pages_path, tmp_path, want):
        """crawler='vb-attachments' emits the downloads table the reference
        would have fetched — byte-identical naming per fetched page."""
        from bbcrawl_spark import extract
        from bbcrawl_spark.htmlkit import decode_html

        drv = _driver(spark, site, pages_path, tmp_path / "whd", crawler="vb-attachments")
        drv.run()
        got = {
            (r["page_url"], r["post_id"], r["att_id"]): r["out_name"]
            for r in drv.downloads().filter("err = ''").collect()
        }
        expected = {}
        for url in want.texts:  # = exactly the fetched pages
            html = decode_html(site.pages[url], "text/html; charset=utf-8")
            for f in extract.extract_vb_attachments(html, url):
                if not f.err:
                    expected[(url, f.post_id, f.att_id)] = f.out_name
        assert got == expected
        assert len(expected) > 0

    def test_vb_headernames_downloads(self, spark, tmp_path):
        """-names-from-header end-to-end: '{postid}-{attid}' prefixes are
        completed from each attachment URL's Content-Disposition header
        (afterdownload.go:27-46), with the reference's two error classes for
        missing vs malformed headers — matched against the pure-Python twin."""
        from bbcrawl_spark import extract
        from bbcrawl_spark.htmlkit import decode_html
        from bbcrawl_spark.operators.robots import parse_robots_txt

        hsite = make_board_site(
            hosts=1, boards=2, threads=2, pages_per_thread=2, attachment_pages=True
        )
        pages_path = str(tmp_path / "hpages.parquet")
        hsite.to_df(spark).write.mode("overwrite").parquet(pages_path)
        robots = {h: parse_robots_txt(t) for h, t in hsite.robots.items()}
        want = oracle.crawl_oracle(
            pages=hsite.pages, seeds=hsite.seeds, budget=2, robots=robots,
            excludes=set(hsite.excludes), max_rounds=20,
        )
        drv = _driver(
            spark, hsite, pages_path, tmp_path / "whh",
            crawler="vb-attachments", headernames=True,
        )
        drv.run()
        got = {
            (r["page_url"], r["post_id"], r["att_id"]): (r["out_name"], r["err"])
            for r in drv.downloads().collect()
        }
        expected = {}
        for url in want.texts:
            if "/att/" in url:
                continue  # attachment blobs carry no posts div
            html = decode_html(hsite.pages[url], "text/html; charset=utf-8")
            for f in extract.extract_vb_attachments(html, url, headernames=True):
                if f.err:
                    expected[(url, f.post_id, f.att_id)] = ("", f.err)
                else:
                    name, err = extract.complete_headername(
                        f.out_name, hsite.headers.get(f.abs_url)
                    )
                    expected[(url, f.post_id, f.att_id)] = (name, err)
        assert got == expected
        # the fixture must exercise all three branches
        names = [v[0] for v in expected.values()]
        errs = [v[1] for v in expected.values()]
        assert any(n for n in names), "no completed header name in fixture"
        assert any(e == extract.NO_HEADER_FIELD_ERR for e in errs)
        assert any(e.startswith("malformed filename") for e in errs)

    def test_file_crawler_downloads(self, spark, site, pages_path, tmp_path):
        drv = _driver(
            spark, site, pages_path, tmp_path / "whf",
            crawler="file", follow_links=False,
        )
        drv.run()
        rows = drv.downloads().collect()
        # every scheduled seed is one download named "{page} - {name}"
        assert {r["page_url"] for r in rows} == {u for u, _, _ in site.seeds}
        for r in rows:
            assert r["out_name"].startswith(f"{r['page_num']} - ")


class TestCharsetAndRedirects:
    def _site_run(self, spark, tmp_path, name, want_kw=None, drv_kw=None, **site_kw):
        hsite = make_board_site(hosts=2, boards=2, threads=2, pages_per_thread=3, **site_kw)
        pages_path = str(tmp_path / f"{name}.parquet")
        hsite.to_df(spark).write.mode("overwrite").parquet(pages_path)
        robots = {h: parse_robots_txt(t) for h, t in hsite.robots.items()}
        want = oracle.crawl_oracle(
            pages=hsite.pages, seeds=hsite.seeds, budget=2, robots=robots,
            excludes=set(hsite.excludes), max_rounds=20, **(want_kw or {}),
        )
        drv = _driver(spark, hsite, pages_path, tmp_path / f"wh_{name}", **(drv_kw or {}))
        drv.run()
        return hsite, want, drv

    def test_mixed_charset_byte_identical(self, spark, tmp_path):
        """F10 end-to-end: cp1252 (Content-Type), BOM'd UTF-8 and
        <meta charset> pages, umlaut text — extracted text byte-identical
        to the oracle through the whole crawl loop."""
        hsite, want, drv = self._site_run(
            spark, tmp_path, "cs", charset_mix=True,
            want_kw={"content_types": None},  # placeholder, replaced below
        )
        # rebuild the oracle WITH content_types (self._site_run default has none)
        robots = {h: parse_robots_txt(t) for h, t in hsite.robots.items()}
        want = oracle.crawl_oracle(
            pages=hsite.pages, seeds=hsite.seeds, budget=2, robots=robots,
            excludes=set(hsite.excludes), max_rounds=20,
            content_types=hsite.content_types,
        )
        got_texts = {r["url"]: r["text"] for r in drv.fetched_texts().collect()}
        assert got_texts == want.texts
        # the fixture must actually exercise non-UTF-8 text
        assert any("Grüße" in t for t in got_texts.values())
        assert _order(drv) == want.crawl_order

    @pytest.mark.parametrize("allow", [True, False])
    def test_redirect_policy_in_gates(self, spark, tmp_path, allow):
        """P6: Log (cap 10) vs Deny (any redirect) gate fetches in the round
        loop; blocked pages stay seen but yield no text/links — matched
        against the oracle under the same policy."""
        hsite, want, drv = self._site_run(
            spark, tmp_path, f"rd{int(allow)}", redirect_pages=True,
            want_kw={"redirects": None, "allow_redirect": allow},
            drv_kw={"allow_redirect": allow},
        )
        robots = {h: parse_robots_txt(t) for h, t in hsite.robots.items()}
        want = oracle.crawl_oracle(
            pages=hsite.pages, seeds=hsite.seeds, budget=2, robots=robots,
            excludes=set(hsite.excludes), max_rounds=20,
            redirects=hsite.redirects, allow_redirect=allow,
        )
        got_texts = {r["url"]: r["text"] for r in drv.fetched_texts().collect()}
        assert got_texts == want.texts
        assert _order(drv) == want.crawl_order
        assert {r["url_hash"] for r in drv.seen_set().collect()} == want.seen
        blocked_12 = "http://forum0.example/b1/t1"  # (b,t,p)=(1,1,1), n=12
        assert blocked_12 not in got_texts
        log_only = "http://forum0.example/b1/t0/page2"  # n=3
        if allow:
            # Log policy: 3 redirects pass (page is reachable via links)
            assert hsite.redirects[log_only] == 3
        else:
            assert log_only not in got_texts


class TestSeedPageNum:
    def test_pager_page_num_carried_into_seed_frontier(self, spark, tmp_path):
        """Query-pager seeds (?page=N) have no '/pageN' suffix; the pager's
        PageNum() must ride into the frontier, not a re-derived 0
        (pagers.go:49-51 — PageNum is the crawler's naming/order input)."""
        from bbcrawl_spark.plans.round import CrawlConfig, CrawlDriver

        seeds = [(f"http://h.ex/f?page={p}", p - 1, 0, p) for p in (1, 2, 3)]
        cfg = CrawlConfig(
            pages_path=str(tmp_path / "nopages"), warehouse_root=str(tmp_path / "wh"),
            seeds=seeds,
        )
        drv = CrawlDriver(spark, cfg)
        drv.bootstrap()
        rows = {r["url"]: r["page_num"] for r in drv._pinned(-1, "frontier").collect()}
        assert rows == {f"http://h.ex/f?page={p}": p for p in (1, 2, 3)}

    def test_three_tuple_seeds_still_derive(self, spark, tmp_path):
        from bbcrawl_spark.plans.round import CrawlConfig, CrawlDriver

        cfg = CrawlConfig(
            pages_path=str(tmp_path / "nopages"), warehouse_root=str(tmp_path / "wh2"),
            seeds=[("http://h.ex/t/page7", 0, 0), ("http://h.ex/f?page=3", 1, 0)],
        )
        drv = CrawlDriver(spark, cfg)
        drv.bootstrap()
        rows = {r["url"]: r["page_num"] for r in drv._pinned(-1, "frontier").collect()}
        assert rows["http://h.ex/t/page7"] == 7
        assert rows["http://h.ex/f?page=3"] == 0  # heuristic: suffix only


class TestCliPageNum:
    def test_query_pager_page_num_drives_src_names(self, spark, tmp_path):
        """Full CLI path: with a query pager (?page=N) the src-crawler output
        names must be '{pager_page}-{fileid}.{suffix}' — before the fix every
        seed re-derived page_num 0 from the URL (no '/pageN' suffix) and the
        reference's names (pagers.go:49-51) were wrong."""
        from bbcrawl_spark.__main__ import main
        from bbcrawl_spark.sources.warehouse import Warehouse

        rows = []
        for p in (1, 2, 3):
            url = f"http://gal.example/view?page={p}"
            html = f'<html><body><img src="/pics/img{p}.jpg"></body></html>'
            rows.append((url, html.encode()))
        pages = str(tmp_path / "pages.parquet")
        spark.createDataFrame(rows, "url string, html binary").write.parquet(pages)
        wh = str(tmp_path / "wh")
        rc = main([
            "--pages", pages, "--warehouse", wh, "--no-follow-links",
            "--bbcrawl", "-pager", "query", "-start", "1", "-end", "3",
            "-crawler", "src", "-tags", "img", "http://gal.example/view",
        ])
        assert rc == 0
        w = Warehouse(spark, wh)
        got = {
            r["page_url"]: (r["page_num"], r["out_name"])
            for r in w.read("downloads").collect()
        }
        assert got == {
            f"http://gal.example/view?page={p}": (p, f"{p}-1.jpg") for p in (1, 2, 3)
        }


class TestResume:
    def test_kill_and_resume_identical_final_state(
        self, spark, site, pages_path, tmp_path, want
    ):
        wh = tmp_path / "whr"
        d1 = _driver(spark, site, pages_path, wh)
        d1.run(max_rounds=2)  # stop mid-crawl ("kill")
        assert d1.wh.last_committed_round() == 1
        d2 = _driver(spark, site, pages_path, wh)  # fresh driver resumes
        summary = d2.run()
        assert summary["done"]
        assert _order(d2) == want.crawl_order
        assert {r["url_hash"] for r in d2.seen_set().collect()} == want.seen

    def test_kill_and_resume_with_incremental_bloom(
        self, spark, site, pages_path, tmp_path, want
    ):
        """Resume must continue the incremental Bloom chain from the
        round-log-pinned bloom_dir (manifest pointers across round dirs)."""
        wh = tmp_path / "whrb"
        d1 = _driver(spark, site, pages_path, wh, bloom_partitions=4)
        d1.run(max_rounds=2)
        d2 = _driver(spark, site, pages_path, wh, bloom_partitions=4)
        d2.run()
        assert _order(d2) == want.crawl_order
        assert {r["url_hash"] for r in d2.seen_set().collect()} == want.seen

    def test_crash_mid_round_resume_identical(
        self, spark, site, pages_path, tmp_path, want
    ):
        """Crash AFTER some snapshot writes but BEFORE the round commit:
        the orphan snapshots must be invisible to resume (round-log pinning)
        and the final state identical to an uninterrupted run."""
        wh = tmp_path / "whc"
        d1 = _driver(spark, site, pages_path, wh)
        d1.run(max_rounds=2)
        # simulate a crashed round 2: tables written, commit_round never ran
        junk = spark.createDataFrame(
            [("http://junk.example/x", 1, "junk.example", 0, 0, 0, 1)],
            "url string, url_hash long, host string, priority int, "
            "page_num int, seed_id long, discovered_in int",
        )
        d1.wh.write("frontier", junk)  # orphan overwrite snapshot
        d1.wh.append("seen", junk.select("url_hash"))  # orphan append
        assert d1.wh.last_committed_round() == 1  # commit barrier intact
        d2 = _driver(spark, site, pages_path, wh)
        d2.run()
        got_order = [
            (r["round"], r["url"]) for r in d2.crawl_order().orderBy("rank").collect()
        ]
        assert got_order == want.crawl_order
        assert {r["url_hash"] for r in d2.seen_set().collect()} == want.seen

    def test_maintenance_crawl_identical_and_bounded_dirs(
        self, spark, site, pages_path, tmp_path, want
    ):
        """Compaction + expiry on (the 100s-of-rounds reader-fanout defense):
        the crawl result is identical, the seen table reads through O(compact
        _every) dirs instead of O(rounds), pre-retention snapshots and stale
        bloom round dirs are gone from disk."""
        import os

        wh = tmp_path / "whm"
        drv = _driver(
            spark, site, pages_path, wh,
            bloom_partitions=4, compact_every=2, expire_keep_rounds=1,
        )
        summary = drv.run()
        assert summary["done"]
        assert _order(drv) == want.crawl_order
        assert {r["url_hash"] for r in drv.seen_set().collect()} == want.seen
        last = drv.wh.last_committed_round()
        assert last >= 3  # maintenance actually cycled
        # bounded read fan-out: current seen chain ≤ compact_every dirs
        man = drv.wh._manifest("seen")
        cur_dirs = man["snapshots"][man["current"]]["dirs"]
        assert len(cur_dirs) <= 2
        # pre-retention snapshots expired (round 0's pin no longer readable)
        old_sid = drv.wh.round_snapshot(0, "seen")
        assert old_sid not in man["snapshots"]
        # stale bloom round dirs deleted; kept manifests resolve only live blobs
        bloom_base = os.path.join(str(wh), "bloom")
        from bbcrawl_spark.operators import dedup as _dedup

        kept_bloom = drv.wh.round_snapshot(last, "bloom_dir")
        for e in _dedup._read_manifest(kept_bloom).values():
            assert os.path.exists(e["path"])
        assert len(os.listdir(bloom_base)) <= last + 1

    def test_resume_after_expiry_identical(
        self, spark, site, pages_path, tmp_path, want
    ):
        """Kill mid-crawl with maintenance on — the expiry has already
        deleted pre-resume snapshots — then resume from the round-log pins."""
        wh = tmp_path / "whme"
        d1 = _driver(
            spark, site, pages_path, wh,
            bloom_partitions=4, compact_every=2, expire_keep_rounds=1,
        )
        d1.run(max_rounds=2)
        assert d1.wh.last_committed_round() == 1
        # round 0's snapshots are expired by now
        assert d1.wh.round_snapshot(0, "seen") not in d1.wh._manifest("seen")["snapshots"]
        d2 = _driver(
            spark, site, pages_path, wh,
            bloom_partitions=4, compact_every=2, expire_keep_rounds=1,
        )
        summary = d2.run()
        assert summary["done"]
        assert _order(d2) == want.crawl_order
        assert {r["url_hash"] for r in d2.seen_set().collect()} == want.seen

    def test_rerun_after_done_is_noop(self, run, spark, site, pages_path):
        drv, s1 = run
        d2 = _driver(spark, site, pages_path, drv.cfg.warehouse_root)
        s2 = d2.run()
        assert s1 == s2


class TestRobotsFullE2E:
    def test_full_rep_crawl_identical_to_oracle(
        self, spark, site, pages_path, tmp_path
    ):
        """robots_full=True: Allow carve-out under a Disallow + '*' wildcard
        flow through the round loop and match the sequential oracle's full-REP
        twin exactly (crawl order + seen set)."""
        from bbcrawl_spark.operators.robots import parse_robots_rules

        robots_txts = {
            # block board 1 except thread 0 — the cross-board entry link
            # targets t0, so the carve-out is reachable while its sibling
            # threads (linked only FROM t0's pages) stay blocked
            "forum0.example": "User-agent: *\nDisallow: /b1\nAllow: /b1/t0\n"
            "Disallow: /b0/secret\n",
            # wildcard: block thread 2 on EVERY board of host 1
            "forum1.example": "User-agent: *\nDisallow: /b*/t2\n"
            "Disallow: /b0/secret\n",
        }
        full_rules = {h: parse_robots_rules(t) for h, t in robots_txts.items()}
        want = oracle.crawl_oracle(
            pages=site.pages,
            seeds=site.seeds,
            budget=2,
            robots_full_rules=full_rules,
            excludes=set(site.excludes),
            max_rounds=20,
        )
        cfg = CrawlConfig(
            pages_path=pages_path,
            warehouse_root=str(tmp_path / "wh_rf"),
            seeds=site.seeds,
            budget=2,
            max_rounds=20,
            excludes=tuple(site.excludes),
            robots=robots_txts,
            robots_full=True,
        )
        drv = CrawlDriver(spark, cfg)
        drv.run()
        assert _order(drv) == want.crawl_order
        assert {r["url_hash"] for r in drv.seen_set().collect()} == want.seen
        urls = [u for _, u in want.crawl_order]
        # the carve-out is reachable, its siblings are not (non-vacuous)
        assert any("forum0.example/b1/t0" in u for u in urls)
        assert not any("forum0.example/b1/t1" in u for u in urls)
        assert not any("forum0.example/b1/t2" in u for u in urls)
        assert not any("forum1.example" in u and "/t2" in u for u in urls)


class TestStreamingAdapter:
    """§2.11: the micro-batch adapter drives the same rounds with the same
    commit barrier — including a mid-stream kill + resume — and can be wired
    into a real Structured Streaming foreachBatch trigger."""

    @pytest.fixture()
    def msite(self):
        return make_board_site(hosts=1, boards=1, threads=2, pages_per_thread=2)

    def test_generator_rounds_with_midstream_resume(
        self, spark, msite, tmp_path
    ):
        from bbcrawl_spark.streaming import micro_batch_rounds

        pages = str(tmp_path / "pages")
        msite.to_df(spark).write.parquet(pages)
        robots = {h: parse_robots_txt(t) for h, t in msite.robots.items()}
        want = oracle.crawl_oracle(
            pages=msite.pages, seeds=msite.seeds, budget=2,
            robots=robots, excludes=set(msite.excludes), max_rounds=20,
        )

        def mk():
            return CrawlDriver(spark, CrawlConfig(
                pages_path=pages, warehouse_root=str(tmp_path / "wh"),
                seeds=msite.seeds, budget=2, max_rounds=20,
                excludes=tuple(msite.excludes), robots=msite.robots,
            ))

        gen = micro_batch_rounds(mk())
        first = next(gen)  # one micro-batch, then 'kill' the stream
        assert first["round"] == 0
        metas = list(micro_batch_rounds(mk()))  # new driver resumes
        assert metas and metas[-1]["done"]
        assert [m["round"] for m in metas][0] == 1  # no round re-ran
        drv = mk()
        assert _order(drv) == want.crawl_order
        assert {r["url_hash"] for r in drv.seen_set().collect()} == want.seen

    def test_foreachbatch_trigger_drives_rounds(self, spark, msite, tmp_path):
        """A real readStream rate source triggers the crawl: each streaming
        micro-batch advances one round via the adapter generator."""
        from bbcrawl_spark.streaming import micro_batch_rounds

        pages = str(tmp_path / "pages")
        msite.to_df(spark).write.parquet(pages)
        drv = CrawlDriver(spark, CrawlConfig(
            pages_path=pages, warehouse_root=str(tmp_path / "whs"),
            seeds=msite.seeds, budget=2, max_rounds=20,
            excludes=tuple(msite.excludes), robots=msite.robots,
        ))
        gen = micro_batch_rounds(drv)
        done = {"v": False}

        def one_round(_df, _bid):
            if not done["v"]:
                meta = next(gen, None)
                if meta is None or meta["done"]:
                    done["v"] = True

        q = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .writeStream.foreachBatch(one_round)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            import time as _t

            deadline = _t.time() + 120
            while not done["v"] and _t.time() < deadline:
                _t.sleep(0.5)
        finally:
            q.stop()
        assert done["v"], "stream never finished the crawl"
        robots = {h: parse_robots_txt(t) for h, t in msite.robots.items()}
        want = oracle.crawl_oracle(
            pages=msite.pages, seeds=msite.seeds, budget=2,
            robots=robots, excludes=set(msite.excludes), max_rounds=20,
        )
        assert _order(drv) == want.crawl_order


class TestCrawlDelayE2E:
    def test_crawl_delay_budgets_flow_through_rounds(self, spark, tmp_path):
        """crawl_delay_round_seconds>0: a host with Crawl-delay gets a
        reduced per-round budget, engine ≡ oracle on order and seen set."""
        from bbcrawl_spark.operators.robots import (
            crawl_delay_budgets, parse_robots_txt,
        )

        site = make_board_site(hosts=2, boards=2, threads=3, pages_per_thread=2)
        # host 1 asks for 45s between fetches; at 60s rounds that is budget 1
        site.robots["forum1.example"] += "Crawl-delay: 45\n"
        pages = str(tmp_path / "pages")
        site.to_df(spark).write.parquet(pages)

        robots = {h: parse_robots_txt(t) for h, t in site.robots.items()}
        hb = {
            r["host"]: r["budget"]
            for r in crawl_delay_budgets(spark, site.robots, 2, 60.0).collect()
        }
        assert hb == {"forum1.example": 1}  # non-vacuous override
        want = oracle.crawl_oracle(
            pages=site.pages, seeds=site.seeds, budget=2,
            robots=robots, excludes=set(site.excludes),
            host_budgets=hb, max_rounds=30,
        )
        drv = CrawlDriver(spark, CrawlConfig(
            pages_path=pages, warehouse_root=str(tmp_path / "wh"),
            seeds=site.seeds, budget=2, max_rounds=30,
            excludes=tuple(site.excludes), robots=site.robots,
            crawl_delay_round_seconds=60.0,
        ))
        drv.run()
        assert _order(drv) == want.crawl_order
        assert {r["url_hash"] for r in drv.seen_set().collect()} == want.seen
        # the delayed host never exceeds 1 fetch in any round
        per = (
            drv._last("fetch_log")
            .filter(F.col("host") == "forum1.example")
            .groupBy("round").agg(F.count("*").alias("n"))
            .agg(F.max("n")).first()[0]
        )
        assert per == 1

    def test_crawl_delay_composes_with_salted_politeness(self, spark, tmp_path):
        """Round-4 fix: Crawl-delay budgets no longer exclude the salted
        ranker — the hot-host skew defense and Crawl-delay honoring run in
        the SAME crawl, still byte-identical to the sequential oracle."""
        from bbcrawl_spark.operators.robots import (
            crawl_delay_budgets, parse_robots_txt,
        )

        site = make_board_site(hosts=2, boards=2, threads=3, pages_per_thread=2)
        site.robots["forum1.example"] += "Crawl-delay: 45\n"
        pages = str(tmp_path / "pages")
        site.to_df(spark).write.parquet(pages)

        robots = {h: parse_robots_txt(t) for h, t in site.robots.items()}
        hb = {
            r["host"]: r["budget"]
            for r in crawl_delay_budgets(spark, site.robots, 2, 60.0).collect()
        }
        assert hb == {"forum1.example": 1}
        want = oracle.crawl_oracle(
            pages=site.pages, seeds=site.seeds, budget=2,
            robots=robots, excludes=set(site.excludes),
            host_budgets=hb, max_rounds=30,
        )
        drv = CrawlDriver(spark, CrawlConfig(
            pages_path=pages, warehouse_root=str(tmp_path / "wh"),
            seeds=site.seeds, budget=2, max_rounds=30,
            excludes=tuple(site.excludes), robots=site.robots,
            crawl_delay_round_seconds=60.0, salt_partitions=4,
        ))
        drv.run()
        assert _order(drv) == want.crawl_order
        assert {r["url_hash"] for r in drv.seen_set().collect()} == want.seen
