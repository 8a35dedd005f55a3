"""spark-submit job entry: ``spark-submit --py-files bbcrawl_spark.zip
-m?`` … or ``spark-submit scripts/run_crawl.py`` (see scripts/submit.sh).

Usage (module form, driver-side):
    python -m bbcrawl_spark --pages PATH --warehouse PATH \
        --seed URL [--seed URL ...] [--budget N] [--rounds N] \
        [--bloom-partitions P] [--salt-partitions S] [--exclude URL ...]

Also accepts the reference's own CLI grammar after ``--bbcrawl``:
    python -m bbcrawl_spark --pages ... --warehouse ... \
        --bbcrawl -pager vb4 -start 1 -end 10 -crawler vb-attachments URL
(the pager expands to the seed frontier; the crawler spec selects the
extraction family).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)

    bbcrawl_args: list[str] | None = None
    if "--bbcrawl" in argv:
        i = argv.index("--bbcrawl")
        bbcrawl_args = ["bbcrawl", *argv[i + 1 :]]
        argv = argv[:i]

    ap = argparse.ArgumentParser(prog="bbcrawl_spark")
    ap.add_argument("--pages", required=True, help="pages table path (parquet/Iceberg)")
    ap.add_argument(
        "--warehouse",
        default="",
        help="crawl state root (defaults to the reference -o output dir "
        "when given after --bbcrawl)",
    )
    ap.add_argument("--seed", action="append", default=[], help="seed URL (repeatable)")
    ap.add_argument("--budget", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=100)
    ap.add_argument("--bloom-partitions", type=int, default=0)
    ap.add_argument("--salt-partitions", type=int, default=0)
    ap.add_argument("--exclude", action="append", default=[])
    ap.add_argument("--no-follow-links", action="store_true")
    ap.add_argument("--cores", type=int, default=None, help="local mode cores (omit on a cluster)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from .plans.round import CrawlConfig, CrawlDriver

    seeds = [(u, i, 0) for i, u in enumerate(args.seed)]
    excludes = tuple(args.exclude)

    # Under spark-submit a session already exists / is configured by the
    # submitter; build_session is the local-mode convenience.
    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    elif args.cores:
        from .plans.session import build_session

        spark = build_session(cores=args.cores)
    else:
        spark = SparkSession.builder.getOrCreate()

    crawler_kind = ""
    headernames = False
    allow_redirect = True
    tags: tuple[str, ...] = ("audio", "img", "video")
    attrs: tuple[tuple[str, str], ...] = ()
    warehouse_root = args.warehouse
    if bbcrawl_args is not None:
        from . import cmdline, pagers

        pager_spec, crawler_spec, glob = cmdline.parse_command(bbcrawl_args)
        # -o (the reference output dir, libcrawl/api.go:57-67) is where every
        # crawler writes its downloads — here, the warehouse root holding the
        # downloads table. --warehouse (engine-native) wins when both given.
        if not warehouse_root:
            warehouse_root = glob["output"]
        if glob["loglevel"]:
            spark.sparkContext.setLogLevel(glob["loglevel"])
        # carry the pager's PageNum() into the seed frontier — re-deriving it
        # from a '/pageN' suffix is wrong for the query/cutter pagers, and
        # page_num is the seed tiebreak in the per-host crawl order (for all
        # three pagers page_num is monotone in emission order, so ordering by
        # it reproduces the pager's emission order exactly)
        seeds = [
            (u, i, 0, pn)
            for i, (_ord, pn, u) in enumerate(pagers.pager_sequence(pager_spec))
        ]
        excludes = excludes + tuple(crawler_spec.excludes)
        crawler_kind = crawler_spec.kind
        headernames = crawler_spec.headernames
        allow_redirect = crawler_spec.allow_redirect
        if crawler_spec.tags:
            tags = crawler_spec.tags
        attrs = crawler_spec.attrs

    if not warehouse_root:
        ap.error("--warehouse (or a reference -o output dir) is required")
    cfg = CrawlConfig(
        pages_path=args.pages,
        warehouse_root=warehouse_root,
        seeds=seeds,
        budget=args.budget,
        max_rounds=args.rounds,
        bloom_partitions=args.bloom_partitions,
        salt_partitions=args.salt_partitions,
        excludes=excludes,
        follow_links=not args.no_follow_links,
        crawler=crawler_kind,
        headernames=headernames,
        allow_redirect=allow_redirect,
        tags=tags,
        attrs=attrs,
    )
    summary = CrawlDriver(spark, cfg).run()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
