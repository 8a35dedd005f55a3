"""Streaming surface — intentionally batch.

The reference is a bounded batch loop (``/root/reference/libcrawl/
api.go:101-114``: a plain ``for`` over pager output), and the north_rule
specifies "each crawl round is a batch DataFrame job". Cross-round state
(frontier / seen / metrics) lives in snapshot-committed warehouse tables,
not in Structured Streaming state stores — see SURVEY.md §2.11 and
``bbcrawl_spark/plans/round.py``.

``micro_batch_rounds`` below is the thin adapter for deployments that want
the crawl driven by a streaming trigger anyway: each micro-batch executes
one crawl round (the round commit is the exactly-once barrier, so the
adapter adds no new semantics).
"""

from __future__ import annotations

from ..plans.round import CrawlDriver

__all__ = ["micro_batch_rounds"]


def micro_batch_rounds(driver: CrawlDriver, max_rounds: int | None = None):
    """Generator form of the crawl loop: yields each committed round's meta,
    suitable for wiring into foreachBatch-style schedulers. Resume-safe:
    constructing a new driver over the same warehouse continues the crawl."""
    driver.bootstrap()
    cap = max_rounds if max_rounds is not None else driver.cfg.max_rounds
    wh = driver.wh
    last = wh.last_committed_round()
    log = wh.round_log()
    if last is not None and log.get(str(last), {}).get("meta", {}).get("done"):
        return
    start = (last if last is not None else -1) + 1
    for r in range(start, cap):
        meta = driver.run_round(r)
        yield meta
        if meta["done"]:
            return
