"""Per-host politeness scheduling: window-ranked fetch-slot assignment.

The reference bounds fetch concurrency with a 5-slot goroutine pool whose
``Dispatch`` spin-waits for a free slot (``/root/reference/libcrawl/
download/downloader.go:38-70, 232-238``; ``DEFAULT_DL_JOBS = 5``,
``libcrawl/api.go:17``).  Spark-native, "at most B fetches per host per
round" becomes a ranking window: rows ranked per host by the deterministic
crawl-order key; ranks ≤ budget are scheduled this round, the rest spill to
the next round's frontier (W1/O4 in SURVEY.md §2.6-2.7).

Hot-host skew (north_rule): one host holding 10^8 frontier URLs would pin a
single reducer. Two defenses, composable:

* Spark ≥3.5 rewrites ``row_number() <= k`` into ``WindowGroupLimit`` with a
  map-side partial limit, so each *input* partition forwards at most k rows
  per host into the shuffle — verified in tests via the physical plan.
* An explicit **salted pre-rank** (``salt = pmod(url_hash, S)``): rank per
  (host, salt) first and keep ≤ budget per salt — a superset of the true
  per-host top-budget (any row in the host's global top-B is in its salt's
  top-B) — then re-rank the ≤ S·B survivors per host. The salt splits
  *volume*, never reorders *within* a host: the ordering key is identical in
  both phases, so the final schedule is byte-identical to the unsalted one
  (asserted by tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rank_fetch_slots", "DEFAULT_ORDER_COLS", "DEFAULT_CONCURRENCY"]

#: deterministic crawl-order key replacing every racy reference counter
#: (A1 global download id, goroutine completion order): priority score
#: first (W3), then pager page order, then stable hash tiebreak.
DEFAULT_ORDER_COLS = ("priority", "page_num", "url_hash")

#: the reference's DEFAULT_DL_JOBS (libcrawl/api.go:17)
DEFAULT_CONCURRENCY = 5


def rank_fetch_slots(
    frontier: DataFrame,
    budget: int,
    host_col: str = "host",
    order_cols: tuple[str, ...] = DEFAULT_ORDER_COLS,
    salt_partitions: int = 0,
    concurrency: int = DEFAULT_CONCURRENCY,
    mode: str = "group_limit",
    key_col: str = "url_hash",
) -> DataFrame:
    """Add scheduling columns to a round's frontier.

    Output columns added:
      fetch_rank  per-host rank in deterministic crawl order (1-based;
                  0 on unscheduled rows in group_limit mode)
      scheduled   fetch_rank <= budget (this round) vs spill to next round
      slot        (fetch_rank-1) % concurrency — the reference's dispatcher
                  slot the fetch would have occupied
      wave        (fetch_rank-1) / concurrency — dispatch wave within the
                  round (the reference's "≤5 in flight" progression)

    ``mode``:
      'group_limit' (default, the 10^10-scale path) — the scheduled set is
        computed through ``row_number() <= budget`` filters, which Catalyst
        rewrites to WindowGroupLimit with MAP-SIDE partial limiting: only
        ~budget rows per host per input partition ever reach the sort
        exchange. The unscheduled remainder is recovered by a hash
        anti-join on ``key_col`` (rows must be unique on it — true for a
        deduped frontier) with fetch_rank 0: a hash exchange instead of a
        full sort of the whole frontier.
      'full_rank' — rank every row (full per-host sort). Needed only when
        unscheduled rows must carry their exact rank.

    ``salt_partitions > 1`` adds the salted pre-phase (see module
    docstring); the scheduled set is provably identical in all modes —
    asserted by tests.
    """
    order = [F.col(c) for c in order_cols]
    w = Window.partitionBy(host_col).orderBy(*order)
    rank = F.row_number().over(w)

    def _finalize(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("fetch_rank", rank)
            .withColumn("scheduled", F.col("fetch_rank") <= budget)
            .withColumn("slot", ((F.col("fetch_rank") - 1) % concurrency).cast("int"))
            .withColumn(
                "wave", F.floor((F.col("fetch_rank") - 1) / concurrency).cast("int")
            )
        )

    def _salt_phase(df: DataFrame) -> DataFrame:
        # any row in a host's true top-budget is in its salt's top-budget,
        # so phase-1 survivors are a superset of the final schedule
        salted = df.withColumn(
            "_salt", F.pmod(F.col(key_col), F.lit(salt_partitions)).cast("int")
        )
        w1 = Window.partitionBy(host_col, "_salt").orderBy(*order)
        return (
            salted.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= budget)  # -> WindowGroupLimit (partial)
            .drop("_r1", "_salt")
        )

    if mode == "group_limit":
        pre = _salt_phase(frontier) if salt_partitions > 1 else frontier
        scheduled = _finalize(pre).filter(
            F.col("fetch_rank") <= budget  # -> WindowGroupLimit (partial)
        )
        unscheduled = (
            frontier.join(scheduled.select(key_col), key_col, "left_anti")
            .withColumn("fetch_rank", F.lit(0))
            .withColumn("scheduled", F.lit(False))
            .withColumn("slot", F.lit(-1).cast("int"))
            .withColumn("wave", F.lit(-1).cast("int"))
        )
        return scheduled.unionByName(unscheduled)

    if mode != "full_rank":
        raise ValueError(f"unknown mode: {mode!r}")
    if salt_partitions <= 1:
        return _finalize(frontier)
    survivors = _finalize(_salt_phase(frontier))
    losers = (
        frontier.join(survivors.select(key_col), key_col, "left_anti")
        .withColumn("fetch_rank", F.lit(0))
        .withColumn("scheduled", F.lit(False))
        .withColumn("slot", F.lit(-1).cast("int"))
        .withColumn("wave", F.lit(-1).cast("int"))
    )
    return survivors.unionByName(losers)


def crawl_order_key(round_col: Column | str = "round") -> list[Column]:
    """The global deterministic crawl order (W2): round, then priority,
    then per-pager emission order, then stable hash tiebreak."""
    r = F.col(round_col) if isinstance(round_col, str) else round_col
    return [r, F.col("priority"), F.col("page_num"), F.col("url_hash")]
