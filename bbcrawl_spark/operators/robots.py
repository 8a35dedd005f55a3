"""robots.txt gating (P7/J5) — graft operator required by the north_rule
(the reference does no robots handling; its politeness is the 5-slot
dispatcher only).

Model: a small per-host rules table ``robots(host string, disallow_prefix
string)`` — one row per Disallow prefix — broadcast-joined against the
frontier (dimension table is tiny relative to a 10^10 frontier).  A URL is
blocked when ANY of its host's prefixes prefix-matches its path.
Allow-precedence and wildcards are intentionally out of scope: simple
prefix Disallow is the common-crawl-compatible core.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import host_of

__all__ = ["parse_robots_txt", "robots_table", "robots_gate"]


def parse_robots_txt(txt: str, user_agent: str = "*") -> list[str]:
    """Disallow prefixes applying to ``user_agent`` (first matching group
    wins, per the de-facto standard)."""
    groups: list[tuple[list[str], list[str]]] = []  # (agents, disallows)
    agents: list[str] = []
    disallows: list[str] = []
    in_group = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_group:
                groups.append((agents, disallows))
                agents, disallows = [], []
                in_group = False
            agents.append(val)
        elif key == "disallow":
            in_group = True
            if val:
                disallows.append(val)
    if agents or disallows:
        groups.append((agents, disallows))
    for ag, dis in groups:
        if user_agent in ag:
            return dis
    for ag, dis in groups:
        if "*" in ag:
            return dis
    return []


def robots_table(
    spark: SparkSession, robots_txts: dict[str, str], user_agent: str = "*"
) -> DataFrame:
    """Build the rules table from raw per-host robots.txt bodies."""
    rows = [
        (host, prefix)
        for host, txt in robots_txts.items()
        for prefix in parse_robots_txt(txt, user_agent)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["host", "disallow_prefix"])
        if rows
        else pd.DataFrame({"host": pd.Series(dtype="str"),
                           "disallow_prefix": pd.Series(dtype="str")}),
    )


def robots_gate(frontier: DataFrame, robots: DataFrame, url_col: str = "url") -> DataFrame:
    """Drop frontier rows disallowed by robots rules.

    Broadcast inner join on host (rules side is small), prefix test on the
    path, then anti-semantics via a blocked-keys left_anti. All JVM-side.
    """
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    blocked = (
        frontier.withColumn("_host", host_of(F.col(url_col)))
        .join(F.broadcast(robots), F.col("_host") == robots["host"], "inner")
        .filter(path.startswith(F.col("disallow_prefix")))
        .select(F.col(url_col).alias("_blocked_url"))
        .distinct()
    )
    return frontier.join(
        blocked, frontier[url_col] == blocked["_blocked_url"], "left_anti"
    )


def robots_allowed_py(url: str, rules: dict[str, list[str]]) -> bool:
    """Pure-Python twin for the sequential oracle."""
    from .. import urlkit

    u = urlkit.parse_url(url)
    path = u.path or "/"
    for prefix in rules.get(u.hostname().lower(), []):
        if path.startswith(prefix):
            return False
    return True
