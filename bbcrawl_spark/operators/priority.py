"""Pagination-aware link priority (W3) — JVM column expression + pure-Python twin.

north_star: "bbcrawl's pagination-aware priority ordering (thread/board
'next-page' links scored above cross-board links)".  In the reference the
*pagers themselves* are the priority: the next page of the current thread is
always crawled before anything else (``libcrawl/api.go:104-113`` — strict
pager order).  For discovered links the graft scores:

    0  next-page link: pagination sibling of the current page — same host,
       same thread base where base strips a vb4-style '/pageN' suffix or a
       query-style 'page=N' parameter
    1  same-host (same board/site) link
    2  cross-host link

Both implementations (Spark column / pure Python for the oracle) are pinned
against each other in tests/test_priority.py.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import urlkit
from ..functions.udfs import host_of

__all__ = ["priority_score_col", "priority_score_py"]

_VB_PAGE_SUFFIX = r"/page[0-9]+$"
_QUERY_PAGE_PARAM = r"(^|&)page=[0-9]+"


def _path(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))


def _query(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))


def _thread_base(path: Column) -> Column:
    return F.regexp_replace(path, _VB_PAGE_SUFFIX, "")


def _query_stripped(q: Column) -> Column:
    return F.regexp_replace(q, _QUERY_PAGE_PARAM, "")


def priority_score_col(page_url: Column | str, link_url: Column | str) -> Column:
    page_url = F.col(page_url) if isinstance(page_url, str) else page_url
    link_url = F.col(link_url) if isinstance(link_url, str) else link_url

    same_host = host_of(page_url) == host_of(link_url)
    p_path, l_path = _path(page_url), _path(link_url)
    p_q, l_q = _query(page_url), _query(link_url)

    vb_next = (
        (_thread_base(p_path) == _thread_base(l_path))
        & (l_path.rlike(_VB_PAGE_SUFFIX) | p_path.rlike(_VB_PAGE_SUFFIX))
        & ((p_path != l_path) | (p_q != l_q))
    )
    query_next = (
        (p_path == l_path)
        & (_query_stripped(p_q) == _query_stripped(l_q))
        & (l_q.rlike(_QUERY_PAGE_PARAM) | p_q.rlike(_QUERY_PAGE_PARAM))
        & (p_q != l_q)
    )
    return (
        F.when(same_host & (vb_next | query_next), F.lit(0))
        .when(same_host, F.lit(1))
        .otherwise(F.lit(2))
        .cast("int")
    )


# --- pure-Python twin (oracle side) ----------------------------------------

_VB_RE = re.compile(_VB_PAGE_SUFFIX)
_QP_RE = re.compile(_QUERY_PAGE_PARAM)


def priority_score_py(page_url: str, link_url: str) -> int:
    pu, lu = urlkit.parse_url(page_url), urlkit.parse_url(link_url)
    if pu.hostname().lower() != lu.hostname().lower() or not lu.hostname():
        return 2
    p_path, l_path = pu.path, lu.path
    p_q, l_q = pu.raw_query, lu.raw_query
    vb_next = (
        _VB_RE.sub("", p_path) == _VB_RE.sub("", l_path)
        and (_VB_RE.search(l_path) or _VB_RE.search(p_path))
        and (p_path != l_path or p_q != l_q)
    )
    query_next = (
        p_path == l_path
        and _QP_RE.sub("", p_q) == _QP_RE.sub("", l_q)
        and (_QP_RE.search(l_q) or _QP_RE.search(p_q))
        and p_q != l_q
    )
    if vb_next or query_next:
        return 0
    return 1
