"""Deterministic synthetic board-site pages table (FIXTURES.md §D).

Generates a multi-host vBulletin-style forum as a Common-Crawl-style pages
table with the authoritative input shape from BASELINE.json.input_hint:

    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

Structure (all seeded by ``seed``, default 42 — fully reproducible):

* H hosts (``forum{i}.example``), B boards each, T threads per board,
  P pages per thread.
* thread page 1: ``http://{host}/b{b}/t{t}`` ; page p>1: ``.../t{t}/page{p}``
  (the vb4 pager URL shape, pagers.go:223-248).
* every thread page carries: a next-page link (if any), links to 2 sibling
  threads (same board), one cross-board link, and occasionally a cross-host
  link — exercising all three priority classes (W3).
* every page has a ``<div id="posts">`` with posts/attachments in the vb4
  id scheme so the extraction UDFs have real work.
* per-host robots.txt disallows ``/b0/secret`` paths; a few URLs land in
  the excludes list.

The ``text`` column is produced by the engine's own ``extract_text`` so the
byte-identical-text contract is closed end-to-end.
"""

from __future__ import annotations

import datetime
import random
from dataclasses import dataclass, field

from .. import extract

__all__ = ["BoardSite", "make_board_site"]

_BASE_TS = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "content_type string, n_redirects int, content_disposition string"
)

_CT_UTF8 = "text/html; charset=utf-8"


@dataclass
class BoardSite:
    pages: dict[str, bytes] = field(default_factory=dict)  # url -> html
    rows: list[tuple] = field(default_factory=list)  # pages-table rows
    robots: dict[str, str] = field(default_factory=dict)  # host -> robots.txt
    seeds: list[tuple[str, int, int]] = field(default_factory=list)  # url, seed_id, priority
    excludes: list[str] = field(default_factory=list)
    content_types: dict[str, str] = field(default_factory=dict)  # url -> Content-Type
    redirects: dict[str, int] = field(default_factory=dict)  # url -> redirect count
    headers: dict[str, str | None] = field(default_factory=dict)  # url -> Content-Disposition

    def add_page(
        self, url: str, body: bytes, text: str, ts, lang: str = "en",
        content_type: str = _CT_UTF8, n_redirects: int = 0,
        content_disposition: str | None = None,
    ) -> None:
        self.pages[url] = body
        self.content_types[url] = content_type
        if n_redirects:
            self.redirects[url] = n_redirects
        if content_disposition is not None:
            self.headers[url] = content_disposition
        self.rows.append(
            (url, ts, body, text, lang, content_type, n_redirects, content_disposition)
        )

    def to_df(self, spark):
        return spark.createDataFrame(self.rows, PAGES_SCHEMA)


def _thread_url(host: str, b: int, t: int, p: int) -> str:
    base = f"http://{host}/b{b}/t{t}"
    return base if p == 1 else f"{base}/page{p}"


def make_board_site(
    hosts: int = 2,
    boards: int = 2,
    threads: int = 3,
    pages_per_thread: int = 3,
    seed: int = 42,
    attachment_pages: bool = False,
    charset_mix: bool = False,
    redirect_pages: bool = False,
    posts_per_page: int = 2,
    words_per_post: int = 0,
) -> BoardSite:
    """``attachment_pages=True`` additionally adds the vb attachment URLs to
    the pages table as fetchable binary resources carrying Content-Disposition
    headers — the input the ``-names-from-header`` path needs (the reference
    reads the header from the attachment GET, downloader.go:121-143).

    ``charset_mix=True`` encodes a deterministic subset of pages as cp1252
    (charset in Content-Type), BOM'd UTF-8 (no charset in Content-Type), and
    latin-1 with a ``<meta charset>`` only — one page class per rung of the
    F10 decode ladder (libhttp/encoding.go:10-16), with umlaut text so a
    wrong decode is visible in the byte-identical-text check.

    ``redirect_pages=True`` marks a deterministic subset of pages with
    n_redirects 3 (Log-policy-ok, Deny-blocked) and 12 (blocked by both) —
    the P6 redirect-gate input (libhttp/redirect/redirect.go:16-33).

    ``posts_per_page`` / ``words_per_post`` size each page realistically
    (a typical forum page is 25 posts × tens of words ≈ 15-50 KB of HTML;
    the 2-post default keeps the golden e2e fixtures byte-stable). Filler
    words are a pure function of (post number, word index) — deterministic
    regardless of generation order.
    """
    rng = random.Random(seed)
    site = BoardSite()
    hostnames = [f"forum{i}.example" for i in range(hosts)]

    i = 0
    for hi, host in enumerate(hostnames):
        site.robots[host] = "User-agent: *\nDisallow: /b0/secret\n"
        for b in range(boards):
            for t in range(threads):
                for p in range(1, pages_per_thread + 1):
                    url = _thread_url(host, b, t, p)
                    variant = (b * 31 + t * 7 + p) % 4 if charset_mix else 0
                    extra = (
                        "Grüße für die Crème brûlée — schöne Füße, détail."
                        if variant
                        else ""
                    )
                    html = _thread_page_html(
                        rng, hostnames, host, b, t, p, threads, pages_per_thread,
                        extra_text=extra, posts_per_page=posts_per_page,
                        words_per_post=words_per_post,
                    )
                    if variant == 1:  # Content-Type charset wins
                        body = html.encode("cp1252")
                        ctype = "text/html; charset=windows-1252"
                    elif variant == 2:  # BOM wins (no charset in header)
                        body = b"\xef\xbb\xbf" + html.encode("utf-8")
                        ctype = "text/html"
                    elif variant == 3:  # <meta charset> wins
                        html = html.replace(
                            "<head>", '<head><meta charset="windows-1252">'
                        )
                        body = html.encode("cp1252")
                        ctype = "text/html"
                    else:
                        body = html.encode("utf-8")
                        ctype = _CT_UTF8
                    n_redir = 0
                    if redirect_pages:
                        if (b, t, p) == (1, 0, 2):
                            n_redir = 3  # Log allows (<=10), Deny blocks
                        elif (b, t, p) == (1, 1, 1):
                            n_redir = 12  # blocked under both policies
                    site.add_page(
                        url, body, extract.extract_text(html),
                        _BASE_TS + datetime.timedelta(seconds=i),
                        content_type=ctype, n_redirects=n_redir,
                    )
                    i += 1
                    if attachment_pages:
                        for pi in range(2):
                            if (p + pi) % 2 != 0:
                                continue  # matches _thread_page_html's atts
                            att_url = f"http://{host}/att/{b}/{t}/{p}/{pi}/file{pi}.pdf"
                            # vary the header: normal / missing / malformed
                            k = (b + t + p + pi) % 3
                            if k == 0:
                                cd = f'attachment; filename="real_{b}{t}{p}{pi}.pdf"'
                            elif k == 1:
                                cd = None  # no header -> reference errors
                            else:
                                cd = 'attachment; filename="a=b.pdf"'  # malformed
                            site.add_page(
                                att_url, b"%PDF-fake " + att_url.encode(), "",
                                _BASE_TS + datetime.timedelta(seconds=i),
                                lang="", content_type="application/pdf",
                                content_disposition=cd,
                            )
                            i += 1
        # a secret page robots must keep out of the crawl
        secret = f"http://{host}/b0/secret/{hi}"
        shtml = "<html><body><div id='posts'>secret</div></body></html>"
        site.add_page(
            secret, shtml.encode(), extract.extract_text(shtml),
            _BASE_TS + datetime.timedelta(seconds=i),
        )
        i += 1

    # seeds: page 1 of thread 0 on every host's board 0
    for s, host in enumerate(hostnames):
        site.seeds.append((_thread_url(host, 0, 0, 1), s, 0))
    # exclude one mid-thread page on host 0 (P1 semantics: exact url string)
    site.excludes.append(_thread_url(hostnames[0], 0, 1, 1))
    return site


#: deterministic filler vocabulary for realistic page sizing
_VOCAB = (
    "forum discussion reply quote thread sticky moderator avatar signature "
    "posted edited attachment download upload image video audio link page "
    "board topic member guest online offline search profile message private "
    "notification subscribe archive index recent popular trending announcement"
).split()


def _thread_page_html(
    rng: random.Random,
    hostnames: list[str],
    host: str,
    b: int,
    t: int,
    p: int,
    threads: int,
    pages_per_thread: int,
    extra_text: str = "",
    posts_per_page: int = 2,
    words_per_post: int = 0,
) -> str:
    links: list[str] = []
    if p < pages_per_thread:
        links.append(
            f'<a href="/b{b}/t{t}/page{p + 1}">Next Page</a>'
        )
    # sibling threads (same board) — relative links exercise rel2abs
    for st in ((t + 1) % threads, (t + 2) % threads):
        if st != t:
            links.append(f'<a href="b{b}/t{st}">Thread {st}</a>')
    # cross-board link
    ob = (b + 1) % 2
    links.append(f'<a href="/b{ob}/t0">Board {ob}</a>')
    # deterministic occasional cross-host link + robots-blocked link
    if rng.random() < 0.3:
        other = hostnames[rng.randrange(len(hostnames))]
        if other != host:
            links.append(f'<a href="http://{other}/b0/t0">Cross {other}</a>')
    if rng.random() < 0.2:
        links.append('<a href="/b0/secret/0">Secret</a>')

    posts = []
    for pi in range(posts_per_page):
        post_no = 100 * p + pi
        atts = ""
        if (p + pi) % 2 == 0:
            atts = (
                f'<a id="attachment{pi + 1}" '
                f'href="/att/{b}/{t}/{p}/{pi}/file{pi}.pdf">att</a>'
            )
        filler = ""
        if words_per_post > 0:
            filler = " " + " ".join(
                _VOCAB[(post_no * 31 + w * 7) % len(_VOCAB)]
                for w in range(words_per_post)
            )
        posts.append(
            f'<div id="post_{post_no}"><p>Post {post_no} of thread {t} '
            f"board {b} on {host}, page {p}. {extra_text}{filler}</p>{atts}</div>"
        )

    return (
        "<html><head><title>"
        f"t{t} p{p}</title></head><body>\n"
        f'<div class="nav">{"".join(links)}</div>\n'
        f'<div id="posts">{"".join(posts)}</div>\n'
        "</body></html>"
    )
