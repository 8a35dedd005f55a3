"""bbcrawl_spark — a PySpark-native URL-frontier / crawl-loop analytics engine.

A from-scratch reimplementation of the capabilities of jwdev42/bbcrawl
(reference, read-only at /root/reference) as an idiomatic Spark DataFrame
engine: pagers become frontier DataFrame generators, the download dispatcher
becomes a per-host politeness window scheduler, HTML extraction becomes
Arrow-batched pandas UDFs, and crawl state (frontier / seen / metrics) lives
in snapshot-committed warehouse tables so a crawl resumes deterministically.

Modules
-------
urlkit      Go net/url-parity URL functions + xxhash64 (pure Python)
htmlkit     minimal DOM + walkTree-parity traversal (pure Python)
extract     vB4-attachment / src / link / text extraction (pure Python core)
pagers      pager -> frontier DataFrame generators (query / cutter / vb4)
config      crawl configuration (pager/crawler specs, politeness budget)
cli         the reference's positional CLI grammar -> CrawlConfig
operators/  dedup (bloom + anti-join), politeness windows, robots, priority,
            text ops (minhash/simhash/quality/langid), similarity search
sources/    pages tables, synthetic board-site generator, warehouse layer
plans/      the per-round crawl batch job + multi-round driver loop
functions/  pandas UDFs + column-expression builders
oracle      sequential pure-Python crawl oracle (reference-loop semantics)
"""

__version__ = "0.1.0"
