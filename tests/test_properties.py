"""Property-based tests (hypothesis) for the pure-Python contracts
(SURVEY.md §5.2-6): canonicalization idempotence, query-encode round-trips,
pager sequence laws, bloom zero-false-negatives, attrs tokenizer laws."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bbcrawl_spark import cmdline, pagers, urlkit
from bbcrawl_spark.operators.dedup import _build_blob, _check_blob

_hosts = st.from_regex(r"[a-z][a-z0-9\-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_paths = st.from_regex(r"(/[A-Za-z0-9._\-]{0,8}){0,4}/?", fullmatch=True)
_querys = st.from_regex(r"([a-z]{1,5}=[A-Za-z0-9]{0,6}(&[a-z]{1,5}=[A-Za-z0-9]{0,6}){0,3})?", fullmatch=True)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(_hosts)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_paths)
    q = draw(_querys)
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    return f"{scheme}://{host}{port}{path}" + (f"?{q}" if q else "") + frag


class TestCanonicalize:
    @given(urls())
    @settings(max_examples=300, deadline=None)
    def test_idempotent(self, u):
        c = urlkit.canonicalize(u)
        assert urlkit.canonicalize(c) == c

    @given(urls())
    @settings(max_examples=300, deadline=None)
    def test_fragment_and_case_invariant(self, u):
        base = u.split("#")[0]
        assert urlkit.canonicalize(u) == urlkit.canonicalize(base)
        # scheme+host case never matters
        p = urlkit.parse_url(u)
        swapped = u.replace(p.scheme, p.scheme.upper(), 1)
        assert urlkit.canonicalize(swapped) == urlkit.canonicalize(u)

    @given(urls())
    @settings(max_examples=300, deadline=None)
    def test_hash_is_stable(self, u):
        assert urlkit.url_hash(u) == urlkit.url_hash(urlkit.canonicalize(u))


class TestQueryEncode:
    @given(st.dictionaries(
        st.from_regex(r"[a-z]{1,6}", fullmatch=True),
        st.lists(st.text(alphabet=st.characters(codec="utf-8",
                                                exclude_characters="&=+%"),
                         max_size=8), min_size=1, max_size=3),
        max_size=4,
    ))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, values):
        encoded = urlkit.query_encode(values)
        assert urlkit.parse_query(encoded) == {k: values[k] for k in sorted(values)}

    @given(st.dictionaries(st.from_regex(r"[a-z]{1,6}", fullmatch=True),
                           st.lists(st.from_regex(r"[a-z0-9]{0,6}", fullmatch=True),
                                    min_size=1, max_size=2), max_size=4))
    @settings(max_examples=200, deadline=None)
    def test_keys_sorted(self, values):
        encoded = urlkit.query_encode(values)
        keys = [p.split("=")[0] for p in encoded.split("&") if p]
        assert keys == sorted(keys)


class TestPagerLaws:
    @given(st.integers(1, 50), st.integers(0, 30), st.integers(1, 5))
    @settings(max_examples=100, deadline=None)
    def test_cutter_sequence_length_and_order(self, start, extra, step):
        end = start + extra
        spec = pagers.CutterPagerSpec(
            url="http://h.example/1/x", start=start, end=end, step=step, cut=(18, 1)
        )
        seq = pagers.pager_sequence(spec)
        assert len(seq) == end - start + 1
        ords = [o for o, _, _ in seq]
        assert ords == sorted(ords) == list(range(len(seq)))
        # substituted number is page*step
        assert seq[0][2] == f"http://h.example/{start * step}/x"

    @given(st.integers(1, 30), st.integers(0, 20))
    @settings(max_examples=100, deadline=None)
    def test_vb4_page1_bare(self, start, extra):
        spec = pagers.VB4PagerSpec(url="http://h/t", start=start, end=start + extra)
        seq = pagers.pager_sequence(spec)
        for _, p, u in seq:
            if p == 1:
                assert u == "http://h/t"
            else:
                assert u == f"http://h/t/page{p}"


class TestBloomProperties:
    @given(st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=500, unique=True),
           st.integers(4, 12))
    @settings(max_examples=50, deadline=None)
    def test_zero_false_negatives(self, keys, bits_per_key):
        arr = np.array(keys, dtype=np.int64)
        blob = _build_blob(arr, bits_per_key, 7)
        assert _check_blob(arr, blob, 7).all()

    @given(st.integers(0, 10_000))
    @settings(max_examples=50, deadline=None)
    def test_false_positive_rate_bounded(self, seed):
        rng = np.random.RandomState(seed)
        members = rng.randint(-(2**62), 2**62, size=2000).astype(np.int64)
        others = rng.randint(-(2**62), 2**62, size=2000).astype(np.int64)
        others = np.setdiff1d(others, members)
        blob = _build_blob(members, 10, 7)
        fpp = _check_blob(others, blob, 7).mean()
        assert fpp < 0.05  # 10 bits/key, 7 hashes -> ~0.8% expected


class TestIncrementalBloomLaws:
    """Numpy-level laws of the OR-in update path (no Spark — the distributed
    wrapper is covered in test_operators): ORing new keys into an existing
    blob is exactly equivalent to building from the union."""

    @given(
        st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=300, unique=True),
        st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=300, unique=True),
    )
    @settings(max_examples=50, deadline=None)
    def test_or_in_equals_union_build(self, old_keys, new_keys):
        from bbcrawl_spark.operators.dedup import _bloom_positions

        old = np.array(old_keys, dtype=np.int64)
        new = np.array([k for k in new_keys if k not in set(old_keys)], dtype=np.int64)
        if len(new) == 0:
            return
        blob = _build_blob(old, 10, 7).copy()
        u = new.astype(np.uint64)
        for pos in _bloom_positions(u, len(blob) * 8, 7):
            np.bitwise_or.at(blob, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        both = np.concatenate([old, new])
        # zero false negatives over the union after OR-in
        assert _check_blob(both, blob, 7).all()
        # and bit-identical to inserting the union into a same-sized blob
        m_bits = len(blob) * 8
        ref = np.zeros_like(blob)
        ub = both.astype(np.uint64)
        for pos in _bloom_positions(ub, m_bits, 7):
            np.bitwise_or.at(ref, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        assert np.array_equal(blob, ref)


class TestBatchHashLaws:
    """Laws of the vectorized signature hash: values must not depend on the
    batch a string arrives in (minhash/simhash reduceat grouping relies on
    this), and the family must be seeded-deterministic and well-spread."""

    @given(st.lists(st.text(min_size=0, max_size=90), min_size=1, max_size=60))
    @settings(max_examples=100, deadline=None)
    def test_batch_composition_invariant(self, strs):
        from bbcrawl_spark.operators.textops import _hash_strings_np

        whole = _hash_strings_np(strs)
        split = np.concatenate(
            [_hash_strings_np(strs[:1]), _hash_strings_np(strs[1:])]
        ) if len(strs) > 1 else _hash_strings_np(strs)
        assert np.array_equal(whole, split)
        assert np.array_equal(whole, _hash_strings_np(list(strs)))

    def test_spread_and_distinct(self):
        from bbcrawl_spark.operators.textops import _hash_strings_np

        strs = [f"tok{i} gram{i % 7}" for i in range(20000)]
        h = _hash_strings_np(strs)
        assert len(np.unique(h)) == len(strs)  # no collisions on this set
        # bits look uniform-ish: each of the 64 bit positions near 50% set
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).mean(0)
        assert (np.abs(bits - 0.5) < 0.05).all()

    def test_long_strings_fold_not_truncate(self):
        from bbcrawl_spark.operators.textops import _hash_strings_np

        a = "x" * 64 + "tail-one"
        b = "x" * 64 + "tail-two"
        ha, hb = _hash_strings_np([a, b])
        assert ha != hb  # bytes past the packed width still influence the hash


class TestAttrsTokenizerLaws:
    @given(st.lists(st.from_regex(r"[a-z0-9 ]{1,6}", fullmatch=True), min_size=1, max_size=5))
    @settings(max_examples=200, deadline=None)
    def test_join_split_roundtrip(self, segments):
        s = "/".join(segments)
        assert cmdline.tokenize_attrs(s) == segments

    @given(st.text(alphabet="ab/\\", max_size=12))
    @settings(max_examples=300, deadline=None)
    def test_never_crashes_except_trailing_escape(self, s):
        # odd trailing backslash run = dangling escape -> reference errors
        stripped = s.rstrip("\\")
        dangling = (len(s) - len(stripped)) % 2 == 1
        try:
            cmdline.tokenize_attrs(s)
            assert not dangling
        except ValueError:
            assert dangling


class TestPathUnescapeLaws:
    """Go unescape(s, encodePath) twin (urlkit.path_unescape)."""

    @given(st.text(min_size=0, max_size=60))
    @settings(max_examples=200, deadline=None)
    def test_encode_then_decode_roundtrips(self, s):
        # percent-encode every byte, decode -> original (Go parity: decode
        # accepts any %XX, uppercase or lowercase hex)
        enc = "".join(f"%{b:02X}" for b in s.encode("utf-8", "surrogateescape"))
        assert urlkit.path_unescape(enc) == s
        enc_lower = "".join(f"%{b:02x}" for b in s.encode("utf-8", "surrogateescape"))
        assert urlkit.path_unescape(enc_lower) == s

    @given(st.text(alphabet=st.characters(blacklist_characters="%"), max_size=60))
    @settings(max_examples=100, deadline=None)
    def test_percent_free_is_identity(self, s):
        assert urlkit.path_unescape(s) == s

    def test_single_pass_like_go(self):
        # decoding is single-pass like Go's: %2541 -> '%41' (NOT 'A')
        assert urlkit.path_unescape("%2541") == "%41"


class TestRepetitionLaws:
    """Randomized cross-check of the JVM column-expr repetition/top-n-gram
    signals against a direct Python ground truth — one Spark job over a
    seeded batch of synthetic documents (per-example Spark jobs would make
    hypothesis unusably slow, so this is a seeded-corpus law test)."""

    def _corpus(self, rng, n_docs=60):
        vocab = ["spark", "shuffle", "the", "a", "join", "scan", "x1", "y2"]
        docs = []
        for _ in range(n_docs):
            n = int(rng.integers(0, 30))
            docs.append(" ".join(rng.choice(vocab, size=n)) if n else "")
        return docs

    def test_top_ngram_matches_python_counter(self, spark):
        from collections import Counter

        from bbcrawl_spark.operators import textops

        rng = np.random.default_rng(4242)
        docs = self._corpus(rng)
        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["t_top_token_frac_e4"], r["t_top_bigram_frac_e4"])
            for r in textops.top_ngram_stats(df).collect()
        }
        for i, doc in enumerate(docs):
            toks = textops.normalized_py(doc).split(" ") if textops.normalized_py(doc) else [""]
            want_tok = Counter(toks).most_common(1)[0][1] * 10000 // len(toks)
            bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            want_bi = (
                Counter(bigrams).most_common(1)[0][1] * 10000 // len(bigrams)
                if bigrams else 0
            )
            assert got[i] == (want_tok, want_bi), (i, doc, got[i], (want_tok, want_bi))

    def test_repetition_stats_match_python(self, spark):
        from bbcrawl_spark.operators import textops

        rng = np.random.default_rng(77)
        base = self._corpus(rng, n_docs=40)
        # inject newlines + duplicate/bullet/ellipsis lines
        docs = []
        for i, d in enumerate(base):
            lines = d.split(" ")[:6] or [""]
            if i % 3 == 0:
                lines += lines[:2]  # duplicate lines
            if i % 4 == 0:
                lines.append("- bullet")
            if i % 5 == 0:
                lines.append("tail...")
            docs.append("\n".join(lines))
        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (
                r["r_n_lines"], r["r_dup_line_frac_e4"],
                r["r_dup_line_char_frac_e4"], r["r_bullet_line_frac_e4"],
                r["r_ellipsis_line_frac_e4"],
            )
            for r in textops.repetition_stats(df).collect()
        }
        for i, doc in enumerate(docs):
            lines = [x.strip(" ") for x in doc.split("\n")]
            lines = [x for x in lines if x != ""]
            n = len(lines)
            n1 = max(n, 1)
            uniq = list(dict.fromkeys(lines))
            c_total = sum(len(x) for x in lines)
            c_dist = sum(len(x) for x in uniq)
            want = (
                n,
                (n - len(uniq)) * 10000 // n1,
                (c_total - c_dist) * 10000 // max(c_total, 1),
                sum(x.startswith(("- ", "* ")) for x in lines) * 10000 // n1,
                sum(x.endswith("...") for x in lines) * 10000 // n1,
            )
            assert got[i] == want, (i, doc, got[i], want)


class TestColumnLaws:
    """Batch-style laws for the new JVM column ops: hypothesis-shaped
    inputs generated deterministically, ONE Spark job per law (a per-
    example job would pay session overhead 300x)."""

    def _url_batch(self, spark):
        from pyspark.sql import functions as F

        # cover: no query / clean query / tracker-only / mixed order /
        # fragment / '?' inside fragment / multi-value params
        return spark.range(0, 400).select(
            F.concat(
                F.lit("http://h"), (F.col("id") % 23).cast("string"),
                F.lit(".example.com/p"), (F.col("id") % 7).cast("string"),
                F.element_at(
                    F.array(
                        F.lit(""),
                        F.lit("?a=1&b=2"),
                        F.lit("?utm_source=x&gclid=g"),
                        F.lit("?z=9&utm_campaign=c&a=1"),
                        F.lit("?b=2&a=1#sec"),
                        F.lit("#frag?utm_source=x"),
                        F.lit("?a=1&a=2&jsessionid=s"),
                    ),
                    ((F.col("id") % 7) + 1).cast("int"),
                ),
            ).alias("u")
        )

    def test_normalize_query_idempotent_and_tracker_free(self, spark):
        from pyspark.sql import functions as F

        from bbcrawl_spark.functions import udfs

        df = self._url_batch(spark).select(
            "u", udfs.normalize_query_col("u").alias("n1")
        ).select("u", "n1", udfs.normalize_query_col("n1").alias("n2"))
        bad = df.filter(F.col("n1") != F.col("n2"))
        assert bad.count() == 0, bad.limit(5).collect()
        # no tracking param survives in the QUERY part of the output
        q = F.regexp_extract("n1", r"^[^#]*\?([^#]*)", 1)
        leaked = df.filter(
            F.exists(
                F.split(q, "&"), lambda p: p.rlike(udfs.TRACKING_PARAMS_RE)
            )
        )
        assert leaked.count() == 0, leaked.limit(5).collect()

    def test_registrable_domain_is_a_fixpoint(self, spark):
        from pyspark.sql import functions as F

        from bbcrawl_spark.operators import linkgraph

        hosts = spark.range(0, 300).select(
            F.concat(
                F.element_at(
                    F.array(F.lit(""), F.lit("www."), F.lit("a.b.")),
                    ((F.col("id") % 3) + 1).cast("int"),
                ),
                F.lit("site"), (F.col("id") % 40).cast("string"),
                F.element_at(
                    F.array(
                        F.lit(".example.com"), F.lit(".co.uk"),
                        F.lit(".com.au"), F.lit(".org"), F.lit(".gob.mx"),
                    ),
                    ((F.col("id") % 5) + 1).cast("int"),
                ),
            ).alias("h")
        )
        d1 = linkgraph.registrable_domain("h")
        df = hosts.select("h", d1.alias("d1")).select(
            "h", "d1", linkgraph.registrable_domain("d1").alias("d2")
        )
        bad = df.filter(F.col("d1") != F.col("d2"))
        assert bad.count() == 0, bad.limit(5).collect()

    def test_recrawl_interval_always_clamped_and_due_consistent(self, spark):
        from pyspark.sql import functions as F

        from bbcrawl_spark.sources import cdx

        caps = spark.range(0, 2000).select(
            F.concat(F.lit("s"), (F.col("id") % 97).cast("string")).alias("surt"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") * 37_123) % 10_000_000
            ).alias("fetch_ts"),
            F.md5((F.col("id") % 300).cast("string")).alias("digest"),
        )
        sched = cdx.recrawl_schedule(
            caps, "2023-12-30 00:00:00",
            min_interval_s=3600, max_interval_s=86_400,
        )
        checked = sched.select(
            ((F.col("interval_s") >= 3600) & (F.col("interval_s") <= 86_400)).alias("clamped"),
            (
                F.col("due")
                == (
                    F.unix_timestamp("next_due_ts")
                    <= F.unix_timestamp(F.to_timestamp(F.lit("2023-12-30 00:00:00")))
                )
            ).alias("due_ok"),
        )
        bad = checked.filter(~F.col("clamped") | ~F.col("due_ok"))
        assert bad.count() == 0
