"""Training-data pipeline operators: dedup family, text analysis
(documents table), similarity search (embeddings table), multimodal."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bbcrawl_spark.operators import multimodal, similarity, textops

SF_DIR = "/root/testdata/sf0.001"


def _raw4x2_decoder(blob: bytes) -> np.ndarray:
    """Stand-in 'real codec' for the set_decoder seam: top-level def so
    cloudpickle ships it to the workers."""
    assert blob.startswith(b"RAW4x2:")
    return np.frombuffer(blob[len(b"RAW4x2:"):], dtype=np.uint8).reshape(2, 4)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestExactDedup:
    def test_keeps_min_id(self, spark):
        df = _docs_df(spark, ["a b c", "A  b   C", "different", "a b c"])
        kept = sorted(r["doc_id"] for r in textops.exact_dedup(df).collect())
        assert kept == [0, 2]  # 1 and 3 normalize to the same text as 0

    def test_on_real_documents(self, docs):
        n = docs.count()
        kept = textops.exact_dedup(docs).count()
        assert 0 < kept <= n


class TestTokenAndQuality:
    def test_token_stats(self, spark):
        df = _docs_df(spark, ["Hello world, 42 times!"])
        [r] = textops.token_stats(df).collect()
        assert r["n_tokens_ws"] == 4
        # BPE-ish: Hello|world|,|4|2|times|! = 7
        assert r["n_tokens_bpeish"] == 7

    def test_quality_flags(self, spark):
        good = "the cat sat on the mat and it was a good day for all of us"
        bad_short = "hi"
        bad_punct = "!!! ??? ... !!! ??? !!!"
        df = _docs_df(spark, [good, bad_short, bad_punct])
        rows = {r["doc_id"]: r for r in textops.quality_score(df).collect()}
        assert rows[0]["q_keep"] is True
        assert rows[1]["q_keep"] is False
        assert rows[2]["q_keep"] is False

    def test_repetition_stats(self, spark):
        # 5 non-empty lines: 'dup' ×3 (2 beyond-first), '- item', 'wait...'
        doc = "dup\ndup\n  dup  \n- item\nwait...\n\n   \n"
        clean = "alpha\nbeta\ngamma"
        df = _docs_df(spark, [doc, clean])
        rows = {r["doc_id"]: r for r in textops.repetition_stats(df).collect()}
        r = rows[0]
        assert r["r_n_lines"] == 5
        assert r["r_dup_line_frac_e4"] == 4000  # 2/5
        # line chars: dup(3)*3 + '- item'(6) + 'wait...'(7) = 22; dup chars 6
        assert r["r_dup_line_char_frac_e4"] == 2727  # floor(6*10000/22)
        assert r["r_bullet_line_frac_e4"] == 2000  # 1/5
        assert r["r_ellipsis_line_frac_e4"] == 2000  # 1/5
        c = rows[1]
        assert c["r_n_lines"] == 3
        assert c["r_dup_line_frac_e4"] == 0
        assert c["r_dup_line_char_frac_e4"] == 0

    def test_repetition_stats_empty_text(self, spark):
        df = _docs_df(spark, ["", "   \n  \n"])
        for r in textops.repetition_stats(df).collect():
            assert r["r_n_lines"] == 0
            assert r["r_dup_line_frac_e4"] == 0
            assert r["r_dup_line_char_frac_e4"] == 0

    def test_top_ngram_stats(self, spark):
        # "spark spark spark shuffle": top token 'spark' 3/4; bigrams
        # ['spark spark','spark spark','spark shuffle'] -> top 2/3
        df = _docs_df(spark, ["spark spark spark shuffle", "one two", "solo"])
        rows = {r["doc_id"]: r for r in textops.top_ngram_stats(df).collect()}
        assert rows[0]["t_top_token_frac_e4"] == 7500
        assert rows[0]["t_top_bigram_frac_e4"] == 6666
        assert rows[1]["t_top_token_frac_e4"] == 5000
        assert rows[1]["t_top_bigram_frac_e4"] == 10000  # the single bigram
        assert rows[2]["t_top_token_frac_e4"] == 10000
        assert rows[2]["t_top_bigram_frac_e4"] == 0  # < 2 tokens: no bigrams

    def test_strip_boilerplate_lines(self, spark):
        # 'cookie banner' appears in 3 docs (df cap 2 -> dropped); unique
        # lines survive in original order; doc 3 is all boilerplate -> ''
        docs = [
            "cookie banner\nreal content one\nmore text",
            "real content two\ncookie banner",
            "cookie banner\nunique tail",
            "cookie banner",
        ]
        df = _docs_df(spark, docs)
        got = {
            r["doc_id"]: r["clean_text"]
            for r in textops.strip_boilerplate_lines(df, max_line_df=2).collect()
        }
        assert got == {
            0: "real content one\nmore text",
            1: "real content two",
            2: "unique tail",
            3: "",
        }

    def test_strip_boilerplate_normalize_pools_case_variants(self, spark):
        # Case/space variants of the banner each have df 2 (<= cap 2) so
        # raw mode keeps ALL of them; normalized they pool to one line with
        # df 4 (> 2) and are stripped. Surviving lines stay RAW either way.
        docs = [
            "Cookie Banner\nreal one",
            "cookie  banner \nreal two",
            "Cookie Banner\nreal three",
            "cookie  banner \nreal four",
        ]
        df = _docs_df(spark, docs)
        raw = {
            r["doc_id"]: r["clean_text"]
            for r in textops.strip_boilerplate_lines(df, max_line_df=2).collect()
        }
        assert raw == {
            0: "Cookie Banner\nreal one",
            1: "cookie  banner \nreal two",
            2: "Cookie Banner\nreal three",
            3: "cookie  banner \nreal four",
        }
        norm = {
            r["doc_id"]: r["clean_text"]
            for r in textops.strip_boilerplate_lines(
                df, max_line_df=2, normalize=True
            ).collect()
        }
        assert norm == {
            0: "real one",
            1: "real two",
            2: "real three",
            3: "real four",
        }

    def test_strip_boilerplate_normalize_identity_when_lines_canonical(self, spark):
        # On already-normalized lines the two modes are the same pass.
        docs = [
            "cookie banner\nreal content one\nmore text",
            "real content two\ncookie banner",
            "cookie banner\nunique tail",
            "cookie banner",
        ]
        df = _docs_df(spark, docs)
        for kw in ({}, {"normalize": True}):
            got = {
                r["doc_id"]: r["clean_text"]
                for r in textops.strip_boilerplate_lines(
                    df, max_line_df=2, **kw
                ).collect()
            }
            assert got == {
                0: "real content one\nmore text",
                1: "real content two",
                2: "unique tail",
                3: "",
            }

    def test_strip_boilerplate_keeps_duplicate_lines_within_doc(self, spark):
        # df counts DISTINCT docs: a line repeated inside ONE doc is not hot
        df = _docs_df(spark, ["again\nagain\nagain", "other"])
        got = {
            r["doc_id"]: r["clean_text"]
            for r in textops.strip_boilerplate_lines(df, max_line_df=1).collect()
        }
        assert got == {0: "again\nagain\nagain", 1: "other"}

    def test_token_budget_sample(self, spark):
        # group 'a': 3+3+3 tokens, budget 7 -> docs 0,1 kept (cum 3,6);
        # doc 2 (cum 9) overflows. group 'b': one 5-token doc fits exactly.
        rows = [
            (0, "a", "one two three"),
            (1, "a", "x y z"),
            (2, "a", "p q r"),
            (3, "b", "a b c d e"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {
            r["doc_id"]: r["cum_tokens"]
            for r in textops.token_budget_sample(df, budget=7).collect()
        }
        assert got == {0: 3, 1: 6, 3: 5}
        # deterministic: prefix in doc_id order, not an arbitrary subset
        got5 = sorted(
            r["doc_id"]
            for r in textops.token_budget_sample(df, budget=5).collect()
        )
        assert got5 == [0, 3]

    def test_token_budget_sample_sliced_identity(self, spark):
        # the pre-sliced path is output-identical to the single-window path
        # for any slice_size — tiny slices, mid, and one-slice-per-group
        rows = [
            (0, "a", "one two three"),
            (1, "a", "x y z"),
            (2, "a", "p q r"),
            (3, "b", "a b c d e"),
            (7, "b", "one"),
            (10, "c", "t1 t2"),
            (11, "c", "t3"),
            (12, "c", "t4 t5 t6 t7"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        for budget in (5, 7, 100):
            base = sorted(
                (r["doc_id"], r["source"], r["cum_tokens"])
                for r in textops.token_budget_sample(df, budget=budget).collect()
            )
            for slice_size in (1, 3, 1000):
                sliced = sorted(
                    (r["doc_id"], r["source"], r["cum_tokens"])
                    for r in textops.token_budget_sample(
                        df, budget=budget, slice_size=slice_size
                    ).collect()
                )
                assert sliced == base, (budget, slice_size)

    def test_token_budget_sample_sliced_giant_group(self, spark):
        # ONE giant group (10k single-token docs) + small groups: sliced
        # path keeps the exact doc_id-prefix, offsets are globally right at
        # every slice boundary, and non-contiguous doc_ids (stride 3) prove
        # slicing is by order_col VALUE range, not row position.
        giant = [(i * 3, "giant", "tok") for i in range(10_000)]
        small = [(1, "s1", "a b"), (2, "s2", "c")]
        df = spark.createDataFrame(
            giant + small, "doc_id long, source string, text string"
        )
        out = textops.token_budget_sample(
            df, budget=2_500, slice_size=100
        ).collect()
        by_group = {}
        for r in out:
            by_group.setdefault(r["source"], []).append(
                (r["doc_id"], r["cum_tokens"])
            )
        giant_rows = sorted(by_group["giant"])
        # greedy prefix: first 2500 docs in doc_id order, cum == position
        assert len(giant_rows) == 2_500
        assert giant_rows[0] == (0, 1)
        assert giant_rows[-1] == (2499 * 3, 2_500)
        assert [c for _, c in giant_rows] == list(range(1, 2_501))
        assert sorted(by_group["s1"]) == [(1, 2)]
        assert sorted(by_group["s2"]) == [(2, 1)]

    def test_token_budget_sample_slice_size_validation(self, spark):
        df = spark.createDataFrame(
            [(0, "a", "x")], "doc_id long, source string, text string"
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="slice_size"):
            textops.token_budget_sample(df, budget=5, slice_size=0)

    def test_top_ngram_stats_plan_is_jvm_only(self, spark):
        df = _docs_df(spark, ["a b a"])
        plan = (
            textops.top_ngram_stats(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan

    def test_repetition_stats_plan_is_jvm_only(self, spark):
        # pure column expressions: no shuffle, no Python eval in the plan
        df = _docs_df(spark, ["a\nb"])
        plan = (
            textops.repetition_stats(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan

    def test_langid(self, spark):
        df = _docs_df(
            spark,
            [
                "the cat is on the mat and it is a fine day",
                "der Hund ist in dem Haus und das ist gut für ihn",
                "le chat est dans la maison pour le moment avec une amie",
                "el perro es grande y la casa es bonita por una parte",
                "zzz qqq xxx",
            ],
        )
        rows = textops.langid(df).orderBy("doc_id").collect()
        assert [r["lang_pred"] for r in rows] == ["en", "de", "fr", "es", "und"]

    def test_langid_extended_profiles(self, spark):
        df = _docs_df(
            spark,
            [
                "il gatto che dorme nella casa è anche il più bello della città",
                "o cachorro do vizinho não gosta de andar com os outros para casa",
                "de hond is niet in het huis en dat is ook goed voor zijn baas",
            ],
        )
        rows = textops.langid(df).orderBy("doc_id").collect()
        assert [r["lang_pred"] for r in rows] == ["it", "pt", "nl"]

    def test_fingerprint_stable(self, spark):
        df = _docs_df(spark, ["Some  Text", "some text"])
        rows = textops.fingerprint(df).collect()
        assert rows[0]["fp_md5"] == rows[1]["fp_md5"]
        assert rows[0]["fp_xxh64"] == rows[1]["fp_xxh64"]


NEAR_DUP_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "the quick brown fox jumps over the lazy dog near the river bank yesterday",  # near-dup of 0
    "completely different content about spark shuffles and window functions",
    "the quick brown fox jumps over the lazy dog near the river bank today",  # exact dup of 0
]


class TestNgramJaccard:
    def test_pairs(self, spark):
        df = _docs_df(spark, NEAR_DUP_TEXTS)
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in textops.ngram_jaccard_pairs(df, threshold=0.5).collect()
        }
        assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
        assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0
        assert not any(2 in p for p in pairs)

    def test_dedup(self, spark):
        df = _docs_df(spark, NEAR_DUP_TEXTS)
        kept = sorted(r["doc_id"] for r in textops.ngram_jaccard_dedup(df, threshold=0.5).collect())
        assert kept == [0, 2]


class TestMinHash:
    def test_signature_deterministic(self, spark):
        df = _docs_df(spark, NEAR_DUP_TEXTS[:2])
        udf = textops.make_minhash_udf(num_hashes=32)
        s1 = df.select(udf("text").alias("sig")).collect()
        s2 = df.select(udf("text").alias("sig")).collect()
        assert [r["sig"] for r in s1] == [r["sig"] for r in s2]

    def test_lsh_finds_near_dups(self, spark):
        df = _docs_df(spark, NEAR_DUP_TEXTS)
        pairs = {
            (r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in textops.minhash_lsh_pairs(df, threshold=0.4).collect()
        }
        assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
        assert (0, 1) in pairs
        assert not any(2 in p for p in pairs)

    def test_dedup(self, spark):
        df = _docs_df(spark, NEAR_DUP_TEXTS)
        kept = sorted(
            r["doc_id"] for r in textops.minhash_dedup(df, threshold=0.4).collect()
        )
        assert kept == [0, 2]

    def test_dedup_leaves_no_cached_state(self, spark):
        # Regression: the former self-join persisted the signature DF and
        # never unpersisted it — every dedup call pinned executor memory for
        # the session. The pair path needs no cache at all; the cluster
        # resolution hands its one checkpoint back via `cache` for explicit
        # release (intermediate rounds are freed inside the loop).
        before = spark.sparkContext._jsc.getPersistentRDDs().size()
        df = _docs_df(spark, NEAR_DUP_TEXTS)
        bc: list = []
        textops.minhash_dedup(df, threshold=0.4, cache=bc).count()
        textops.minhash_lsh_pairs(df, threshold=0.4).count()
        for d in bc:
            d.unpersist()
        assert spark.sparkContext._jsc.getPersistentRDDs().size() == before

    def test_dedup_is_transitively_correct(self, spark):
        """A≈C and B≈C (but A,B found only via C) must leave ONE survivor.
        The old drop-id_b rule kept both A and B."""
        base = "the quick brown fox jumps over the lazy dog again and again"
        texts = [
            base + " alpha tail",          # 0: ≈ 2
            base + " bravo tail",          # 1: ≈ 2
            base + " tail",                # 2: hub
            "completely different text about spark shuffles and parquet files",
        ]
        df = _docs_df(spark, texts)
        pairs = {
            (r["id_a"], r["id_b"])
            for r in textops.minhash_lsh_pairs(df, threshold=0.4).collect()
        }
        assert (0, 2) in pairs and (1, 2) in pairs
        kept = sorted(
            r["doc_id"] for r in textops.minhash_dedup(df, threshold=0.4).collect()
        )
        assert kept == [0, 3]

    def test_lsh_pairs_bucket_cap_is_lower_bound(self, spark):
        # an exact-duplicate cluster of 4 collides in EVERY band bucket;
        # max_bucket_size below the cluster size drops those buckets (never
        # emitting a false pair), a cap at/above keeps all 6 pairs
        df = _docs_df(spark, [NEAR_DUP_TEXTS[0]] * 4 + [NEAR_DUP_TEXTS[2]])
        full = textops.minhash_lsh_pairs(df, threshold=0.4)
        assert full.count() == 6
        capped = textops.minhash_lsh_pairs(df, threshold=0.4, max_bucket_size=3)
        assert capped.count() == 0

    def test_bucket_cap_filters_before_collect_list(self, spark):
        # The cap must drop a hot bucket BEFORE collect_list materializes it
        # (a 10^7-member bucket would OOM the aggregation task otherwise):
        # the plan's window count + filter sit BELOW the collect_list
        # aggregate, and both reuse ONE (band, bucket) exchange.
        df = _docs_df(spark, NEAR_DUP_TEXTS)
        plan = (
            textops.minhash_lsh_pairs(df, threshold=0.4, max_bucket_size=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("collect_list") >= 1
        i_win = plan.find("Window")
        i_agg = plan.find("collect_list")
        assert i_win != -1 and i_agg != -1
        # executedPlan prints top-down: the aggregate appears ABOVE (before,
        # in string order) the window pre-filter feeding it
        assert i_agg < i_win, plan
        # the window's hash partitioning is reused by the groupBy: exactly
        # one exchange on (band, bucket) in the whole pairs plan
        import re as _re

        bb_exchanges = [
            m for m in _re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
            if "band" in m and "bucket" in m
        ]
        assert len(bb_exchanges) == 1, plan


class TestPII:
    def test_redact_counts_and_text(self, spark):
        rows = [
            (0, "mail bob@example.com or call +1 555 123 4567"),
            (1, "server 192.168.0.1 up"),
            (2, "nothing here"),
            (3, "a@b.co c@d.org 10.0.0.255 020-7946-0958"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["pii_email_n"], r["pii_ip_n"], r["pii_phone_n"],
                r["redacted_text"],
            )
            for r in textops.redact_pii(df).collect()
        }
        assert got[0] == (1, 0, 1, "mail <EMAIL> or call <PHONE>")
        assert got[1] == (0, 1, 0, "server <IP> up")
        assert got[2] == (0, 0, 0, "nothing here")
        assert got[3] == (2, 1, 1, "<EMAIL> <EMAIL> <IP> <PHONE>")

    def test_redact_order_ip_not_swallowed_by_phone(self, spark):
        # the dotted quad must become <IP>, not get eaten by the looser
        # phone heuristic that would otherwise match "192.168.0.1"
        df = spark.createDataFrame([(0, "ping 192.168.0.1 now")], "doc_id long, text string")
        r = textops.redact_pii(df).first()
        assert r["redacted_text"] == "ping <IP> now"
        assert (r["pii_ip_n"], r["pii_phone_n"]) == (1, 0)

    def test_redact_email_digits_hidden_from_phone(self, spark):
        # sequential contract: the email is replaced FIRST, so its digits
        # can never seed a phone match
        df = spark.createDataFrame(
            [(0, "mail 12345678901@example.com ok")], "doc_id long, text string"
        )
        r = textops.redact_pii(df).first()
        assert r["redacted_text"] == "mail <EMAIL> ok"
        assert (r["pii_email_n"], r["pii_phone_n"]) == (1, 0)

    def test_redact_plan_is_jvm_only(self, spark):
        # pure regexp column expressions: no shuffle, no Python eval
        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        plan = (
            textops.redact_pii(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan


class TestContamination:
    def _dfs(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps over the lazy dog today"),
                (1, "totally unrelated words about spark shuffle partitions"),
                (2, "the quick brown fox jumps high"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(0, "the quick brown fox jumps over the lazy dog")],
            "bid long, text string",
        )
        return docs, bench

    def test_overlap_counts(self, spark):
        docs, bench = self._dfs(spark)
        got = {
            r["doc_id"]: (r["n_overlap"], r["contaminated"])
            for r in textops.contamination_check(docs, bench, n=5).collect()
        }
        # doc 0 shares all 5 benchmark 5-grams; doc 2 shares exactly the
        # one 5-gram "the quick brown fox jumps"; doc 1 is clean
        assert got[0] == (5, True)
        assert got[1] == (0, False)
        assert got[2] == (1, True)

    def test_min_overlap_threshold(self, spark):
        docs, bench = self._dfs(spark)
        got = {
            r["doc_id"]: r["contaminated"]
            for r in textops.contamination_check(
                docs, bench, n=5, min_overlap=2
            ).collect()
        }
        assert got == {0: True, 1: False, 2: False}

    def test_hashed_equals_string_join(self, spark):
        docs, bench = self._dfs(spark)
        a = sorted(
            (r["doc_id"], r["n_overlap"])
            for r in textops.contamination_check(
                docs, bench, n=5, hash_shingles=True
            ).collect()
        )
        b = sorted(
            (r["doc_id"], r["n_overlap"])
            for r in textops.contamination_check(
                docs, bench, n=5, hash_shingles=False
            ).collect()
        )
        assert a == b

    def test_benchmark_side_broadcast(self, spark):
        # the production shape: benchmark shingles broadcast, the 100-TB
        # corpus side ships zero shuffle bytes for the join
        docs, bench = self._dfs(spark)
        plan = (
            textops.contamination_check(docs, bench, n=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan, plan


class TestSimHash:
    def test_exact_dup_zero_hamming(self, spark):
        df = _docs_df(spark, NEAR_DUP_TEXTS)
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in textops.simhash_pairs(df, max_hamming=3).collect()
        }
        assert pairs.get((0, 3)) == 0
        assert not any(2 in p for p in pairs)

    def test_long_near_dup_low_hamming(self, spark):
        # simhash converges with length: 1 token changed out of ~100 flips
        # few bits, so the 4x16-band pigeonhole (hamming<=3) catches it
        base = (
            "spark engine shuffle partition window aggregate join broadcast "
            "filter column frame batch arrow pandas vector hash bloom frontier "
            "crawl politeness budget robots seed host priority page thread "
            "board link extract text token corpus"
        ) * 3
        # the substituted word is fixture-pinned to a pair measuring ≤3 under
        # the engine's hash family (the property under test is that the
        # 4x16-band join CATCHES such pairs, not one word's exact distance)
        df = _docs_df(spark, [base, base.replace("bloom", "stack"), "tiny other"])
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in textops.simhash_pairs(df, max_hamming=3).collect()
        }
        assert (0, 1) in pairs and pairs[(0, 1)] <= 3
        assert not any(2 in p for p in pairs)

    def test_pairs_bucket_cap_is_lower_bound(self, spark):
        # same contract as minhash_lsh_pairs: 4 exact duplicates collide in
        # all 4 band buckets; a cap below the cluster size drops those
        # buckets entirely (pairs are a lower bound, never false), a cap
        # at/above the size keeps all 6 zero-hamming pairs
        df = _docs_df(spark, [NEAR_DUP_TEXTS[0]] * 4 + [NEAR_DUP_TEXTS[2]])
        full = textops.simhash_pairs(df, max_hamming=3)
        assert full.count() == 6
        capped = textops.simhash_pairs(df, max_hamming=3, max_bucket_size=3)
        assert capped.count() == 0
        roomy = textops.simhash_pairs(df, max_hamming=3, max_bucket_size=4)
        assert roomy.count() == 6

    def test_pairs_single_pass_plan(self, spark):
        # grouped in-bucket expansion, not a banded self-join: the simhash
        # UDF (ArrowEvalPython) evaluates ONCE and there is ONE (band,
        # bucket) exchange — the former self-join paid both twice
        df = _docs_df(spark, NEAR_DUP_TEXTS)
        plan = (
            textops.simhash_pairs(df, max_hamming=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("ArrowEvalPython") == 1, plan
        import re as _re

        bb_exchanges = [
            m for m in _re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
            if "band" in m and "bucket" in m
        ]
        assert len(bb_exchanges) == 1, plan

    def test_simhash_dedup_transitive(self, spark):
        # exact dups of doc 0 chain into one cluster; min-id survives
        df = _docs_df(spark, [NEAR_DUP_TEXTS[0], NEAR_DUP_TEXTS[0],
                              NEAR_DUP_TEXTS[0], NEAR_DUP_TEXTS[2]])
        bc: list = []
        kept = sorted(
            r["doc_id"] for r in textops.simhash_dedup(df, cache=bc).collect()
        )
        for h in bc:
            h.unpersist()
        assert kept == [0, 3]

    def test_simhash_closure_matches_duckdb_oracle(self, spark):
        # The composed simhash_dedup closure, cross-checked by engine:
        # Spark connected-components vs DuckDB's recursive-CTE label
        # flooding over the SAME Spark-produced pairs (driver row:
        # simhash_closure_check). Non-vacuous: the sf0.01 corpus yields
        # ~28 simhash pairs including chained clusters.
        import __spark_entry__ as entry

        row = entry.q_simhash_closure_check(spark, "/root/testdata/sf0.01").first()
        assert row["n_pairs"] > 10
        assert row["n_dropped_spark"] > 0
        assert row["dropped_set_match"] == 1, row
        assert row["cluster_labels_match"] == 1, row

    def test_simhash_distinct_for_different_text(self, spark):
        df = _docs_df(spark, [NEAR_DUP_TEXTS[0], NEAR_DUP_TEXTS[2]])
        a, b = [r[0] for r in df.select(textops.simhash_udf("text")).collect()]
        assert a != b

    def test_simhash_batch_boundary_invariant(self):
        # Regression: a trailing empty doc used to CLAMP the reduceat offset,
        # truncating the PRECEDING doc's last token's bit votes — the simhash
        # depended on where the Arrow batch ended. Exercise the raw kernel.
        import pandas as pd

        fn = textops.simhash_udf.func
        doc = "hello world foo bar"
        alone = fn(pd.Series([doc])).iloc[0]
        with_trailing_empty = fn(pd.Series([doc, ""])).iloc[0]
        with_two_empties = fn(pd.Series([doc, "", "   "])).iloc[0]
        assert alone == with_trailing_empty == with_two_empties
        # empty docs themselves hash to 0, and docs AFTER an empty are intact
        out = fn(pd.Series(["", doc, "", doc]))
        assert out.iloc[0] == 0 and out.iloc[2] == 0
        assert out.iloc[1] == alone and out.iloc[3] == alone


class TestSimilarity:
    def test_brute_force_self_nearest(self, spark, emb):
        corpus = emb.limit(200).cache()
        queries = corpus.limit(5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        knn = similarity.brute_force_knn(corpus, queries, k=3)
        top1 = {
            r["query_id"]: r["vec_id"]
            for r in knn.filter("knn_rank = 1").collect()
        }
        # every vector's nearest neighbor is itself (cos=1)
        assert all(q == v for q, v in top1.items())

    def test_lsh_recall_reasonable(self, spark, emb):
        corpus = emb.limit(300).cache()
        queries = corpus.limit(10).select(F.col("vec_id").alias("query_id"), "embedding")
        dim = len(corpus.first()["embedding"])
        exact = similarity.brute_force_knn(corpus, queries, k=5)
        # synthetic near-random embeddings are the ANN worst case (weak
        # neighbor structure): short codes + many tables for recall
        approx = similarity.lsh_knn(
            corpus, queries, dim=dim, k=5, num_planes=3, num_tables=16
        )
        e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
        a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.9  # pinned: the entry-query config must hold this
        # self-match always survives (same bucket by construction)
        assert all((q, q) in a for q in {p[0] for p in e})

    def test_ann_recall_pinned_floors(self, spark):
        """The driver-visible recall query (q_ann_recall config: LSH p3/t16,
        IVF trained codebook C16/p8) holds pinned floors at sf0.01 — the
        scale the driver's correctness gate runs at: LSH per-query >= 0.9;
        IVF mean >= 0.9 and per-query >= 0.8 (this near-uniform synthetic
        data is the IVF worst case — real clustered embeddings reach the
        same recall at far smaller probe fractions)."""
        corpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ).cache()
        queries = corpus.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        rows = similarity.ann_recall(corpus, queries, dim=64, k=10).collect()
        by_variant: dict[str, list[float]] = {}
        for r in rows:
            by_variant.setdefault(r["variant"], []).append(r["recall_e4"] / 10000)
        assert len(by_variant["lsh"]) == 5 and len(by_variant["ivf"]) == 5
        assert min(by_variant["lsh"]) >= 0.9, by_variant
        assert min(by_variant["ivf"]) >= 0.8, by_variant
        assert sum(by_variant["ivf"]) / 5 >= 0.9, by_variant

    def test_near_dup_exact_path(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),  # near-dup of 0
            (2, [0.0, 1.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        pairs = similarity.cosine_near_dup_pairs(df, threshold=0.95, exact=True).collect()
        assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]

    def test_near_dup_lsh_path_recall_floor(self, spark):
        # the SCALE path a 100-TB run uses (LSH buckets, not the O(n²)
        # exact join) must keep 100% of the exact path's pairs in the
        # high-threshold regime it targets (driver row: near_dup_recall)
        import __spark_entry__ as entry

        rec = {
            r["threshold_e2"]: r
            for r in entry.q_near_dup_recall(spark, "/root/testdata/sf0.01").collect()
        }
        assert rec[90]["n_exact"] == 5  # the planted cos≈0.99 near-dups
        assert rec[90]["recall_e4"] == 10000
        # the honest negative: low-threshold similarity is not LSH territory
        assert rec[35]["n_exact"] > 50
        assert rec[35]["recall_e4"] < 5000

    def test_near_dup_lsh_single_pass_plan_and_cap(self, spark):
        # r6 rewrite (the r4 simhash fix applied to embeddings): the LSH
        # path must evaluate the hyperplane UDF exactly ONCE — the former
        # banded self-join ran it under both join aliases — and the
        # hot-bucket cap must be a pure pre-filter (lower bound: a capped
        # run's pairs are a subset of the uncapped run's, and a cap of 1
        # leaves no bucket with two members, hence no pairs).
        import re

        rows = [(i, [float(i % 7 == 0), float(i % 3), 1.0, 0.5]) for i in range(40)]
        rows.append((1000, [0.0, 2.0, 1.0, 0.5]))  # near-dup of the i%3==1 family
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        lsh = similarity.cosine_near_dup_pairs(
            df, threshold=0.9, dim=4, num_planes=4
        )
        plan = lsh._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"ArrowEvalPython|BatchEvalPython", plan)) == 1, plan
        uncapped = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
        capped = {
            (r["id_a"], r["id_b"])
            for r in similarity.cosine_near_dup_pairs(
                df, threshold=0.9, dim=4, num_planes=4, max_bucket_size=8
            ).collect()
        }
        assert capped <= uncapped
        assert (
            similarity.cosine_near_dup_pairs(
                df, threshold=0.9, dim=4, num_planes=4, max_bucket_size=1
            ).count()
            == 0
        )
        # every LSH pair is a true >= threshold pair (inline cosine is the
        # same JVM fold the exact path uses)
        exact = {
            (r["id_a"], r["id_b"])
            for r in similarity.cosine_near_dup_pairs(
                df, threshold=0.9, exact=True
            ).collect()
        }
        assert uncapped <= exact

    def test_minhash_lsh_recall_floor(self, spark):
        # The flagship 100-TB dedup candidate generator (minhash_lsh_pairs,
        # 64 hashes x 16 bands) vs the exact ngram-Jaccard path, on the
        # planted-variant corpus (driver row: minhash_lsh_recall).
        # Banding math: collision P = 1-(1-s^4)^16 -> >= 0.988 at s >= 0.7.
        import __spark_entry__ as entry

        rec = {
            r["threshold_e2"]: r
            for r in entry.q_minhash_lsh_recall(
                spark, "/root/testdata/sf0.01"
            ).collect()
        }
        # strong regime: the banding-math floor the production dedup relies on
        assert rec[70]["n_exact"] > 50  # planted k=20 pairs + natural dups
        assert rec[70]["recall_e4"] >= 9500, rec[70]
        # marginal band regime (P ~ 0.65 at s=0.5): drift alarm, not a goal
        assert rec[50]["n_exact"] > 100
        assert rec[50]["recall_e4"] >= 7500, rec[50]
        # honest negative: banding retrieves only the tail at s ~ 0.33 —
        # low-threshold similarity belongs to the exact shingle path
        assert rec[30]["n_exact"] > 140
        assert rec[30]["recall_e4"] < 8000, rec[30]


class TestMultimodal:
    def _media(self, spark, n=6):
        rows = [
            (i, multimodal.encode_fake_image(8 + i, 4 + i, seed=i), "image/fake", 8 + i, 4 + i)
            for i in range(n)
        ]
        return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    def test_strict_decode_raises(self):
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG\r\n...", strict=True)

    def test_features_through_spark(self, spark):
        media = self._media(spark)
        feats = {r["media_id"]: r for r in multimodal.image_features(media).collect()}
        assert len(feats) == 6
        assert feats[0]["width"] == 8 and feats[0]["height"] == 4
        img = multimodal.decode_image(multimodal.encode_fake_image(8, 4, seed=0), strict=False)
        assert feats[0]["mean_intensity"] == int(img.mean())

    def test_resize_roundtrip(self, spark):
        media = self._media(spark, n=3)
        out = multimodal.resize_images(media, 4, 2).collect()
        for r in out:
            img = multimodal.decode_image(bytes(r["blob"]), strict=False)
            assert img.shape == (2, 4)

    def test_frame_sample(self, spark):
        media = self._media(spark, n=2)
        rows = multimodal.frame_sample(media, every_n=2).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert by_id[0] == [0, 2]  # height 4 -> frames 0,2
        assert by_id[1] == [0, 2, 4]  # height 5 -> frames 0,2,4

    def test_strict_error_names_the_registry(self):
        with pytest.raises(NotImplementedError, match="set_decoder"):
            multimodal.decode_image(b"\x89PNG\r\n...", strict=True)

    def test_pluggable_decoder_through_spark(self, spark):
        """A cluster wires its codec via set_decoder(fn) without editing the
        operator: the registered decoder is captured into the mapInPandas
        closure at construction time and runs on the workers for non-FAKEIMG
        blobs (FAKEIMG still decodes natively)."""
        rows = [
            (0, b"RAW4x2:" + bytes(range(8)), "image/raw", 4, 2),
            (1, multimodal.encode_fake_image(8, 4, seed=1), "image/fake", 8, 4),
        ]
        media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        multimodal.set_decoder(_raw4x2_decoder)
        try:
            feats = {
                r["media_id"]: r
                for r in multimodal.image_features(media).collect()
            }
        finally:
            multimodal.reset_decoder()
        assert (feats[0]["width"], feats[0]["height"]) == (4, 2)
        assert feats[0]["mean_intensity"] == int(np.arange(8).mean())
        assert (feats[1]["width"], feats[1]["height"]) == (8, 4)
        # registry cleared: strict decode of the custom format raises again
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(rows[0][1], strict=True)

    def test_operator_captures_decoder_at_construction(self, spark):
        """reset_decoder() after the DataFrame is built must NOT break an
        already-constructed plan — the decoder travels in the closure."""
        media = spark.createDataFrame(
            [(0, b"RAW4x2:" + bytes(range(8)), "image/raw", 4, 2)],
            multimodal.MEDIA_SCHEMA,
        )
        multimodal.set_decoder(_raw4x2_decoder)
        feats_df = multimodal.image_features(media)
        multimodal.reset_decoder()
        out = feats_df.collect()
        assert out[0]["width"] == 4 and out[0]["height"] == 2


class TestAudio:
    """The third modality: FAKEAUD stand-in, pluggable codec registry with
    construction-time capture (same contract as the image decoder)."""

    def teardown_method(self):
        multimodal.reset_audio_decoder()

    def _media(self, spark, n=4):
        rows = [
            (i, multimodal.encode_fake_audio(8000 * (1 + i % 2), 400 + 100 * i, seed=i),
             "audio/fake", 0, 0)
            for i in range(n)
        ]
        return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    def test_fake_roundtrip_deterministic(self):
        b1 = multimodal.encode_fake_audio(16000, 640, seed=7)
        b2 = multimodal.encode_fake_audio(16000, 640, seed=7)
        assert b1 == b2
        sr, x = multimodal.decode_audio(b1)
        assert sr == 16000 and len(x) == 640

    def test_strict_error_names_the_registry(self):
        with pytest.raises(NotImplementedError, match="set_audio_decoder"):
            multimodal.decode_audio(b"RIFF....WAVE", strict=True)

    def test_features_through_spark(self, spark):
        rows = {
            r["media_id"]: r
            for r in multimodal.audio_features(self._media(spark)).collect()
        }
        assert len(rows) == 4
        r0 = rows[0]
        assert r0["sample_rate"] == 8000 and r0["n_samples"] == 400
        assert r0["duration_ms"] == 50  # 400 / 8000 s
        assert r0["rms_e0"] > 0 and r0["zero_crossings"] > 0
        # int16 uniform noise RMS ≈ 32768/sqrt(3) ≈ 18900
        assert 15000 < r0["rms_e0"] < 22000

    def test_null_blob_rows_are_skipped(self, spark):
        # failed-fetch / metadata-only rows carry NULL blobs — the stage
        # must skip them, not die in bytes(None) (image twin covered too)
        rows = [
            (0, multimodal.encode_fake_audio(8000, 100, seed=1), "audio/fake", 0, 0),
            (1, None, "audio/fake", 0, 0),
        ]
        media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        got = multimodal.audio_features(media).collect()
        assert [r["media_id"] for r in got] == [0]
        img_rows = [
            (0, multimodal.encode_fake_image(4, 4, seed=1), "image/fake", 4, 4),
            (1, None, "image/fake", 4, 4),
        ]
        img = spark.createDataFrame(img_rows, multimodal.MEDIA_SCHEMA)
        assert [r["media_id"] for r in multimodal.image_features(img).collect()] == [0]
        assert [r["media_id"] for r in multimodal.resize_images(img, 2, 2).collect()] == [0]

    def test_pluggable_decoder_captured_at_construction(self, spark):
        def dec(blob):
            return 1000, np.zeros(100, dtype=np.int16)

        media = spark.createDataFrame(
            [(0, b"RIFF-not-fake", "audio/wav", 0, 0)], multimodal.MEDIA_SCHEMA
        )
        multimodal.set_audio_decoder(dec)
        op = multimodal.audio_features(media)  # captures the registry NOW
        multimodal.reset_audio_decoder()
        [r] = op.collect()
        assert r["sample_rate"] == 1000 and r["n_samples"] == 100
        assert r["rms_e0"] == 0 and r["zero_crossings"] == 0


class TestNgramJaccardScaleCap:
    def test_cap_never_creates_false_pairs(self, spark):
        df = _docs_df(spark, NEAR_DUP_TEXTS)
        exact = {
            (r["id_a"], r["id_b"])
            for r in textops.ngram_jaccard_pairs(df, threshold=0.5).collect()
        }
        capped = {
            (r["id_a"], r["id_b"])
            for r in textops.ngram_jaccard_pairs(
                df, threshold=0.5, max_shingle_df=3
            ).collect()
        }
        # capped jaccard is a lower bound -> capped pairs ⊆ exact pairs
        assert capped <= exact
        # the exact dup (identical text) always survives any df cap > 1
        assert (0, 3) in capped


class TestIVF:
    def test_ivf_self_match_and_recall(self, spark, emb):
        corpus = emb.limit(300).cache()
        queries = corpus.limit(10).select(F.col("vec_id").alias("query_id"), "embedding")
        dim = len(corpus.first()["embedding"])
        exact = similarity.brute_force_knn(corpus, queries, k=5)
        cents = similarity.train_ivf_centroids(corpus, dim=dim, n_centroids=8)
        approx = similarity.ivf_knn(
            corpus, queries, dim=dim, k=5, n_centroids=8, n_probe=4, centroids=cents
        )
        e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
        a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
        # a vector's own inverted list is always probed first
        assert all((q, q) in a for q in {p[0] for p in e})
        assert len(e & a) / len(e) >= 0.8  # pinned (trained codebook)

    def test_trained_centroids_deterministic(self, spark, emb):
        corpus = emb.limit(200).cache()
        c1 = similarity.train_ivf_centroids(corpus, dim=64, n_centroids=8)
        c2 = similarity.train_ivf_centroids(corpus, dim=64, n_centroids=8)
        import numpy as np

        assert np.array_equal(c1, c2)

    def test_train_survives_sparse_offset_negative_ids(self, spark, emb):
        # Regression: `id % step == 0` sampling assumed dense ids from ~0.
        # A sparse/offset/negative id space produced an EMPTY sample and
        # np.linalg.norm raised on the 0-d array. Falls back to the first
        # max_sample rows now.
        corpus = emb.limit(200).select(
            (F.col("vec_id") * 1000 + 7).alias("vec_id"), "embedding"
        )
        c = similarity.train_ivf_centroids(corpus, dim=64, n_centroids=8)
        assert c.shape == (8, 64)
        neg = emb.limit(200).select(
            (-F.col("vec_id") * 1000 - 7).alias("vec_id"), "embedding"
        )
        c2 = similarity.train_ivf_centroids(neg, dim=64, n_centroids=8)
        assert c2.shape == (8, 64)

    def test_train_empty_corpus_returns_seeded(self, spark, emb):
        import numpy as np

        empty = emb.filter(F.lit(False))
        c = similarity.train_ivf_centroids(empty, dim=64, n_centroids=8)
        assert np.array_equal(c, similarity._seed_centroids(64, 8, 42))

    def test_ivf_deterministic(self, spark, emb):
        corpus = emb.limit(50).cache()
        queries = corpus.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
        r1 = sorted(map(tuple, similarity.ivf_knn(corpus, queries, dim=64, k=3).collect()))
        r2 = sorted(map(tuple, similarity.ivf_knn(corpus, queries, dim=64, k=3).collect()))
        assert r1 == r2


class TestParagraphDedup:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_later_copies_removed_first_kept(self, spark):
        df = self._df(spark, [
            (1, "cookie banner\nalpha body\nfooter"),
            (2, "cookie banner\nbeta body\nfooter"),
            (3, "gamma body\ncookie banner"),
        ])
        got = {r["doc_id"]: r["clean_text"]
               for r in textops.paragraph_dedup(df).collect()}
        # doc 1 (lowest id) keeps both shared segments; later docs lose them
        assert got[1] == "cookie banner\nalpha body\nfooter"
        assert got[2] == "beta body"
        assert got[3] == "gamma body"

    def test_within_doc_repeats_collapse_to_first(self, spark):
        df = self._df(spark, [(7, "dup line\nmiddle\ndup line")])
        got = textops.paragraph_dedup(df).collect()[0]["clean_text"]
        assert got == "dup line\nmiddle"

    def test_empty_segments_never_dedup_candidates(self, spark):
        # consecutive separators make '' segments; deduping them would strip
        # every blank line after the corpus's first
        df = self._df(spark, [(1, "a\n\nb"), (2, "c\n\nd\n\ne")])
        got = {r["doc_id"]: r["clean_text"]
               for r in textops.paragraph_dedup(df).collect()}
        assert got[1] == "a\n\nb"
        assert got[2] == "c\n\nd\n\ne"

    def test_identity_when_no_duplicates(self, spark):
        rows = [(i, f"unique {i}\nbody {i}") for i in range(10)]
        df = self._df(spark, rows)
        got = {r["doc_id"]: r["clean_text"]
               for r in textops.paragraph_dedup(df).collect()}
        assert got == {i: t for i, t in rows}

    def test_paragraph_separator_mode(self, spark):
        df = self._df(spark, [
            (1, "shared para\n\nown one"),
            (2, "own two\n\nshared para"),
        ])
        got = {r["doc_id"]: r["clean_text"]
               for r in textops.paragraph_dedup(df, sep="\n\n").collect()}
        assert got[1] == "shared para\n\nown one"
        assert got[2] == "own two"

    def test_min_chars_guards_short_segments(self, spark):
        df = self._df(spark, [(1, "x\nlong segment"), (2, "x\nother")])
        got = {r["doc_id"]: r["clean_text"]
               for r in textops.paragraph_dedup(df, min_chars=2).collect()}
        # 'x' is below min_chars -> kept in both docs
        assert got[1] == "x\nlong segment"
        assert got[2] == "x\nother"


class TestDedupAgainst:
    def test_exact_screen_drops_known_texts(self, spark):
        ref = spark.createDataFrame(
            [(1, "The quick brown fox."), (2, "Other reference doc.")],
            "doc_id long, text string")
        new = spark.createDataFrame(
            [(10, "the quick  brown fox."),   # normalized-equal to ref 1
             (11, "Genuinely new content here.")],
            "doc_id long, text string")
        got = textops.dedup_against(new, ref)
        assert [r["doc_id"] for r in got.collect()] == [11]
        # original columns survive untouched
        assert got.columns == ["doc_id", "text"]

    def test_near_screen_drops_planted_variant(self, spark):
        base = ("word" + " token alpha beta gamma delta epsilon zeta eta theta"
                " iota kappa lambda mu nu xi omicron pi rho sigma tau") * 3
        variant = base.replace("alpha", "ALTERED", 1)  # tiny edit, J ~ high
        ref = spark.createDataFrame([(1, base)], "doc_id long, text string")
        new = spark.createDataFrame(
            [(10, variant), (11, "completely different short doc text")],
            "doc_id long, text string")
        kept_exact = textops.dedup_against(new, ref)
        assert {r["doc_id"] for r in kept_exact.collect()} == {10, 11}
        kept_near = textops.dedup_against(new, ref, near=True, threshold=0.5)
        assert {r["doc_id"] for r in kept_near.collect()} == {11}

    def test_ref_side_never_returned(self, spark):
        ref = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        new = spark.createDataFrame([(9, "x y z")], "doc_id long, text string")
        assert {r["doc_id"] for r in textops.dedup_against(new, ref).collect()} == {9}


class TestSourceStats:
    def test_exact_rollup_values(self, spark):
        good = "the quick brown fox jumps over the lazy dog again and again"
        df = spark.createDataFrame(
            [
                (1, good, "sA"),
                (2, good, "sA"),            # exact dup within sA
                (3, good + " extra", "sA"),
                (4, "!!! ???", "sB"),       # fails quality gates
                (5, good, "sB"),
            ],
            "doc_id long, text string, source string")
        got = {r["source"]: r for r in textops.source_stats(df).collect()}
        a, b = got["sA"], got["sB"]
        assert (a["n_docs"], a["n_unique"]) == (3, 2)
        assert a["dup_rate_e4"] == (3 - 2) * 10000 // 3
        assert a["keep_rate_e4"] == 10000
        # sA token sum: 12 + 12 + 13 = 37
        assert a["mean_tokens_m"] == 37 * 1000 // 3
        assert (b["n_docs"], b["n_unique"]) == (2, 2)
        assert b["dup_rate_e4"] == 0
        assert b["keep_rate_e4"] == 5000

    def test_single_shuffle_plan(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e f", "s")], "doc_id long, text string, source string")
        plan = textops.source_stats(df)._jdf.queryExecution().executedPlan().toString()
        # one logical rollup: no Python eval, and the only exchanges are the
        # two-phase distinct-count expansion over the SAME source key
        assert "EvalPython" not in plan


class TestStratifiedSample:
    def test_matches_python_md5_draw_exactly(self, spark):
        import hashlib
        rows = [(i, f"s{i % 3}") for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        fr = {"s0": 0.5, "s1": 0.25}
        got = {r["doc_id"] for r in
               textops.stratified_sample(df, fr, salt="t", default=0.1).collect()}
        def keep(i, g):
            frac = fr.get(g, 0.1)
            thr = textops._frac_hex_threshold(frac)
            return thr is not None and hashlib.md5(f"{i}t".encode()).hexdigest()[:8] < thr
        want = {i for i, g in rows if keep(i, g)}
        assert got == want
        assert 0 < len(got) < len(rows)

    def test_salt_redraws_same_salt_repeats(self, spark):
        df = spark.createDataFrame([(i, "s") for i in range(500)],
                                   "doc_id long, source string")
        a1 = {r["doc_id"] for r in textops.stratified_sample(df, {"s": 0.5}, salt="a").collect()}
        a2 = {r["doc_id"] for r in textops.stratified_sample(df, {"s": 0.5}, salt="a").collect()}
        b = {r["doc_id"] for r in textops.stratified_sample(df, {"s": 0.5}, salt="b").collect()}
        assert a1 == a2
        assert a1 != b

    def test_edge_fractions(self, spark):
        df = spark.createDataFrame([(i, "all" if i < 50 else "none") for i in range(100)],
                                   "doc_id long, source string")
        got = textops.stratified_sample(df, {"all": 1.0, "none": 0.0}).collect()
        assert {r["doc_id"] for r in got} == set(range(50))

    def test_membership_stable_under_corpus_growth(self, spark):
        # a doc's fate depends only on (id, salt) — adding rows never flips
        # it (the property partition-seeded df.sample() lacks)
        small = spark.createDataFrame([(i, "s") for i in range(100)],
                                      "doc_id long, source string")
        big = spark.createDataFrame([(i, "s") for i in range(1000)],
                                    "doc_id long, source string")
        ks = {r["doc_id"] for r in textops.stratified_sample(small, {"s": 0.3}).collect()}
        kb = {r["doc_id"] for r in textops.stratified_sample(big, {"s": 0.3}).collect()}
        assert ks == {i for i in kb if i < 100}

    def test_no_shuffle_no_python(self, spark):
        df = spark.createDataFrame([(1, "s")], "doc_id long, source string")
        plan = textops.stratified_sample(df, {"s": 0.5})._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan and "EvalPython" not in plan


class TestParagraphDedupPlan:
    def test_no_segment_text_crosses_an_exchange(self, spark):
        # Scale pin: the exploded side must project down to
        # (id, pos, hash, len) before any shuffle, and reassembly must
        # regroup POSITIONS (ints), never (pos, seg) structs — the document
        # text is re-split at the final join instead of being shuffled.
        df = spark.createDataFrame([(1, "a\nb"), (2, "a\nc")],
                                   "doc_id long, text string")
        plan = textops.paragraph_dedup(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "collect_list(pos" in plan
        assert "collect_list(struct(pos" not in plan
        assert "EvalPython" not in plan


class TestChunkDocuments:
    def test_windows_and_overlap(self, spark):
        toks = [f"t{i}" for i in range(10)]
        df = _docs_df(spark, [" ".join(toks)])
        rows = sorted(
            textops.chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
            key=lambda r: r["chunk_id"],
        )
        # stride 3 over 10 tokens -> starts 0,3,6,9
        assert [r["chunk_start"] for r in rows] == [0, 3, 6, 9]
        assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]
        assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4, 1]
        assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
        assert rows[1]["chunk_text"] == "t3 t4 t5 t6"  # 1-token overlap
        assert rows[3]["chunk_text"] == "t9"  # short tail window

    def test_every_token_covered_exactly_stride_apart(self, spark):
        text = " ".join(f"w{i}" for i in range(57))
        df = _docs_df(spark, [text])
        rows = textops.chunk_documents(df, chunk_tokens=16, overlap=4).collect()
        covered = set()
        for r in rows:
            covered |= set(range(r["chunk_start"], r["chunk_start"] + r["n_chunk_tokens"]))
        assert covered == set(range(57))

    def test_empty_and_whitespace_docs_dropped(self, spark):
        df = _docs_df(spark, ["", "   ", "one token here"])
        rows = textops.chunk_documents(df, chunk_tokens=8, overlap=0).collect()
        assert len(rows) == 1 and rows[0]["n_chunk_tokens"] == 3

    def test_overlap_validation(self, spark):
        df = _docs_df(spark, ["a b c"])
        with pytest.raises(ValueError):
            textops.chunk_documents(df, chunk_tokens=4, overlap=4)
        with pytest.raises(ValueError):
            textops.chunk_documents(df, chunk_tokens=4, overlap=-1)

    def test_no_shuffle_no_python(self, spark):
        df = _docs_df(spark, ["a b c d e f"])
        plan = textops.chunk_documents(df, chunk_tokens=4, overlap=1) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "EvalPython" not in plan


class TestNormalizeUnicode:
    def test_composes_decomposed(self, spark):
        df = _docs_df(spark, ["café", "café"])
        rows = sorted(textops.normalize_unicode(df).collect(), key=lambda r: r["doc_id"])
        assert rows[0]["nfc_text"] == "café"
        assert rows[0]["nfc_text_changed_int"] == 1
        assert rows[1]["nfc_text"] == "café"  # NFC fixpoint
        assert rows[1]["nfc_text_changed_int"] == 0

    def test_idempotent(self, spark):
        df = _docs_df(spark, ["åb ç x́ÿz"])
        once = textops.normalize_unicode(df).select(
            "doc_id", F.col("nfc_text").alias("text")
        )
        twice = textops.normalize_unicode(once).collect()
        assert twice[0]["nfc_text_changed_int"] == 0

    def test_strip_controls(self, spark):
        df = _docs_df(spark, ["a\x00b\x1fc\nd\te"])
        row = textops.normalize_unicode(df, strip_controls=True).collect()[0]
        assert row["nfc_text"] == "abc\nd\te"  # \n \t survive, C0 stripped

    def test_one_arrow_eval_no_shuffle(self, spark):
        df = _docs_df(spark, ["abc"])
        plan = textops.normalize_unicode(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1, plan
        assert "BatchEvalPython" not in plan and "Exchange" not in plan


class TestHashedLinearScore:
    @staticmethod
    def _py_score(text):
        import hashlib
        import re as _re

        w = textops.hash_weights()
        toks = [t for t in _re.split(r"\s+", _re.sub(r"\s+", " ", text.lower()).strip()) if t]
        s = 0
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            s += w[(int(h[0], 16) * 16 + int(h[1], 16)) % 256]
        return len(toks), s

    def test_matches_python_reference(self, spark):
        texts = ["Hello World", "the quick brown fox JUMPS", "a", "x " * 40]
        df = _docs_df(spark, texts)
        rows = sorted(textops.hashed_linear_score(df).collect(), key=lambda r: r["doc_id"])
        for r, text in zip(rows, texts):
            n, s = self._py_score(text)
            assert (r["n_tokens_scored"], r["score_sum"]) == (n, s), text
            assert r["keep_int"] == int(s > 0)

    def test_empty_text_scores_zero(self, spark):
        df = _docs_df(spark, ["", "   "])
        for r in textops.hashed_linear_score(df).collect():
            assert (r["n_tokens_scored"], r["score_sum"], r["keep_int"]) == (0, 0, 0)

    def test_custom_weights_all_ones_counts_tokens(self, spark):
        df = _docs_df(spark, ["one two three four"])
        row = textops.hashed_linear_score(df, weights=[1] * 256).collect()[0]
        assert row["score_sum"] == 4 == row["n_tokens_scored"]

    def test_no_shuffle_no_python(self, spark):
        df = _docs_df(spark, ["a b c"])
        plan = textops.hashed_linear_score(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan and "EvalPython" not in plan


def _src_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


class TestPackSequences:
    def _mixed(self, spark):
        texts = [" ".join(f"t{i}_{j}" for j in range((i * 7) % 23)) for i in range(40)]
        return _docs_df(spark, texts)

    def test_matches_brute_force_concat_and_split(self, spark):
        df = self._mixed(spark)
        got = {
            (r["doc_id"], r["seq_id"]): (
                r["seq_pos"], r["doc_tok_start"], r["piece_tokens"]
            )
            for r in textops.pack_sequences(df, seq_tokens=10).collect()
        }
        stream = [
            (i, k)
            for i, t, in [(r["doc_id"], r["text"]) for r in df.collect()]
            for k, _ in enumerate(t.split())
        ]
        exp = {}
        for pos, (i, k) in enumerate(stream):
            key = (i, pos // 10)
            if key not in exp:
                exp[key] = [pos % 10, k, 0]
            exp[key][2] += 1
        assert got == {k: tuple(v) for k, v in exp.items()}

    def test_pieces_partition_each_doc_and_fill_sequences(self, spark):
        df = self._mixed(spark)
        rows = textops.pack_sequences(df, seq_tokens=16).collect()
        # per doc: pieces tile [0, n_tokens) contiguously
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for did, ps in by_doc.items():
            ps.sort(key=lambda r: r["doc_tok_start"])
            assert ps[0]["doc_tok_start"] == 0
            for a, b in zip(ps, ps[1:]):
                assert a["doc_tok_start"] + a["piece_tokens"] == b["doc_tok_start"]
            assert ps[-1]["doc_tok_start"] + ps[-1]["piece_tokens"] == ps[0]["n_tokens"]
        # per sequence: every sequence but the last holds exactly seq_tokens
        seq_tot = {}
        for r in rows:
            seq_tot[r["seq_id"]] = seq_tot.get(r["seq_id"], 0) + r["piece_tokens"]
        last = max(seq_tot)
        assert set(seq_tot) == set(range(last + 1))
        assert all(seq_tot[s] == 16 for s in range(last))
        assert 0 < seq_tot[last] <= 16

    def test_slice_path_identity(self, spark):
        df = self._mixed(spark)
        base = sorted(map(tuple, textops.pack_sequences(df, seq_tokens=10).collect()))
        for sl in (1, 7, 64):
            sliced = textops.pack_sequences(df, seq_tokens=10, slice_size=sl)
            assert sorted(map(tuple, sliced.collect())) == base

    def test_grouped_packing_is_per_group(self, spark):
        rows = [(i, "w " * 5, f"s{i % 2}") for i in range(6)]
        df = _src_df(spark, rows)
        out = textops.pack_sequences(df, seq_tokens=8, group_col="source").collect()
        # 3 docs x 5 tokens per group -> seqs 0 and 1 in EACH group
        per_group = {}
        for r in out:
            per_group.setdefault(r["source"], set()).add(r["seq_id"])
        assert per_group == {"s0": {0, 1}, "s1": {0, 1}}

    def test_empty_docs_dropped_and_validation(self, spark):
        df = _docs_df(spark, ["", "  ", "a b"])
        out = textops.pack_sequences(df, seq_tokens=4).collect()
        assert [r["doc_id"] for r in out] == [2]
        with pytest.raises(ValueError):
            textops.pack_sequences(df, seq_tokens=0)
        with pytest.raises(ValueError):
            textops.pack_sequences(df, seq_tokens=4, slice_size=0)

    def test_precounted_token_col(self, spark):
        df = _docs_df(spark, ["a b c", "d e"]).withColumn(
            "n", F.size(F.split("text", " "))
        )
        out = textops.pack_sequences(df, seq_tokens=4, token_col="n").collect()
        assert sum(r["piece_tokens"] for r in out) == 5


class TestRebalanceCorpus:
    def _corpus(self, spark):
        rows = [(i, f"text {i}", f"src{i % 3}") for i in range(90)]
        return _src_df(spark, rows)

    def test_matches_md5_brute_force_exactly(self, spark):
        import hashlib
        df = self._corpus(spark)
        tg = {"src0": 3, "src1": 1}
        got = sorted(r["doc_id"] for r in
                     textops.rebalance_corpus(df, tg, salt="s").collect())
        cnt = {"src0": 30, "src1": 30}
        D = 4
        T = min(cnt[g] * D // tg[g] for g in tg)
        exp = []
        for i in range(90):
            g = f"src{i % 3}"
            if g not in tg:
                continue
            d = int(hashlib.md5(f"{i}s".encode()).hexdigest()[:8], 16)
            if d * D * cnt[g] < tg[g] * T * (1 << 32):
                exp.append(i)
        assert got == sorted(exp)

    def test_binding_group_kept_whole_and_mixture_matches(self, spark):
        # binding group (weight large relative to its count) keeps ~all rows
        rows = [(i, "t", "rare" if i < 40 else "common") for i in range(4000)]
        df = _src_df(spark, rows)
        out = textops.rebalance_corpus(df, {"rare": 1, "common": 1}).collect()
        by = {}
        for r in out:
            by[r["source"]] = by.get(r["source"], 0) + 1
        assert by["rare"] == 40  # scarce side is the constraint: kept whole
        # equal weights -> common downsampled to ~40 (binomial, wide margin)
        assert 20 <= by["common"] <= 60

    def test_untargeted_groups_dropped_and_validation(self, spark):
        df = self._corpus(spark)
        out = textops.rebalance_corpus(df, {"src0": 1, "src2": 0})
        assert {r["source"] for r in out.collect()} == {"src0"}
        with pytest.raises(ValueError):
            textops.rebalance_corpus(df, {"src0": 0})

    def test_deterministic_and_stable_under_repartition(self, spark):
        df = self._corpus(spark)
        tg = {"src0": 2, "src1": 3, "src2": 5}
        a = sorted(r["doc_id"] for r in textops.rebalance_corpus(df, tg).collect())
        b = sorted(r["doc_id"] for r in
                   textops.rebalance_corpus(df.repartition(13), tg).collect())
        assert a == b and len(a) > 0

    def test_schema_unchanged(self, spark):
        df = self._corpus(spark)
        out = textops.rebalance_corpus(df, {"src0": 1})
        assert out.columns == df.columns


class TestCorpusShuffle:
    def test_matches_global_md5_order(self, spark):
        import hashlib
        df = _docs_df(spark, [f"d{i}" for i in range(64)])
        got = {r["doc_id"]: r["shuffle_rank"]
               for r in textops.corpus_shuffle(df, salt="z").collect()}
        order = sorted(range(64),
                       key=lambda i: (hashlib.md5(f"{i}z".encode()).hexdigest(), i))
        assert got == {i: r for r, i in enumerate(order)}

    def test_permutation_and_repartition_stability(self, spark):
        df = _docs_df(spark, [f"d{i}" for i in range(100)])
        a = textops.corpus_shuffle(df, salt="q")
        ranks = sorted(r["shuffle_rank"] for r in a.collect())
        assert ranks == list(range(100))
        b = textops.corpus_shuffle(df.repartition(9), salt="q")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_salt_changes_permutation(self, spark):
        df = _docs_df(spark, [f"d{i}" for i in range(50)])
        a = {r["doc_id"]: r["shuffle_rank"]
             for r in textops.corpus_shuffle(df, salt="a").collect()}
        b = {r["doc_id"]: r["shuffle_rank"]
             for r in textops.corpus_shuffle(df, salt="b").collect()}
        assert a != b

    def test_prefix_chars_identity_and_validation(self, spark):
        df = _docs_df(spark, [f"d{i}" for i in range(80)])
        a = sorted(map(tuple, textops.corpus_shuffle(df, prefix_chars=1).collect()))
        b = sorted(map(tuple, textops.corpus_shuffle(df, prefix_chars=3).collect()))
        assert a == b
        with pytest.raises(ValueError):
            textops.corpus_shuffle(df, prefix_chars=0)

    def test_no_global_window(self, spark):
        # the corpus-sized window partitions on _bucket; the only
        # partition-by-constant window runs over the tiny counts table
        df = _docs_df(spark, [f"d{i}" for i in range(10)])
        plan = textops.corpus_shuffle(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "_bucket" in plan.split("Window")[1]
