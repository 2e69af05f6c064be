"""Unit tests for the pure-function layer: hashing, urlnorm, content,
textstats, simdedup. Mirrors the reference's table-driven operator
tests (SURVEY.md §5.2)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from searchgov_spider_ray.functions import content, simdedup, textstats, urlnorm
from searchgov_spider_ray.functions.hashing import (
    sha256_hex,
    shake_id,
    xxhash64,
    xxhash64_array,
)


class TestXXHash64:
    # Published xxHash64 test vectors (xxHash repo / python-xxhash docs).
    def test_known_vectors(self):
        assert xxhash64(b"") == 0xEF46DB3751D8E999
        assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
        assert xxhash64(b"abc") == 0x44BC2CF5AD770999
        assert xxhash64(b"Nobody inspects the spammish repetition") == 0xFBCEA83C8A378BF1

    def test_seed_changes_hash(self):
        assert xxhash64(b"abc", 1) != xxhash64(b"abc", 0)

    def test_str_equals_utf8_bytes(self):
        assert xxhash64("héllo") == xxhash64("héllo".encode("utf-8"))

    def test_array_matches_scalar(self):
        urls = ["", "a", "https://example.gov/x?a=1", "x" * 100]
        arr = xxhash64_array(urls)
        assert arr.dtype == np.uint64
        assert [int(v) for v in arr] == [xxhash64(u) for u in urls]

    def test_array_matches_scalar_all_tail_classes(self):
        # every length 0..96 hits every (stripe, 8-byte, 4-byte, 1-byte)
        # tail combination of the spec; mixed lengths exercise the
        # length-sorted lockstep prefixes and the un-permute
        import random

        rng = random.Random(123)
        vals = [bytes(rng.randrange(256) for _ in range(n)) for n in range(97)]
        vals += [bytes(rng.randrange(256) for _ in range(n)) for n in (255, 256, 4096, 4097)]
        rng.shuffle(vals)
        for seed in (0, 7, 2**64 - 1):
            arr = xxhash64_array(vals, seed)
            assert [int(v) for v in arr] == [xxhash64(v, seed) for v in vals]

    def test_ids(self):
        assert sha256_hex("abc") == (
            "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
        )
        assert len(shake_id("job", "x")) == 10
        assert shake_id("a") != shake_id("b")


class TestCanonicalize:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("HTTP://Example.GOV/Path", "http://example.gov/Path"),
            ("https://example.gov:443/a", "https://example.gov/a"),
            ("https://example.gov:8443/a", "https://example.gov:8443/a"),
            ("https://example.gov", "https://example.gov/"),
            ("https://example.gov/a/../b/./c", "https://example.gov/b/c"),
            ("https://example.gov/a#frag", "https://example.gov/a"),
            ("https://example.gov/a?b=2&a=1", "https://example.gov/a?a=1&b=2"),
            ("https://example.gov/a%7Eb", "https://example.gov/a~b"),
            ("https://example.gov/a%2fb", "https://example.gov/a%2Fb"),
            ("https://example.gov/dir/", "https://example.gov/dir/"),
            ("  https://example.gov/a\n", "https://example.gov/a"),
        ],
    )
    def test_cases(self, raw, expected):
        assert urlnorm.canonicalize(raw) == expected

    def test_idempotent(self):
        urls = [
            "https://Example.gov:443/a/../b?z=1&a=&a=2#f",
            "http://sub.agency.example.gov/path/file.PDF?x=%7e",
        ]
        for u in urls:
            once = urlnorm.canonicalize(u)
            assert urlnorm.canonicalize(once) == once

    def test_surt_sorts_by_domain(self):
        s1 = urlnorm.surt("https://a.example.gov/z")
        s2 = urlnorm.surt("https://b.example.gov/a")
        s3 = urlnorm.surt("https://example.com/a")
        # example.gov hosts group together under sort, before/after .com block
        assert s1.startswith("gov,example,a)") and s2.startswith("gov,example,b)")
        assert sorted([s3, s1, s2]) == [s3, s1, s2]

    def test_parts(self):
        u = "https://www.example.gov/docs/Report.PDF?x=1"
        assert urlnorm.host_of(u) == "www.example.gov"
        assert urlnorm.path_of(u) == "/docs/Report.PDF"
        assert urlnorm.query_of(u) == "x=1"
        assert urlnorm.basename_extension(u) == ("Report.PDF", ".pdf")
        assert urlnorm.ensure_http_prefix("example.gov/a") == "https://example.gov/a"
        assert urlnorm.ensure_http_prefix("http://x.gov") == "http://x.gov"
        assert urlnorm.join_url("https://a.gov/dir/page.html", "../other") == "https://a.gov/other"

    def test_separate_file_name(self):
        assert urlnorm.separate_file_name("myFile_name2023v1") == "my File name 2023 v 1"


class TestContent:
    def test_sanitize_text(self):
        assert content.sanitize_text("a\x00b&nbsp;c   d\n\n\n") == "ab c d"
        assert content.sanitize_text("   \n\x07  ") is None
        assert content.sanitize_text(None) is None

    def test_sanitize_series_matches_scalar_on_simple_text(self):
        s = pd.Series(["a&nbsp;b   c", "x\x01y"])
        out = content.sanitize_series(s)
        assert out.tolist() == ["a b c", "xy"]

    def test_decode_body(self):
        assert content.decode_body("héllo".encode("utf-8")) == "héllo"
        # bare UTF-16 BOM: detection chain decodes it to empty text
        # (reference chain: utf-8 fails -> detect utf-16 -> decode)
        assert content.decode_body(b"\xff\xfe") == ""
        # detection miss falls through to latin-1 (total fallback)
        assert content.decode_body(b"\xff\xfe\xfd" * 2) != ""

    def test_detect_encoding_viscii_remap(self, monkeypatch):
        # reference encoding.py:15-17 — python lacks VISCII, use cp1258
        monkeypatch.setattr(content, "_detect_raw", lambda data: "VISCII")
        assert content.detect_encoding(b"xin chao") == "cp1258"
        monkeypatch.setattr(content, "_detect_raw", lambda data: None)
        assert content.detect_encoding(b"") is None

    def test_decode_http_response_chain(self, monkeypatch):
        # utf-8 first (encoding.py:25-26)
        assert content.decode_http_response("héllo".encode("utf-8")) == "héllo"
        # detected-encoding branch (encoding.py:27-30)
        monkeypatch.setattr(content, "_detect_raw", lambda data: "cp1252")
        assert content.decode_http_response("café".encode("cp1252")) == "café"
        # total fallback = str(bytes) repr, reference encoding.py:31-32
        monkeypatch.setattr(content, "_detect_raw", lambda data: None)
        assert content.decode_http_response(b"\xff\xfe") == str(b"\xff\xfe")

    def test_language_code(self):
        assert content.get_language_code("en-US") == "en"
        assert content.get_language_code("FR") == "fr"
        assert content.get_language_code("") is None
        assert content.get_language_code("1x") is None


class TestTextStats:
    def test_detect_lang(self):
        en = "The quick brown fox jumps over the lazy dog and the cat is in the house"
        es = "la casa de los niños es muy grande y el perro que vive allí también"
        assert textstats.detect_lang(en) == "en"
        assert textstats.detect_lang(es) == "es"
        assert textstats.detect_lang("") is None

    def test_token_counts(self):
        out = textstats.token_counts(pd.Series(["a b  c", "hello, world!", ""]))
        assert out["ws_tokens"].tolist() == [3, 2, 0]
        assert out["bpe_tokens"].tolist() == [3, 4, 0]

    def test_quality_scores(self):
        out = textstats.quality_scores(pd.Series(["The cat sat on the mat."]))
        row = out.iloc[0]
        assert row["n_words"] == 6
        assert row["stopword_ratio"] == pytest.approx(3 / 6)
        assert 0 < row["punct_ratio"] < 0.1

    def test_fingerprint_and_hashes(self):
        a = "word " * 100
        b = "word " * 100 + "tail"
        assert textstats.fingerprint(a) == textstats.fingerprint(a)
        h = textstats.content_hashes(pd.Series(["A  b", "a b", "c"]))
        assert h[0] == h[1] != h[2]


class TestSimDedup:
    def test_minhash_similar_docs_agree(self):
        mh = simdedup.MinHasher(num_perm=128)
        base = "the quick brown fox jumps over the lazy dog " * 20
        near = base + "extra tail words here"
        far = "completely different content about tax forms " * 20
        s1 = mh.signature(simdedup.shingle_hashes(base))
        s2 = mh.signature(simdedup.shingle_hashes(near))
        s3 = mh.signature(simdedup.shingle_hashes(far))
        sim12 = (s1 == s2).mean()
        sim13 = (s1 == s3).mean()
        assert sim12 > 0.6 > sim13

    def test_band_keys_lsh(self):
        mh = simdedup.MinHasher(num_perm=128)
        sig = mh.signature(simdedup.shingle_hashes("a b c d e f g h i j"))
        keys = mh.band_keys(sig, bands=16)
        assert len(keys) == 16
        # identical docs share all bands
        assert np.array_equal(keys, mh.band_keys(sig, bands=16))

    def test_simhash_hamming(self):
        a = simdedup.simhash("the quick brown fox jumps over the lazy dog " * 10)
        b = simdedup.simhash("the quick brown fox jumps over the lazy cat " * 10)
        c = simdedup.simhash("totally unrelated text about something else " * 10)
        d_ab = simdedup.hamming64(np.array([a], dtype=np.uint64), np.array([b], dtype=np.uint64))[0]
        d_ac = simdedup.hamming64(np.array([a], dtype=np.uint64), np.array([c], dtype=np.uint64))[0]
        assert d_ab < d_ac

    def test_jaccard(self):
        a = np.array([1, 2, 3, 4], dtype=np.uint64)
        b = np.array([3, 4, 5, 6], dtype=np.uint64)
        assert simdedup.jaccard(a, b) == pytest.approx(2 / 6)
        assert simdedup.jaccard(a, a) == 1.0


class TestInSorted:
    """_in_sorted is the broadcast membership filter used by
    customers_without_orders / users_first_seen_late; the sf fixtures
    exercise only its all-present path, so pin both sides here."""

    def test_membership(self):
        import numpy as np

        from searchgov_spider_ray.pipelines.queries import _in_sorted

        arr = np.array([2, 5, 7, 100], dtype=np.int64)
        keys = np.array([1, 2, 3, 5, 7, 99, 100, 101], dtype=np.int64)
        got = _in_sorted(arr, keys)
        assert got.tolist() == [False, True, False, True, True, False, True, False]

    def test_empty_arr(self):
        import numpy as np

        from searchgov_spider_ray.pipelines.queries import _in_sorted

        assert _in_sorted(np.array([], dtype=np.int64), np.array([1, 2], dtype=np.int64)).tolist() == [False, False]


class TestSlidingWindow:
    """events_sliding_counts RANGE-frame edge semantics: peers at an
    identical ts share one frame, the 1-hour-preceding boundary is
    inclusive, and 1h+1us is exclusive — pinned against hand-computed
    expectations (the sf fixtures only exercise random gaps)."""

    def test_range_frame_boundaries(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchgov_spider_ray.pipelines.queries import events_sliding_counts

        ts = pd.to_datetime(
            format="ISO8601",
            arg=[
                "2024-01-01 00:00:00",
                "2024-01-01 00:30:00",
                "2024-01-01 01:00:00",  # exactly 1h after e0: inclusive
                "2024-01-01 01:00:00",  # peer row, same frame as above
                "2024-01-01 02:00:00.000001",  # 1h+1us after the peers: exclusive
            ]
        ).astype("datetime64[us]")
        df = pd.DataFrame(
            {
                "event_id": pd.Series(range(5), dtype="int64"),
                "ts": ts,
                "user_id": pd.Series([7] * 5, dtype="int64"),
                "value": [1.25] * 5,
            }
        )
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "events.parquet")

        out = events_sliding_counts(str(tmp_path)).to_pandas().sort_values("event_id")
        assert out["cnt_1h"].tolist() == [1, 2, 4, 4, 1]
        assert out["sum_value_micros_1h"].tolist() == [n * 1_250_000 for n in (1, 2, 4, 4, 1)]


class TestAsofAttribution:
    """events_asof_attribution edge semantics: equal-ts view is
    eligible (<=), equal-ts tie broken toward max view_id, clicks with
    no prior view dropped (inner as-of)."""

    def test_boundaries_and_ties(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchgov_spider_ray.pipelines.queries import events_asof_attribution

        ts = pd.to_datetime(
            [
                "2024-01-01 00:00:00",  # e0 click: before any view -> dropped
                "2024-01-01 00:10:00",  # e1 view
                "2024-01-01 00:10:00",  # e2 view, same ts as e1 -> tie
                "2024-01-01 00:10:00",  # e3 click at the views' exact ts -> matches e2
                "2024-01-01 00:20:00",  # e4 click -> still e2
                "2024-01-01 00:30:00",  # e5 scroll: ignored entirely
            ]
        ).astype("datetime64[us]")
        df = pd.DataFrame(
            {
                "event_id": pd.Series(range(6), dtype="int64"),
                "ts": ts,
                "user_id": pd.Series([9] * 6, dtype="int64"),
                "event_type": ["click", "view", "view", "click", "click", "scroll"],
            }
        )
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "events.parquet")

        out = events_asof_attribution(str(tmp_path)).to_pandas().sort_values("click_id")
        assert out["click_id"].tolist() == [3, 4]
        assert out["view_id"].tolist() == [2, 2]
        assert out["gap_us"].tolist() == [0, 600_000_000]


class TestStratifiedSample:
    """sample_stratified is a pure function of (key, stratum): identical
    survivors under any partitioning, exact per-row predicate."""

    def test_partition_invariance(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from searchgov_spider_ray.pipelines.training import sample_stratified

        df = pd.DataFrame(
            {
                "doc_id": pd.Series(range(1000), dtype="int64"),
                "lang": ["en" if i % 3 == 0 else "de" for i in range(1000)],
            }
        )
        rates = {"en": 200_000}
        one = sample_stratified(
            rd.from_pandas(df).repartition(1), rate_micros=rates, default_micros=800_000
        ).to_pandas()
        many = sample_stratified(
            rd.from_pandas(df).repartition(13), rate_micros=rates, default_micros=800_000
        ).to_pandas()
        assert sorted(one["doc_id"]) == sorted(many["doc_id"])
        # rough rate sanity: strata land near their targets
        en = one[one["lang"] == "en"]
        de = one[one["lang"] == "de"]
        assert 0.1 < len(en) / 334 < 0.3
        assert 0.7 < len(de) / 666 < 0.9


class TestTopTerms:
    def test_tf_then_df_then_term(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from searchgov_spider_ray.pipelines.training import top_distinctive_terms

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([0, 1, 2], dtype="int64"),
                    "text": [
                        "apple apple banana cherry",  # tf: apple 2 wins; banana/cherry tie on tf
                        "banana banana cherry",
                        "cherry date",
                    ],
                }
            )
        )
        out = top_distinctive_terms(docs, k=2).to_pandas()
        d0 = out[out["doc_id"] == 0].sort_values("rank")
        # rank 1: apple (tf 2); rank 2: banana (tf 1, df 2) beats cherry (df 3)
        assert d0["term"].tolist() == ["apple", "banana"]
        assert d0["tf"].tolist() == [2, 1]
        assert d0["df"].tolist() == [1, 2]
        d2 = out[out["doc_id"] == 2].sort_values("rank")
        # date (df 1) outranks cherry (df 3) at equal tf
        assert d2["term"].tolist() == ["date", "cherry"]


def test_xxhash_array_multi_block(monkeypatch):
    """Force the length-sorted lockstep path to split across several
    padded-matrix blocks; hashes must be identical to single-block."""
    import searchgov_spider_ray.functions.hashing as H

    vals = [("x%d" % i) * (i % 37 + 1) for i in range(500)] + ["y" * 5000]
    expect = H.xxhash64_array(vals)
    monkeypatch.setattr(H, "_BLOCK_BYTES", 4096)  # tiny budget -> many blocks
    got = H.xxhash64_array(vals)
    assert (got == expect).all()


class TestCanonicalizeTotal:
    def test_malformed_urls_never_raise(self):
        bad = [
            "http://h:8o80/x",      # non-numeric port
            "http://[x",            # unbalanced IPv6 bracket
            "https://example.gov:99999999999999999999/x",
        ]
        for u in bad:
            out = urlnorm.canonicalize(u)
            assert out.startswith("invalid://"), out
        # batch path routes the same inputs through the scalar fallback
        outs = urlnorm.canonicalize_batch(np.array(bad, dtype=object))
        assert all(o.startswith("invalid://") for o in outs)

    def test_invalid_form_is_offsite_denied(self):
        from searchgov_spider_ray.stages.scope import JobScope

        scope = JobScope(allowed_domains=["example.gov"])
        canon = urlnorm.canonicalize("http://h:8o80/x")
        reason = scope.evaluate(pd.Series([canon], dtype="object")).iloc[0]
        assert reason == "offsite"


class TestEventsJsonStats:
    """The r4 verdict's adversarial-props contract: the kernel's real
    JSON parse must agree with DuckDB's json_extract_string + CAST on
    nested / string / float / exponent / duplicate-key shapes (TRY_CAST
    stands in for CAST so non-castable values compare as NULL instead
    of raising — the documented KNOWN LATENT #4 error-semantics gap)."""

    SHAPES = [
        '{"k": 5}',
        '{"k": -7}',
        '{"k": 0}',
        '{"a": {"k": 99}}',            # nested only -> NULL
        '{"k": 11, "a": {"k": 99}}',   # top-level wins over nested
        '{"k": "12"}',                 # numeric string -> 12
        '{"k": "  13  "}',             # padded numeric string -> 13
        '{"k": "xyz"}',                # non-numeric string -> NULL
        '{"k": "1.5"}',                # decimal string -> rounds
        '{"k": 1.5}',                  # float: half away from zero -> 2
        '{"k": -2.5}',                 # -> -3
        '{"k": 2.0}',                  # integral float -> 2
        '{"k": 1e5}',                  # exponent form -> 100000
        '{"k": 1E+3}',                 # -> 1000
        '{"s": "\\"k\\": 3"}',         # k inside a string value -> NULL
        '{"k": null}',
        '{"k": true}',                 # bool -> NULL
        '{"kk": 4}',                   # different key -> NULL
        '{"k": [1,2]}',                # array -> NULL
        '{"k": {"x": 1}}',             # object -> NULL
        '{"k":1,"k":2}',               # duplicate key: FIRST wins -> 1
        # int64-max passthrough is pinned by the per-value test below;
        # here a sum-safe big int keeps the oracle's SUM inside BIGINT
        '{"k": 922337203685477580}',
        '{"k": 12345678901234567890}', # > int64 -> NULL
        '{"k": 9.3e18}',               # float overflow -> NULL
        "{}",
    ]
    PER_VALUE_ONLY = ['{"k": 9223372036854775807}']  # int64 max

    def test_adversarial_props_agree_with_duckdb(self, ray_session, tmp_path):
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchgov_spider_ray.pipelines.queries import events_json_stats

        df = pd.DataFrame(
            {
                "event_type": [f"t{i % 3}" for i in range(len(self.SHAPES))],
                "props": self.SHAPES,
            }
        )
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "events.parquet")

        got = (
            events_json_stats(str(tmp_path))
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("events", df)
        want = con.execute(
            """
            WITH x AS (
                SELECT event_type,
                       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                FROM events
            )
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   CAST(MIN(k) AS BIGINT) AS min_k,
                   CAST(MAX(k) AS BIGINT) AS max_k
            FROM x WHERE k IS NOT NULL
            GROUP BY 1 ORDER BY 1
            """
        ).df().reset_index(drop=True)
        assert got["event_type"].tolist() == want["event_type"].tolist()
        for c in ["n", "sum_k", "min_k", "max_k"]:
            assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist(), c

    def test_per_value_extraction_matches_duckdb(self):
        """Row-level pin of _json_k_bigint against TRY_CAST, shape by
        shape — failures name the exact diverging props string."""
        import duckdb

        from searchgov_spider_ray.pipelines.queries import _json_k_bigint

        con = duckdb.connect()
        for s in self.SHAPES + self.PER_VALUE_ONLY:
            want = con.execute(
                "SELECT TRY_CAST(json_extract_string(?, '$.k') AS BIGINT)", [s]
            ).fetchone()[0]
            got = _json_k_bigint(s)
            assert got == (None if want is None else int(want)), s

    def test_malformed_json_drops(self):
        from searchgov_spider_ray.pipelines.queries import _json_k_bigint

        # json_extract RAISES on malformed input; the kernel drops the
        # row instead (KNOWN LATENT #4) — pin the drop, not the raise
        assert _json_k_bigint("not json") is None
        assert _json_k_bigint("") is None
        assert _json_k_bigint(None) is None
