"""hash_join how= variants, hot-key salting, and the anti_join_keys
narrow/wide dispatch (SURVEY.md §2.4 A5 at engine scale)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from searchgov_spider_ray.pipelines import relational


BIG = 2**53  # beyond float64-exact integers: the corruption trap


def _sorted_rows(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(df.itertuples(index=False, name=None))


@pytest.fixture
def int_sides(ray_session):
    left = pd.DataFrame(
        {
            "k": [1, 2, 3, BIG + 7, BIG + 8, 5, 2],
            "lv": [10, 20, 30, 40, 50, 60, 70],
        }
    )
    right = pd.DataFrame({"k": [2, 3, BIG + 7, 9], "rv": [200, 300, 700, 900]})
    return left, right


class TestHowVariants:
    def test_inner_matches_pandas(self, int_sides):
        left, right = int_sides
        out = relational.hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", n_parts=5
        ).to_pandas()
        exp = left.merge(right, on="k", how="inner")
        assert _sorted_rows(out) == _sorted_rows(exp)

    def test_left_preserves_big_ints(self, int_sides):
        left, right = int_sides
        out = relational.hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", n_parts=5, how="left"
        ).to_pandas()
        assert len(out) == len(left)
        got = dict(zip(out["lv"], out["rv"]))
        # matched int64 payloads stay exact (no float64 round-trip)
        assert got[40] == 700 and got[20] == 200 and got[70] == 200
        # misses are nulls, not NaN-corrupted numbers
        assert pd.isna(got[10]) and pd.isna(got[50]) and pd.isna(got[60])
        # big join keys survive exactly
        assert set(out["k"]) == set(left["k"])

    def test_outer_both_side_misses_and_big_ints(self, int_sides):
        left, right = int_sides
        out = relational.hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", n_parts=5, how="outer"
        ).to_pandas()
        # 7 left rows (one key, 2, twice) + right-only keys {9}
        assert len(out) == len(left) + 1
        # right-only row carries its payload with a null left side
        r9 = out[out["rv"] == 900]
        assert len(r9) == 1 and pd.isna(r9["lv"].iloc[0]) and int(r9["k"].iloc[0]) == 9
        # big int keys and payloads exact through the outer padding
        assert int(out.loc[out["lv"] == 40, "rv"].iloc[0]) == 700
        assert (BIG + 8) in set(int(k) for k in out["k"])

    def test_outer_null_keys_unmatched_both_sides(self, ray_session):
        left = pa.table({"k": pa.array([1, None, 2], type=pa.int64()), "lv": [10, 11, 12]})
        right = pa.table({"k": pa.array([2, None], type=pa.int64()), "rv": [200, 201]})
        out = relational.hash_join(
            rd.from_arrow(left), rd.from_arrow(right), on="k", n_parts=3, how="outer"
        ).to_pandas()
        # SQL: NULL keys match nothing — each null-key row appears
        # unmatched on its own side
        assert len(out) == 4
        lnull = out[out["lv"] == 11]
        assert len(lnull) == 1 and pd.isna(lnull["rv"].iloc[0])
        rnull = out[out["rv"] == 201]
        assert len(rnull) == 1 and pd.isna(rnull["lv"].iloc[0]) and pd.isna(rnull["k"].iloc[0])

    def test_outer_string_keys(self, ray_session):
        left = pd.DataFrame({"k": ["a", "b"], "lv": [1, 2]})
        right = pd.DataFrame({"k": ["b", "c"], "rv": [20, 30]})
        out = relational.hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", n_parts=4, how="outer"
        ).to_pandas()
        assert len(out) == 3
        assert set(out["k"]) == {"a", "b", "c"}
        assert int(out.loc[out["k"] == "b", "rv"].iloc[0]) == 20

    def test_anti_and_semi(self, int_sides):
        left, right = int_sides
        anti = relational.hash_join(
            rd.from_pandas(left), rd.from_pandas(right[["k"]]), on="k", n_parts=5, how="anti"
        ).to_pandas()
        semi = relational.hash_join(
            rd.from_pandas(left), rd.from_pandas(right[["k"]]), on="k", n_parts=5, how="semi"
        ).to_pandas()
        assert sorted(anti["lv"]) == [10, 50, 60]  # keys 1, BIG+8, 5
        assert sorted(semi["lv"]) == [20, 30, 40, 70]
        assert (BIG + 8) in set(anti["k"])  # exact at >= 2^53

    def test_anti_keeps_null_left_keys(self, ray_session):
        # SQL NOT EXISTS: a NULL key never matches, so anti KEEPS it
        left = pa.table({"k": pa.array([1, None, 2], type=pa.int64()),
                         "lv": pa.array([10, 11, 12])})
        right = pa.table({"k": pa.array([2], type=pa.int64())})
        out = relational.hash_join(
            rd.from_arrow(left), rd.from_arrow(right), on="k", n_parts=3, how="anti"
        ).to_pandas()
        assert sorted(out["lv"]) == [10, 11]

    def test_string_keys(self, ray_session):
        left = pd.DataFrame({"k": ["a", "b", "c", "b"], "lv": [1, 2, 3, 4]})
        right = pd.DataFrame({"k": ["b", "z"], "rv": [20, 26]})
        inner = relational.hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", n_parts=4
        ).to_pandas()
        assert _sorted_rows(inner) == _sorted_rows(left.merge(right, on="k"))
        anti = relational.hash_join(
            rd.from_pandas(left), rd.from_pandas(right[["k"]]), on="k", n_parts=4, how="anti"
        ).to_pandas()
        assert sorted(anti["lv"]) == [1, 3]

    def test_unsupported_how_raises(self, int_sides):
        left, right = int_sides
        with pytest.raises(ValueError):
            relational.hash_join(
                rd.from_pandas(left), rd.from_pandas(right), on="k", how="cross"
            )


class TestSkewSalting:
    def test_salted_parts_balance(self):
        # 90%-one-key fixture: without salting the hot key's partition
        # holds 9k rows; salted, no partition exceeds 2x the median
        n, n_parts, n_salts = 10_000, 16, 16
        keys = np.where(np.arange(n) % 10 == 0, np.arange(n) + 100, 7).astype(np.int64)
        base = relational._part_of(keys, n_parts)
        is_hot = keys == 7
        salted = relational._salted_left_parts(base, is_hot, n_salts, n_parts)
        counts = np.bincount(salted, minlength=n_parts)
        assert counts.max() <= 2 * np.median(counts)
        # the unsalted distribution fails the same bar (sanity)
        raw = np.bincount(base, minlength=n_parts)
        assert raw.max() > 2 * np.median(raw)

    def test_replicated_right_covers_all_salted_parts(self):
        base = relational._part_of(np.array([7], dtype=np.int64), 16)
        take, parts = relational._replicated_right_parts(
            base, np.array([True]), 16, 16
        )
        left_parts = relational._salted_left_parts(
            relational._part_of(np.full(1000, 7, dtype=np.int64), 16),
            np.ones(1000, dtype=bool), 16, 16,
        )
        assert set(left_parts) <= set(parts)

    def test_salted_join_parity(self, ray_session):
        # planted skew: 90% of left rows share one key; the salted join
        # must produce exactly the unsalted (and pandas) result
        n = 3000
        rng_k = np.where(np.arange(n) % 10 == 0, (np.arange(n) % 50) + 100, 7)
        left = pd.DataFrame({"k": rng_k.astype(np.int64), "lv": np.arange(n)})
        right = pd.DataFrame(
            {"k": np.arange(200, dtype=np.int64), "rv": np.arange(200) * 3}
        )
        exp = left.merge(right, on="k", how="inner")
        out = relational.hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k",
            n_parts=8, salt_hot=True, n_salts=8,
        ).to_pandas()
        assert _sorted_rows(out) == _sorted_rows(exp)
        anti = relational.hash_join(
            rd.from_pandas(left), rd.from_pandas(right[["k"]]), on="k",
            n_parts=8, how="anti", salt_hot=True, n_salts=8,
        ).to_pandas()
        exp_anti = left[~left["k"].isin(right["k"])]
        assert _sorted_rows(anti) == _sorted_rows(exp_anti[["k", "lv"]])


class TestAntiJoinKeysDispatch:
    def test_narrow_wide_parity_int(self, ray_session):
        left = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "v": np.arange(100)})
        right = pd.DataFrame({"k": np.arange(0, 100, 3, dtype=np.int64)})
        narrow = relational.anti_join_keys(
            rd.from_pandas(left), rd.from_pandas(right), "k", broadcast_below=10**9
        ).to_pandas()
        wide = relational.anti_join_keys(
            rd.from_pandas(left), rd.from_pandas(right), "k",
            broadcast_below=0, n_parts=7,
        ).to_pandas()
        exp = left[left["k"] % 3 != 0]
        assert _sorted_rows(narrow) == _sorted_rows(exp)
        assert _sorted_rows(wide) == _sorted_rows(exp)

    def test_narrow_wide_parity_string(self, ray_session):
        left = pd.DataFrame({"k": [f"u{i}" for i in range(50)], "v": range(50)})
        right = pd.DataFrame({"k": [f"u{i}" for i in range(0, 50, 2)]})
        narrow = relational.anti_join_keys(
            rd.from_pandas(left), rd.from_pandas(right), "k", broadcast_below=10**9
        ).to_pandas()
        wide = relational.anti_join_keys(
            rd.from_pandas(left), rd.from_pandas(right), "k",
            broadcast_below=0, n_parts=7,
        ).to_pandas()
        exp = left[left["v"] % 2 == 1]
        assert _sorted_rows(narrow) == _sorted_rows(exp)
        assert _sorted_rows(wide) == _sorted_rows(exp)


class TestNullKeyHandling:
    """Review-found regressions: a NULL key in any batch must not flip
    the partition function's dtype, and NULL right keys follow SQL
    (match nothing) on every path."""

    def test_nullable_int_batch_keeps_partitioning(self, ray_session):
        left = pa.table({"k": pa.array([1, None, 2, 5], type=pa.int64()),
                         "lv": pa.array([10, 11, 12, 15])})
        right = pa.table({"k": pa.array([2, 5], type=pa.int64()),
                          "rv": pa.array([20, 50])})
        inner = relational.hash_join(
            rd.from_arrow(left), rd.from_arrow(right), on="k", n_parts=5
        ).to_pandas()
        assert sorted(zip(inner["lv"], inner["rv"])) == [(12, 20), (15, 50)]
        anti = relational.hash_join(
            rd.from_arrow(left), rd.from_arrow(right.select(["k"])), on="k",
            n_parts=5, how="anti",
        ).to_pandas()
        assert sorted(anti["lv"]) == [10, 11]  # null-key row kept

    def test_null_right_keys_match_nothing(self, ray_session):
        left = pa.table({"k": pa.array([1, None, 2], type=pa.int64()), "lv": pa.array([10, 11, 12])})
        right = pa.table({"k": pa.array([2, None], type=pa.int64()), "rv": pa.array([20, 99])})
        inner = relational.hash_join(
            rd.from_arrow(left), rd.from_arrow(right), on="k", n_parts=3
        ).to_pandas()
        assert sorted(zip(inner["lv"], inner["rv"])) == [(12, 20)]
        semi = relational.hash_join(
            rd.from_arrow(left), rd.from_arrow(right.select(["k"])), on="k",
            n_parts=3, how="semi",
        ).to_pandas()
        assert sorted(semi["lv"]) == [12]

    def test_anti_join_keys_broadcast_null_right(self, ray_session):
        left_i = pa.table({"k": pa.array([1, 2], type=pa.int64()), "v": pa.array([1, 2])})
        right_i = pa.table({"k": pa.array([2, None], type=pa.int64())})
        out = relational.anti_join_keys(
            rd.from_arrow(left_i), rd.from_arrow(right_i), "k", broadcast_below=10**9
        ).to_pandas()
        assert sorted(out["v"]) == [1]
        # a string NULL must not become the literal key "None"
        left_s = pd.DataFrame({"k": ["a", "None"], "v": [1, 2]})
        right_s = pa.table({"k": pa.array(["b", None], type=pa.string())})
        out_s = relational.anti_join_keys(
            rd.from_pandas(left_s), rd.from_arrow(right_s), "k", broadcast_below=10**9
        ).to_pandas()
        assert sorted(out_s["v"]) == [1, 2]

    def test_hot_key_detection_finds_planted_skew(self, ray_session):
        n = 3000
        keys = np.where(np.arange(n) % 10 == 0, (np.arange(n) % 50) + 100, 7)
        ds = rd.from_pandas(pd.DataFrame({"k": keys.astype(np.int64), "v": np.arange(n)}))
        hot = relational._detect_hot_keys(ds, "k", False, n_parts=8, hot_factor=2.0)
        assert 7 in set(hot.tolist())
