"""BPE merge learning/encoding: exact agreement with a pure-Python
reference, greedy-merge edge cases, and early-stop behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.bpe import (
    chars,
    encode_words,
    learn_bpe,
    merge_apply,
)


def _py_bpe(word_freq: dict[str, int], n: int):
    """Same recurrence, pure Python: overlapping pair counts, argmax by
    (count DESC, pair lexicographic ASC), greedy left-to-right merge."""
    state = {w: list(w) for w in word_freq}
    merges = []
    for step in range(1, n + 1):
        cnt: dict[tuple[str, str], int] = {}
        for w, f in word_freq.items():
            s = state[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + f
        if not cnt:
            break
        (l, r), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, l + r, c))
        for w in state:
            out: list[str] = []
            for x in state[w]:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            state[w] = out
    return merges, state


def test_learn_matches_python_reference(spark):
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaa": 4,
          "aaaa": 2, "a": 9}
    df = spark.createDataFrame(list(wf.items()), ["word", "freq"])
    got_merges, got_state = learn_bpe(df, num_merges=12)
    exp_merges, exp_state = _py_bpe(wf, 12)
    assert got_merges == exp_merges
    assert {r.word: list(r.syms) for r in got_state.collect()} == exp_state
    # encode_words replays the same merges to the same pieces
    enc = {r.word: list(r.pieces) for r in encode_words(df, got_merges).collect()}
    assert enc == exp_state


def test_merge_apply_is_greedy_left_to_right(spark):
    """The aggregate fold must equal the greedy non-overlapping scan,
    including the left==right run cases."""
    cases = [
        (["a", "a", "a"], "a", "a", ["aa", "a"]),
        (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
        (["a", "b", "b"], "a", "b", ["ab", "b"]),
        (["a", "a", "b"], "a", "b", ["a", "ab"]),
        (["aa", "a", "a"], "aa", "a", ["aaa", "a"]),
        (["a", "a", "aa"], "a", "aa", ["a", "aaa"]),
        (["x"], "a", "b", ["x"]),
        ([], "a", "b", []),
    ]
    df = spark.createDataFrame(
        [(i, syms, l, r, exp) for i, (syms, l, r, exp) in enumerate(cases)],
        ["i", "syms", "l", "r", "exp"],
    )
    for i, (syms, l, r, exp) in enumerate(cases):
        got = (
            df.where(F.col("i") == i)
            .select(merge_apply(F.col("syms"), l, r).alias("m"))
            .collect()[0]["m"]
        )
        assert list(got) == exp, f"case {i}: {syms} merge ({l},{r})"


def test_early_stop_when_no_pairs_remain(spark):
    # single-char words only: zero adjacent pairs, zero merges
    df = spark.createDataFrame([("a", 3), ("b", 2)], ["word", "freq"])
    merges, state = learn_bpe(df, num_merges=5)
    assert merges == []
    assert {r.word: list(r.syms) for r in state.collect()} == {
        "a": ["a"],
        "b": ["b"],
    }
    # two-char word: exactly one merge possible, then stop
    df2 = spark.createDataFrame([("ab", 3)], ["word", "freq"])
    merges2, state2 = learn_bpe(df2, num_merges=5)
    assert merges2 == [(1, "a", "b", "ab", 3)]
    assert [list(r.syms) for r in state2.collect()] == [["ab"]]


def test_chars_splits_to_characters(spark):
    df = spark.createDataFrame([("abc",), ("x",)], ["w"])
    got = {r.w: list(r.c) for r in df.select("w", chars("w").alias("c")).collect()}
    assert got == {"abc": ["a", "b", "c"], "x": ["x"]}
