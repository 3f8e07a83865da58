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


def test_batched_equals_sequential_on_vocab(spark):
    """learn_bpe_batched must reproduce the strict sequential merge list
    (steps, pairs, counts) and final state exactly — here on a vocabulary
    mixing overlap runs, shared symbols, and deep merge chains."""
    from telemetry_parquet_spark.datapipe.bpe import learn_bpe_batched

    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaa": 4,
          "aaaa": 2, "a": 9}
    df = spark.createDataFrame(list(wf.items()), ["word", "freq"])
    exp_merges, exp_state = _py_bpe(wf, 12)
    got_merges, got_state = learn_bpe_batched(df, num_merges=12, batch_m=8)
    assert got_merges == exp_merges
    assert {r.word: list(r.syms) for r in got_state.collect()} == exp_state


def test_batched_handles_aliasing_and_ties(spark):
    """Adversarial corpora for every batch-closing rule: merged-string
    aliasing ('ab' already a symbol via earlier merges / concat collisions
    'ab'+'c' vs 'a'+'bc'), count ties that must fall to the lexicographic
    tiebreak, and created pairs whose counts sit exactly at the admit
    boundary. Equality with the sequential pure-Python replay proves the
    selector stopped every time it had to."""
    from telemetry_parquet_spark.datapipe.bpe import learn_bpe_batched

    vocabs = [
        # aliasing: frequent (a,b) merge creates symbol 'ab' while 'ab'-ish
        # contexts keep the created pairs hot
        {"abab": 10, "abc": 9, "ab": 8, "cab": 7, "abcab": 6},
        # exact count ties everywhere: lexicographic order decides each step
        {"ab": 3, "cd": 3, "ef": 3, "gh": 3},
        # created-pair preemption: merging (a,b) in 'xabx' makes (x,ab)/(ab,x)
        # nearly as frequent as the next original pair
        {"xabx": 5, "yz": 5, "xa": 1, "bx": 1},
        # concat collision: 'ab'+'c' vs 'a'+'bc' both merge to 'abc'
        {"abc": 6, "a": 3, "ab": 5, "bc": 5, "abcabc": 2},
        # overlap runs with left==right pairs
        {"aaaa": 4, "aaab": 3, "baaa": 2, "bb": 7},
    ]
    for wf in vocabs:
        df = spark.createDataFrame(list(wf.items()), ["word", "freq"])
        for n in (6, 10):
            exp_merges, exp_state = _py_bpe(wf, n)
            got_merges, got_state = learn_bpe_batched(df, num_merges=n, batch_m=4)
            assert got_merges == exp_merges, (wf, n)
            assert {
                r.word: list(r.syms) for r in got_state.collect()
            } == exp_state, (wf, n)


def test_batched_random_corpora_property(spark):
    """Randomized (seeded) small-alphabet vocabularies — small alphabets
    maximize symbol collisions, ties, aliasing, and created-pair pressure,
    the exact conditions the batch selector must detect."""
    import random

    from telemetry_parquet_spark.datapipe.bpe import learn_bpe_batched

    rng = random.Random(1234)
    for trial in range(6):
        wf = {}
        for _ in range(rng.randint(4, 10)):
            w = "".join(rng.choice("ab c") for _ in range(rng.randint(1, 6)))
            w = w.replace(" ", "")
            if w:
                wf[w] = wf.get(w, 0) + rng.randint(1, 9)
        if not wf:
            continue
        df = spark.createDataFrame(list(wf.items()), ["word", "freq"])
        exp_merges, exp_state = _py_bpe(wf, 8)
        got_merges, got_state = learn_bpe_batched(df, num_merges=8, batch_m=4)
        assert got_merges == exp_merges, (trial, wf)
        assert {
            r.word: list(r.syms) for r in got_state.collect()
        } == exp_state, (trial, wf)
