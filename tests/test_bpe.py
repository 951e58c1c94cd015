"""BPE training pins: merge application must equal classic left-to-right
non-overlapping pair replacement, and the learned merges must match a
reference in-memory BPE trainer on the same word counts."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from dpo_ocr_spark.ops.bpe import N_MERGES, SEP, bpe_train

SF = "/root/testdata/sf0.001"


def _ref_apply(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Classic BPE merge: left-to-right, non-overlapping."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(word_counts: dict[str, int], n: int):
    shapes = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(n):
        pc: Counter = Counter()
        for w, syms in shapes.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += word_counts[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, *best[0], best[1]))
        shapes = {w: _ref_apply(s, best[0]) for w, s in shapes.items()}
    return merges


def _delim_apply(seg: str, left: str, right: str) -> str:
    return seg.replace(
        f"{SEP}{left}{SEP}{SEP}{right}{SEP}", f"{SEP}{left}{right}{SEP}"
    )


def test_delimited_replace_is_classic_bpe():
    """The shared delimited-string replace must equal _ref_apply on the
    adversarial overlap shapes (aaa, aaaa, abab...)."""
    for word in ["aaa", "aaaa", "aaaaa", "abab", "aabaa", "banana"]:
        for pair in [("a", "a"), ("a", "b"), ("b", "a"), ("an", "a")]:
            syms = list(word)
            # build current segmentation via a first merge when needed
            if pair[0] not in word:
                continue
            seg = SEP + (SEP + SEP).join(syms) + SEP
            got = _delim_apply(seg, *pair)
            want = _ref_apply(syms, pair)
            want_seg = SEP + (SEP + SEP).join(want) + SEP
            assert got == want_seg, (word, pair, got, want_seg)


def test_bpe_train_matches_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    words = (
        docs.select(
            F.explode(
                F.split(
                    F.regexp_replace(F.lower("text"), r"\s+", " "), " "
                )
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w").count().collect()
    )
    counts = {r["w"]: r["count"] for r in words}
    want = _ref_train(counts, N_MERGES)
    got = sorted(map(tuple, bpe_train(spark, SF).collect()))
    assert got == sorted(want)


def test_bpe_train_deterministic(spark):
    a = sorted(map(tuple, bpe_train(spark, SF).collect()))
    b = sorted(map(tuple, bpe_train(spark, SF).collect()))
    assert a == b and len(a) == N_MERGES
