"""Bit-equality of the round-8 Python md5 kernels (ops/texthash.py)
against the JVM expression chains they replaced, on adversarial word
lists (unicode, empties, duplicate shingles, 1/2/3-word edges)."""

import random

import pytest

from deepdoc_api_spark.ops.dedup import (
    _DIGESTS_EXPR,
    _SHINGLES_EXPR,
    _hash_expr,
    _window_expr,
    N_HASHES,
)
from deepdoc_api_spark.ops.texthash import (
    containment_sketch,
    minhash_of,
    shingles,
    simhash16_of,
    simhash64_words,
)


def _adversarial_word_lists():
    rng = random.Random("texthash-bitexact")
    vocab = [
        "alpha", "beta", "naïve", "测试", "ému", "ß", "İstanbul", "x" * 40,
        "a", "", "CONFIDENTIAL", "σς", " ", "tab\tword", "0", "-1",
    ]
    lists = [
        [], ["a"], ["a", "b"], ["a", "b", "c"], ["a", "a", "a", "a"],
        ["dup", "dup", "dup", "dup", "dup"],
    ]
    for _ in range(40):
        n = rng.randint(3, 60)
        lists.append([rng.choice(vocab) for _ in range(n)])
    return lists


@pytest.fixture(scope="module")
def words_df(spark):
    lists = _adversarial_word_lists()
    df = spark.createDataFrame(
        [(i, ws) for i, ws in enumerate(lists)], "doc_id bigint, w array<string>"
    )
    return lists, df


def test_minhash_and_shingles_bitexact(spark, words_df):
    lists, df = words_df
    mh = [
        f"array_min(transform(dg, d -> {_window_expr(k)})) as mh{k}"
        for k in range(N_HASHES)
    ]
    jvm = (
        df.selectExpr("doc_id", f"{_SHINGLES_EXPR} as g")
        .selectExpr("doc_id", "g", f"{_DIGESTS_EXPR} as dg")
        .selectExpr("doc_id", "g", *mh)
        .collect()
    )
    for r in jvm:
        ws = lists[r.doc_id]
        assert list(r.g) == shingles(ws), r.doc_id
        mins = minhash_of(shingles(ws))
        for k in range(N_HASHES):
            want = r[f"mh{k}"]
            got = None if mins is None else mins[k]
            assert got == want, (r.doc_id, k)


def test_containment_sketch_bitexact(spark, words_df):
    lists, df = words_df
    from deepdoc_api_spark.ops.dedup import _digests_expr

    mh = [
        f"array_min(transform(dg, d -> {_window_expr(k)})) as mh{k}"
        for k in range(N_HASHES)
    ]
    jvm = (
        df.selectExpr("doc_id", f"array_distinct({_SHINGLES_EXPR}) as gs")
        .selectExpr("doc_id", f"{_digests_expr('gs')} as dg")
        .selectExpr(
            "doc_id",
            f"array_distinct(transform(dg, d -> {_window_expr(0)})) as hs",
            *mh,
        )
        .collect()
    )
    for r in jvm:
        hs, mins = containment_sketch(lists[r.doc_id])
        assert list(r.hs) == hs, r.doc_id
        for k in range(N_HASHES):
            want = r[f"mh{k}"]
            got = None if mins is None else mins[k]
            assert got == want, (r.doc_id, k)


def test_simhash_words_bitexact(spark, words_df):
    lists, df = words_df
    hashes = df.selectExpr(
        "doc_id", "transform(w, x -> md5(concat('0:', x))) as ds"
    ).selectExpr(
        "doc_id",
        "transform(ds, d -> cast(conv(substr(d, 1, 8), 16, 10) as bigint)) as ha",
        "transform(ds, d -> cast(conv(substr(d, 9, 8), 16, 10) as bigint)) as hb",
    )
    bit_sums = [
        f"aggregate({arr}, cast(0 as bigint), (acc, h) ->"
        f" acc + ((h >> {i % 32}) & 1) * 2 - 1) as b{i}"
        for i, arr in [(j, "ha") for j in range(32)]
        + [(j, "hb") for j in range(32, 64)]
    ]
    word_exprs = [
        "cast("
        + " + ".join(
            f"(case when b{16 * k + j} >= 0 then {1 << j} else 0 end)"
            for j in range(16)
        )
        + f" as bigint) as w{k}"
        for k in range(4)
    ]
    jvm = hashes.selectExpr("doc_id", *bit_sums).selectExpr(
        "doc_id", *word_exprs
    ).collect()
    for r in jvm:
        got = simhash64_words(lists[r.doc_id])
        assert [r.w0, r.w1, r.w2, r.w3] == got, r.doc_id


def test_simhash16_bitexact(spark, words_df):
    lists, df = words_df
    hashes = df.selectExpr(
        "doc_id", f"transform(w, x -> {_hash_expr(0, 'x')}) as hs"
    )
    bit_sums = [
        f"aggregate(hs, cast(0 as bigint), (acc, h) ->"
        f" acc + ((h >> {i}) & 1) * 2 - 1) as b{i}"
        for i in range(16)
    ]
    folded = " + ".join(
        f"(case when b{i} >= 0 then {1 << i} else 0 end)" for i in range(16)
    )
    jvm = (
        hashes.selectExpr("doc_id", *bit_sums)
        .selectExpr("doc_id", f"cast({folded} as bigint) as simhash")
        .collect()
    )
    for r in jvm:
        assert simhash16_of(lists[r.doc_id]) == r.simhash, r.doc_id


def test_null_word_list_mirrors_jvm_zero_fold(spark):
    # null w → null lambdas → every bit sum null → all-zero words
    df = spark.createDataFrame(
        [(0, None)], "doc_id bigint, w array<string>"
    )
    assert simhash64_words(None) == [0, 0, 0, 0]
    assert simhash16_of(None) == 0
    hashes = df.selectExpr(
        "doc_id", f"transform(w, x -> {_hash_expr(0, 'x')}) as hs"
    )
    folded = " + ".join(
        "(case when aggregate(hs, cast(0 as bigint), (acc, h) ->"
        f" acc + ((h >> {i}) & 1) * 2 - 1) >= 0 then {1 << i} else 0 end)"
        for i in range(16)
    )
    r = hashes.selectExpr(f"cast({folded} as bigint) as s").collect()[0]
    assert r.s == 0
