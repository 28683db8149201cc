"""Edge-corpus oracle sweep (round 5).

The driver's correctness gate runs every oracle pair on the FIXED
testdata corpora, whose content is benign — no empty documents, no
whitespace-only text, no zero vectors. The round-5 self-review caught a
real engine/oracle divergence that only a sub-10-word document could
trigger (Spark's descending ``sequence(1, 0)``), proving the fixed
corpora under-constrain the mirrors. This suite re-runs EVERY
SQL-expressible queries() entry and its DuckDB oracle on a synthetic
corpus built of edge cases:

* documents: empty text, whitespace-only, single word, sub-window
  word counts, multi-byte UTF-8 + astral emoji, a 5000-char single
  token, newline/tab runs, punctuation runs, an exact-duplicate pair,
  and ordinary multi-sentence text;
* embeddings: an all-zero vector (cosine denominators!), exact
  duplicate vectors, negated and tiny-magnitude vectors, plus
  deterministic pseudo-random fill.

Equality must hold row-for-row exactly like the driver's check. Any
query that CANNOT be defined on some edge input should surface that
decision here explicitly, not silently diverge between engines.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.test_ops_oracle import _norm

EDGE_DOCS = [
    (0, ""),
    (1, "   \t  \n "),
    (2, "hello"),
    (3, "two words"),
    (4, "only three words"),
    (5, "héllo wörld émoji \U0001f30d text ünïts " + "mixed CASE Tokens"),
    (6, "x" * 5000),
    (7, "line one\nline two\n\nline four\ttabbed"),
    (8, "!!! ??? ... ,,, ;;; ::: --- ((( )))"),
    (9, "the quick brown fox jumps over the lazy dog again and again"),
    (10, "the quick brown fox jumps over the lazy dog again and again"),
    (11, " ".join(f"w{i % 7}" for i in range(64))),
    (12, "9 8 7 6 5 4 3 2 1 0 repeated digits 9 8 7 6 5 4 3 2 1 0"),
    # a doc quoting doc 11's opening words (containment territory)
    (13, " ".join(f"w{i % 7}" for i in range(12))),
    (14, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    # exotic whitespace (round-5 review): VT splits in Java \s but not
    # RE2's, NBSP/NEL/FS are Python-whitespace but in neither regex —
    # the mirrors pin explicit classes so these agree engine-for-engine
    (15, "alpha\x0bbeta gamma\xa0delta and some normal words here"),
    (16, "words\x1cseparated\x1dby\x1einformation\x1fseparators now"),
    (17, "\x85embedded nel\u2009thin space\u3000ideographic end"),
]


def _edge_vec(i: int, dim: int = 8):
    if i == 0:
        return [0.0] * dim  # zero vector: cosine denominator is 0
    if i == 1 or i == 2:
        return [float((j % 3) - 1) for j in range(dim)]  # exact dup pair
    if i == 3:
        return [-float((j % 3) - 1) for j in range(dim)]  # negation of 1
    if i == 4:
        return [1e-30] * dim  # tiny magnitude
    # deterministic pseudo-random fill
    return [
        math.sin(i * 31 + j * 7) for j in range(dim)
    ]


@pytest.fixture(scope="module")
def edge_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("edge-sf"))
    docs = spark.createDataFrame(
        [
            (i, t, "en" if i % 2 else "de", f"src{i % 3}", len(t))
            for i, t in EDGE_DOCS
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    embs = spark.createDataFrame(
        [(i, [float(x) for x in _edge_vec(i)], i % 4) for i in range(24)],
        "vec_id long, embedding array<float>, label int",
    )
    embs.coalesce(1).write.parquet(os.path.join(sf, "embeddings.parquet"))
    return sf


def _duck_edge(sf):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"create view {t} as select * from"
            f" '{os.path.join(sf, t + '.parquet')}/*.parquet'"
        )
    return con


EDGE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", EDGE_KEYS)
def test_edge_corpus_matches_oracle(spark, edge_sf, name):
    if name == "iceberg_dry_run":
        pytest.skip("statement-text oracle is corpus-stat-shaped, not per-row")
    sql = entry_mod.oracle_sql()[name]
    if name == "rng_chunk_checksums":
        from deepdoc_api_spark.ops.rng_oracle import rng_chunk_checksums_sql

        sql = rng_chunk_checksums_sql(edge_sf)
    elif name.startswith("extract_chunks_"):
        from deepdoc_api_spark.ops.rng_oracle import rng_chunk_checksums_one_sql

        sql = rng_chunk_checksums_one_sql(
            edge_sf, name.removeprefix("extract_chunks_")
        )
    q = entry_mod.queries()[name]
    sdf = q(spark, edge_sf)
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]

    res = _duck_edge(edge_sf).execute(sql)
    dcols = [d[0] for d in res.description]
    drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]

    assert sdf.columns == dcols, f"{name}: column mismatch"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}"
    )
    assert sorted(srows) == sorted(drows), f"{name}: value mismatch on edges"


def test_kmeans_survives_all_zero_seed_range(spark, tmp_path):
    """Round-5 review: if every vec_id in the seed range [0, nlist) is
    a zero vector (one failed encoder batch at the head of the table),
    the nonzero guard empties the seeds, assign1 yields null cids, and
    the aggregated cid=None centroid row must not crash the driver
    collect — both engines produce the same (empty) clustering."""
    import os

    import duckdb

    from deepdoc_api_spark.ops import similarity

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    dim = 8
    rows = [(i, [0.0] * dim, 0) for i in range(16)]  # zero seed range
    rows += [
        (16 + i, [float((i + j) % 3 - 1) for j in range(dim)], 1)
        for i in range(8)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(sf, "embeddings.parquet"))

    srows = sorted(
        tuple(r) for r in similarity.ivf_topk(spark, sf, nlist=16).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view embeddings as select * from "
        f"'{os.path.join(sf, 'embeddings.parquet')}/*.parquet'"
    )
    drows = sorted(
        tuple(r)
        for r in con.execute(similarity.ivf_topk_sql(nlist=16)).fetchall()
    )
    assert srows == drows  # both empty: no rankable centroid exists
    sem = sorted(
        tuple(r)
        for r in similarity.semantic_dedup(spark, sf, nlist=16).collect()
    )
    dsem = sorted(
        tuple(r)
        for r in con.execute(
            similarity._semantic_dedup_sql(
                "SELECT vec_id, embedding FROM embeddings", 900_000, 16
            )
        ).fetchall()
    )
    assert sem == dsem


# ---------------------------------------------------------------------------
# seeded fuzz corpus: randomized content over the full oracle surface
# ---------------------------------------------------------------------------

_FUZZ_VOCAB = (
    "the quick brown fox data spark table value key row scan".split()
    + ["héllo", "wörld", "naïve", "測試", "Ünïts", "CASE", "x" * 300]
    + ["42", "3.14", "!!!", "a_b", "c-d", "(paren)", "🌍"]
)
_FUZZ_SEPS = [" ", " ", " ", " ", "  ", "\t", "\n", "\x0b", "\xa0", " "]


def _fuzz_text(rng) -> str:
    n = rng.choice([0, 1, 2, 5, 9, 11, 25, 60, 150])
    parts = []
    for _ in range(n):
        parts.append(rng.choice(_FUZZ_VOCAB))
        parts.append(rng.choice(_FUZZ_SEPS))
    return "".join(parts)


@pytest.fixture(scope="module")
def fuzz_sf(spark, tmp_path_factory):
    import random

    rng = random.Random("fuzz-corpus:r5")
    sf = str(tmp_path_factory.mktemp("fuzz-sf"))
    docs = []
    for i in range(30):
        t = _fuzz_text(rng)
        if rng.random() < 0.15 and docs:  # exact duplicates
            t = docs[rng.randrange(len(docs))][1]
        docs.append((i, t))
    spark.createDataFrame(
        [
            (i, t, rng_lang, f"src{i % 4}", len(t))
            for (i, t), rng_lang in zip(
                docs, (random.Random(f"l{i}").choice(["en", "de", "fr"]) for i, _ in docs)
            )
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    vec_rng = random.Random("fuzz-vecs:r5")
    embs = []
    for i in range(40):
        r = vec_rng.random()
        if r < 0.08:
            v = [0.0] * 8
        elif r < 0.2 and embs:
            v = list(embs[vec_rng.randrange(len(embs))][1])
        else:
            v = [vec_rng.uniform(-1, 1) for _ in range(8)]
        embs.append((i, v, i % 3))
    spark.createDataFrame(
        [(i, [float(x) for x in v], lb) for i, v, lb in embs],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(os.path.join(sf, "embeddings.parquet"))
    return sf


@pytest.mark.parametrize("name", EDGE_KEYS)
def test_fuzz_corpus_matches_oracle(spark, fuzz_sf, name):
    """Same gate as the edge sweep, on seeded RANDOM content — covers
    interaction cases no hand-picked fixture enumerates. The seed is
    fixed, so a failure here is a deterministic reproducer, not a
    flake."""
    if name == "iceberg_dry_run":
        pytest.skip("statement-text oracle is corpus-stat-shaped, not per-row")
    sql = entry_mod.oracle_sql()[name]
    if name == "rng_chunk_checksums":
        from deepdoc_api_spark.ops.rng_oracle import rng_chunk_checksums_sql

        sql = rng_chunk_checksums_sql(fuzz_sf)
    elif name.startswith("extract_chunks_"):
        from deepdoc_api_spark.ops.rng_oracle import rng_chunk_checksums_one_sql

        sql = rng_chunk_checksums_one_sql(
            fuzz_sf, name.removeprefix("extract_chunks_")
        )
    q = entry_mod.queries()[name]
    sdf = q(spark, fuzz_sf)
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
    res = _duck_edge(fuzz_sf).execute(sql)
    dcols = [d[0] for d in res.description]
    drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]
    assert sdf.columns == dcols, f"{name}: column mismatch"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}"
    )
    assert sorted(srows) == sorted(drows), f"{name}: fuzz value mismatch"
