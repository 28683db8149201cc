"""Round-6 adversarial-spans sweep: fuzzed span SEQUENCES fed directly
through the Spark pipeline (Arrow boundary, fused kernel dispatch,
skew paths) must chunk identically to the same kernels run in-driver.

The edge/fuzz corpus sweeps (tests/test_edge_corpus_oracle.py) fuzz
document TEXT through the datagen recipe; this file removes the
generator from the loop and fuzzes the span table itself — unicode
classes, pathological HTML, empty/huge spans, unknown kinds, negative
and duplicate offsets, and a >skew-threshold giant that exercises the
isolate path under adversarial content. Contract-conformant inputs
only (non-null fields, per the span-table schema); per-doc error
isolation has its own suite."""

import random

import pytest

from deepdoc_api_spark.job.pipeline import chunk_documents
from deepdoc_api_spark.kernels.pipeline import chunk_document
from deepdoc_api_spark.schema import SPANS_DDL

_WEIRD_TEXT = [
    "",
    " ",
    "\u00a0\u2009\u3000",          # unicode spaces
    "\u200b\u200d",                # zero-width
    "náïve Ωμέγα 中文 العربية",     # mixed scripts
    "😀🎉\U0001f9e0",               # astral plane
    "line\nbreak\ttab\x0bvt",
    "word " * 400,                 # long repetitive
    "<not a tag",
    "a&b &amp; &lt;x&gt; &bogus;",
    "\u0085\u2028\u2029",          # NEL + line/para separators
    "\x00nul\x01soh\x08bs",          # control bytes (valid UTF-8)
    "e\u0301combining\u0300",        # combining marks (no NFC applied)
    "CONFIDENTIAL ALPHA",          # header-suppression collider
]

_WEIRD_HTML = [
    "<div><p>ok</p>",
    "<p class='nav'>navish</p><p>body text long enough to keep</p>",
    '<a href="x>y">link</a><p>' + "content " * 10 + "</p>",
    "<table><tr><td>a</td><td>b</td></tr>",
    "<script>var x='</p>';</script><p>after raw</p>",
    "<ul><li>one</li><li>two</li>",
    "<< << <3 <-- <p>stray</p>",
    "<P CLASS=\"Footer\">upper</P><p>" + "t" * 40 + "</p>",
    "<img src='ünï.png'><p>après l'image un paragraphe assez long</p>",
    "<!-- unterminated comment <p>gone</p>",
]

_KINDS = ["html", "title", "text", "list", "table", "media", "unknown",
          "TABLE", "text ", ""]


def _fuzz_spans(rng: random.Random, n: int):
    spans = []
    for i in range(n):
        kind = rng.choice(_KINDS)
        if kind == "html":
            text = rng.choice(_WEIRD_HTML)
        elif kind == "media":
            text = ""
        else:
            text = rng.choice(_WEIRD_TEXT)
        media_ref = (
            f"m://fuzz/{i}-\u00e9.png" if kind in ("media", "table") and rng.random() < 0.7
            else ""
        )
        # offsets: mostly ascending, sometimes negative/duplicate/huge
        r = rng.random()
        if r < 0.05:
            offset = -rng.randint(1, 50)
        elif r < 0.10:
            offset = spans[-1]["offset"] if spans else 0
        elif r < 0.15:
            offset = rng.randint(10**6, 10**7)
        else:
            offset = i * 7 + rng.randint(0, 6)
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}
        )
    return spans


@pytest.mark.parametrize(
    "chunker_type", ["hybrid", "hierarchical", "toc", "mineru", "fallback"]
)
def test_adversarial_spans_spark_equals_driver(spark, chunker_type):
    rng = random.Random(f"advspans:{chunker_type}")
    docs = []
    for d in range(48):
        n = rng.choice([0, 1, 2, 5, 30, 120])
        docs.append((f"adv-{d:04d}", _fuzz_spans(rng, n)))
    # one giant over the skew threshold: the isolate path must chunk
    # adversarial content byte-identically too
    docs.append(("adv-giant", _fuzz_spans(rng, 4500)))

    oracle = {
        did: [
            (c["kind"], c["text"], c["media_ref"], c["chunk_index"])
            for c in chunk_document(did, spans, chunker_type)
        ]
        for did, spans in docs
    }

    sdf = spark.createDataFrame(
        [(did, spans) for did, spans in docs], SPANS_DDL
    ).repartition(8, "doc_id")
    got = {}
    for row in (
        chunk_documents(sdf, chunker_type)
        .select("doc_id", "kind", "text", "media_ref", "chunk_index")
        .collect()
    ):
        got.setdefault(row.doc_id, []).append(
            (row.kind, row.text, row.media_ref, row.chunk_index)
        )
    for doc in got.values():
        doc.sort(key=lambda t: t[3])

    # empty-output docs: the driver oracle records [], Spark emits no rows
    for did, chunks in oracle.items():
        assert got.get(did, []) == chunks, f"{chunker_type}:{did}"
    assert set(got) <= set(oracle)
