"""Differential test: engine fallback window chunker (K5) vs the
reference's ``FallbackDocumentProcessor._chunk_content``.

``app/processing.py`` cannot be imported (docling/libreoffice deps),
but the K5 method is self-contained: extract exactly that function via
AST from the read-only snapshot, execute it with the reference's own
pydantic models (``app/models.py`` imports cleanly), and compare
against the engine's ``fallback_chunks`` on randomized content.
"""

import ast
import importlib.util
import os
import random
import string
import sys
import uuid
from typing import List

import pytest

from deepdoc_api_spark.kernels.chunkers import fallback_chunks

PROC_PATH = "/root/reference/app/processing.py"
MODELS_PATH = "/root/reference/app/models.py"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(PROC_PATH) and os.path.exists(MODELS_PATH)),
    reason="reference snapshot not available",
)


def _load_reference_k5():
    spec = importlib.util.spec_from_file_location("ref_models", MODELS_PATH)
    models = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(models)

    tree = ast.parse(open(PROC_PATH, "r", encoding="utf-8").read())
    fn = None
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.ClassDef)
            and node.name == "FallbackDocumentProcessor"
        ):
            for sub in node.body:
                if isinstance(sub, ast.FunctionDef) and sub.name == "_chunk_content":
                    fn = sub
    assert fn is not None, "reference _chunk_content not found"
    module = ast.Module(body=[fn], type_ignores=[])
    code = compile(ast.fix_missing_locations(module), "ref_chunk_content", "exec")
    ns = {
        "uuid": uuid,
        "List": List,
        "ChunkResult": models.ChunkResult,
        "ChunkMetadata": models.ChunkMetadata,
    }
    exec(code, ns)
    return lambda content: ns["_chunk_content"](None, content, "file.txt", {"pages": [1]})


@pytest.mark.parametrize("seed", range(120))
def test_fallback_matches_reference(seed):
    ref_chunk = _load_reference_k5()
    rng = random.Random(f"k5:{seed}")
    kind = rng.choice(["words", "nospace", "mixed", "short", "spacey"])
    n = rng.randint(0, 5000)
    if kind == "words":
        content = " ".join(
            "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 12)))
            for _ in range(n // 6)
        )
    elif kind == "nospace":
        content = "x" * n
    elif kind == "short":
        content = "hello world"[: rng.randint(0, 11)]
    elif kind == "spacey":
        content = (" " * rng.randint(1, 5)).join("ab" for _ in range(n // 4))
    else:
        content = "".join(
            rng.choice(string.ascii_lowercase + "    .\n") for _ in range(n)
        )

    expected = ref_chunk(content)
    got = fallback_chunks(content)

    assert len(got) == len(expected), (seed, kind)
    for g, e in zip(got, expected):
        assert g["text"] == e.text, (seed, kind)
        assert g["chunk_overlap"] == e.metadata.chunk_overlap, (seed, kind)
        assert g["pages"] == e.metadata.page_num_int, (seed, kind)
        assert len(g["text"]) == e.metadata.chunk_size, (seed, kind)
