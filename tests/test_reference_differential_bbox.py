"""Differential test: engine bbox normalization (O9) vs the reference's
``DocumentProcessor._extract_bbox_from_object`` executed directly.

``app/processing.py`` cannot be imported whole (docling deps), so the
method is AST-extracted from the read-only snapshot (same pattern as
the K5 differential) and run against SimpleNamespace objects built from
the same mappings the engine normalizes as dicts.
"""

import ast
import logging
import os
import random
from types import SimpleNamespace
from typing import Any, Dict, Optional

import pytest

from deepdoc_api_spark.kernels.bbox import normalize_bbox, raw_bbox, span_bbox

PROC_PATH = "/root/reference/app/processing.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PROC_PATH), reason="reference snapshot not available"
)


def _load_reference_normalizer():
    tree = ast.parse(open(PROC_PATH, "r", encoding="utf-8").read())
    fn = None
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == "DocumentProcessor":
            for sub in node.body:
                if (
                    isinstance(sub, ast.FunctionDef)
                    and sub.name == "_extract_bbox_from_object"
                ):
                    fn = sub
    assert fn is not None, "reference _extract_bbox_from_object not found"
    module = ast.Module(body=[fn], type_ignores=[])
    code = compile(ast.fix_missing_locations(module), "ref_bbox", "exec")
    ns: Dict[str, Any] = {
        "logger": logging.getLogger("ref"),
        "Optional": Optional,
        "Dict": Dict,
    }
    exec(code, ns)
    return lambda obj: ns["_extract_bbox_from_object"](None, obj)


KEY_POOLS = [
    ["l", "t", "r", "b"],
    ["x", "y", "width", "height"],
    ["x1", "y1", "x2", "y2"],
    ["left", "top", "right", "bottom"],
]


def test_synthesized_conventions_match_reference():
    ref = _load_reference_normalizer()
    for offset in range(0, 5000, 7):
        raw = raw_bbox(offset)
        got = normalize_bbox(raw)
        want = ref(SimpleNamespace(**raw))
        assert got == want, f"offset={offset}: {got} != {want}"
        assert got is not None and got["area"] == got["width"] * got["height"]


def test_randomized_partial_and_mixed_objects_match_reference():
    """Partial conventions, mixed keys, None values, junk types — the
    probing/fallback order must agree with the reference everywhere."""
    ref = _load_reference_normalizer()
    rng = random.Random(42)
    values = [0, 1, 10.5, -3, None, 100]
    for trial in range(10000):
        keys = []
        for pool in KEY_POOLS:
            keys.extend(k for k in pool if rng.random() < 0.4)
        obj = {k: rng.choice(values) for k in keys}
        got = normalize_bbox(dict(obj))
        want = ref(SimpleNamespace(**obj))
        assert got == want, f"trial={trial} obj={obj}: {got} != {want}"


def test_none_and_empty():
    ref = _load_reference_normalizer()
    assert normalize_bbox(None) is None
    assert normalize_bbox({}) == ref(SimpleNamespace())


def test_span_bbox_deterministic():
    assert span_bbox(1234) == span_bbox(1234)
    b = span_bbox(1234)
    assert set(b) == {"left", "top", "right", "bottom", "width", "height", "area"}
