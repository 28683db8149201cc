"""Differential test against the REFERENCE implementation itself.

The reference's MinerU layout post-processor
(``/root/reference/app/mineru_adapter/layout_processor.py``) is pure
stdlib — unlike the docling-dependent paths it can be imported and
executed directly. This suite generates random MinerU-style layout
dicts, runs the reference ``LayoutProcessor.process_layout`` as the
oracle, maps the same layout into the engine's span records, runs the
engine's fold, and asserts record-by-record equality on
``(type, content, page, hierarchy, image_path)`` — the strongest
available evidence that O2–O6 semantics (reading-order sort, block
extraction, repeated-header suppression, hierarchy fold incl. quirks,
adjacent merge with page ranges) are reproduced exactly.

The reference module is imported read-only from the reference snapshot;
the test skips cleanly if the snapshot is absent.
"""

import importlib.util
import os
import random

import pytest

from deepdoc_api_spark.kernels.layout import format_records

REF_PATH = "/root/reference/app/mineru_adapter/layout_processor.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH), reason="reference snapshot not available"
)


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_layout_processor", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.LayoutProcessor()


WORDS = ["alpha", "beta", "gamma", "delta", "sigma", "omega", "kappa"]


def _gen_layout(rng: random.Random, n_pages: int):
    """Random MinerU-style layout dict (layout_processor.py:65-129)."""

    def words(n):
        return " ".join(rng.choice(WORDS) for _ in range(n))

    rep_header = "RUNNING " + rng.choice(WORDS).upper()
    pdf_info = []
    for p in range(n_pages):
        def make_block():
            y0 = rng.randint(0, 900)
            x0 = rng.randint(0, 600)
            bbox = [x0, y0, x0 + rng.randint(10, 200), y0 + rng.randint(5, 40)]
            btype = rng.choice(["title", "text", "text", "list", "table", "figure"])
            if btype in ("title", "text"):
                content = (
                    rep_header
                    if btype == "title" and rng.random() < 0.35
                    else words(rng.randint(1, 8))
                )
                nspans = rng.randint(1, 3)
                return {
                    "type": btype,
                    "bbox": bbox,
                    "lines": [
                        {"spans": [{"content": content if s == 0 else words(3)}]}
                        for s in range(nspans)
                    ],
                }
            if btype == "list":
                return {
                    "type": "list",
                    "bbox": bbox,
                    "blocks": [
                        {
                            "lines": [
                                {"spans": [{"content": words(rng.randint(1, 5))}]}
                            ]
                        }
                        for _ in range(rng.randint(1, 3))
                    ],
                }
            if btype == "table":
                return {
                    "type": "table",
                    "bbox": bbox,
                    "blocks": [
                        {
                            "lines": [
                                {
                                    "spans": [
                                        {
                                            "type": rng.choice(["table", "text"]),
                                            "html": f"<table>{words(2)}</table>",
                                            "content": words(2),
                                            "image_path": f"img://{p}-{rng.randint(0,9)}.png"
                                            if rng.random() < 0.5
                                            else "",
                                        }
                                    ]
                                }
                            ]
                        }
                    ],
                }
            return {"type": "figure", "bbox": bbox, "lines": []}

        blocks = [make_block() for _ in range(rng.randint(0, 10))]
        k1 = rng.randint(0, len(blocks))
        k2 = rng.randint(k1, len(blocks))
        pdf_info.append(
            {
                "page_idx": p,
                "para_blocks": blocks[:k1],
                "preproc_blocks": blocks[k1:k2],
                "discarded_blocks": blocks[k2:],
            }
        )
    return {"pdf_info": pdf_info}


def _layout_to_records(layout: dict):
    """Map a MinerU layout into the engine's normalized block records,
    mirroring the corpus convention: offset order == the reference's
    (y0, x0)-sorted reading order per page (SURVEY §2.3 O2)."""
    records = []
    for page in layout.get("pdf_info", []):
        page_no = page.get("page_idx", 0) + 1
        all_blocks = (
            list(page.get("para_blocks", []))
            + list(page.get("preproc_blocks", []))
            + list(page.get("discarded_blocks", []))
        )
        all_blocks.sort(
            key=lambda b: (
                b.get("bbox", [0, 0, 0, 0])[1],
                b.get("bbox", [0, 0, 0, 0])[0],
            )
        )
        for item in all_blocks:
            t = item.get("type", "")
            if t in ("title", "text"):
                for line in item.get("lines", []):
                    for span in line.get("spans", []):
                        records.append(
                            {
                                "kind": t,
                                "content": span.get("content", ""),
                                "media_ref": "",
                                "page": page_no,
                                "offset": 0,
                            }
                        )
            elif t == "list":
                for block in item.get("blocks", []):
                    for line in block.get("lines", []):
                        for span in line.get("spans", []):
                            records.append(
                                {
                                    "kind": "list",
                                    "content": span.get("content", ""),
                                    "media_ref": "",
                                    "page": page_no,
                                    "offset": 0,
                                }
                            )
            elif t == "table":
                for block in item.get("blocks", []):
                    for line in block.get("lines", []):
                        for span in line.get("spans", []):
                            if span.get("type") == "table":
                                records.append(
                                    {
                                        "kind": "table",
                                        "content": span.get("html", ""),
                                        "media_ref": span.get("image_path", ""),
                                        "page": page_no,
                                        "offset": 0,
                                    }
                                )
    return records


@pytest.mark.parametrize("seed", range(120))
def test_fold_matches_reference_process_layout(seed):
    ref = _load_reference()
    rng = random.Random(f"diff:{seed}")
    layout = _gen_layout(rng, n_pages=rng.randint(1, 4))

    expected = ref.process_layout(layout)
    got = format_records(_layout_to_records(layout))

    assert len(got) == len(expected), (
        f"seed={seed}: {len(got)} records vs reference {len(expected)}"
    )
    for g, e in zip(got, expected):
        assert g["type"] == e["type"], seed
        assert g["content"] == e["content"], seed
        assert g["page"] == e["page"], seed
        assert g["hierarchy"] == e["hierarchy"], seed
        assert g.get("media_ref", "") == e.get("image_path", ""), seed


def test_combine_split_pdfs_matches_reference():
    """O7: split-part recombination re-sequences page indices."""
    import copy

    ref = _load_reference()
    rng = random.Random("combine:1")
    parts = [_gen_layout(rng, n_pages=rng.randint(1, 3)) for _ in range(3)]
    # combine_split_pdfs mutates page dicts in place — feed it a deep copy
    combined = ref.combine_split_pdfs(copy.deepcopy(parts))
    expected = ref.process_layout(combined)

    # engine view: the combined doc is the concatenated span sequence
    # with sequential page numbering
    records = []
    page_base = 0
    for part in parts:
        recs = _layout_to_records(part)
        for r in recs:
            records.append({**r, "page": r["page"] + page_base})
        page_base += len(part["pdf_info"])
    got = format_records(records)

    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert (g["type"], g["content"], g["page"], g["hierarchy"]) == (
            e["type"], e["content"], e["page"], e["hierarchy"]
        )
