"""fastjson.dumps_indent2 must be BYTE-IDENTICAL to
json.dumps(obj, ensure_ascii=False, indent=2) — the doc_json (K3)
contract rides on it."""

from __future__ import annotations

import glob
import json

import pytest

from deepseek_ocr_customvllm_ray.functions.fastjson import dumps_indent2


def ref(obj) -> str:
    return json.dumps(obj, ensure_ascii=False, indent=2)


EDGE_OBJECTS = [
    {},
    [],
    {"a": {}},
    {"a": []},
    "plain",
    'quotes " and \\ backslash and \t tab \n newline \x01 control',
    "unicode: é 中文 tiếng Việt   emoji \U0001f600",
    0,
    -17,
    10**30,
    3.5,
    -0.0,
    1e300,
    True,
    False,
    None,
    {"k": [1, "two", {"three": [None, True, {"deep": []}]}]},
    {"page_number": 1, "blocks": [
        {"type": "heading", "level": 2, "text": "Tiêu đề"},
        {"type": "paragraph", "text": "văn bản | with | pipes"},
        {"type": "table", "table_id": "tbl_01",
         "rows": [["a", "1"], ["cộng", "2"]], "validation": "High"},
        {"type": "image", "source": "images/0_0.jpg"},
    ]},
    ["mixed", 1, 2.25, None, False, ["nested", []]],
]


@pytest.mark.parametrize("obj", EDGE_OBJECTS, ids=range(len(EDGE_OBJECTS)))
def test_edge_objects_byte_identical(obj):
    assert dumps_indent2(obj) == ref(obj)


def test_nan_and_infinities_match_dumps():
    for v in (float("nan"), float("inf"), float("-inf")):
        assert dumps_indent2([v]) == ref([v])


def test_tuple_serializes_as_list():
    assert dumps_indent2((1, 2)) == ref((1, 2))


def test_non_str_key_rejected():
    with pytest.raises(TypeError):
        dumps_indent2({1: "x"})


def test_unsupported_type_rejected():
    with pytest.raises(TypeError):
        dumps_indent2({"x": object()})


def test_corpus_envelopes_byte_identical():
    """Every doc_json the golden extractor produces on a bench shard must
    match stdlib dumps byte-for-byte (the real contract surface)."""
    import pyarrow.parquet as pq

    from deepseek_ocr_customvllm_ray.config import ExtractConfig
    from deepseek_ocr_customvllm_ray.sources.corpus import generate_pages
    from deepseek_ocr_customvllm_ray.sources.golden import extract_document

    t = generate_pages(n_docs=300, seed=99, pdf_fraction=0.6)
    cfg = ExtractConfig()
    checked = 0
    for u, ts, p in zip(
        t["url"].to_pylist(), t["warc_ts"].to_pylist(), t["html"].to_pylist()
    ):
        doc = extract_document(u, ts.isoformat(), p, cfg)
        if doc is None:
            continue
        parsed = json.loads(doc["doc_json"])  # envelope roundtrips
        assert doc["doc_json"] == ref(parsed)
        checked += 1
    assert checked > 200
