"""URL canonicalization + domain quota (stages/urls.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.urls import (
    domain_quota,
    make_url_parse_batch,
)


def _parse(urls):
    fn = make_url_parse_batch("url", "doc_id")
    return fn(pa.table({
        "doc_id": pa.array(range(len(urls)), pa.int64()),
        "url": pa.array(urls, pa.string()),
    }))


def test_parse_components_hand_computed():
    out = _parse(["https://www.Example.CO.UK:8443/A/b?q=1#frag"])
    assert out["host"].to_pylist() == ["www.example.co.uk"]
    assert out["registered_domain"].to_pylist() == ["example.co.uk"]
    assert out["path"].to_pylist() == ["/A/b"]  # path case is significant
    assert out["canonical_url"].to_pylist() == ["https://example.co.uk/A/b"]


def test_parse_defaults_and_plain_domains():
    out = _parse(["http://sub.site.com", "https://site.com/x"])
    assert out["path"].to_pylist() == ["/", "/x"]
    # registered domain is the last two labels, subdomains stripped
    assert out["registered_domain"].to_pylist() == ["site.com", "site.com"]
    assert out["canonical_url"].to_pylist() == [
        "https://sub.site.com/",  # only a LEADING www. is stripped
        "https://site.com/x",
    ]


def test_parse_single_label_host_is_own_domain():
    out = _parse(["http://localhost:8080/admin"])
    assert out["host"].to_pylist() == ["localhost"]
    assert out["registered_domain"].to_pylist() == ["localhost"]


def test_parse_drops_non_http_and_null():
    out = _parse(["ftp://files.example.com/x", None, "not a url", "https://ok.com/"])
    assert out["doc_id"].to_pylist() == [3]
    assert out["host"].to_pylist() == ["ok.com"]


def test_domain_quota_caps_per_domain(ray_session):
    import ray.data as rd

    rows = pa.table({
        "doc_id": pa.array([5, 1, 3, 2, 4, 10], pa.int64()),
        "registered_domain": pa.array(
            ["a.com", "a.com", "a.com", "b.com", "b.com", "c.com"], pa.string()
        ),
    })
    out = (
        domain_quota(rd.from_arrow(rows), "registered_domain", "doc_id", k=2,
                     num_partitions=3)
        .to_pandas()
        .sort_values(["registered_domain", "doc_id"])
    )
    # lowest-k ids per domain survive; groups smaller than k pass through
    assert list(map(tuple, out.to_numpy())) == [
        (1, "a.com"), (3, "a.com"), (2, "b.com"), (4, "b.com"), (10, "c.com"),
    ]


def test_domain_quota_k_validation():
    with pytest.raises(ValueError):
        domain_quota(None, "d", "i", k=0)
