"""PII redaction (stages/redact.py) — Arrow RE2 kernels."""

from __future__ import annotations

import pyarrow as pa

from deepseek_ocr_customvllm_ray.stages.redact import make_redact_batch, redact_pii


def _run(texts):
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    return make_redact_batch("text", "doc_id")(batch)


def test_each_kind():
    out = _run([
        "mail bob.smith+x@sub.example.co.uk now",
        "host 192.168.0.1 and 10.0.0.255",
        "call 555-123-4567",
        "clean text stays clean",
    ])
    assert out["redacted"].to_pylist() == [
        "mail <EMAIL> now",
        "host <IP> and <IP>",
        "call <PHONE>",
        "clean text stays clean",
    ]
    assert out["n_emails"].to_pylist() == [1, 0, 0, 0]
    assert out["n_ips"].to_pylist() == [0, 2, 0, 0]
    assert out["n_phones"].to_pylist() == [0, 0, 1, 0]


def test_mixed_row_counts_once_each():
    out = _run(["a@b.io 1.2.3.4 999-888-7777 a@b.io"])
    assert out["redacted"].to_pylist() == ["<EMAIL> <IP> <PHONE> <EMAIL>"]
    assert out["n_emails"].to_pylist() == [2]
    assert out["n_ips"].to_pylist() == [1]
    assert out["n_phones"].to_pylist() == [1]


def test_order_prevents_double_count():
    """The dotted digits inside an email's domain must not be counted as an
    IP: emails are replaced before the IP pattern runs."""
    out = _run(["user@10.0.0.1.example.com only"])
    assert out["n_emails"].to_pylist() == [1]
    assert out["n_ips"].to_pylist() == [0]
    assert out["redacted"].to_pylist() == ["<EMAIL> only"]


def test_empty_and_boundary():
    out = _run(["", "a@b.c", "not-an-email @ nor-ip 1.2.3", "1234-567-8901"])
    # 'a@b.c' — single-letter TLD fails the {2,} quantifier
    assert out["n_emails"].to_pylist() == [0, 0, 0, 0]
    assert out["n_ips"].to_pylist() == [0, 0, 0, 0]
    # '1234-567-8901' — \b rejects the 4-digit prefix start
    assert out["n_phones"].to_pylist() == [0, 0, 0, 0]
    assert out["redacted"].to_pylist()[3] == "1234-567-8901"


def test_null_text_passthrough():
    """Null in -> null out (SQL regexp_replace semantics; matches the
    DuckDB oracle)."""
    out = make_redact_batch("text", "doc_id")(
        pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array([None], pa.string()),
        })
    )
    assert out["redacted"].to_pylist() == [None]
    assert out["n_emails"].to_pylist() == [None]


def test_dataset_path(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["see x@y.zz", "none"], pa.string()),
    })
    df = redact_pii(rd.from_arrow(t), "text", "doc_id").to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    assert df["redacted"].tolist() == ["see <EMAIL>", "none"]
    assert df["n_emails"].tolist() == [1, 0]
