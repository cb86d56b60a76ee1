"""Robustness corpus generator (M20 analog) + distributed CER evaluation.

The reference synthesizes skew/perspective/blur/shadow page-image variants
(Scripts/augument_img.py:179-243, seeded) and scores OCR output with CER
(Scripts/eval_CER.py).  Pixel-space augmentation needs image libs, so the
sandbox analog perturbs the OBSERVABLE channel instead — the emission text —
with seeded, severity-controlled noise families:

- ``char_swap``   — transpose adjacent characters (skew/blur analog)
- ``char_drop``   — delete characters (occlusion/shadow analog)
- ``char_sub``    — substitute visually-confusable characters (o0, l1, rn/m)
- ``word_dup``    — stutter words (decode-repeat analog)

Evaluation: run the extraction pipeline over clean and noisy corpora and
compute per-url CER distributed (map_batches over joined pairs; the CER
kernel is ``functions/evalmetrics.cer``), then a tiny mean.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

_CONFUSABLE = {"o": "0", "0": "o", "l": "1", "1": "l", "e": "c", "a": "á"}


def perturb_text(text: str, severity: float, rng: np.random.Generator) -> str:
    """Apply the noise families at ``severity`` (expected fraction of
    characters affected); deterministic in (text, severity, rng state)."""
    chars = list(text)
    n = len(chars)
    if n == 0 or severity <= 0:
        return text
    k = max(1, int(n * severity))
    for _ in range(k):
        op = rng.integers(0, 3)
        i = int(rng.integers(0, n))
        if op == 0 and i + 1 < n:  # swap
            chars[i], chars[i + 1] = chars[i + 1], chars[i]
        elif op == 1:  # drop (replace with empty, keep indices stable)
            chars[i] = ""
        else:  # confusable substitution
            c = chars[i]
            chars[i] = _CONFUSABLE.get(c, c)
    out = "".join(chars)
    # word stutter
    words = out.split(" ")
    if len(words) > 3 and rng.random() < severity * 4:
        j = int(rng.integers(0, len(words)))
        words.insert(j, words[j])
        out = " ".join(words)
    return out


def perturb_pages_table(pages, severity: float, seed: int = 7):
    """pages pa.Table -> same table with synthetic-PDF emissions perturbed
    (HTML rows pass through)."""
    import pyarrow as pa

    from .pdfpayload import build_pdf_payload, is_pdf_payload, parse_pdf_payload

    rng = np.random.default_rng(seed)
    payloads = []
    for p in pages["html"].to_pylist():
        if p is not None and is_pdf_payload(p):
            new_pages = [
                {"width": w, "height": h, "emission": perturb_text(e, severity, rng)}
                for (w, h, e) in parse_pdf_payload(p)
            ]
            payloads.append(build_pdf_payload(new_pages))
        else:
            payloads.append(p)
    return pa.table(
        {
            "url": pages["url"],
            "warc_ts": pages["warc_ts"],
            "html": pa.array(payloads, pa.binary()),
            "text": pages["text"],
            "lang": pages["lang"],
        }
    )


def corpus_cer_eval(clean_docs, noisy_docs) -> Dict[str, float]:
    """Per-url CER between two extracted-doc tables (markdown channel) +
    corpus mean (G4).  Inputs: pandas DataFrames with url/markdown."""
    from ..functions.evalmetrics import cer

    clean = dict(zip(clean_docs["url"], clean_docs["markdown"]))
    rows: List[Tuple[str, float]] = []
    for url, noisy_md in zip(noisy_docs["url"], noisy_docs["markdown"]):
        if url in clean:
            rows.append((url, cer(clean[url], noisy_md)[0]))
    mean = float(np.mean([c for _, c in rows])) if rows else 0.0
    return {"n_docs": len(rows), "mean_cer": mean}
