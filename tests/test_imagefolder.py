"""S3 sorted image-folder reader + K7 per-image markdown path
(sources/imagefolder.py; reference Scripts/run_batch.py:99-146)."""

from __future__ import annotations

import os

import pytest

from deepseek_ocr_customvllm_ray.functions.mdtext import batch_cli_clean
from deepseek_ocr_customvllm_ray.sources.imagefolder import (
    batch_cli_markdown,
    read_image_folder,
    write_per_image_md,
)

EMISSIONS = {
    "b_page": "## Title<|ref|>text<|/ref|><|det|>[[10,10,500,500]]<|/det|>\n\n\n\nbody",
    "a_page": "plain page, no tags\n\n\n\nstays uncollapsed",
    "C_PAGE": "<center>x</center><|ref|>t<|/ref|><|det|>[[1,1,2,2]]<|/det|>tail",
}


@pytest.fixture()
def folder(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "b_page.png").write_text(EMISSIONS["b_page"])
    (d / "a_page.jpg").write_text(EMISSIONS["a_page"])
    (d / "C_PAGE.JPEG").write_text(EMISSIONS["C_PAGE"])  # uppercase ext kept
    (d / "notes.txt").write_text("not an image")         # excluded
    (d / "sub").mkdir()                                   # dirs ignored
    return str(d)


def test_reader_sorted_order_and_stems(ray_session, folder):
    rows = sorted(read_image_folder(folder).take_all(), key=lambda r: r["order"])
    # lexicographic path order: C_PAGE.JPEG < a_page.jpg < b_page.png
    assert [r["stem"] for r in rows] == ["C_PAGE", "a_page", "b_page"]
    assert [r["order"] for r in rows] == [0, 1, 2]
    assert rows[1]["data"] == EMISSIONS["a_page"].encode()


def test_reader_empty_folder_raises(ray_session, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    (d / "readme.txt").write_text("x")
    with pytest.raises(FileNotFoundError):
        read_image_folder(str(d))


def test_batch_cli_markdown_matches_serial_contract(ray_session, folder):
    out = {
        r["stem"]: r["markdown"]
        for r in batch_cli_markdown(read_image_folder(folder)).take_all()
    }
    assert out == {
        stem: batch_cli_clean(EMISSIONS[stem]) for stem in EMISSIONS
    }


def test_write_per_image_md_stem_matched(ray_session, folder, tmp_path):
    out_dir = str(tmp_path / "md_out")
    n = write_per_image_md(
        batch_cli_markdown(read_image_folder(folder)), out_dir
    )
    assert n == 3
    files = sorted(os.listdir(out_dir))
    assert files == ["C_PAGE.md", "a_page.md", "b_page.md"]
    got = open(os.path.join(out_dir, "b_page.md")).read()
    assert got == batch_cli_clean(EMISSIONS["b_page"])


def test_extension_siblings_resolve_deterministically(ray_session, tmp_path):
    """scan1.png and scan1.jpg share the stem; the reference's serial
    sorted loop writes last-wins, so the max-order sibling must own
    scan1.md on any cluster shape — not whichever task ran last."""
    d = tmp_path / "dup"
    d.mkdir()
    (d / "scan1.jpg").write_text("from jpg")
    (d / "scan1.png").write_text("from png")   # sorts after .jpg -> wins
    (d / "other.png").write_text("solo")
    out = tmp_path / "md"
    n = write_per_image_md(
        batch_cli_markdown(read_image_folder(str(d))), str(out)
    )
    files = sorted(p.name for p in out.iterdir())
    assert files == ["other.md", "scan1.md"]
    assert n == 2  # files on disk, not input rows
    assert "from png" in (out / "scan1.md").read_text()
