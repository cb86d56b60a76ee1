"""Real-backend smoke runner: exercise the import-guarded seams end to end
on any environment that has the real libraries.

This sandbox has no PIL / PyMuPDF / pytesseract / vLLM, so the library's
real-pixel and GPU paths (S2 render, M1 deskew, M5 tiling, M7 tensor
emission, A1 engine) are covered only by protocol fakes and skip-guarded
tests here.  On a deployment box, run

    python tools/real_backends_smoke.py

and every seam whose backend imports will execute against real data:

- PIL:      M1/M2/M5/M7/M8 pixel path — deskew, margin crop, dynamic
            tiling, prepare_page_image, tokenize_with_images with real
            BICUBIC resampling, and the ImageOps.pad differential;
- PyMuPDF:  S2 — MuPdfPageRenderer over a synthetic PDF payload, then the
            page-exploded extract pipeline with renderer injection;
- tesseract: M1 — detect_and_correct_skew on a rendered rotated page;
- vLLM:     A1/A3/A4 — make_ocr_engine() resolves VllmOcrEngine; engine
            construction is reported but NOT run (needs a GPU + weights).

Exit code 0 = every available backend passed; missing backends are
reported and skipped (that is the expected result in this sandbox).
The skip-guarded pytest twins live in tests/test_real_backends.py and
tests/test_tensorize.py; this script is the one-command version for CI
on real images.
"""

from __future__ import annotations

import sys
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])

RESULTS = []


def run(name, available, fn):
    if not available:
        RESULTS.append((name, "SKIP (backend not installed)"))
        return
    try:
        fn()
        RESULTS.append((name, "PASS"))
    except Exception:
        RESULTS.append((name, "FAIL\n" + traceback.format_exc()))


def _pil_pixel_path():
    import numpy as np
    from PIL import Image

    from deepseek_ocr_customvllm_ray.functions.tiling import (
        count_tiles,
        crop_flexible_pixels,
        dynamic_preprocess_pixels,
        prepare_page_image,
    )

    rng = np.random.default_rng(7)
    img = Image.fromarray(
        rng.integers(0, 256, size=(2200, 1700, 3), dtype=np.uint8))
    tiles, grid = dynamic_preprocess_pixels(img)
    assert grid == count_tiles(1700, 2200), grid
    assert len(tiles) == grid[0] * grid[1]
    assert all(t.size == (640, 640) for t in tiles)
    cropped = crop_flexible_pixels(img)
    assert cropped.size == (1700 - 120, 2200 - 120)
    out = prepare_page_image(img)  # deskew may no-op without tesseract
    assert out.size[0] > 0 and out.size[1] > 0


def _pil_tensor_emission():
    import numpy as np
    from PIL import Image, ImageOps

    from deepseek_ocr_customvllm_ray.functions.tensorize import (
        ArrayImage,
        pad_global_view,
        tokenize_with_images,
    )
    from deepseek_ocr_customvllm_ray.functions.tiling import num_image_tokens

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(1024, 512, 3), dtype=np.uint8)
    ours = pad_global_view(ArrayImage(px))
    theirs = np.asarray(ImageOps.pad(
        Image.fromarray(px), (1024, 1024), color=(127, 127, 127)))
    assert np.array_equal(ours, theirs), "pad geometry differs from PIL"

    # full emission over a REAL PIL image (BICUBIC resampling in resize)
    big = Image.fromarray(
        rng.integers(0, 256, size=(2200, 1700, 3), dtype=np.uint8))
    enc = lambda s: [500 + (ord(c) % 80) for c in s]  # noqa: E731
    out = tokenize_with_images(
        [big], enc, image_token_id=128815, bos_id=0, eos_id=1, pad_id=2)
    assert out["pixel_values"].shape == (1, 3, 1024, 1024)
    assert out["num_image_tokens"] == [num_image_tokens(1700, 2200)]
    assert int(out["images_seq_mask"].sum()) == out["num_image_tokens"][0]


def _pymupdf_render_and_pipeline():
    import ray
    import ray.data as rd

    from deepseek_ocr_customvllm_ray.config import ExtractConfig
    from deepseek_ocr_customvllm_ray.pipelines.extract import (
        build_extract_pipeline,
    )
    from deepseek_ocr_customvllm_ray.sources.corpus import generate_pages
    from deepseek_ocr_customvllm_ray.stages.ocr_stage import MuPdfPageRenderer

    renderer = MuPdfPageRenderer(dpi=144)
    pages = generate_pages(n_docs=50, seed=3, pdf_fraction=1.0)
    payload = next(
        p for p in pages["html"].to_pylist() if p.startswith(b"%PDF"))
    rendered = renderer.render(payload)
    assert rendered, "renderer produced no pages"

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    out = build_extract_pipeline(
        rd.from_arrow(pages), ExtractConfig(), renderer=renderer
    ).take_all()
    assert len(out) > 0


def _tesseract_deskew():
    import numpy as np
    from PIL import Image

    from deepseek_ocr_customvllm_ray.functions.tiling import (
        detect_and_correct_skew,
    )

    # black-on-white text-ish bands; OSD may return 0 rotation — the smoke
    # asserts the call executes and returns an image, not a specific angle
    arr = np.full((800, 600, 3), 255, dtype=np.uint8)
    for y in range(100, 700, 60):
        arr[y:y + 20, 80:520] = 0
    out = detect_and_correct_skew(Image.fromarray(arr))
    assert out.size[0] > 0


def _vllm_engine_resolves():
    from deepseek_ocr_customvllm_ray.stages.vllm_engine import (
        VllmOcrEngine,
        make_ocr_engine,
    )

    cls = make_ocr_engine(prefer_real=True)
    assert cls is VllmOcrEngine, cls
    # Constructing the engine loads model weights onto a GPU — out of
    # scope for a smoke run; resolution + import is the seam under test.


def main() -> int:
    def has(mod):
        try:
            __import__(mod)
            return True
        except ImportError:
            return False

    pil = has("PIL")
    run("PIL pixel path (M1/M2/M5/M8)", pil, _pil_pixel_path)
    run("PIL tensor emission (M7)", pil, _pil_tensor_emission)
    run("PyMuPDF render + pipeline (S2)", has("fitz"),
        _pymupdf_render_and_pipeline)
    run("tesseract deskew (M1)", pil and has("pytesseract"),
        _tesseract_deskew)
    run("vLLM engine seam (A1)", has("vllm"), _vllm_engine_resolves)

    width = max(len(n) for n, _ in RESULTS)
    failed = 0
    for name, status in RESULTS:
        print(f"{name:<{width}}  {status}")
        failed += status.startswith("FAIL")
    ran = sum(1 for _, s in RESULTS if not s.startswith("SKIP"))
    print(f"\n{ran} ran, {len(RESULTS) - ran} skipped, {failed} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
