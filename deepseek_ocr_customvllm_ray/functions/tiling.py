"""Page tiling / image-token accounting (M3, M4, M7 observable parity).

Pure re-expression of the reference's dynamic tiling decision and
image-token arithmetic — the part of the vision pre-processor whose outputs
are scalars and therefore testable without any image libraries:

- ``find_closest_aspect_ratio`` — process/image_process.py:97-111
- ``count_tiles``               — process/image_process.py:114-128
  (candidate grids ``MIN_CROPS=2 <= i*j <= MAX_CROPS=6`` sorted by area,
  constants app/config.py:15-16)
- ``num_image_tokens``          — app/core/ocr_engine.py:61-106
  (global view ``h*(w+1)`` with h=w=ceil((1024/16)/4)=16, local view
  ``(j*h2)*(i*w2+1)`` with h2=w2=ceil((640/16)/4)=10 when tiled, +1 view
  separator; images <=640x640 use grid [1,1])

The mock OCR actor attaches ``n_image_tokens`` per page as a metrics column
so token-throughput accounting mirrors the reference's.
"""

from __future__ import annotations

import math
from typing import List, Tuple

BASE_SIZE = 1024   # app/config.py:12
IMAGE_SIZE = 640   # app/config.py:13
MIN_CROPS = 2      # app/config.py:15
MAX_CROPS = 6      # app/config.py:16
PATCH_SIZE = 16
DOWNSAMPLE = 4

# The reference prompt (app/config.py:58), part of the observable contract.
PROMPT = "<image>\n<|grounding|>Convert the document to markdown."


import functools


@functools.lru_cache(maxsize=None)
def candidate_ratios(min_num: int = MIN_CROPS, max_num: int = MAX_CROPS) -> List[Tuple[int, int]]:
    # pure function of two small ints, called once per page: cached
    # (uncached it was ~250k generator resumes per 1500 bench docs)
    ratios = set(
        (i, j)
        for n in range(min_num, max_num + 1)
        for i in range(1, n + 1)
        for j in range(1, n + 1)
        if min_num <= i * j <= max_num
    )
    return sorted(ratios, key=lambda x: x[0] * x[1])


def find_closest_aspect_ratio(
    aspect_ratio: float,
    target_ratios: List[Tuple[int, int]],
    width: int,
    height: int,
    image_size: int,
) -> Tuple[int, int]:
    best_diff = float("inf")
    best = (1, 1)
    area = width * height
    for ratio in target_ratios:
        target = ratio[0] / ratio[1]
        diff = abs(aspect_ratio - target)
        if diff < best_diff:
            best_diff = diff
            best = ratio
        elif diff == best_diff:
            if area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
                best = ratio
    return best


def count_tiles(
    width: int,
    height: int,
    min_num: int = MIN_CROPS,
    max_num: int = MAX_CROPS,
    image_size: int = IMAGE_SIZE,
) -> Tuple[int, int]:
    aspect_ratio = width / height
    return find_closest_aspect_ratio(
        aspect_ratio, candidate_ratios(min_num, max_num), width, height, image_size
    )


def num_image_tokens(width: int, height: int, cropping: bool = True) -> int:
    """Total image tokens the model consumes for one page
    (ocr_engine.py:61-106, byte-exact arithmetic)."""
    if cropping:
        if width <= 640 and height <= 640:
            grid = (1, 1)
        else:
            grid = count_tiles(width, height)
        nw, nh = grid
    else:
        nw = nh = 1
    h = w = math.ceil((BASE_SIZE // PATCH_SIZE) / DOWNSAMPLE)
    h2 = w2 = math.ceil((IMAGE_SIZE // PATCH_SIZE) / DOWNSAMPLE)
    global_tokens = h * (w + 1)
    local_tokens = (nh * h2) * (nw * w2 + 1) if (nw > 1 or nh > 1) else 0
    return global_tokens + local_tokens + 1


# --- page-prep dimension stubs (M1/M2 analogs) ----------------------------


def deskew_dims(width: int, height: int) -> Tuple[int, int]:
    """M1 ``detect_and_correct_skew`` stub: Tesseract OSD is unavailable, so
    the rotation angle is always 0 and dimensions pass through (the
    reference also passes through on any detection failure,
    process/image_process.py:63-95)."""
    return width, height


def crop_margin_dims(width: int, height: int, margin: int = 60) -> Tuple[int, int]:
    """M2 ``crop_flexible_pixels`` dimension effect: fixed 60 px margins on
    all four sides, skipped when the crop would be degenerate
    (process/image_process.py:21-61)."""
    new_w, new_h = width - 2 * margin, height - 2 * margin
    if new_w <= 0 or new_h <= 0:
        return width, height
    return new_w, new_h


# --- real pixel kernels (M1, M2, M5, M8) — import-guarded -----------------
# These operate on PIL-like images (anything with .mode/.size/.convert/
# .crop/.resize/.rotate); PIL itself is only required to DECODE pages, so
# the slicing arithmetic stays testable in this container via a fake image.


def pil_available() -> bool:
    try:
        from PIL import Image  # noqa: F401

        return True
    except Exception:
        return False


def crop_flexible_pixels(img, margin: int = 60):
    """M2 real pixel crop (process/image_process.py:21-61): RGBA/P -> RGB,
    fixed ``margin`` px off all four sides, returned unchanged when the
    crop would be degenerate or anything raises (the reference swallows
    all exceptions and passes the input through)."""
    try:
        if getattr(img, "mode", None) in ("RGBA", "P"):
            img = img.convert("RGB")
        width, height = img.size
        left, top = margin, margin
        right, bottom = width - margin, height - margin
        if left < right and top < bottom:
            return img.crop((left, top, right, bottom))
        return img
    except Exception:
        return img


def detect_and_correct_skew(img):
    """M1 real deskew (process/image_process.py:63-95): Tesseract OSD
    rotation angle, applied as a bound rotation (canvas expands; the
    reference uses ``imutils.rotate_bound`` which rotates CLOCKWISE by
    ``angle``, so the PIL equivalent is ``rotate(-angle, expand=True)``).
    Any failure — pytesseract absent, OSD error — returns the input
    unchanged, exactly the reference's failure path."""
    try:
        import numpy as np
        import pytesseract
        from pytesseract import Output

        results = pytesseract.image_to_osd(
            np.array(img), output_type=Output.DICT
        )
        angle = results.get("rotate", 0)
        if angle:
            return img.rotate(-angle, expand=True)
        return img
    except Exception:
        return img


def dynamic_preprocess_pixels(
    img,
    min_num: int = MIN_CROPS,
    max_num: int = MAX_CROPS,
    image_size: int = IMAGE_SIZE,
    use_thumbnail: bool = False,
):
    """M5 real dynamic tiling (process/image_process.py:131-169): pick the
    closest tile grid ``(i, j)``, resize to ``(i*s, j*s)``, slice row-major
    into ``i*j`` ``s x s`` tiles.  Returns ``(tiles, (i, j))``.  Pure
    arithmetic over the image protocol — the grid/box math is shared with
    :func:`count_tiles` (the dims-level contract) so both stay in lockstep.
    """
    width, height = img.size
    grid = find_closest_aspect_ratio(
        width / height, candidate_ratios(min_num, max_num), width, height,
        image_size,
    )
    tw, th = image_size * grid[0], image_size * grid[1]
    cols = tw // image_size
    resized = img.resize((tw, th))
    tiles = []
    for k in range(grid[0] * grid[1]):
        box = (
            (k % cols) * image_size,
            (k // cols) * image_size,
            (k % cols + 1) * image_size,
            (k // cols + 1) * image_size,
        )
        tiles.append(resized.crop(box))
    if use_thumbnail and len(tiles) != 1:
        tiles.append(img.resize((image_size, image_size)))
    return tiles, grid


def prepare_page_image(img, margin: int = 60):
    """M8 single-page prep, real-pixel path: deskew THEN margin-crop — the
    reference's order matters (postprocess_md.py:168-180)."""
    return crop_flexible_pixels(detect_and_correct_skew(img), margin=margin)


# --- M6 ImageTransform contract -------------------------------------------


def image_transform(
    pixels,
    mean: Tuple[float, float, float] = (0.5, 0.5, 0.5),
    std: Tuple[float, float, float] = (0.5, 0.5, 0.5),
    normalize: bool = True,
):
    """M6 ``ImageTransform`` contract (process/image_process.py:175-194):
    torchvision ``ToTensor`` + ``Normalize`` re-expressed in numpy —
    (H, W, 3) uint8 pixels -> (3, H, W) float32 with
    ``x = (p/255 - mean) / std`` per channel (defaults map [0,255] to
    [-1, 1]); ``normalize=False`` stops at the [0, 1] ToTensor output.
    Torch-free so the tensor contract is testable in this container; a GPU
    deployment feeds the same array layout to the model."""
    import numpy as np

    arr = np.asarray(pixels)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) pixels, got {arr.shape}")
    x = arr.astype(np.float32) / 255.0           # ToTensor scaling
    x = np.transpose(x, (2, 0, 1))               # HWC -> CHW
    if normalize:
        m = np.asarray(mean, dtype=np.float32).reshape(3, 1, 1)
        s = np.asarray(std, dtype=np.float32).reshape(3, 1, 1)
        x = (x - m) / s
    return x
