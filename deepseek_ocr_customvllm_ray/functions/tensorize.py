"""M7 tensor emission: the ``tokenize_with_images`` output contract.

Re-expresses the reference processor's tensor assembly
(process/image_process.py:416-585) as numpy, torch-free:

- ``input_ids``            (1, L) int64 — prompt tokens with image-token
  runs spliced in (run layout at :510-521), trailing EOS removed in
  inference mode (:555-559);
- ``target_ids``           (L,) int64 — image-token / negative positions
  masked to ``ignore_id`` (:533-550);
- ``images_seq_mask``      (L,) bool — True exactly on image-token runs;
- ``pixel_values``         (n_images, 3, 1024, 1024) float32 — each page's
  global view, aspect-preserving pad to BASE_SIZE with the transform mean
  color (ImageOps.pad semantics, :473-475), then ToTensor+Normalize
  (functions/tiling.image_transform);
- ``images_crop``          (1, n_tiles, 3, 640, 640) float32 — the
  dynamic-tiling local views when any page tiles (:484-494), else the
  reference's zero placeholder (:563-576);
- ``images_spatial_crop``  (n_images, 2) int64 — (width_tiles,
  height_tiles) per page (:478-480);
- ``num_image_tokens``     list[int] — per-page run lengths, equal by
  construction to ``tiling.num_image_tokens`` (the long-verified scalar
  contract).

The tokenizer and the resampler are seams: ``encode`` is any
``str -> list[int]`` (the vLLM tokenizer in deployment, a deterministic
stub in tests), and images are anything speaking the PIL protocol
(``size`` / ``resize`` / ``crop``).  :class:`ArrayImage` is a numpy-backed
implementation (nearest-neighbor resample) so the FULL pixel path runs and
is tested in this container; a PIL deployment passes real images and gets
PIL's resampling — the assembly arithmetic is identical.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from .tiling import (
    BASE_SIZE,
    IMAGE_SIZE,
    PROMPT,
    dynamic_preprocess_pixels,
    image_transform,
    num_image_tokens,
)

IGNORE_ID = -100  # process/image_process.py ignore_id default
IMAGE_TOKEN = "<image>"
# ImageOps.pad fill = tuple(int(x * 255) for x in mean) with mean 0.5
PAD_FILL = 127


class ArrayImage:
    """Numpy-backed PIL-protocol image: (H, W, 3) uint8 pixels.

    ``resize`` is nearest-neighbor index sampling — deterministic and
    library-free.  This is the documented resample seam: a real deployment
    uses PIL images (BICUBIC), and every OTHER byte of the emission
    (layout, masks, pad geometry, normalization) is shared.
    """

    def __init__(self, pixels: np.ndarray):
        pixels = np.asarray(pixels)
        if pixels.ndim != 3 or pixels.shape[2] != 3:
            raise ValueError(f"expected (H, W, 3) pixels, got {pixels.shape}")
        self.pixels = pixels.astype(np.uint8, copy=False)
        self.mode = "RGB"

    @property
    def size(self):
        return (self.pixels.shape[1], self.pixels.shape[0])

    def resize(self, wh):
        w, h = wh
        src_h, src_w = self.pixels.shape[:2]
        # PIL-style nearest: sample source center of each dest pixel
        rows = np.minimum(
            ((np.arange(h) + 0.5) * src_h / h).astype(np.int64), src_h - 1
        )
        cols = np.minimum(
            ((np.arange(w) + 0.5) * src_w / w).astype(np.int64), src_w - 1
        )
        return ArrayImage(self.pixels[rows][:, cols])

    def crop(self, box):
        l, t, r, b = box
        return ArrayImage(self.pixels[t:b, l:r])

    def convert(self, mode):
        if mode != "RGB":
            raise ValueError(f"ArrayImage only converts to RGB, got {mode}")
        return self


def to_pixels(img) -> np.ndarray:
    """(H, W, 3) uint8 pixels from an ArrayImage or a PIL image."""
    if isinstance(img, ArrayImage):
        return img.pixels
    arr = np.asarray(img.convert("RGB") if img.mode != "RGB" else img)
    return arr.astype(np.uint8, copy=False)


def contain_size(width: int, height: int, tw: int, th: int):
    """PIL ``ImageOps.contain`` target-size arithmetic: scale to fit within
    (tw, th) preserving aspect ratio, Python ``round`` on the free axis."""
    im_ratio = width / height
    dest_ratio = tw / th
    if im_ratio != dest_ratio:
        if im_ratio > dest_ratio:
            new_height = round(height / width * tw)
            if new_height != th:
                return (tw, new_height)
        else:
            new_width = round(width / height * th)
            if new_width != tw:
                return (new_width, th)
    return (tw, th)


def pad_global_view(img, base_size: int = BASE_SIZE,
                    fill: int = PAD_FILL) -> np.ndarray:
    """``ImageOps.pad(img, (base, base), color=mean)`` as pixels: contain-
    resize through the image protocol, then center-pad with the mean color
    (process/image_process.py:473-475; centering arithmetic = PIL's
    ``round((size - resized) * 0.5)`` on exactly one axis)."""
    w, h = img.size
    cw, ch = contain_size(w, h, base_size, base_size)
    px = to_pixels(img.resize((cw, ch)) if (cw, ch) != (w, h) else img)
    if (cw, ch) == (base_size, base_size):
        return px
    out = np.full((base_size, base_size, 3), fill, dtype=np.uint8)
    if cw != base_size:
        x = round((base_size - cw) * 0.5)
        out[:ch, x:x + cw] = px
    else:
        y = round((base_size - ch) * 0.5)
        out[y:y + ch, :cw] = px
    return out


def image_token_run(nw: int, nh: int, image_token_id: int) -> List[int]:
    """Per-image token-run layout (process/image_process.py:510-521):
    global = 16 rows of (16 tokens + 1 row separator) + 1 view separator;
    local (only when tiled) = nh*10 rows of (nw*10 tokens + 1)."""
    import math

    nq_base = math.ceil((BASE_SIZE // 16) / 4)   # 16
    nq = math.ceil((IMAGE_SIZE // 16) / 4)       # 10
    run = ([image_token_id] * nq_base + [image_token_id]) * nq_base
    run += [image_token_id]
    if nw > 1 or nh > 1:
        run += ([image_token_id] * (nq * nw) + [image_token_id]) * (nq * nh)
    return run


def tokenize_with_images(
    images: Sequence,
    encode: Callable[[str], List[int]],
    *,
    image_token_id: int,
    bos_id: int,
    eos_id: int,
    pad_id: int,
    ignore_id: int = IGNORE_ID,
    prompt: str = PROMPT,
    bos: bool = True,
    eos: bool = True,
    cropping: bool = True,
    inference_mode: bool = True,
) -> dict:
    """Full tensor assembly (process/image_process.py:416-585), numpy out.

    ``encode`` must match the reference's ``encode(text, bos=False,
    eos=False)``.  Token ids are explicit parameters because the reference
    reads them off the deployed tokenizer.
    """
    splits = prompt.split(IMAGE_TOKEN)
    if len(splits) - 1 != len(images):
        raise ValueError(
            f"prompt has {len(splits) - 1} image tags for {len(images)} images"
        )

    tokenized: List[int] = []
    seq_mask: List[bool] = []
    pixel_list: List[np.ndarray] = []
    crop_list: List[np.ndarray] = []
    spatial: List[List[int]] = []
    n_img_tokens: List[int] = []
    image_shapes: List[tuple] = []

    for text_sep, image in zip(splits, images):
        sep_ids = encode(text_sep)
        tokenized += sep_ids
        seq_mask += [False] * len(sep_ids)

        image_shapes.append(tuple(image.size))
        w, h = image.size
        tiles = None
        if w <= IMAGE_SIZE and h <= IMAGE_SIZE:
            ratio = (1, 1)
        elif cropping:
            tiles, ratio = dynamic_preprocess_pixels(image)
        else:
            ratio = (1, 1)

        if not cropping:  # reference: image_size <= 640 and not cropping
            image = image.resize((IMAGE_SIZE, IMAGE_SIZE))
        pixel_list.append(image_transform(pad_global_view(image)))

        nw, nh = ratio
        spatial.append([nw, nh])
        if tiles is not None and (nw > 1 or nh > 1):
            crop_list += [image_transform(to_pixels(t)) for t in tiles]

        run = image_token_run(nw, nh, image_token_id)
        tokenized += run
        seq_mask += [True] * len(run)
        n_img_tokens.append(len(run))

    tail_ids = encode(splits[-1])
    tokenized += tail_ids
    seq_mask += [False] * len(tail_ids)

    if bos:
        tokenized = [bos_id] + tokenized
        seq_mask = [False] + seq_mask
    if eos:
        tokenized = tokenized + [eos_id]
        seq_mask = seq_mask + [False]

    input_ids = np.asarray(tokenized, dtype=np.int64)
    seq_mask_arr = np.asarray(seq_mask, dtype=bool)
    target_ids = input_ids.copy()
    target_ids[(input_ids < 0) | (input_ids == image_token_id)] = ignore_id
    input_ids = np.where(input_ids < 0, pad_id, input_ids)

    if inference_mode:
        if input_ids[-1] != eos_id:
            raise ValueError("inference mode expects a trailing eos token")
        input_ids = input_ids[:-1]
        target_ids = target_ids[:-1]
        seq_mask_arr = seq_mask_arr[:-1]

    if not pixel_list:
        pixel_values = np.zeros((1, 3, BASE_SIZE, BASE_SIZE), dtype=np.float32)
        spatial_arr = np.zeros((1, 1), dtype=np.int64)
        images_crop = np.zeros(
            (1, 1, 3, IMAGE_SIZE, IMAGE_SIZE), dtype=np.float32
        )
    else:
        pixel_values = np.stack(pixel_list, axis=0)
        spatial_arr = np.asarray(spatial, dtype=np.int64)
        if crop_list:
            images_crop = np.stack(crop_list, axis=0)[np.newaxis]
        else:
            images_crop = np.zeros(
                (1, 1, 3, IMAGE_SIZE, IMAGE_SIZE), dtype=np.float32
            )

    return {
        "input_ids": input_ids[np.newaxis],
        "target_ids": target_ids,
        "images_seq_mask": seq_mask_arr,
        "pixel_values": pixel_values,
        "images_crop": images_crop,
        "images_spatial_crop": spatial_arr,
        "num_image_tokens": n_img_tokens,
        "image_shapes": image_shapes,
    }


def check_token_parity(width: int, height: int, cropping: bool = True) -> bool:
    """The emission's per-image run length equals the scalar contract
    ``tiling.num_image_tokens`` for any page dims (used by tests)."""
    if cropping and not (width <= IMAGE_SIZE and height <= IMAGE_SIZE):
        from .tiling import count_tiles

        nw, nh = count_tiles(width, height)
    else:
        nw = nh = 1
    return len(image_token_run(nw, nh, 0)) == num_image_tokens(
        width, height, cropping
    )
