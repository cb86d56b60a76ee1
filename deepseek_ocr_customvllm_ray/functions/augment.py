"""M20 pixel augmentation family (robustness corpus generator).

Re-expression of the reference's eval-corpus augmentations
(``Scripts/augument_img.py:36-155``): rotate+center-crop, random
perspective (seeded ``np.random.default_rng``), directional motion blur
(separable box via cumsum), and gradient shadow.  The reference builds
these on PIL; here every kernel is NUMPY-FIRST over ``(H, W, 3) uint8``
arrays — the blur/shadow math is byte-for-semantics identical (the
reference's own inner loops are numpy), and the geometric warps use
inverse-mapped bilinear sampling with white fill (PIL uses BICUBIC;
geometry, seeding, and corner mapping are identical, resampling kernel
differs — documented, since the downstream consumer is a robustness-CER
trend, not a pixel hash).  PIL-guarded wrappers at the bottom apply the
same operations to PIL images for deployments that have it.

Everything is deterministic: pure functions of (array, params, seed).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np

WHITE = 255.0


# ---------------------------------------------------------------------------
# sampling primitives


def _bilinear_sample(arr: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Sample ``arr`` (H, W, 3) at float coords (xs, ys) with bilinear
    interpolation; out-of-bounds reads WHITE (the reference's fill)."""
    h, w = arr.shape[:2]
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]

    def at(xi, yi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        out = np.full(xi.shape + (3,), WHITE, dtype=np.float64)
        out[inside] = arr[yi[inside], xi[inside]].astype(np.float64)
        return out

    p00 = at(x0, y0)
    p10 = at(x0 + 1, y0)
    p01 = at(x0, y0 + 1)
    p11 = at(x0 + 1, y0 + 1)
    top = p00 * (1 - fx) + p10 * fx
    bot = p01 * (1 - fx) + p11 * fx
    return top * (1 - fy) + bot * fy


def _resize_bilinear(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """(H, W, 3) -> (out_h, out_w, 3), PIL-style coordinate mapping
    ``src = (dst + 0.5) * scale - 0.5``."""
    h, w = arr.shape[:2]
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    gx, gy = np.meshgrid(xs, ys)
    return np.clip(
        _bilinear_sample(arr, gx, gy) + 0.5, 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# 1) rotate with center crop (augument_img.py:36-47)


def rotate_with_crop_array(
    arr: np.ndarray, angle_deg: float, crop_ratio: float = 0.96
) -> np.ndarray:
    """Rotate with canvas expand (white fill), center-crop to
    ``crop_ratio`` of the original, resize back to the original size —
    the reference's skew simulation, shape-preserving by construction."""
    h, w = arr.shape[:2]
    th = math.radians(angle_deg)
    c, s = abs(math.cos(th)), abs(math.sin(th))
    rw, rh = int(math.ceil(w * c + h * s)), int(math.ceil(w * s + h * c))

    # inverse mapping: output pixel -> source coords (rotate about centers)
    gx, gy = np.meshgrid(np.arange(rw, dtype=np.float64),
                         np.arange(rh, dtype=np.float64))
    ux, uy = gx - (rw - 1) / 2.0, gy - (rh - 1) / 2.0
    cos_t, sin_t = math.cos(th), math.sin(th)
    # PIL .rotate(angle) is counter-clockwise; inverse = clockwise
    sx = cos_t * ux - sin_t * uy + (w - 1) / 2.0
    sy = sin_t * ux + cos_t * uy + (h - 1) / 2.0
    rotated = _bilinear_sample(arr, sx, sy)

    cw, ch = int(w * crop_ratio), int(h * crop_ratio)
    left, top = (rw - cw) // 2, (rh - ch) // 2
    cropped = np.clip(rotated[top:top + ch, left:left + cw] + 0.5, 0, 255)
    return _resize_bilinear(cropped.astype(np.uint8), w, h)


# ---------------------------------------------------------------------------
# 2) perspective / keystone (augument_img.py:53-85)


def perspective_coeffs(pa: List[Tuple], pb: List[Tuple]) -> List[float]:
    """8 projective coefficients mapping target corners ``pb`` back to
    source corners ``pa`` (the PIL ``Image.PERSPECTIVE`` convention: for
    output (x, y), input = ((ax+by+c)/(gx+hy+1), (dx+ey+f)/(gx+hy+1))),
    solved by least squares exactly as the reference does."""
    rows = []
    for (x, y), (u, v) in zip(pa, pb):
        rows.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        rows.append([0, 0, 0, x, y, 1, -v * x, -v * y])
    a = np.array(rows, dtype=np.float64)
    b = np.array([p for uv in pb for p in uv], dtype=np.float64)
    coeffs, *_ = np.linalg.lstsq(a, b, rcond=None)
    return coeffs.tolist()


def apply_perspective_array(arr: np.ndarray, coeffs: List[float]) -> np.ndarray:
    """Apply 8-coefficient projective warp (PIL ``transform`` semantics:
    coeffs map OUTPUT coords to INPUT sample coords), white fill."""
    h, w = arr.shape[:2]
    a, b, c, d, e, f, g, hh = coeffs
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    den = g * gx + hh * gy + 1.0
    sx = (a * gx + b * gy + c) / den
    sy = (d * gx + e * gy + f) / den
    return np.clip(_bilinear_sample(arr, sx, sy) + 0.5, 0, 255).astype(np.uint8)


def random_perspective_array(
    arr: np.ndarray, max_shift: float = 0.06, seed: int = 0
) -> np.ndarray:
    """Seeded keystone distortion: corners perturbed by
    ``uniform(-max_shift*dim, +max_shift*dim)`` in the REFERENCE'S draw
    order (tl.x, tl.y, tr.x, tr.y, br.x, br.y, bl.x, bl.y) so the same
    seed produces the same geometry."""
    rng = np.random.default_rng(seed)
    h, w = arr.shape[:2]
    pb = [(0, 0), (w, 0), (w, h), (0, h)]
    dx, dy = max_shift * w, max_shift * h
    pa = [
        (rng.uniform(-dx, dx), rng.uniform(-dy, dy)),
        (w + rng.uniform(-dx, dx), rng.uniform(-dy, dy)),
        (w + rng.uniform(-dx, dx), h + rng.uniform(-dy, dy)),
        (rng.uniform(-dx, dx), h + rng.uniform(-dy, dy)),
    ]
    # coefficients solved FROM the perturbed source corners, like the
    # reference (pa -> pb fit, applied as output->input sampling)
    return apply_perspective_array(arr, perspective_coeffs(pa, pb))


# ---------------------------------------------------------------------------
# 3) directional motion blur (augument_img.py:91-128)


def horizontal_motion_blur_array(arr: np.ndarray, k: int = 15) -> np.ndarray:
    """Separable horizontal box blur via cumulative sums — the reference's
    exact numpy kernel (edge-padded, odd k, clip to uint8)."""
    k = int(k)
    if k < 3:
        return arr
    if k % 2 == 0:
        k += 1
    h, w, c = arr.shape
    if k >= w:
        k = w - 1 if (w % 2 == 0) else w
        if k < 3:
            return arr
    pad = k // 2
    fp = np.pad(arr.astype(np.float32), ((0, 0), (pad, pad), (0, 0)), mode="edge")
    cs = np.cumsum(fp, axis=1)
    cs = np.concatenate([np.zeros((h, 1, c), dtype=np.float32), cs], axis=1)
    out = (cs[:, k:, :] - cs[:, :-k, :]) / float(k)
    return np.clip(out, 0, 255).astype(np.uint8)


def motion_blur_array(arr: np.ndarray, k: int = 15, angle_deg: float = 10.0) -> np.ndarray:
    """Directional blur: rotate (expand, white fill) -> horizontal box
    blur -> rotate back -> center-crop to the original size."""
    h, w = arr.shape[:2]
    tmp = _rotate_expand(arr, angle_deg)
    tmp = horizontal_motion_blur_array(tmp, k=k)
    tmp = _rotate_expand(tmp, -angle_deg)
    th, tw = tmp.shape[:2]
    left, top = max(0, (tw - w) // 2), max(0, (th - h) // 2)
    return tmp[top:top + h, left:left + w]


def _rotate_expand(arr: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate with canvas expand and white fill (no crop/resize)."""
    h, w = arr.shape[:2]
    th = math.radians(angle_deg)
    c, s = abs(math.cos(th)), abs(math.sin(th))
    rw, rh = int(math.ceil(w * c + h * s)), int(math.ceil(w * s + h * c))
    gx, gy = np.meshgrid(np.arange(rw, dtype=np.float64),
                         np.arange(rh, dtype=np.float64))
    ux, uy = gx - (rw - 1) / 2.0, gy - (rh - 1) / 2.0
    cos_t, sin_t = math.cos(th), math.sin(th)
    sx = cos_t * ux - sin_t * uy + (w - 1) / 2.0
    sy = sin_t * ux + cos_t * uy + (h - 1) / 2.0
    return np.clip(_bilinear_sample(arr, sx, sy) + 0.5, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# 4) gradient shadow (augument_img.py:134-155)


def add_shadow_gradient_array(
    arr: np.ndarray, strength: float = 0.35, seed: int = 0
) -> np.ndarray:
    """Seeded linear illumination gradient: one side darkened by up to
    ``strength`` (mask in ``[1-strength, 1]``), direction drawn from the
    seeded rng — the reference's exact math."""
    rng = np.random.default_rng(seed)
    f = arr.astype(np.float32) / 255.0
    h, w = f.shape[:2]
    x = np.linspace(0, 1, w)[None, :]
    y = np.linspace(0, 1, h)[:, None]
    angle = rng.uniform(0, 2 * np.pi)
    gx = np.cos(angle) * x + np.sin(angle) * y
    gx = (gx - gx.min()) / (gx.max() - gx.min() + 1e-9)
    mask = 1.0 - strength * gx
    return np.clip(f * mask[..., None] * 255.0, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# reference severity families (augument_img.py:179-207) + PIL wrappers


AUGMENT_FAMILIES = {
    # name -> list of (kernel-kwargs) severity levels, reference values
    "skew": [{"angle_deg": 2.0}, {"angle_deg": -3.5}],
    "perspective": [{"max_shift": 0.05}, {"max_shift": 0.08}],
    "blur": [{"k": 13}, {"k": 21}],
    "shadow": [{"strength": 0.30}, {"strength": 0.45}],
}


def augment_page_array(
    arr: np.ndarray, family: str, severity: int = 0, seed: int = 0
) -> np.ndarray:
    """Dispatch one augmentation at a reference severity level — the
    robustness-corpus generator entry point (deterministic in seed)."""
    kw = AUGMENT_FAMILIES[family][severity]
    if family == "skew":
        return rotate_with_crop_array(arr, **kw)
    if family == "perspective":
        return random_perspective_array(arr, seed=seed, **kw)
    if family == "blur":
        return motion_blur_array(arr, **kw)
    if family == "shadow":
        return add_shadow_gradient_array(arr, seed=seed, **kw)
    raise ValueError(f"unknown augmentation family {family!r}")


def augment_page_pil(img, family: str, severity: int = 0, seed: int = 0):
    """PIL wrapper (import-guarded): converts to array, applies the numpy
    kernel, converts back — one code path for both worlds."""
    from PIL import Image

    out = augment_page_array(
        np.asarray(img.convert("RGB")), family, severity=severity, seed=seed
    )
    return Image.fromarray(out, mode="RGB")
