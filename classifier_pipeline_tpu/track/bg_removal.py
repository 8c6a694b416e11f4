"""Background-animal removal (reference src/track/clip.py:235-306).

Upstream keeps this DISABLED (the call at reference clip.py:230 is commented
out), so this is a capability-parity port of a cold path, not a hot kernel:
it would run at most once per clip during background initialisation. It is
therefore host-side numpy/scipy orchestration around the same cv2-quirk
semantics (tuple-kernel morphology => 2x1 close, Otsu thresholding, label
raster order), with the final hole-fill done by the JAX diffusion inpaint
(ops.imageops.inpaint_diffusion) instead of cv2.INPAINT_TELEA.

Semantics mirrored per reference line:
  * clip.py:241-245 - clamp diff below background_thresh to 0, cap at 255, u8,
    NL-means denoise.
  * clip.py:248-250 - detect_objects(otsus=True): 15x15 Gaussian blur, Otsu
    threshold, tuple-quirk MORPH_CLOSE, 8-connected components w/ stats
    (imageprocessing.py:239-247).
  * clip.py:252-268 - per component: enlarge(2) clipped to frame, skip
    frame-sized regions.
  * clip.py:269-279 - re-detect inside the normalized background crop.
  * clip.py:280-296 - overlap gate (MIN_ORIGIN_OVERLAP=0.80, clip.py:45) with
    the reference's exact arithmetic: overlap_pixels sums the *label image*
    over the original mask, divided by the component's pixel count.
  * clip.py:297-305 - inpaint every nonzero sub-label within the region.
"""

from __future__ import annotations

import numpy as np

MIN_ORIGIN_OVERLAP = 0.80  # reference clip.py:45


def _gaussian_kernel(ksize: int) -> np.ndarray:
    """cv2.getGaussianKernel(ksize, 0): sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _blur_u8(img: np.ndarray, ksize: int) -> np.ndarray:
    """Separable Gaussian blur with REFLECT_101 borders, rounded back to u8."""
    k = _gaussian_kernel(ksize)
    pad = ksize // 2
    x = np.pad(img.astype(np.float64), pad, mode="reflect")
    x = np.apply_along_axis(lambda r: np.convolve(r, k, mode="valid"), 1, x)
    x = np.apply_along_axis(lambda c: np.convolve(c, k, mode="valid"), 0, x)
    return np.clip(np.rint(x), 0, 255).astype(np.uint8)


def _otsu(img_u8: np.ndarray) -> int:
    hist = np.bincount(img_u8.reshape(-1), minlength=256).astype(np.float64)
    p = hist / hist.sum()
    omega = np.cumsum(p)
    mu = np.cumsum(p * np.arange(256))
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma = np.where(denom > 1e-12, (mu_t * omega - mu) ** 2 / denom, 0.0)
    return int(np.argmax(sigma))


def _close_2x1(mask: np.ndarray) -> np.ndarray:
    """cv2 tuple-kernel quirk: MORPH_CLOSE with a 2x1 column kernel."""
    d = np.maximum(mask, np.vstack([mask[:1], mask[:-1]]))
    return np.minimum(d, np.vstack([d[:1], d[:-1]]))


def _label8(mask: np.ndarray):
    """8-connected components, labels in raster order of first pixel
    (cv2.connectedComponentsWithStats order). Returns (n, labels, stats,
    centroids) like cv2: stats rows [x, y, w, h, area], row 0 = background."""
    from classifier_pipeline_tpu.utils.tools import get_ndimage

    ndimage = get_ndimage()

    lab, n = ndimage.label(mask > 0, structure=np.ones((3, 3), np.int32))
    # scipy labels in raster order of first pixel already; build stats
    stats = [[0, 0, mask.shape[1], mask.shape[0], int((lab == 0).sum())]]
    cents = [tuple(np.flip(np.mean(np.argwhere(lab == 0), axis=0))) if (lab == 0).any() else (0.0, 0.0)]
    for i in range(1, n + 1):
        ys, xs = np.nonzero(lab == i)
        stats.append(
            [int(xs.min()), int(ys.min()), int(xs.max() - xs.min() + 1),
             int(ys.max() - ys.min() + 1), int(len(xs))]
        )
        cents.append((float(xs.mean()), float(ys.mean())))
    return n + 1, lab, np.array(stats, np.int64), np.array(cents, np.float64)


def detect_objects_host(image_u8: np.ndarray, otsus: bool = False, threshold: int = 30, ksize: int = 15):
    """Host mirror of reference imageprocessing.detect_objects (:239-247)."""
    blurred = _blur_u8(image_u8, ksize)
    t = _otsu(blurred) if otsus else threshold
    th = (blurred > t).astype(np.uint8)
    closed = _close_2x1(th)
    return _label8(closed)


def _normalize(data: np.ndarray, new_max: float = 255.0):
    """reference imageprocessing.normalize (:151-169)."""
    mx, mn = float(data.max()), float(data.min())
    if mx == mn:
        if mx == 0:
            return np.zeros(data.shape, np.float32), False
        return data.astype(np.float32) / mx, False
    return new_max * (data.astype(np.float32) - mn) / (mx - mn), True


def remove_background_animals(
    initial_frame: np.ndarray,
    initial_diff: np.ndarray,
    background_thresh: float,
) -> np.ndarray:
    """Inpaint stationary animals out of the initial background estimate.

    initial_frame: f32 (H, W) first-frames background; modified copy returned.
    initial_diff: f32 (H, W) max change between first frame and the rest.
    """
    import jax.numpy as jnp

    from classifier_pipeline_tpu.ops.imageops import (
        inpaint_diffusion,
        nl_means_denoise_u8,
    )

    h, w = initial_frame.shape
    initial_frame = initial_frame.astype(np.float32).copy()
    diff = initial_diff.astype(np.float32).copy()
    diff[diff < background_thresh] = 0
    diff[diff > 255] = 255
    diff = np.asarray(
        nl_means_denoise_u8(jnp.asarray(diff.astype(np.uint8).astype(np.int32)))
    ).astype(np.uint8)

    _, lower_mask, lower_objects, centroids = detect_objects_host(diff, otsus=True)

    for component in lower_objects[1:]:
        x0, y0, cw, ch, area = (int(v) for v in component)
        # region.enlarge(2, max=frame)
        x0e, y0e = max(x0 - 2, 0), max(y0 - 2, 0)
        x1e, y1e = min(x0 + cw + 2, w), min(y0 + ch + 2, h)
        if (x1e - x0e) >= w or (y1e - y0e) >= h:
            continue  # background animal bigger than max, likely false positive
        background_region = initial_frame[y0e:y1e, x0e:x1e]
        norm_back, _ = _normalize(background_region, new_max=255)
        sub_components, sub_connected, sub_stats, _ = detect_objects_host(
            norm_back.astype(np.uint8), otsus=True
        )
        if sub_components <= 1:
            continue
        overlap_image = lower_mask[y0e:y1e, x0e:x1e] * 255
        overlap_pixels = np.sum(sub_connected[overlap_image > 0]) / float(area)
        region_area = (x1e - x0e) * (y1e - y0e)
        if (
            overlap_pixels < MIN_ORIGIN_OVERLAP
            or sub_stats[1][4] == 0
            or sub_stats[1][4] == region_area
        ):
            continue
        hole = (sub_connected > 0).astype(np.uint8)
        # cv2.inpaint(..., radius=3) samples known pixels up to 3px from the
        # front; harmonic diffusion only sees the hole's immediate boundary,
        # which sits on the animal's residual hot rim. Dilating the hole by
        # the same radius puts the boundary on genuine background.
        from classifier_pipeline_tpu.utils.tools import get_ndimage

        ndimage = get_ndimage()

        hole = ndimage.binary_dilation(hole, np.ones((3, 3)), iterations=3)
        hole = hole.astype(np.uint8)
        # Jacobi diffusion needs O(d^2) sweeps to settle a hole of diameter d
        side = max(x1e - x0e, y1e - y0e)
        filled = np.asarray(
            inpaint_diffusion(
                jnp.asarray(background_region), jnp.asarray(hole),
                iters=max(64, 2 * side * side),
            )
        )
        initial_frame[y0e:y1e, x0e:x1e] = filled
    return initial_frame
