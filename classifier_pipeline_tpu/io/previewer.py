"""Clip preview rendering (reference src/ml_tools/previewer.py).

Renders raw / tracking-box / classified previews of a clip to MP4 (ffmpeg)
or GIF (fallback). Heat colourmap is computed (magma-like ramp) instead of
the reference's pickled colourmap resource.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from classifier_pipeline_tpu.utils.tools import normalize_host

from .mpeg_creator import MPEGCreator

PREVIEW_RAW = "raw"
PREVIEW_BOXES = "boxes"
PREVIEW_CLASSIFIED = "classified"
PREVIEW_TRACKING = "tracking"

TRACK_COLOURS = [
    (255, 0, 0), (0, 255, 0), (50, 100, 255), (255, 255, 0),
    (255, 0, 255), (0, 255, 255), (255, 128, 0), (128, 0, 255),
]


def _heat_colourmap(n=256):
    """Black -> purple -> red -> yellow -> white ramp."""
    t = np.linspace(0, 1, n)
    r = np.clip(3.0 * t, 0, 1)
    g = np.clip(3.0 * t - 1.0, 0, 1)
    b = np.clip(np.where(t < 0.4, 2.0 * t, 3.0 * t - 2.0), 0, 1)
    return (np.stack([r, g, b], axis=1) * 255).astype(np.uint8)


_CMAP = _heat_colourmap()


def render_thermal(frame, t_min=None, t_max=None, scale=4):
    f = frame.astype(np.float32)
    t_min = f.min() if t_min is None else t_min
    t_max = f.max() if t_max is None else t_max
    norm = np.clip((f - t_min) / max(t_max - t_min, 1e-6) * 255, 0, 255)
    rgb = _CMAP[norm.astype(np.uint8)]
    if scale != 1:
        rgb = np.repeat(np.repeat(rgb, scale, axis=0), scale, axis=1)
    return rgb


class Previewer:
    def __init__(self, config=None, preview_type=PREVIEW_CLASSIFIED, scale=4):
        self.config = config
        self.preview_type = preview_type
        self.scale = scale

    def export_clip_preview(self, filename, thermal, tracks=None,
                            predictions=None, fps=9, filtered=None,
                            masks=None, flows=None):
        """thermal: (T, H, W) uint16; tracks: AssembledTracks; predictions:
        {model_id: Predictions} for footer labels. For the "tracking" debug
        view pass filtered (T, H, W) f32, masks (T, H, W) u8 and optionally
        flows (T, H, W, 2)."""
        from PIL import Image, ImageDraw

        mpeg = MPEGCreator(filename, fps=fps)
        t_min = float(thermal.min())
        t_max = float(thermal.max())
        bounds_by_frame = {}
        for ti, track in enumerate(tracks or []):
            label = None
            if predictions:
                for reg in predictions.values():
                    tp = reg.prediction_for(track.track_id)
                    if tp is not None and tp.max_score is not None:
                        label = f"{tp.predicted_tag()} {tp.max_score * 10:.1f}"
            for b in track.bounds:
                bounds_by_frame.setdefault(b.frame_number, []).append(
                    (ti, b, label)
                )
        if self.preview_type == PREVIEW_TRACKING:
            # 4-up debug view (reference previewer.create_four_tracking_image
            # :321-380): thermal+boxes | filtered over mask | flow magnitude
            for t in range(thermal.shape[0]):
                th_rgb = render_thermal(thermal[t], t_min, t_max, 1)
                if t in bounds_by_frame:
                    img = Image.fromarray(th_rgb)
                    draw = ImageDraw.Draw(img)
                    for ti, b, _label in bounds_by_frame[t]:
                        draw.rectangle(
                            [b.x, b.y, b.right, b.bottom],
                            outline=TRACK_COLOURS[ti % len(TRACK_COLOURS)],
                            width=1,
                        )
                    th_rgb = np.asarray(img)
                f = filtered[t] if filtered is not None else np.zeros_like(
                    thermal[t], np.float32
                )
                fn, _ = normalize_host(f)
                f_rgb = np.repeat(np.uint8(fn)[..., None], 3, axis=2)
                m = masks[t] if masks is not None else np.zeros_like(
                    thermal[t], np.uint8
                )
                m_rgb = np.repeat(np.uint8(m > 0)[..., None] * 255, 3, axis=2)
                if flows is not None:
                    mag = np.linalg.norm(
                        flows[t].astype(np.float32), axis=-1
                    ) / 4.0 + t_min
                    fl_rgb = render_thermal(mag, t_min, t_max, 1)
                else:
                    fl_rgb = np.zeros_like(th_rgb)
                quad = np.hstack(
                    (np.vstack((th_rgb, m_rgb)), np.vstack((f_rgb, fl_rgb)))
                )
                img = Image.fromarray(quad).resize(
                    (quad.shape[1] * self.scale, quad.shape[0] * self.scale),
                    Image.BILINEAR,
                )
                mpeg.next_frame(np.ascontiguousarray(np.asarray(img)))
            mpeg.close()
            logging.info("Exported tracking preview %s", filename)
            return filename
        for t in range(thermal.shape[0]):
            rgb = render_thermal(thermal[t], t_min, t_max, self.scale)
            if self.preview_type != PREVIEW_RAW and t in bounds_by_frame:
                img = Image.fromarray(rgb)
                draw = ImageDraw.Draw(img)
                for ti, b, label in bounds_by_frame[t]:
                    colour = TRACK_COLOURS[ti % len(TRACK_COLOURS)]
                    s = self.scale
                    draw.rectangle(
                        [b.x * s, b.y * s, b.right * s, b.bottom * s],
                        outline=colour, width=1,
                    )
                    if label and self.preview_type == PREVIEW_CLASSIFIED:
                        draw.text((b.x * s, b.bottom * s + 1), label, fill=colour)
                rgb = np.asarray(img)
            mpeg.next_frame(np.ascontiguousarray(rgb))
        mpeg.close()
        logging.info("Exported preview %s", filename)
        return filename
