"""IR TFRecord writing + reading (reference src/ml_tools/irwriter.py,
irdataset.py).

The reference's IR training samples are single frames: a per-region gray crop
and a background-diff "filtered" crop, each normalized 0..255, PNG-encoded
into a tf.Example (irwriter.create_tf_example:42-116). The reader decodes the
thermal PNG, duplicates it into 2 channels (irdataset.decode_image:139-146 —
the filtered channel is decoded but unused upstream; quirk preserved), and
resize-with-pads to the model input.

Uses our native TFRecord container (data/tfrecords.py) and PIL for PNG, so
files are byte-compatible with tf.data (covered by the oracle test).
"""

from __future__ import annotations

import dataclasses
import hashlib
import io
import logging
from pathlib import Path

import numpy as np

from classifier_pipeline_tpu.data import tfrecords as tfr


@dataclasses.dataclass
class IRSample:
    """One labelled frame of one IR track (reference FrameSample subset)."""

    clip_id: int
    track_id: int
    label: str
    frame_number: int
    region: tuple  # (x, y, w, h)
    source_file: object = None
    augment: bool = False

    @property
    def unique_id(self):
        return f"{self.clip_id}-{self.track_id}-{self.frame_number}"


def _png_encode(img_u8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.uint8(img_u8)).save(buf, format="PNG")
    return buf.getvalue()


def _normalize(data):
    """reference imageprocessing.normalize semantics; returns (img, ok)."""
    from classifier_pipeline_tpu.utils.tools import normalize_host

    return normalize_host(data)


def get_diff_back_filtered(background, frame, back_thresh):
    """reference cliptracker.get_diff_back_filtered (:656-668)."""
    filtered = np.abs(np.float32(frame) - np.float32(background))
    filtered[filtered < back_thresh] = 0
    filtered, _ = _normalize(filtered)
    return filtered


def get_data(samples, back_thresh, frames=None, background=None):
    """Crop + filter sample frames (reference irwriter.get_data:118-168).

    frames: (T, H, W) uint8 gray video (decoded via pipeline.ir_extractor
    .load_video when not provided); frame 0 doubles as the background, like
    the reference's first-gray-frame background.
    """
    if frames is None:
        from classifier_pipeline_tpu.pipeline.ir_extractor import load_video

        frames = load_video(samples[0].source_file)
    if background is None:
        background = frames[0]
    data = []
    failed = []
    for sample in samples:
        fn = sample.frame_number
        if fn < 0 or fn >= len(frames):
            failed.append(fn)
            continue
        x, y, w, h = sample.region
        gray_sub = frames[fn][y : y + h, x : x + w]
        back_sub = background[y : y + h, x : x + w]
        if gray_sub.size == 0:
            failed.append(fn)
            continue
        filtered = get_diff_back_filtered(back_sub, gray_sub, back_thresh)
        gray_sub, ok = _normalize(gray_sub)
        if not ok:
            continue
        filtered, ok = _normalize(filtered)
        if not ok:
            continue
        data.append((sample, gray_sub, filtered))
    if failed:
        logging.warning(
            "Could not get %s for %s", failed, str(samples[0].source_file)
        )
    return data


def create_ir_example(sample: IRSample, thermal, filtered, labels) -> bytes:
    """reference irwriter.create_tf_example (:42-116): PNG crops + metadata."""
    image_height, image_width = thermal.shape
    encoded_thermal = _png_encode(thermal)
    encoded_filtered = _png_encode(filtered)
    feature = {
        "image/augmented": tfr.int64_feature(int(sample.augment)),
        "image/height": tfr.int64_feature(image_height),
        "image/width": tfr.int64_feature(image_width),
        "image/filename": tfr.bytes_feature(str(sample.source_file or "")),
        "image/source_id": tfr.bytes_feature(str(sample.unique_id)),
        "image/thermalkey/sha256": tfr.bytes_feature(
            hashlib.sha256(encoded_thermal).hexdigest()
        ),
        "image/thermalencoded": tfr.bytes_feature(encoded_thermal),
        "image/filteredkey/sha256": tfr.bytes_feature(
            hashlib.sha256(encoded_filtered).hexdigest()
        ),
        "image/clip_id": tfr.int64_feature(int(sample.clip_id)),
        "image/track_id": tfr.int64_feature(int(sample.track_id)),
        "image/filteredencoded": tfr.bytes_feature(encoded_filtered),
        "image/format": tfr.bytes_feature("jpeg"),
        "image/class/text": tfr.bytes_feature(sample.label),
        "image/class/label": tfr.int64_feature(labels.index(sample.label)),
    }
    return tfr.encode_example(feature)


def save_data(samples, writer, labels, extra_args):
    """reference irwriter.save_data (:171-190): crop, encode, write."""
    sample_data = get_data(
        samples,
        extra_args["back_thresh"],
        frames=extra_args.get("frames"),
        background=extra_args.get("background"),
    )
    saved = 0
    for sample, thermal, filtered in sample_data:
        writer.write(create_ir_example(sample, thermal, filtered, labels))
        saved += 1
    return saved


def _resize_with_pad(img, th, tw):
    """tf.image.resize_with_pad: scale preserving aspect, center-pad zeros."""
    h, w = img.shape[:2]
    scale = min(th / h, tw / w)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    ys = (np.arange(nh) + 0.5) * h / nh - 0.5
    xs = (np.arange(nw) + 0.5) * w / nw - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None]
    fx = np.clip(xs - x0, 0, 1)[None, :]
    img = img.astype(np.float32)
    if img.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    resized = (
        img[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + img[np.ix_(y0, x1)] * (1 - fy) * fx
        + img[np.ix_(y1, x0)] * fy * (1 - fx)
        + img[np.ix_(y1, x1)] * fy * fx
    )
    out = np.zeros((th, tw) + img.shape[2:], np.float32)
    oy, ox = (th - nh) // 2, (tw - nw) // 2
    out[oy : oy + nh, ox : ox + nw] = resized
    return out


def read_ir_records(path, image_size=(32, 32), labeled=True):
    """Decode an IR shard (reference irdataset.read_irrecord:89-146).

    Yields (image (H, W, 2) float32, label_index). Channel quirk preserved:
    both channels are the thermal PNG.
    """
    from PIL import Image

    for raw in tfr.read_records(path):
        ex = tfr.decode_example(raw)
        thermal = np.asarray(
            Image.open(io.BytesIO(ex["image/thermalencoded"][0]))
        ).astype(np.float32)
        img = np.stack([thermal, thermal], axis=-1)
        img = _resize_with_pad(img, image_size[0], image_size[1])
        if labeled:
            yield img, int(ex["image/class/label"][0])
        else:
            yield img
