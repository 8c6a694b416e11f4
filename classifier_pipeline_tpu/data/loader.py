"""Training input pipeline (reference src/ml_tools/{tfdataset,
thermaldataset}.py).

Reads our TFRecord shards, decodes examples to arrays, and applies the
reference's augmentation chain — rotation (±0.1 turns, nearest fill),
left-right flip, 45->32 crop at (7,7), 5x5 tiling, brightness/contrast —
as one jitted batched JAX function so augmentation runs on device.
Includes the label remapping and the multi-label land-bird extra class.
"""

from __future__ import annotations

import functools
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from . import tfrecords as tfr

IMG_SIZE = 45
CROP = 32
CROP_OFF = 7

# label remaps applied when reading (reference thermaldataset.py:40-55)
DEFAULT_REMAPS = {
    "allbirds": "bird",
    "black swan": "land-bird",
    "brown quail": "land-bird",
    "california quail": "land-bird",
    "duck": "land-bird",
    "pheasant": "land-bird",
    "pukeko": "land-bird",
    "quail": "land-bird",
    "chicken": "land-bird",
}
LAND_BIRDS = ["land-bird"]


def load_split(record_dir, num_frames=25, channels=2):
    """Decode a split directory into memory arrays:
    images (N, F, 45, 45, C), labels (N,), features (N, ...)."""
    record_dir = Path(record_dir)
    images = []
    labels = []
    features = []
    for f in sorted(record_dir.glob("*.tfrecord")):
        for rec in tfr.read_records(f):
            ex = tfr.decode_example(rec)
            th = ex["image/thermalencoded"].reshape(num_frames, IMG_SIZE, IMG_SIZE)
            fi = ex["image/filteredencoded"].reshape(num_frames, IMG_SIZE, IMG_SIZE)
            images.append(np.stack([th, fi], axis=-1))
            labels.append(int(ex["image/class/label"][0]))
            features.append(ex.get("image/features"))
    if not images:
        return None
    return {
        "images": np.stack(images).astype(np.float32),
        "labels": np.array(labels, np.int32),
        "features": features,
    }


def build_label_arrays(source_labels, train_labels, multi_label=True):
    """Map stored label ids -> training one-hot rows, with the land-bird
    extra class (reference kerasmodel.py:567-568, thermaldataset.py:56-77)."""
    L = len(train_labels)
    onehots = np.zeros((len(source_labels), L), np.float32)
    bird_idx = train_labels.index("bird") if "bird" in train_labels else None
    for i, lbl in enumerate(source_labels):
        lbl = DEFAULT_REMAPS.get(lbl, lbl)
        if lbl not in train_labels:
            continue
        onehots[i, train_labels.index(lbl)] = 1.0
        if multi_label and lbl in LAND_BIRDS and bird_idx is not None:
            onehots[i, bird_idx] = 1.0
    return onehots


@functools.partial(jax.jit, static_argnames=("square_width", "augment"))
def augment_and_tile(images, rng, square_width=5, augment=True):
    """(B, F, 45, 45, C) -> (B, 32*sw, 32*sw, C) with reference augments."""
    B, F, H, W, C = images.shape
    k_rot, k_flip, k_bright, k_contrast = jax.random.split(rng, 4)

    if augment:
        # rotation: uniform ±0.1 turns, nearest-neighbour fill like
        # keras RandomRotation(0.1, fill_mode="nearest")
        angles = jax.random.uniform(
            k_rot, (B,), minval=-0.1 * 2 * np.pi, maxval=0.1 * 2 * np.pi
        )

        def rotate_one(img, angle):
            # img: (F, H, W, C); rotate about center, nearest sampling
            cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
            yy = jnp.arange(H, dtype=jnp.float32)[:, None] - cy
            xx = jnp.arange(W, dtype=jnp.float32)[None, :] - cx
            cos, sin = jnp.cos(angle), jnp.sin(angle)
            sy = cy + yy * cos - xx * sin
            sx = cx + yy * sin + xx * cos
            iy = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, H - 1)
            ix = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, W - 1)
            return img[:, iy, ix, :]

        images = jax.vmap(rotate_one)(images, angles)
        flips = jax.random.uniform(k_flip, (B,)) > 0.5
        images = jnp.where(
            flips[:, None, None, None, None], images[:, :, :, ::-1, :], images
        )

    images = images[:, :, CROP_OFF : CROP_OFF + CROP, CROP_OFF : CROP_OFF + CROP, :]
    # tile 5x5 (row-major frames)
    S = CROP
    tiled = images.reshape(B, square_width, square_width, S, S, C)
    tiled = tiled.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, square_width * S, square_width * S, C
    )
    if augment:
        # RandomBrightness(0.2) on 0..255 then RandomContrast(0.5)
        delta = jax.random.uniform(
            k_bright, (B, 1, 1, 1), minval=-0.2 * 255, maxval=0.2 * 255
        )
        tiled = tiled + delta
        factor = jax.random.uniform(
            k_contrast, (B, 1, 1, 1), minval=0.5, maxval=1.5
        )
        mean = jnp.mean(tiled, axis=(1, 2), keepdims=True)
        tiled = (tiled - mean) * factor + mean
        tiled = jnp.clip(tiled, 0.0, 255.0)
    return tiled


class TrainLoader:
    """Shuffled, optionally label-resampled batch iterator."""

    def __init__(self, split, onehots, batch_size=32, augment=True,
                 square_width=5, seed=0, resample=False):
        self.images = split["images"]
        self.onehots = onehots
        self.batch_size = batch_size
        self.augment = augment
        self.square_width = square_width
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.resample = resample

    def __len__(self):
        return max(1, len(self.images) // self.batch_size)

    def epoch(self):
        n = len(self.images)
        if self.resample:
            # per-label uniform resampling (reference tfdataset.py:167-197):
            # draw each batch element with probability inversely proportional
            # to its label's frequency
            labels = np.argmax(self.onehots, axis=1)
            counts = np.bincount(labels, minlength=self.onehots.shape[1])
            weights = 1.0 / np.maximum(counts[labels], 1)
            weights = weights / weights.sum()
            order = self.rng.choice(n, size=n, replace=True, p=weights)
        else:
            order = self.rng.permutation(n)
        bs = self.batch_size
        for i in range(0, n - bs + 1, bs) if n >= bs else [0]:
            idx = order[i : i + bs] if n >= bs else order
            self.key, sub = jax.random.split(self.key)
            images = augment_and_tile(
                jnp.asarray(self.images[idx]),
                sub,
                square_width=self.square_width,
                augment=self.augment,
            )
            yield images, jnp.asarray(self.onehots[idx])
