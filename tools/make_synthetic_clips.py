#!/usr/bin/env python3
"""Synthesize CPTV fixtures that exercise tracker edge cases the real
fixture clips (possum/hedgehog) never reach, then let tools/mint_goldens.py
mint reference-oracle goldens for them.

Scenarios (reference semantics each targets):
  * crossing    — two animals swap sides, merging into one region mid-clip:
                  match-ambiguity tiebreak in the greedy matcher
                  (reference src/track/clip.py region<->track scoring).
  * many12      — 12 simultaneous moving blobs; minted with max_tracks=10:
                  the track-count overflow filter
                  (reference src/track/cliptrackextractor.py filter_tracks).
  * ffc_storm   — a mid-clip burst of FFC-affected frames (int telemetry,
                  time_on - last_ffc < 9 ms branch of is_affected_by_ffc,
                  reference src/piclassifier/cptvmotiondetector.py:211-224):
                  tracks must survive via blank frames, not fragment.
  * blank_gap   — the animal vanishes for several frames then reappears on
                  its motion path: Kalman extrapolation + MIN_KALMAN_FRAMES
                  gating (reference src/track/track.py add_blank_frame).
  * edge        — a region entering/leaving through the frame border:
                  edge cropping and the region-on-edge handling
                  (reference src/track/region.py crop logic).
  * merge_split — two blobs approach, overlap into ONE region for several
                  frames, then separate: the matcher must hand the merged
                  region to one track, extrapolate the other through
                  blanks, and re-acquire on split (reference
                  src/track/cliptracker.py _match_existing_tracks scoring).
  * tie_entry   — two IDENTICAL same-frame blobs (equal size/heat/mass):
                  the same-score track-creation tie the reference resolves
                  by set() iteration order (cliptracker.py:140,207-210) —
                  goldens compare order-insensitively on positions.
  * mass_flicker— a marginal blob hovering at the detection threshold, its
                  size pulsing so the region appears/disappears across
                  frames: min-mass gating + blank-frame bookkeeping.
  * ffc_trigger — the animal appears DURING an FFC burst and the burst ends
                  mid-approach: tracking must begin cleanly at the FFC
                  boundary (is_affected_by_ffc gating on the first usable
                  frames).
  * sparse      — a fast 6-frame appearance: the shortest viable track
                  (also the classify-side sparse-segment confidence-cap
                  regime, reference ml_tools/interpreter.py:161-167).

Determinism: every pixel is a pure function of (scenario, frame index) via
a seeded RandomState; re-running this script reproduces byte-identical
clips, so goldens and fixtures can be re-minted at will.

All clips are 160x120 lepton3 (background_thresh=20), 9 fps, int-ms
telemetry, with an embedded background frame (frame 0) so background
subtraction is deterministic.

Usage: python tools/make_synthetic_clips.py [outdir=tests/fixtures]
"""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

W, H = 160, 120
BASE = 2400  # counts; lepton3 raw-ish range, same ballpark as possum
FRAME_MS = 111  # ~9 fps
NOISE_AMP = 3  # +-3 counts << background_thresh 20


def background():
    """Static scene: gentle vertical gradient + fixed texture."""
    rng = np.random.RandomState(7)
    yy = np.linspace(0, 14, H)[:, None]
    tex = rng.randint(-4, 5, size=(H, W))
    return (BASE + yy + tex).astype(np.uint16)


def blob(frame, cx, cy, w=10, h=8, heat=90):
    """Stamp a warm rounded rectangle centred at (cx, cy); soft 1-px rim so
    masses vary as it moves subpixel-ish (ints, but edges clip)."""
    x0, x1 = int(round(cx - w / 2)), int(round(cx + w / 2))
    y0, y1 = int(round(cy - h / 2)), int(round(cy + h / 2))
    xs0, xs1 = max(0, x0), min(W, x1)
    ys0, ys1 = max(0, y0), min(H, y1)
    if xs0 >= xs1 or ys0 >= ys1:
        return
    frame[ys0:ys1, xs0:xs1] += heat
    # cooler rim ring (still above thresh) for less box-like components
    if ys1 - ys0 > 2 and xs1 - xs0 > 2:
        frame[ys0 + 1:ys1 - 1, xs0 + 1:xs1 - 1] += 30


def make_clip(path, n_frames, stamp, ffc_frames=(), seed=1):
    """Write a clip: frame 0 is the background; stamp(frame_f64, i) adds
    actors for frame i. ffc_frames get last_ffc == time_on (affected)."""
    from classifier_pipeline_tpu.cptv.codec import CptvHeader, CptvWriter

    bg = background()
    rng = np.random.RandomState(seed)
    header = CptvHeader(
        timestamp_us=1_600_000_000_000_000,
        devicename="synthetic",
        model="lepton3",
        brand="flir",
        firmware="1.0",
        device_id=99,
        camera_serial=99,
        fps=9,
        has_background=True,
    )
    wtr = CptvWriter(path, header)
    wtr.write_frame(
        bg, time_on_ms=60_000, last_ffc_ms=10_000, temp_c=20.0,
        last_ffc_temp_c=20.0, is_background=True,
    )
    for i in range(n_frames):
        f = bg.astype(np.int64) + rng.randint(-NOISE_AMP, NOISE_AMP + 1,
                                              size=(H, W))
        stamp(f, i)
        t_on = 60_000 + (i + 1) * FRAME_MS
        last_ffc = t_on if i in ffc_frames else 10_000
        wtr.write_frame(
            np.clip(f, 0, 65535).astype(np.uint16),
            time_on_ms=t_on, last_ffc_ms=last_ffc, temp_c=20.0,
            last_ffc_temp_c=20.0, is_background=False,
        )
    wtr.close()


def crossing(outdir):
    def stamp(f, i):
        blob(f, 20 + 2.0 * i, 50)          # A: left -> right
        blob(f, 140 - 2.0 * i, 54, w=12)   # B: right -> left, brushes A
    make_clip(outdir / "synth_crossing.cptv", 60, stamp, seed=11)


def many12(outdir):
    def stamp(f, i):
        k = 0
        for r in range(3):
            for c in range(4):
                cx = 22 + c * 38 + (1.0 if (k % 2) else -1.0) * 0.15 * i
                cy = 24 + r * 36 + 0.12 * i * (1 if r == 1 else -1)
                blob(f, cx, cy, w=8, h=7, heat=80 + 4 * k)
                k += 1
    make_clip(outdir / "synth_many12.cptv", 55, stamp, seed=12)


def ffc_storm(outdir):
    def stamp(f, i):
        blob(f, 15 + 1.8 * i, 60 + 0.3 * i)
    # two bursts of FFC-affected frames mid-track
    make_clip(outdir / "synth_ffc_storm.cptv", 70, stamp,
              ffc_frames=set(range(25, 31)) | set(range(44, 47)), seed=13)


def blank_gap(outdir):
    def stamp(f, i):
        if 28 <= i < 36:
            return  # vanishes: blank frames + Kalman extrapolation
        blob(f, 18 + 1.6 * i, 45 + 0.5 * i)
    make_clip(outdir / "synth_blank_gap.cptv", 70, stamp, seed=14)


def edge(outdir):
    def stamp(f, i):
        # enters through the left border, exits through the right; also a
        # second blob sliding along the top edge (permanently clipped)
        blob(f, -6 + 2.4 * i, 70, w=14, h=10)
        blob(f, 30 + 1.5 * i, 2, w=10, h=8)
    make_clip(outdir / "synth_edge.cptv", 75, stamp, seed=15)


def merge_split(outdir):
    def stamp(f, i):
        # approach until fully overlapped (frames ~22-38), then separate
        sep = max(4.0, 34.0 - 1.5 * i) if i < 20 else (
            4.0 if i < 38 else 4.0 + 1.8 * (i - 38)
        )
        blob(f, 80 - sep, 56, w=12, h=9)
        blob(f, 80 + sep, 58, w=10, h=8)
    make_clip(outdir / "synth_merge_split.cptv", 60, stamp, seed=16)


def tie_entry(outdir):
    def stamp(f, i):
        # two blobs with IDENTICAL geometry/heat appearing on the same
        # frame, mirrored about the centre so their scores tie exactly
        blob(f, 40 + 1.2 * i, 40, w=10, h=8, heat=90)
        blob(f, 120 - 1.2 * i, 80, w=10, h=8, heat=90)
    make_clip(outdir / "synth_tie_entry.cptv", 50, stamp, seed=17)


def mass_flicker(outdir):
    def stamp(f, i):
        # a solid anchor track plus a marginal blob that pulses between a
        # comfortably-detectable size and a couple of pixels
        blob(f, 20 + 1.5 * i, 90, w=11, h=9)
        if (i // 3) % 2 == 0:
            blob(f, 100, 30 + 0.4 * i, w=6, h=5, heat=60)
        else:
            blob(f, 100, 30 + 0.4 * i, w=2, h=2, heat=35)
    make_clip(outdir / "synth_mass_flicker.cptv", 60, stamp, seed=18)


def ffc_trigger(outdir):
    def stamp(f, i):
        if i < 12:
            return  # empty scene until the burst is underway
        blob(f, 10 + 2.0 * (i - 12), 64, w=12, h=9)
    # FFC burst spans the animal's entry: frames 10-17 are FFC-affected,
    # the first clean frames catch it mid-approach
    make_clip(outdir / "synth_ffc_trigger.cptv", 60, stamp,
              ffc_frames=set(range(10, 18)), seed=19)


def sparse(outdir):
    def stamp(f, i):
        if 20 <= i < 26:  # 6 frames only, moving fast enough to survive
            blob(f, 30 + 4.0 * (i - 20), 60, w=12, h=10)
    make_clip(outdir / "synth_sparse.cptv", 50, stamp, seed=20)


ALL_SCENARIOS = (crossing, many12, ffc_storm, blank_gap, edge,
                 merge_split, tie_entry, mass_flicker, ffc_trigger, sparse)


def main():
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "tests/fixtures"
    outdir.mkdir(parents=True, exist_ok=True)
    for fn in ALL_SCENARIOS:
        fn(outdir)
        print("wrote", fn.__name__)


if __name__ == "__main__":
    main()
