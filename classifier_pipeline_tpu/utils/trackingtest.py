"""Golden tracking-test harness (reference tests/trackingtest.py +
testconfig.py).

Loads the reference's tracking-tests YAML format (!TestRecording /
!TestTrack entries with expected tag, start/end seconds and boxes), re-runs
the tracker on each recording, matches produced tracks to expectations by
start-time + box distance, and scores each as IMPROVED / SAME / WORSE
against the recorded optimal times.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path

import numpy as np
import yaml

MATCH_ERROR_S = 1.0  # seconds tolerance on start/end (reference :18)
MAX_BOX_ERROR = 8  # px distance for a box match (reference :82-112)


@dataclasses.dataclass
class TestTrack:
    tag: str
    start: float
    end: float
    start_pos: tuple  # (time_s, [l, t, r, b])
    end_pos: tuple
    opt_start: float = None
    opt_end: float = None
    expected: bool = True
    track_id: int = None
    confidence: float = None


@dataclasses.dataclass
class TestRecording:
    filename: str
    tracks: list
    device: str = None
    rec_id: int = None


def _construct_any(loader, node):
    if isinstance(node, yaml.MappingNode):
        return loader.construct_mapping(node, deep=True)
    return loader.construct_scalar(node)


def load_test_file(path):
    """Parse tracking-tests.yml (custom YAML tags mapped to plain dicts)."""

    class Loader(yaml.SafeLoader):
        pass

    for tag in ("!TestConfig", "!TestRecording", "!TestTrack"):
        Loader.add_constructor(tag, _construct_any)
    raw = yaml.load(Path(path).read_text(), Loader=Loader)
    recs = []
    for r in raw.get("recording_tests", []):
        tracks = [
            TestTrack(
                tag=t.get("tag"),
                start=t.get("start"),
                end=t.get("end"),
                start_pos=tuple(t.get("start_pos", (None, None))),
                end_pos=tuple(t.get("end_pos", (None, None))),
                opt_start=t.get("opt_start"),
                opt_end=t.get("opt_end"),
                expected=t.get("expected", True),
                track_id=t.get("track_id"),
                confidence=t.get("confidence"),
            )
            for t in r.get("tracks", [])
        ]
        recs.append(
            TestRecording(
                filename=r["filename"], tracks=tracks,
                device=r.get("device"), rec_id=r.get("rec_id"),
            )
        )
    return recs, raw.get("clip_dir")


def box_distance(box_a, box_b):
    """Mean corner distance between [l,t,r,b] boxes."""
    a = np.asarray(box_a, np.float64)
    b = np.asarray(box_b, np.float64)
    tl = np.hypot(a[0] - b[0], a[1] - b[1])
    br = np.hypot(a[2] - b[2], a[3] - b[3])
    return (tl + br) / 2


def match_track(expected: TestTrack, produced_tracks, fps=9.0):
    """Find the produced track matching an expected one (start time within
    tolerance + start box within MAX_BOX_ERROR)."""
    best = None
    best_d = None
    exp_box = expected.start_pos[1]
    for t in produced_tracks:
        meta = t if isinstance(t, dict) else t.get_metadata()
        if abs(meta["start_s"] - expected.start) > MATCH_ERROR_S + 2:
            continue
        pos = meta["positions"][0]
        got_box = [pos["x"], pos["y"], pos["x"] + pos["width"], pos["y"] + pos["height"]]
        d = box_distance(exp_box, got_box)
        if d <= MAX_BOX_ERROR and (best_d is None or d < best_d):
            best, best_d = meta, d
    return best


def score_track(expected: TestTrack, matched):
    """IMPROVED / SAME / WORSE / MISSED vs the recorded optimal timings."""
    if matched is None:
        return "MISSED" if expected.expected else "SAME"
    opt_start = expected.opt_start if expected.opt_start is not None else expected.start
    opt_end = expected.opt_end if expected.opt_end is not None else expected.end
    start_err = abs(matched["start_s"] - opt_start)
    end_err = abs(matched["end_s"] - opt_end)
    old_start_err = abs(expected.start - opt_start)
    old_end_err = abs(expected.end - opt_end)
    if start_err + end_err < old_start_err + old_end_err - MATCH_ERROR_S:
        return "IMPROVED"
    if start_err <= old_start_err + MATCH_ERROR_S and end_err <= old_end_err + MATCH_ERROR_S:
        return "SAME"
    return "WORSE"


def generate_tests(metadata_files, out_file):
    """Create a tracking-tests YAML from produced metadata (reference
    tests/generatetests.py): each track's current start/end become the
    recorded baseline for future IMPROVED/SAME/WORSE scoring."""
    import json

    recordings = []
    for mf in metadata_files:
        meta = json.loads(Path(mf).read_text())
        tracks = []
        for t in meta.get("tracks", []):
            if not t.get("positions"):
                continue
            p0, p1 = t["positions"][0], t["positions"][-1]
            tracks.append(
                {
                    "tag": (t.get("predictions") or [{}])[0].get("tag", "unknown"),
                    "start": t["start_s"],
                    "end": t["end_s"],
                    "opt_start": t["start_s"],
                    "opt_end": t["end_s"],
                    "expected": True,
                    "track_id": t["id"],
                    "start_pos": [
                        t["start_s"],
                        [p0["x"], p0["y"], p0["x"] + p0["width"], p0["y"] + p0["height"]],
                    ],
                    "end_pos": [
                        t["end_s"],
                        [p1["x"], p1["y"], p1["x"] + p1["width"], p1["y"] + p1["height"]],
                    ],
                }
            )
        recordings.append(
            {"filename": Path(meta.get("source", mf)).name, "tracks": tracks}
        )
    doc = {"recording_tests": recordings, "clip_dir": "."}
    Path(out_file).write_text(yaml.safe_dump(doc, sort_keys=False))
    return out_file


def run_tests(test_file, clip_dir=None, extract_fn=None):
    """Run the whole suite; returns {filename: [(tag, verdict), ...]}."""
    if extract_fn is None:
        from classifier_pipeline_tpu.pipeline.extractor import extract_file

        extract_fn = lambda p: extract_file(p).metadata["tracks"]
    recs, default_dir = load_test_file(test_file)
    clip_dir = Path(clip_dir or default_dir or ".")
    results = {}
    for rec in recs:
        path = clip_dir / rec.filename
        if not path.exists():
            logging.warning("missing clip %s — skipped", path)
            continue
        produced = extract_fn(path)
        verdicts = []
        for expected in rec.tracks:
            matched = match_track(expected, produced)
            verdicts.append((expected.tag, score_track(expected, matched)))
        results[rec.filename] = verdicts
    return results


def main(argv=None):
    """CLI: generate a tracking-tests YAML from metadata sidecars, or run
    one against local clips (reference tests/generatetests.py minus the API
    download — this environment processes local recordings)."""
    import argparse
    import logging

    parser = argparse.ArgumentParser(description="tracking test harness")
    sub = parser.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate", help="metadata sidecars -> tests YAML")
    g.add_argument("metadata", nargs="+", help=".txt metadata sidecars")
    g.add_argument("-o", "--out", default="tracking-tests.yml")
    r = sub.add_parser("run", help="run a tests YAML against local clips")
    r.add_argument("tests", help="tracking-tests YAML")
    r.add_argument("-d", "--clip-dir", default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    if args.cmd == "generate":
        out = generate_tests(args.metadata, args.out)
        logging.info("wrote %s", out)
        return 0
    results = run_tests(args.tests, clip_dir=args.clip_dir)
    worse = 0
    for fname, verdicts in results.items():
        for tag, verdict in verdicts:
            logging.info("%s: %s -> %s", fname, tag, verdict)
            worse += verdict == "WORSE"
    logging.info("%d recordings, %d WORSE",
                 len(results), worse)
    return 1 if worse else 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
