#!/usr/bin/env python3
"""Mint golden tracking outputs by running the REFERENCE pipeline as an
oracle (it runs fine on CPU in this environment).

The reference imports three modules absent here; each gets a functional
shim:
  * timezonefinder / pytz — trivial tz lookups (goldens don't depend on tz).
  * cptv_rs_python_bindings — backed by our own CPTV codec, whose decode is
    byte-compare tested against the format spec (tests/test_cptv_codec.py).

Validation: minting possum.cptv through this harness must reproduce the
reference repo's own shipped golden (possum.txt) box-for-box — run
tests/test_trackingtest_harness.py or compare manually. Only then are the
hedgehog / lepton3.5 goldens trustworthy.

The lepton3.5 fixture is possum.cptv re-telemetried: model="lepton3.5" and
pixels shifted into the centi-Kelvin range (~28000), which flips the
reference's weight_add branch (cliptrackextractor.py:124-127) and the
lepton3.5 threshold tables.

Usage: python tools/mint_goldens.py [outdir=tests/goldens]
"""
import json
import shutil
import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
L35_SHIFT = 25640  # possum median ~2360 -> ~28000 (lepton3.5 temp_thresh)


def install_shims():
    import numpy as np

    tzf = types.ModuleType("timezonefinder")

    class TimezoneFinder:
        def timezone_at(self, **kw):
            return "Pacific/Auckland"

    tzf.TimezoneFinder = TimezoneFinder
    sys.modules.setdefault("timezonefinder", tzf)

    pytz = types.ModuleType("pytz")
    from zoneinfo import ZoneInfo

    pytz.timezone = lambda name: ZoneInfo(name)
    # pandas probes pytz.__version__ at import; without one its own import
    # fails half-way (which then poisons every later pandas import)
    pytz.__version__ = "2024.1"
    sys.modules.setdefault("pytz", pytz)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from classifier_pipeline_tpu.cptv.codec import CptvReader

    rs = types.ModuleType("cptv_rs_python_bindings")
    rs.CptvReader = CptvReader
    sys.modules.setdefault("cptv_rs_python_bindings", rs)


def make_lepton35_fixture(src, dst):
    """Re-telemeter a clip: model=lepton3.5, pixels shifted to ~28000."""
    import numpy as np

    from classifier_pipeline_tpu.cptv.codec import CptvWriter, load_cptv

    clip = load_cptv(src)
    h = clip.header
    import copy

    h2 = copy.copy(h)
    h2.model = "lepton3.5"
    w = CptvWriter(dst, h2)
    for i in range(clip.n_frames):
        f = clip.frame(i)
        w.write_frame(
            (f.pix.astype(np.int64) + L35_SHIFT).astype(np.uint16),
            time_on_ms=int(f.time_on),
            last_ffc_ms=int(f.last_ffc_time),
            temp_c=float(f.temp_c),
            last_ffc_temp_c=float(f.last_ffc_temp_c),
            is_background=bool(f.background_frame),
        )
    w.close()


def mint(clip_path, workdir, max_tracks=None):
    """Run the reference extract_file over a copy of clip_path; return the
    metadata dict it writes."""
    work = Path(workdir)
    work.mkdir(parents=True, exist_ok=True)
    local = work / Path(clip_path).name
    shutil.copy(clip_path, local)
    sys.path.insert(0, str(REF / "src"))
    try:
        from config.config import Config
        from track.trackextractor import extract_file

        # cv2 5.0 requires (2,1) measurements; the reference was written for
        # cv2 4.x where a flat (2,) array worked. Same numbers either way.
        import numpy as np
        from track import kalman as ref_kalman

        def _correct(self, rect):
            pts = np.array(
                [[np.float32(rect.centroid[0])], [np.float32(rect.centroid[1])]],
                np.float32,
            )
            self.kalman.correct(pts)

        ref_kalman.Kalman.correct = _correct

        # default config is what the reference CI goldens were minted with
        # (possum.txt: background_thresh=20, tracker_version=11 == defaults)
        config = Config.get_defaults()
        if max_tracks is not None:
            config.tracking["thermal"].max_tracks = max_tracks
        extract_file(local, config, cache_to_disk=False)
    finally:
        sys.path.pop(0)
    meta = json.loads(local.with_suffix(".txt").read_text())
    return meta


def main():
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "tests/goldens"
    outdir.mkdir(parents=True, exist_ok=True)
    fixdir = REPO / "tests/fixtures"
    fixdir.mkdir(parents=True, exist_ok=True)
    install_shims()

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        # 1. validation target: possum must reproduce the shipped golden
        meta = mint(REF / "tests/clips/possum.cptv", td)
        (outdir / "possum_minted.txt").write_text(json.dumps(meta, indent=1))

        # 2. hedgehog (no background frame, previously untested goldens)
        meta = mint(REF / "tests/clips/hedgehog.cptv", td)
        (outdir / "hedgehog.txt").write_text(json.dumps(meta, indent=1))

        # 3. lepton3.5 variant (weight_add=1.0 branch)
        l35 = fixdir / "possum_l35.cptv"
        if not l35.exists():
            make_lepton35_fixture(REF / "tests/clips/possum.cptv", l35)
        meta = mint(l35, td)
        (outdir / "possum_l35.txt").write_text(json.dumps(meta, indent=1))

        # 4. no-background x lepton3.5 cross (rolling-background bootstrap
        # under weight_add=1.0)
        hl35 = fixdir / "hedgehog_l35.cptv"
        if not hl35.exists():
            make_lepton35_fixture(REF / "tests/clips/hedgehog.cptv", hl35)
        meta = mint(hl35, td)
        (outdir / "hedgehog_l35.txt").write_text(json.dumps(meta, indent=1))

        # 5. synthetic edge-case corpus (tools/make_synthetic_clips.py):
        # crossing tracks, max_tracks overflow, FFC storms, blank-gap
        # Kalman extrapolation, border-clipped regions
        # many12 is minted WITHOUT max_tracks: the reference creates
        # same-frame tracks by iterating a set() of regions
        # (cliptracker.py:140,207-210), so the order among equal-score
        # tracks — and hence WHICH ties a max_tracks cut drops — is
        # memory-address-dependent and not a stable golden. The overflow
        # behavior itself is asserted structurally in
        # tests/test_tracking_parity.py::test_many12_max_tracks_overflow.
        for name, mt in (
            ("synth_crossing", None),
            ("synth_many12", None),
            ("synth_ffc_storm", None),
            ("synth_blank_gap", None),
            ("synth_edge", None),
            # round-5 additions: merge-then-split matcher handoff, exact
            # same-score simultaneous entries, near-threshold mass flicker,
            # FFC-adjacent trigger, 6-frame sparse track
            ("synth_merge_split", None),
            ("synth_tie_entry", None),
            ("synth_mass_flicker", None),
            ("synth_ffc_trigger", None),
            ("synth_sparse", None),
        ):
            clip = fixdir / f"{name}.cptv"
            if not clip.exists():
                raise SystemExit(
                    f"{clip} missing - run tools/make_synthetic_clips.py first"
                )
            meta = mint(clip, td, max_tracks=mt)
            (outdir / f"{name}.txt").write_text(json.dumps(meta, indent=1))
    print("goldens written to", outdir)


if __name__ == "__main__":
    main()
