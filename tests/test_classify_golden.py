"""End-to-end classification golden vs the reference pipeline.

tools/mint_classify_golden.py runs the REFERENCE's KerasModel classify path
(reference src/ml_tools/interpreter.py:132-168 + kerasmodel.py predict,
trackprediction.py:127-194 accumulation) over possum's tracks with a
committed, reference-built .keras fixture and seed 42, and records segment
frames, raw per-segment outputs, masses, and the accumulated scores.

Here OUR pipeline — FlaxInterpreter with weights imported from the very
same .keras (models/keras_import.py), the fused device preprocess+forward
(classify/interpreter.py), and our TrackPrediction — classifies the same
clip with the same seed. Asserted:
  * sampled segment frames and masses: EXACT (same RNG call sequence);
  * raw per-segment sigmoid outputs: atol 5e-4 (cv2-resize vs
    separable-matmul preprocessing rounding + f32 conv stacks — the tile
    oracle bound is 8e-3 on a 0..255 scale, which the normalized sigmoid
    outputs compress well below);
  * accumulated class_best_score / max_score / clarity: atol 5e-4,
    predicted tag equal.

No tensorflow at test time — the fixture and golden are committed; this
runs in the fast suite and pins the whole classifier half end-to-end.
"""

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"
GOLDENS = Path(__file__).parent / "goldens"

RAW_ATOL = 5e-4


@pytest.fixture(scope="module")
def golden():
    return json.loads((GOLDENS / "possum_classify.json").read_text())


@pytest.fixture(scope="module")
def our_predictions(possum_cptv, golden):
    from classifier_pipeline_tpu.classify.interpreter import (
        ClipContext,
        FlaxInterpreter,
    )
    from classifier_pipeline_tpu.pipeline.extractor import ClipTrackExtractor

    interp = FlaxInterpreter(FIXTURES / "classify_model.keras")
    interp.seed = golden["seed"]
    extractor = ClipTrackExtractor(keep_rows=True, emit_filtered=True)
    result = extractor.extract(possum_cptv)
    clip = result.clip
    mask = ~clip.is_background
    ffc = list(np.nonzero(
        (clip.time_on_ms[mask].astype(np.int64)
         - clip.last_ffc_ms[mask].astype(np.int64)) < 9
    )[0])  # ClipClassifier._ffc_frames (int-ms FFC branch)
    ctx = ClipContext(clip.foreground_pixels, result.rows.filtered, ffc)
    preds = {}
    for track in result.tracks:
        tp = interp.classify_track(ctx, track, min_segments=1)
        assert tp is not None
        preds[track.track_id] = tp
    return interp, preds


def test_labels_match(golden, our_predictions):
    interp, _ = our_predictions
    assert interp.labels == golden["labels"]


def test_per_track_predictions_match_reference(golden, our_predictions):
    _, preds = our_predictions
    assert len(preds) == len(golden["tracks"])
    for gt in golden["tracks"]:
        tp = preds[gt["track_id"]]
        # segment sampling: exact same frames in the same order
        got_frames = [[int(f) for f in p.frames] for p in tp.predictions]
        assert got_frames == gt["prediction_frames"], (
            f"track {gt['track_id']}: segment sampling diverged"
        )
        got_masses = [float(p.mass) for p in tp.predictions]
        np.testing.assert_allclose(got_masses, gt["masses"], rtol=0, atol=0)
        # raw model outputs per segment
        got_raw = np.array([np.asarray(p.prediction, np.float64)
                            for p in tp.predictions])
        np.testing.assert_allclose(
            got_raw, np.array(gt["raw_predictions"]), rtol=0, atol=RAW_ATOL,
            err_msg=f"track {gt['track_id']}: raw segment outputs",
        )


def test_accumulated_scores_match_reference(golden, our_predictions):
    _, preds = our_predictions
    for gt in golden["tracks"]:
        tp = preds[gt["track_id"]]
        assert tp.predicted_tag() == gt["predicted_tag"]
        np.testing.assert_allclose(
            np.asarray(tp.class_best_score, np.float64),
            np.array(gt["class_best_score"]), rtol=0, atol=RAW_ATOL,
        )
        assert abs(tp.max_score - gt["max_score"]) < RAW_ATOL
        assert abs(tp.clarity - gt["clarity"]) < RAW_ATOL
