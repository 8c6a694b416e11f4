"""modelevaluate CLI: metadata confusion, directory re-evaluation, and the
model-score formula (reference src/modelevaluate.py:67-125, 270-430,
592-847)."""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest

CLIPS = Path("/root/reference/tests/clips")


def _sidecar(tracks):
    return {"tracks": tracks}


def test_model_score_weighting():
    from classifier_pipeline_tpu.cli.modelevaluate import model_score

    labels = ["bird", "possum", "false-positive", "None"]
    cm = np.zeros((4, 4), np.int64)
    cm[0, 0] = 10  # all birds right
    cm[1, 1] = 8
    cm[1, 2] = 2  # possum sometimes called fp
    cm[2, 2] = 5
    score_good = model_score(cm, labels)
    cm_bad = cm.copy()
    cm_bad[0, 0] = 2
    cm_bad[0, 1] = 8  # birds confused with possum (penalized harder)
    assert model_score(cm_bad, labels) < score_good


def test_metadata_confusion(tmp_path):
    from classifier_pipeline_tpu.cli.modelevaluate import metadata_confusion

    meta = _sidecar(
        [
            {
                "tags": [
                    {"what": "possum", "automatic": False},
                    {"what": "cat", "automatic": True, "model": {"name": "Master"}},
                ]
            },
            {
                "tags": [
                    {"what": "rat", "automatic": False},
                    {"what": "rodent", "automatic": True, "model": {"name": "Master"}},
                ]
            },
            {"tags": [{"what": "bird", "automatic": False}]},  # no AI tag
        ]
    )
    (tmp_path / "a.txt").write_text(json.dumps(meta))
    cm, acc, labels = metadata_confusion(tmp_path)
    assert "rodent" in labels and "None" in labels
    # rat remapped to rodent and matched; possum mis-called cat; bird -> None
    li = {l: i for i, l in enumerate(labels)}
    assert cm[li["rodent"], li["rodent"]] == 1
    assert cm[li["possum"], li["cat"]] == 1
    assert cm[li["bird"], li["None"]] == 1
    assert acc == pytest.approx(1 / 3)


def test_evaluate_dir_end_to_end(tmp_path, tmp_path_factory):
    from classifier_pipeline_tpu.cli.modelevaluate import evaluate_dir
    from classifier_pipeline_tpu.models.artifacts import create_model

    shutil.copy(CLIPS / "possum.cptv", tmp_path / "possum.cptv")
    meta = json.loads((CLIPS / "possum.txt").read_text())
    for t in meta["tracks"]:
        t["tags"] = [{"what": "possum", "automatic": False}]
    (tmp_path / "possum.txt").write_text(json.dumps(meta))

    prefix = tmp_path_factory.mktemp("model") / "m"
    create_model(prefix, model_name="simple-cnn")
    cm, acc, labels = evaluate_dir(str(prefix) + ".json", tmp_path, threshold=0.0)
    assert "possum" in labels
    assert cm.sum() == 2  # two human-tagged tracks evaluated
