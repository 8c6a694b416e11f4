"""Export path: TFLite conversion executed with the in-env tensorflow as
oracle, plus orbax round-trip (reference src/tfliteconverter.py:20-93 is
the counterpart — it converts released keras models for the Pi; ours
converts the Flax model via jax2tf through cli/export.py).
"""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_prefix(tmp_path_factory):
    from classifier_pipeline_tpu.models.artifacts import create_model

    prefix = tmp_path_factory.mktemp("export_model") / "m"
    create_model(prefix, model_name="simple-cnn")
    return prefix


@pytest.mark.oracle
def test_tflite_export_predictions_match(model_prefix, tmp_path):
    """cli/export.py -c: the converted flatbuffer, run by tf.lite's own
    interpreter, predicts what the Flax model predicts. Tolerance covers
    the converter's default fp16 weight quantization."""
    tf = pytest.importorskip("tensorflow")
    from classifier_pipeline_tpu.classify.interpreter import FlaxInterpreter
    from classifier_pipeline_tpu.cli.export import main

    tfl_path = tmp_path / "model.tflite"
    rc = main(["-m", str(model_prefix) + ".json", "-c", str(tfl_path)])
    assert rc == 0 and tfl_path.exists() and tfl_path.stat().st_size > 0

    interp = FlaxInterpreter(Path(str(model_prefix) + ".json"))
    _, shape = interp.shape()
    x = np.random.default_rng(1).uniform(
        0, 255, (1,) + tuple(shape[1:])
    ).astype(np.float32)
    want = np.asarray(interp.predict(x), np.float32)

    lite = tf.lite.Interpreter(model_path=str(tfl_path))
    lite.allocate_tensors()
    inp = lite.get_input_details()[0]
    out = lite.get_output_details()[0]
    lite.set_tensor(inp["index"], x)
    lite.invoke()
    got = lite.get_tensor(out["index"])
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)


def test_orbax_export_roundtrip(model_prefix, tmp_path):
    """cli/export.py -e: the checkpoint restores to the exact variables."""
    import jax
    import orbax.checkpoint as ocp

    from classifier_pipeline_tpu.classify.interpreter import FlaxInterpreter
    from classifier_pipeline_tpu.cli.export import main

    out_dir = tmp_path / "ckpt"
    rc = main(["-m", str(model_prefix) + ".json", "-e", str(out_dir)])
    assert rc == 0

    interp = FlaxInterpreter(Path(str(model_prefix) + ".json"))
    restored = ocp.StandardCheckpointer().restore(
        (out_dir / "checkpoint").absolute(), interp.variables
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(interp.variables),
        jax.tree_util.tree_leaves_with_path(restored),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_test_smoke(model_prefix, capsys):
    from classifier_pipeline_tpu.cli.export import main

    rc = main(["-m", str(model_prefix) + ".json", "-r"])
    assert rc == 0
    assert "predict ok" in capsys.readouterr().out
