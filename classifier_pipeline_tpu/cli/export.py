"""Model export for deployment (reference src/tfliteconverter.py).

The reference converts Keras models to TFLite for the Pi. Our deployment
targets are:
  * the native artifact pair (.json + .msgpack) — served by serve-model /
    the classify service on any JAX host;
  * an Orbax checkpoint directory (fleet training infra);
  * optionally a TFLite flatbuffer via jax2tf when tensorflow is installed
    (edge devices without JAX).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path


def export_orbax(interpreter, out_dir):
    import orbax.checkpoint as ocp

    out_dir = Path(out_dir).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out_dir / "checkpoint", interpreter.variables)
    ckptr.wait_until_finished()
    logging.info("wrote orbax checkpoint to %s", out_dir)


def export_tflite(interpreter, out_path):
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as exc:
        raise SystemExit(f"tflite export needs tensorflow: {exc}")
    _, shape = interpreter.shape()
    input_shape = (1,) + tuple(shape[1:])
    fn = jax2tf.convert(
        lambda x: interpreter.model.apply(interpreter.variables, x, train=False),
        enable_xla=False,
    )
    tf_fn = tf.function(
        fn, input_signature=[tf.TensorSpec(input_shape, tf.float32)],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()]
    )
    converter.optimizations = [tf.lite.Optimize.DEFAULT]
    converter.target_spec.supported_types = [tf.float16]
    tflite_model = converter.convert()
    Path(out_path).write_bytes(tflite_model)
    logging.info("wrote tflite model to %s (%d bytes)", out_path, len(tflite_model))


def run_test(interpreter):
    import numpy as np

    _, shape = interpreter.shape()
    batch = np.random.default_rng(0).uniform(
        0, 255, (2,) + tuple(shape[1:])
    ).astype(np.float32)
    out = interpreter.predict(batch)
    print("predict ok:", out.shape, "labels:", interpreter.labels[:5], "...")


def main(argv=None):
    parser = argparse.ArgumentParser(description="export a trained model")
    parser.add_argument("-m", "--model-file", required=True)
    parser.add_argument("-e", "--export-orbax", metavar="DIR")
    parser.add_argument("-c", "--convert-tflite", metavar="FILE")
    parser.add_argument("-r", "--run-test", action="store_true")
    args = parser.parse_args(argv)
    from classifier_pipeline_tpu.classify.interpreter import FlaxInterpreter
    from classifier_pipeline_tpu.utils.logs import init_logging
    from classifier_pipeline_tpu.utils.tools import enable_compile_cache

    init_logging()

    enable_compile_cache()
    interpreter = FlaxInterpreter(args.model_file)
    if args.export_orbax:
        export_orbax(interpreter, args.export_orbax)
    if args.convert_tflite:
        export_tflite(interpreter, args.convert_tflite)
    if args.run_test:
        run_test(interpreter)
    return 0


if __name__ == "__main__":
    sys.exit(main())
