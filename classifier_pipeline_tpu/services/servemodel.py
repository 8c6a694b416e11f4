"""Model inference HTTP server (reference src/piclassifier/servemodel.py).

POST /predict with raw float32 tensor bytes -> raw float32 predictions.
GET /ready -> 200 once the model is loaded. stdlib http.server (the
reference uses Flask+waitress with threads=1; inference is serialized here
with a lock for the same effect)."""

from __future__ import annotations

import argparse
import logging
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_handler(interpreter, input_shape):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logging.debug(fmt, *args)

        def do_GET(self):
            if self.path == "/ready":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ready")
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path != "/predict":
                self.send_response(404)
                self.end_headers()
                return
            length = int(self.headers.get("content-length", 0))
            data = self.rfile.read(length)
            batch = np.frombuffer(data, np.float32).reshape(
                (-1,) + tuple(input_shape)
            )
            with lock:
                preds = interpreter.predict(batch)
            out = np.asarray(preds, np.float32).tobytes()
            self.send_response(200)
            self.send_header("content-type", "application/octet-stream")
            self.send_header("content-length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config-file")
    parser.add_argument("-m", "--model-file")
    parser.add_argument("-p", "--port", type=int, default=8123)
    args = parser.parse_args(argv)
    from classifier_pipeline_tpu.classify.interpreter import FlaxInterpreter
    from classifier_pipeline_tpu.config.config import Config
    from classifier_pipeline_tpu.utils.logs import init_logging
    from classifier_pipeline_tpu.utils.tools import enable_compile_cache

    init_logging()

    enable_compile_cache()
    model_file = args.model_file
    if model_file is None:
        config = Config.load_from_file(args.config_file)
        models = [m for m in config.models if not m.run_over_network]
        if not models:
            models = config.models
        model_file = models[0].model_file
    interpreter = FlaxInterpreter(model_file)
    _, shape = interpreter.shape()
    input_shape = shape[1:]
    # warm the jit cache before accepting traffic
    interpreter.predict(np.zeros((1,) + tuple(input_shape), np.float32))
    server = ThreadingHTTPServer(
        ("127.0.0.1", args.port), make_handler(interpreter, input_shape)
    )
    logging.info("serve-model listening on %s", args.port)
    server.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
