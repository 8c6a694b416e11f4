"""Unix-socket classification job daemon (reference src/classifyservice.py).

Accepts JSON jobs {"file": ..., "cache": ..., "calculate_thumbnails": ...}
on a unix socket, classifies, replies with the metadata JSON. One thread per
connection; the interpreter (and its jit cache) is shared.
"""

from __future__ import annotations

import argparse
import json
import logging
import socket
import sys
import threading
from pathlib import Path

SOCKET_NAME = "/etc/cacophony/thermal-classifier"


class ClassifyService:
    def __init__(self, config, socket_path=SOCKET_NAME):
        self.config = config
        self.socket_path = Path(socket_path)
        from classifier_pipeline_tpu.pipeline.clipclassifier import ClipClassifier

        self.classifier = ClipClassifier(config)
        self._lock = threading.Lock()

    def run(self):
        if self.socket_path.exists():
            self.socket_path.unlink()
        self.socket_path.parent.mkdir(parents=True, exist_ok=True)
        server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        server.bind(str(self.socket_path))
        server.listen(5)
        logging.info("ClassifyService listening on %s", self.socket_path)
        while True:
            conn, _ = server.accept()
            threading.Thread(
                target=self.handle, args=(conn,), daemon=True
            ).start()

    def handle(self, conn):
        try:
            data = b""
            conn.settimeout(30)
            while True:
                chunk = conn.recv(4096)
                if not chunk:
                    break
                data += chunk
                try:
                    job = json.loads(data.decode())
                    break
                except json.JSONDecodeError:
                    continue
            if not data:
                return
            job = json.loads(data.decode())
            if job.get("ready"):
                conn.sendall(b'{"ready": true}')
                return
            filename = job["file"]
            logging.info("Classify job: %s", filename)
            with self._lock:
                meta = self.classifier.process_file(filename)
            from classifier_pipeline_tpu.pipeline.extractor import _json_default

            conn.sendall(json.dumps(meta, default=_json_default).encode())
        except Exception as ex:
            logging.exception("classify job failed")
            try:
                conn.sendall(json.dumps({"error": str(ex)}).encode())
            except OSError:
                pass
        finally:
            conn.close()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config-file")
    parser.add_argument("--socket", default=SOCKET_NAME)
    args = parser.parse_args(argv)
    from classifier_pipeline_tpu.config.config import Config
    from classifier_pipeline_tpu.utils.logs import init_logging
    from classifier_pipeline_tpu.utils.tools import enable_compile_cache

    init_logging()

    enable_compile_cache()
    config = Config.load_from_file(args.config_file)
    ClassifyService(config, args.socket).run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
