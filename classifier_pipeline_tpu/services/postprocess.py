"""Postprocess watcher (reference src/piclassifier/postprocess.py).

Watches the recorder's postprocess spool directory and re-classifies
finished recordings with the full model. The reference uses the watchdog
package + pauses during live recording via a dbus signal; we poll with
os.scandir (no dependency) and expose the same pause hook.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

POLL_SECS = 2.0


class DirWatcher:
    def __init__(self, watch_dir, classifier, move_to=None):
        self.watch_dir = Path(watch_dir)
        self.classifier = classifier
        self.move_to = Path(move_to) if move_to else self.watch_dir.parent
        self.paused = False
        self._seen = {}

    def pause(self):
        self.paused = True

    def resume(self):
        self.paused = False

    def scan_once(self):
        if self.paused or not self.watch_dir.exists():
            return 0
        processed = 0
        for f in sorted(self.watch_dir.glob("*.cptv")):
            # wait until the file stops growing (recording finished + renamed
            # out of temp/)
            size = f.stat().st_size
            prev = self._seen.get(f)
            self._seen[f] = size
            if prev != size:
                continue
            try:
                logging.info("Postprocessing %s", f)
                meta = self.classifier.process_file(f)
                out_meta = f.with_suffix(".txt")
                self.classifier.save_metadata(meta, out_meta)
                dest = self.move_to / f.name
                f.rename(dest)
                meta_dest = self.move_to / out_meta.name
                if out_meta.exists():
                    out_meta.rename(meta_dest)
                processed += 1
            except Exception:
                logging.exception("postprocess failed for %s", f)
            finally:
                self._seen.pop(f, None)
        return processed

    def run(self):
        logging.info("Watching %s", self.watch_dir)
        while True:
            self.scan_once()
            time.sleep(POLL_SECS)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config-file")
    parser.add_argument("--watch-dir", default="/var/spool/cptv/postprocess")
    args = parser.parse_args(argv)
    from classifier_pipeline_tpu.config.config import Config
    from classifier_pipeline_tpu.pipeline.clipclassifier import ClipClassifier
    from classifier_pipeline_tpu.utils.logs import init_logging
    from classifier_pipeline_tpu.utils.tools import enable_compile_cache

    init_logging()

    enable_compile_cache()
    config = Config.load_from_file(args.config_file)
    watcher = DirWatcher(args.watch_dir, ClipClassifier(config))
    watcher.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
