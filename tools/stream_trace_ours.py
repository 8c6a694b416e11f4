#!/usr/bin/env python3
"""Debug: per-frame motion/recording trace of OUR streaming replay, same
format as stream_trace_ref.py."""
import sys
import tempfile
import time
from datetime import timedelta
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from classifier_pipeline_tpu.config.config import Config
from classifier_pipeline_tpu.config.thermalconfig import ThermalConfig
from classifier_pipeline_tpu.cptv import load_cptv
from classifier_pipeline_tpu.pipeline.cameras import CameraFrame, HeaderInfo
from classifier_pipeline_tpu.pipeline.piclassifier import PiClassifier
from classifier_pipeline_tpu.pipeline.recorders import DummyRecorder

clip_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/clips/possum.cptv"
clip = load_cptv(clip_path)
h = clip.header
headers = HeaderInfo(
    res_x=h.x_resolution, res_y=h.y_resolution, fps=9,
    model=h.model or None, brand=h.brand or None,
    frame_size=h.x_resolution * h.y_resolution * 2 + 640, pixel_bits=16,
)
thermal_config = ThermalConfig.load_from_file(
    "/root/reference/tests/config.toml", headers.model
)
td = tempfile.mkdtemp()
thermal_config.recorder.output_dir = str(Path(td) / "cptv")
recorder = DummyRecorder(thermal_config, headers)
pi = PiClassifier(Config({}), thermal_config, headers, classify=False,
                  detect_after=0, recorder=recorder)

i = 0
for f in clip.frames():
    if f.background_frame:
        pi.motion_detector.seed_background(np.asarray(f.pix))
        continue
    cf = CameraFrame(
        pix=np.asarray(f.pix),
        time_on=timedelta(milliseconds=int(f.time_on)),
        last_ffc_time=timedelta(milliseconds=int(f.last_ffc_time)),
        temp_c=f.temp_c,
        last_ffc_temp_c=f.last_ffc_temp_c,
    )
    pi.process_frame(cf, time.time())
    md = pi.motion_detector
    rec = pi.recorder
    print(
        f"{i},{int(md.ffc_affected)},{int(md.movement_detected)},"
        f"{int(rec.recording)},{getattr(rec, 'frames', -1)},"
        f"{md.temp_thresh},"
        f"{__import__('hashlib').md5(np.ascontiguousarray(md.background)).hexdigest()[:8]},"
        f"{md.background.dtype}"
    )
    i += 1
pi.disconnected()
