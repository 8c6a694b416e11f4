#!/usr/bin/env python3
"""Debug: per-frame motion/recording trace of the REFERENCE streaming
replay (possum), for diffing against our replay. Prints
frame_idx,ffc,movement,recording,rec_frames per frame."""
import sys
import numpy as np
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import pandas  # noqa: F401
import sklearn  # noqa: F401

from mint_goldens import REF, install_shims
from mint_streaming_golden import install_pi_shims, patch_ref_kalman

install_shims()
install_pi_shims()
sys.path.insert(0, str(REF / "src"))

import tempfile
import time
from datetime import timedelta

from config.config import Config
from config.thermalconfig import ThermalConfig
from config.timewindow import RelAbsTime, TimeWindow
from piclassifier.headerinfo import HeaderInfo
from piclassifier.piclassifier import PiClassifier

from classifier_pipeline_tpu.cptv.codec import CptvReader

patch_ref_kalman()

clip_path = sys.argv[1] if len(sys.argv) > 1 else str(REF / "tests/clips/possum.cptv")
td = tempfile.mkdtemp()
work = Path(td)
(work / "cptv").mkdir(parents=True, exist_ok=True)

reader = CptvReader(clip_path)
header = reader.get_header()
headers = HeaderInfo(
    res_x=header.x_resolution, res_y=header.y_resolution, fps=9,
    brand=header.brand or None, model=header.model or None,
    frame_size=header.x_resolution * header.y_resolution * 2 + 640,
    pixel_bits=16, serial="", firmware="",
)
config = Config.load_from_file(str(REF / "tests/test-config.yaml"))
thermal_config = ThermalConfig.load_from_file(
    str(REF / "tests/config.toml"), headers.model
)
thermal_config.recorder.output_dir = work / "cptv"
thermal_config.recorder.rec_window = TimeWindow(
    RelAbsTime(""), RelAbsTime(""), None, None, 0
)
pi = PiClassifier(config, thermal_config, headers, False, 0, None, None)

from cptv import Frame

i = 0
while True:
    frame = reader.next_frame()
    if frame is None:
        break
    f = Frame(
        frame.pix,
        timedelta(milliseconds=frame.time_on),
        timedelta(milliseconds=frame.last_ffc_time),
        frame.temp_c,
        frame.last_ffc_temp_c,
        frame.background_frame,
    )
    if f.background_frame:
        pi.motion_detector._background._background = f.pix
        continue
    pi.process_frame(f, time.time())
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
