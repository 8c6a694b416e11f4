#!/usr/bin/env python3
"""Debug probe: dump the reference streaming replay's per-frame tracking
intermediates (avg_change, norm stats, threshold, denoised filtered hash,
component masses) for possum, to pinpoint where our streaming scan
diverges. Writes /tmp/ref_probe.npz with stacked arrays."""
import sys
from pathlib import Path

import numpy as np

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

# instrument _get_filtered_frame + detect_objects
from track import cliptracker
from ml_tools import imageprocessing

LOG = []
orig_gff = cliptracker.ClipTracker._get_filtered_frame
orig_det = imageprocessing.detect_objects


def probed_gff(self, clip, thermal, sub_change=True, denoise=True):
    avg_change = int(
        round(np.average(thermal) - self.background_alg.get_average())
    )
    filtered, thresh = orig_gff(self, clip, thermal, sub_change, denoise)
    LOG.append({
        "frame": clip.current_frame,
        "avg_change": avg_change,
        "thresh": float(thresh),
        "thermal": np.array(thermal, np.uint16),
        "bg": np.array(self.background_alg.background, np.float64),
        "filtered": np.array(filtered, np.uint8),
    })
    return filtered, thresh


def probed_det(image, otsus=False, threshold=30, kernel=(15, 15)):
    res = orig_det(image, otsus=otsus, threshold=threshold, kernel=kernel)
    if LOG:
        LOG[-1]["masses"] = np.array(res[2][:, 4], np.int64)  # stats area col
        LOG[-1]["boxes"] = np.array(res[2][:, :4], np.int64)
    return res


cliptracker.ClipTracker._get_filtered_frame = probed_gff
# cliptrackextractor imported detect_objects by name
import track.cliptrackextractor as cte

cte.detect_objects = probed_det

clip_path = str(REF / "tests/clips/possum.cptv")
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
pi.disconnected()

np.savez(
    "/tmp/ref_probe.npz",
    frames=np.array([e["frame"] for e in LOG]),
    avg_change=np.array([e["avg_change"] for e in LOG]),
    thresh=np.array([e["thresh"] for e in LOG]),
    thermal=np.stack([e["thermal"] for e in LOG]),
    bg=np.stack([e["bg"] for e in LOG]),
    filtered=np.stack([e["filtered"] for e in LOG]),
    masses=np.array([e.get("masses", np.zeros(0, np.int64)) for e in LOG],
                    dtype=object),
    allow_pickle=True,
)
print("probe entries:", len(LOG))
