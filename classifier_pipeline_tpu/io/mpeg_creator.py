"""MP4 encoding via an ffmpeg subprocess pipe (reference
src/ml_tools/mpeg_creator.py). Falls back to animated GIF via PIL when
ffmpeg is unavailable (headless/dev environments)."""

from __future__ import annotations

import logging
import shutil
import subprocess
from pathlib import Path


class MPEGCreator:
    def __init__(self, filename, fps=9, quality=21):
        self.filename = Path(filename)
        self.fps = fps
        self.quality = quality
        self._proc = None
        self._frames = []  # GIF fallback buffer
        self._ffmpeg = shutil.which("ffmpeg")

    def _start(self, width, height):
        cmd = [
            self._ffmpeg, "-y", "-f", "rawvideo", "-vcodec", "rawvideo",
            "-s", f"{width}x{height}", "-pix_fmt", "rgb24",
            "-r", str(self.fps), "-i", "-", "-an", "-vcodec", "libx264",
            "-crf", str(self.quality), "-pix_fmt", "yuv420p",
            str(self.filename),
        ]
        self._proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )

    def next_frame(self, rgb):
        """rgb: (H, W, 3) uint8."""
        if self._ffmpeg:
            if self._proc is None:
                self._start(rgb.shape[1], rgb.shape[0])
            self._proc.stdin.write(rgb.tobytes())
        else:
            from PIL import Image

            self._frames.append(Image.fromarray(rgb))

    def close(self):
        if self._proc is not None:
            self._proc.stdin.close()
            self._proc.wait()
            self._proc = None
        elif self._frames:
            out = self.filename.with_suffix(".gif")
            self._frames[0].save(
                out, save_all=True, append_images=self._frames[1:],
                duration=int(1000 / self.fps), loop=0,
            )
            logging.info("no ffmpeg; wrote GIF preview %s", out)
            self._frames = []
