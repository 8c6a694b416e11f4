import os, time, glob, json
import numpy as np
from pathlib import Path
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from classifier_pipeline_tpu.pipeline.extractor import ClipTrackExtractor
ex = ClipTrackExtractor()
paths = ["/root/reference/tests/clips/possum.cptv"]*16
ex.extract_batch(paths)  # warm
with jax.profiler.trace("/tmp/jaxtrace"):
    t0 = time.time()
    ex.extract_batch(paths)
    print(f"traced run {time.time()-t0:.2f}s", flush=True)
