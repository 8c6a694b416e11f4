"""TPU probe: scheduling knobs of the unrolled symmetric NL-means kernel.

A/Bs the round-robin partial-accumulator count (_N_PARTIAL) in the
production fully-unrolled kernel. Accumulation is int32 end-to-end, so any
partial count is bit-identical — only the dependence-graph shape changes.

TRAP (first version of this probe hit it): jax.jit traces at first CALL,
not at wrapper creation — the compile call must run while the module
global is set, or every "variant" silently compiles the default program
(the giveaway: the second variant's "compile" is a .jax_cache hit in
seconds). Compiles happen inside the per-variant loop here; timed rounds
afterwards are retrace-free C++ fast-path calls, so the reset global is
irrelevant to them.

Run under `timeout N python tools/nlm_sched_probe.py || retry` (tunnel
flaps wedge silently); each variant is a fresh Mosaic program (cold compile
~5-8 min first time, then cached in .jax_cache).
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from classifier_pipeline_tpu.ops import pallas_nlmeans as pn

B, H, W, N = 32, 120, 160, 50
rng = np.random.default_rng(0)
imgs = jnp.asarray(np.clip(rng.normal(90, 50, (B, H, W)), 0, 255).astype(np.int32))


def chain(kern):
    def f(x):
        def body(i, y):
            return kern(jnp.bitwise_and(y + i, 255))
        return jax.lax.fori_loop(0, N, body, x)
    return jax.jit(f)


variants = [int(v) for v in (sys.argv[1:] or [8, 16])]
fns, refs = {}, {}
for npart in variants:
    pn._N_PARTIAL = npart
    fns[npart] = chain(functools.partial(
        pn.nl_means_denoise_u8_pallas_packed_sym, unroll=True))
    t0 = time.time()
    refs[npart] = np.asarray(fns[npart](imgs))  # traces + compiles NOW
    print(f"npart{npart}: compile+run {time.time()-t0:.1f}s", flush=True)
pn._N_PARTIAL = 8

base = refs[variants[0]]
for npart in variants[1:]:
    assert np.array_equal(base, refs[npart]), f"npart={npart} output differs!"
print("all variants bit-identical", flush=True)

best = {npart: 1e9 for npart in variants}
for rnd in range(4):
    for npart in variants:  # interleaved rounds: tunnel/device phase fair
        t0 = time.time()
        np.asarray(fns[npart](imgs))
        dt = time.time() - t0
        best[npart] = min(best[npart], dt)
        print(f"r{rnd} npart{npart}: {dt*1000:.1f} ms "
              f"-> {dt/N/B*1e3:.3f} ms/img", flush=True)
for npart in variants:
    print(f"BEST npart{npart}: {best[npart]/N/B*1e3:.3f} ms/img", flush=True)
