"""TPU probe v2: chain kernel iterations on-device so tunnel latency amortizes."""
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
            # xor-mix the iteration index in so XLA can't CSE the loop body
            return kern(jnp.bitwise_and(y + i, 255))
        return jax.lax.fori_loop(0, N, body, x)
    return jax.jit(f)

import functools
old = chain(pn.nl_means_denoise_u8_pallas_packed_sym)
new = chain(functools.partial(pn.nl_means_denoise_u8_pallas_packed_sym,
                              unroll=True))

def run(f, name):
    t0 = time.time()
    np.asarray(f(imgs))
    print(f"{name}: first (compile+run) {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(imgs))
        best = min(best, time.time() - t0)
    per = best / N / B * 1e3
    print(f"{name}: best {best*1000:.1f} ms for {N}x{B} imgs -> {per:.3f} ms/img", flush=True)

for _ in range(2):
    run(old, "sym_fori")
    run(new, "sym_unroll")
