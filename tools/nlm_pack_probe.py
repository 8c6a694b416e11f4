#!/usr/bin/env python3
"""A/B the NL-means lane-packing width (VERDICT r04 item 4 follow-up).

The fully-unrolled symmetric kernel only fits nimg=2 in VMEM; the
fori-loop kernel runs at 64M scoped and could pack 3-4 images per program,
sharing lane tiles better: lanes(nimg)=ceil(((nimg-1)*Wpad+W+hs+2ts)/128)
per work row vs nimg*2 unpacked. This probe chains iterations on-device
(one fetch) and compares ms/img for prod(unroll,nimg=2) vs fori nimg=2/3/4.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from classifier_pipeline_tpu.ops import pallas_nlmeans as pn

B, H, W, N = 24, 120, 160, 50
rng = np.random.default_rng(0)
imgs = jnp.asarray(np.clip(rng.normal(90, 50, (B, H, W)), 0, 255).astype(np.int32))


def packed_sym_n(img_batch, nimg, unroll=False):
    """Generic lane-packing: nimg images side-by-side per program."""
    Bn, H, W = img_batch.shape
    ts = pn.TEMPLATE // 2
    p = pn.SEARCH // 2 + ts
    pad_n = (-Bn) % nimg
    if pad_n:
        img_batch = jnp.concatenate(
            [img_batch] + [img_batch[-1:]] * pad_n, axis=0)
    Bp = img_batch.shape[0]
    x = img_batch.astype(jnp.float32)
    xpad = jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="reflect")
    seg = W + 2 * p
    packed = xpad.reshape(Bp // nimg, nimg, H + 2 * p, seg)
    packed = jnp.concatenate([packed[:, i] for i in range(nimg)], axis=-1)
    out = pn._sym_call(packed, nimg, H, W, pn.TEMPLATE, pn.SEARCH,
                       unroll=unroll)
    return out.reshape(Bp, H, W)[:Bn]


def chain(kern):
    def f(x):
        def body(i, y):
            return kern(jnp.bitwise_and(y + i, 255))
        return jax.lax.fori_loop(0, N, body, x)
    return jax.jit(f)


def run(f, name):
    t0 = time.time()
    np.asarray(f(imgs))
    print(f"{name}: first (compile+run) {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(imgs))
        best = min(best, time.time() - t0)
    print(f"{name}: best {best*1000:.1f} ms -> {best/N/B*1e3:.3f} ms/img",
          flush=True)


variants = [
    ("unroll_n2 (prod)", chain(functools.partial(packed_sym_n, nimg=2,
                                                 unroll=True))),
    ("fori_n2", chain(functools.partial(packed_sym_n, nimg=2))),
    ("fori_n3", chain(functools.partial(packed_sym_n, nimg=3))),
    ("fori_n4", chain(functools.partial(packed_sym_n, nimg=4))),
]
for name, f in variants:
    try:
        run(f, name)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
