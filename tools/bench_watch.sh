#!/bin/bash
# Tunnel watcher: probe the TPU every 5 min; when it answers, run bench.py
# (which has its own watchdog + total budget) and exit. Log to bench_watch.log.
cd /root/repo
LOG=/root/repo/bench_watch.log
echo "[$(date +%H:%M:%S)] watcher start" >> "$LOG"
for i in $(seq 1 36); do
  if timeout 75 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
import jax.numpy as jnp
x = jnp.ones((8,8)); (x@x).sum().block_until_ready(); print(float(jnp.asarray((x@x).sum())))" >/dev/null 2>&1; then
    echo "[$(date +%H:%M:%S)] tunnel UP (probe $i) — running bench" >> "$LOG"
    python bench.py > /root/repo/bench_r4.out 2> /root/repo/bench_r4_session.stderr
    echo "[$(date +%H:%M:%S)] bench rc=$? result: $(tail -1 /root/repo/bench_r4.out)" >> "$LOG"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] tunnel down (probe $i)" >> "$LOG"
  sleep 300
done
echo "[$(date +%H:%M:%S)] watcher gave up" >> "$LOG"
