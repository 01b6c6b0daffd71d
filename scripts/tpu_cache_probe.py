"""Probe: does jax's persistent compilation cache work through the
remote-compile relay?  If the second *process* invocation compiles in
seconds instead of minutes, chunked multi-process quality runs (the
mitigation for the relay client's host-RSS growth on multi-hour runs)
pay compile only once.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_cache_probe.py

Run twice; compare "compile+first-step" wall time.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp


@jax.jit
def f(x, w):
    # enough matmul layers to take >1s to compile but not minutes
    for _ in range(16):
        x = jnp.tanh(x @ w)
    return x.sum()


t0 = time.time()
x = jnp.ones((256, 512), jnp.bfloat16)
w = jnp.ones((512, 512), jnp.bfloat16)
v = float(f(x, w))
print(f"devices={jax.devices()}")
print(f"compile+first-step: {time.time()-t0:.1f}s  value={v:.3f}")
print("cache dir entries:", len(list(Path("/tmp/jaxcache").glob("*"))))
