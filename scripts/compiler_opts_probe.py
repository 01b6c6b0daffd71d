"""Can TPU DebugOptions reach the relay via jit(compiler_options=...) even
though the local client rejects them in XLA_FLAGS? Time the per-step FAR
train step with and without a scoped-vmem override."""
import time
import jax
import numpy as np
from vptr_tpu.config import get_preset
from vptr_tpu.train.trainer import Trainer

cfg = get_preset("far_mnist").override({"steps_per_dispatch": 1})
tr = Trainer(cfg, write_outputs=False)
state = tr.init_state()
rng = np.random.default_rng(0)
past = rng.random((10, 10, 64, 64, 1)).astype(np.float32)
future = rng.random((10, 10, 64, 64, 1)).astype(np.float32)
batch = tr.put_batch(past, future)
k = 10

def bench(step, state):
    state, m = step(state, *batch); float(m["T_total"])
    t0 = time.perf_counter()
    for _ in range(k):
        state, m = step(state, *batch)
    float(m["T_total"])
    return state, (time.perf_counter() - t0) / k * 1000

state, ms = bench(tr.train_step, state)
print(f"default: {ms:.1f} ms/step", flush=True)

for name, opts in [
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
]:
    try:
        step = jax.jit(tr.raw_train_step, donate_argnums=(0,),
                       compiler_options=opts)
        def in_mesh(*a, _s=step):
            with tr.mesh:
                return _s(*a)
        state, ms = bench(in_mesh, state)
        print(f"{name}: {ms:.1f} ms/step", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
