"""Worker for tests/test_parallel.py::test_two_process_distributed — NOT a
test module (no ``test_`` prefix; pytest does not collect it).

Spawned twice with ``python _mp_worker.py <pid> <port> <out_dir>``: joins a
2-process jax.distributed CPU cluster (4 fake devices per process, 8 global),
builds the regular Trainer on a data=8 mesh, and runs one FAR train step on a
host-sharded batch. Covers what the single-process fake cluster cannot
(parity target: the reference's DDP drivers, train_FAR_mp.py:200-204,320-326):

* global-batch assembly through ``jax.make_array_from_process_local_data``
  (trainer.py ``_stage`` under ``process_count() > 1``),
* the ragged-batch-under-multi-host ValueError,
* host-0-only observability (logger / TB writer gating),
* multi-host EVALUATION: ``eval_step`` loss metrics and ``evaluate()``
  per-timestep curves on a host-sharded val batch (global means, identical
  on every host and to the single-process run), and ``_local_rows`` — the
  GIF-sample fetch of this host's rows from a batch-sharded global array
  that is not fully addressable from one process.

Prints one ``RESULT {json}`` line the parent asserts on.
"""

import json
import os
import sys


def main():
    pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import jax

    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np

    from vptr_tpu.config import get_preset
    from vptr_tpu.parallel.mesh import make_mesh
    from vptr_tpu.train.trainer import Trainer

    cfg = get_preset("far_mnist").override({
        "dtype": "float32",
        "ckpt_dir": os.path.join(out_dir, "run"),
        "ae": {"feat_dim": 24, "n_res_blocks": 1},
        "transformer": {"d_model": 24, "n_heads": 4,
                        "num_encoder_layers": 2,
                        "num_past_frames": 2, "num_future_frames": 2,
                        "dropout": 0.0, "drop_path": 0.0},
        "data": {"batch_size": 8, "img_size": 32,
                 "num_past_frames": 2, "num_future_frames": 2},
    })
    tr = Trainer(cfg, mesh=make_mesh(data=8, model=1), write_outputs=True)

    # host-0-only observability (reference: train_FAR_mp.py rank==0 gates)
    host0_outputs = tr.write_outputs and tr.writer is not None

    # deterministic init: set_seed(cfg.seed) is process-independent
    state = tr.init_state()

    # the parent wrote the GLOBAL batch; this host stages rows
    # [pid*4, (pid+1)*4) — mesh device order is process-major, so
    # make_array_from_process_local_data assembles them in global row order
    data = np.load(os.path.join(out_dir, "batch.npz"))
    lo, hi = pid * 4, (pid + 1) * 4
    b = tr.put_batch(data["past"][lo:hi], data["future"][lo:hi])
    state, metrics = tr.train_step(state, *b)
    metrics = {k: float(v) for k, v in metrics.items()}

    # ragged batch under multi-host must raise (replication is ill-defined
    # when per-host shards differ)
    try:
        tr.put_batch(data["past"][:3], data["future"][:3])
        ragged_raised = False
    except ValueError:
        ragged_raised = True

    # ---- multi-host evaluation (the val path trainer.train() runs) ----
    # eval_step: loss metrics are global-batch means (replicated) — every
    # host must see the values of the SINGLE global batch, not its half
    vb = tr.put_batch(data["vpast"][lo:hi], data["vfuture"][lo:hi])
    emetrics, pred = tr.eval_step(state, *vb)
    emetrics = {k: float(v) for k, v in emetrics.items()}
    # the GIF-sample fetch: a cross-process global jax.Array is not fully
    # addressable from one host; _local_rows must return exactly this
    # host's rows of the global prediction
    local = tr._local_rows(pred)
    local_row_means = [float(np.mean(r)) for r in np.asarray(local)]

    # evaluate(): per-timestep metric curves with a host-sharded loader
    # (each host's loader yields ITS rows; put_batch assembles the global
    # batch) — curves are global means, identical on every host
    from vptr_tpu.eval.harness import evaluate

    curves = evaluate(tr, state, [(data["vpast"][lo:hi],
                                   data["vfuture"][lo:hi])],
                      mode="far", num_pred=2)
    curves = {m: [float(v) for v in c] for m, c in curves.items()}

    print("RESULT " + json.dumps({
        "pid": pid,
        "metrics": metrics,
        "ragged_raised": ragged_raised,
        "host0_outputs": host0_outputs,
        "eval_metrics": emetrics,
        "local_rows_shape": list(np.asarray(local).shape),
        "local_row_means": local_row_means,
        "curves": curves,
    }), flush=True)


if __name__ == "__main__":
    main()
