"""Multi-device semantics on the 8-device CPU fake cluster:

* data-parallel train step == single-device train step (DDP parity,
  reference: train_FAR_mp.py semantics);
* tensor-parallel sharded params produce the same forward as replicated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.slow

from vptr_tpu.config import get_preset
from vptr_tpu.parallel.mesh import make_mesh, state_sharding, tp_param_specs
from vptr_tpu.train.trainer import Trainer

TINY = {
    "dtype": "float32",
    "ae": {"feat_dim": 24, "n_res_blocks": 1},
    "transformer": {"d_model": 24, "n_heads": 4, "num_encoder_layers": 2,
                    "num_past_frames": 2, "num_future_frames": 2,
                    "dropout": 0.0, "drop_path": 0.0},
    "data": {"batch_size": 8, "img_size": 32,
             "num_past_frames": 2, "num_future_frames": 2},
}


def _batch(rng):
    past = rng.random((8, 2, 32, 32, 1)).astype(np.float32)
    future = rng.random((8, 2, 32, 32, 1)).astype(np.float32)
    return past, future


def test_dp_matches_single_device():
    cfg = get_preset("far_mnist").override(TINY)
    past, future = _batch(np.random.default_rng(0))

    # 8-way data parallel
    tr_dp = Trainer(cfg, mesh=make_mesh(data=8, model=1),
                    write_outputs=False)
    s_dp = tr_dp.init_state()
    s_dp, m_dp = tr_dp.train_step(s_dp, *tr_dp.put_batch(past, future))

    # single device
    tr_1 = Trainer(cfg, mesh=make_mesh(data=1, model=1,
                                       devices=jax.devices()[:1]),
                   write_outputs=False)
    s_1 = tr_1.init_state()
    s_1, m_1 = tr_1.train_step(s_1, *tr_1.put_batch(past, future))

    for k in m_1:
        np.testing.assert_allclose(float(m_dp[k]), float(m_1[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)
    # parameters after the step match too (global-batch equivalence)
    p_dp = jax.tree_util.tree_leaves(s_dp.transformer.params)
    p_1 = jax.tree_util.tree_leaves(s_1.transformer.params)
    # cross-device reduction order perturbs grads at float32 epsilon; after
    # one AdamW step that shows up as ~1e-5 absolute noise on parameters
    for a, b in zip(p_dp, p_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_tp_sharded_step_matches_replicated():
    cfg = get_preset("far_mnist").override(
        {**TINY, "mesh": {"data": 4, "model": 2}})
    past, future = _batch(np.random.default_rng(1))

    mesh = make_mesh(data=4, model=2)
    tr = Trainer(cfg, mesh=mesh, write_outputs=False)
    template = jax.eval_shape(tr.init_state)
    shardings = state_sharding(template, mesh, tensor_parallel=True)
    state_tp = jax.jit(tr.init_state, out_shardings=shardings)()

    # some transformer params must actually be sharded over 'model'
    specs = tp_param_specs(state_tp.transformer.params)
    sharded = [s for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)) if len(s) > 0]
    assert sharded, "no tensor-parallel rules matched"

    state_rep = tr.init_state()
    s_tp, m_tp = tr.train_step(state_tp, *tr.put_batch(past, future))
    s_rep, m_rep = tr.train_step(state_rep, *tr.put_batch(past, future))
    for k in m_rep:
        np.testing.assert_allclose(float(m_tp[k]), float(m_rep[k]),
                                   atol=1e-4, rtol=1e-4, err_msg=k)


def test_sequence_parallel_matches_baseline():
    """sequence_parallel shards temporal-attention columns over 'model';
    results must match the unsharded run."""
    cfg_base = get_preset("far_mnist").override(TINY)
    cfg_sp = get_preset("far_mnist").override(
        {**TINY, "mesh": {"data": 4, "model": 2},
         "transformer": {**TINY["transformer"], "sequence_parallel": True}})
    past, future = _batch(np.random.default_rng(3))

    tr_base = Trainer(cfg_base, mesh=make_mesh(data=1, model=1,
                                               devices=jax.devices()[:1]),
                      write_outputs=False)
    s0 = tr_base.init_state()
    s0, m0 = tr_base.train_step(s0, *tr_base.put_batch(past, future))

    tr_sp = Trainer(cfg_sp, mesh=make_mesh(data=4, model=2),
                    write_outputs=False)
    s1 = tr_sp.init_state()
    s1, m1 = tr_sp.train_step(s1, *tr_sp.put_batch(past, future))
    for k in m0:
        np.testing.assert_allclose(float(m1[k]), float(m0[k]),
                                   atol=1e-4, rtol=1e-4, err_msg=k)


def test_two_process_distributed_matches_single():
    """REAL multi-process execution (process_count() == 2), which the
    in-process fake cluster cannot cover: two subprocesses join a
    jax.distributed CPU cluster (4 fake devices each, 8 global) and run one
    FAR train step on host-sharded batch halves. Asserts (a) global-batch
    assembly via make_array_from_process_local_data reproduces the
    single-process step, (b) the ragged-multi-host ValueError fires,
    (c) only host 0 constructs the logger/TB writer, and (d) EVALUATION
    under multi-host: eval_step metrics, evaluate() per-timestep curves
    (both global means — identical on every host and to the
    single-process run), and the _local_rows GIF-sample fetch returning
    exactly this host's rows of a batch-sharded prediction. Parity
    target: the reference's DDP drivers (train_FAR_mp.py:200-204,320-326,
    val at train_FAR.py:120-142)."""
    import json
    import socket
    import subprocess
    import sys
    import tempfile
    from pathlib import Path

    tiny = {**TINY,
            "transformer": {**TINY["transformer"],
                            "dropout": 0.0, "drop_path": 0.0}}

    # single-process reference on the in-process 8-device cluster
    rng = np.random.default_rng(0)
    past, future = _batch(rng)
    vpast, vfuture = _batch(np.random.default_rng(7))
    cfg = get_preset("far_mnist").override(tiny)
    tr = Trainer(cfg, mesh=make_mesh(data=8, model=1), write_outputs=False)
    s0 = tr.init_state()
    s0, m_ref = tr.train_step(s0, *tr.put_batch(past, future))
    m_ref = {k: float(v) for k, v in m_ref.items()}
    # single-process eval reference (same post-step state: both hosts run
    # the identical global step from the identical seeded init)
    em_ref, pred_ref = tr.eval_step(s0, *tr.put_batch(vpast, vfuture))
    em_ref = {k: float(v) for k, v in em_ref.items()}
    pred_ref = np.asarray(jax.device_get(pred_ref))
    from vptr_tpu.eval.harness import evaluate
    curves_ref = {m: [float(v) for v in c] for m, c in evaluate(
        tr, s0, [(vpast, vfuture)], mode="far", num_pred=2).items()}

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    with tempfile.TemporaryDirectory() as out_dir:
        np.savez(Path(out_dir) / "batch.npz", past=past, future=future,
                 vpast=vpast, vfuture=vfuture)
        worker = Path(__file__).parent / "_mp_worker.py"
        import os

        repo_root = str(Path(__file__).parent.parent)
        env = {**os.environ,
               "JAX_PLATFORMS": "cpu",
               "PALLAS_AXON_POOL_IPS": "",
               "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
               # repo root first; keep the existing tail (the axon
               # sitecustomize rides PYTHONPATH on this image)
               "PYTHONPATH": os.pathsep.join(
                   [repo_root] + ([os.environ["PYTHONPATH"]]
                                  if os.environ.get("PYTHONPATH") else []))}
        procs = [subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), out_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True) for i in range(2)]
        outs = [p.communicate(timeout=900)[0] for p in procs]
        results = {}
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]
            line = [ln for ln in out.splitlines()
                    if ln.startswith("RESULT ")]
            assert line, out[-3000:]
            r = json.loads(line[-1][len("RESULT "):])
            results[r["pid"]] = r

        # (c) host-0-only observability
        assert results[0]["host0_outputs"] is True
        assert results[1]["host0_outputs"] is False
        assert (Path(out_dir) / "run" / "train_log.log").exists()
        # (b) ragged multi-host raise, on both hosts
        assert results[0]["ragged_raised"] and results[1]["ragged_raised"]
        # (a) assembled global batch == single-process step
        for k, v in m_ref.items():
            for pid in (0, 1):
                np.testing.assert_allclose(
                    results[pid]["metrics"][k], v, atol=1e-5, rtol=1e-5,
                    err_msg=f"{k} (host {pid})")
        # (d) multi-host evaluation == single-process, on BOTH hosts
        for pid in (0, 1):
            r = results[pid]
            for k, v in em_ref.items():
                np.testing.assert_allclose(
                    r["eval_metrics"][k], v, atol=1e-5, rtol=1e-5,
                    err_msg=f"eval {k} (host {pid})")
            for m, c in curves_ref.items():
                np.testing.assert_allclose(
                    r["curves"][m], c, atol=1e-5, rtol=1e-5,
                    err_msg=f"curve {m} (host {pid})")
            # _local_rows returned exactly this host's 4 rows of the
            # global batch-sharded prediction
            assert r["local_rows_shape"] == list(pred_ref[:4].shape), r
            np.testing.assert_allclose(
                r["local_row_means"],
                pred_ref[pid * 4:(pid + 1) * 4].mean(axis=(1, 2, 3, 4)),
                atol=1e-5, rtol=1e-5, err_msg=f"local rows (host {pid})")


def test_sp_plus_tp_matches_baseline():
    """SP and TP COMBINED on the same 'model' axis (the configuration
    dryrun_multichip validates): tensor-parallel param shards + temporal
    token columns sharded over 'model'. GSPMD reshards between the two
    layouts — numerics must match the single-device run. This blesses the
    composition; each addresses a different bottleneck (TP: param/optimizer
    HBM + GEMM FLOPs, SP: activation HBM in temporal attention)."""
    cfg_base = get_preset("far_mnist").override(TINY)
    cfg_sp = get_preset("far_mnist").override(
        {**TINY, "mesh": {"data": 4, "model": 2},
         "transformer": {**TINY["transformer"], "sequence_parallel": True}})
    past, future = _batch(np.random.default_rng(7))

    tr_base = Trainer(cfg_base, mesh=make_mesh(data=1, model=1,
                                               devices=jax.devices()[:1]),
                      write_outputs=False)
    s0 = tr_base.init_state()
    s0, m0 = tr_base.train_step(s0, *tr_base.put_batch(past, future))

    mesh = make_mesh(data=4, model=2)
    tr = Trainer(cfg_sp, mesh=mesh, write_outputs=False)
    template = jax.eval_shape(tr.init_state)
    shardings = state_sharding(template, mesh, tensor_parallel=True)
    s1 = jax.jit(tr.init_state, out_shardings=shardings)()
    # TP must actually engage alongside SP
    specs = tp_param_specs(s1.transformer.params)
    assert [s for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)) if len(s) > 0]
    s1, m1 = tr.train_step(s1, *tr.put_batch(past, future))
    for k in m0:
        np.testing.assert_allclose(float(m1[k]), float(m0[k]),
                                   atol=1e-4, rtol=1e-4, err_msg=k)


NAR_TINY = {
    "dtype": "float32",
    "ae": {"feat_dim": 24, "n_res_blocks": 1},
    "transformer": {"variant": "nar", "d_model": 24, "n_heads": 4,
                    "num_encoder_layers": 2, "num_decoder_layers": 2,
                    "num_past_frames": 2, "num_future_frames": 2,
                    "enc_h": 4, "enc_w": 4,   # 32px, 3 downs -> 4x4 latents
                    "rpe": True, "dropout": 0.0, "drop_path": 0.0},
    "data": {"batch_size": 8, "img_size": 32,
             "num_past_frames": 2, "num_future_frames": 2},
}


def test_nar_dp_matches_single_device():
    """NAR step (enc-dec attention, BatchNorm conv-FFN in the encoder, NCE
    head) under 8-way DP == single device (reference: train_NAR_mp.py:94-118
    semantics)."""
    cfg = get_preset("nar_mnist").override(NAR_TINY)
    past, future = _batch(np.random.default_rng(5))

    tr_dp = Trainer(cfg, mesh=make_mesh(data=8, model=1),
                    write_outputs=False)
    s_dp = tr_dp.init_state()
    s_dp, m_dp = tr_dp.train_step(s_dp, *tr_dp.put_batch(past, future))

    tr_1 = Trainer(cfg, mesh=make_mesh(data=1, model=1),
                   write_outputs=False)
    s_1 = tr_1.init_state()
    s_1, m_1 = tr_1.train_step(s_1, *tr_1.put_batch(past, future))

    for k in m_1:
        np.testing.assert_allclose(float(m_dp[k]), float(m_1[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)
    # BatchNorm batch-stats must be GLOBAL-batch statistics under DP
    # (SURVEY.md §7 "hard parts": stats silently diverge per-shard otherwise)
    for a, b in zip(jax.tree_util.tree_leaves(s_dp.transformer.stats),
                    jax.tree_util.tree_leaves(s_1.transformer.stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_nar_tp_sharded_step_matches_replicated():
    cfg = get_preset("nar_mnist").override(
        {**NAR_TINY, "mesh": {"data": 4, "model": 2}})
    past, future = _batch(np.random.default_rng(6))

    mesh = make_mesh(data=4, model=2)
    tr = Trainer(cfg, mesh=mesh, write_outputs=False)
    template = jax.eval_shape(tr.init_state)
    shardings = state_sharding(template, mesh, tensor_parallel=True)
    state_tp = jax.jit(tr.init_state, out_shardings=shardings)()
    specs = tp_param_specs(state_tp.transformer.params)
    sharded = [s for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)) if len(s) > 0]
    assert sharded, "no tensor-parallel rules matched for NAR"

    state_rep = tr.init_state()
    s_tp, m_tp = tr.train_step(state_tp, *tr.put_batch(past, future))
    s_rep, m_rep = tr.train_step(state_rep, *tr.put_batch(past, future))
    for k in m_rep:
        np.testing.assert_allclose(float(m_tp[k]), float(m_rep[k]),
                                   atol=1e-4, rtol=1e-4, err_msg=k)


def test_ae_dp_matches_single_device():
    """Stage-1 AE step (GAN alternation + conv BatchNorm everywhere) under
    8-way DP == single device (reference: train_AutoEncoder.py:59-74 + DDP).
    BatchNorm batch stats are the classic DP divergence trap."""
    cfg = get_preset("ae_mnist").override({
        "dtype": "float32",
        "ae": {"feat_dim": 24, "n_res_blocks": 1, "n_downsampling": 2},
        "data": {"batch_size": 8, "img_size": 32,
                 "num_past_frames": 2, "num_future_frames": 2},
    })
    past, future = _batch(np.random.default_rng(7))

    tr_dp = Trainer(cfg, mesh=make_mesh(data=8, model=1),
                    write_outputs=False)
    s_dp = tr_dp.init_state()
    s_dp, m_dp = tr_dp.train_step(s_dp, *tr_dp.put_batch(past, future))

    tr_1 = Trainer(cfg, mesh=make_mesh(data=1, model=1),
                   write_outputs=False)
    s_1 = tr_1.init_state()
    s_1, m_1 = tr_1.train_step(s_1, *tr_1.put_batch(past, future))

    # 1e-4: the generator-side GAN term normalizes with BATCH stats
    # (reference train()-mode parity), so the G forward now contains
    # cross-device mean/var reductions whose accumulation order differs
    # between the sharded and single-device schedules (~4e-5 relative
    # through the disc stack)
    for k in m_1:
        np.testing.assert_allclose(float(m_dp[k]), float(m_1[k]),
                                   atol=1e-4, rtol=1e-4, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s_dp.enc.stats),
                    jax.tree_util.tree_leaves(s_1.enc.stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
