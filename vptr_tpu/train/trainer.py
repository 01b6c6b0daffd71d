"""Experiment driver: build models, init/shard state, run the epoch loop.

Covers the roles of all five reference train scripts
(reference: train_AutoEncoder.py / train_FAR.py / train_NAR.py /
train_FAR_mp.py / train_NAR_mp.py): stage selection comes from config, and
multi-chip data-parallelism is the default execution mode (a 1-chip mesh is
just the degenerate case) — no separate "_mp" code path.
"""

from __future__ import annotations

import time
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vptr_tpu.config import ExperimentConfig
from vptr_tpu.data.loader import build_loader
from vptr_tpu.data.transforms import ReNormalize
from vptr_tpu.losses import build_optimizer
from vptr_tpu.models.autoencoder import build_autoencoder
from vptr_tpu.models.discriminator import build_discriminator
from vptr_tpu.models.transformer import build_transformer
from vptr_tpu.parallel.mesh import DATA_AXIS, make_mesh
from vptr_tpu.train.checkpoint import CheckpointManager, load_ae_modules
from vptr_tpu.train.state import AETrainState, ModuleState, Stage2TrainState
from vptr_tpu.train.steps import (
    make_ae_eval_step,
    make_ae_train_step,
    make_far_eval_step,
    make_far_train_step,
    make_nar_eval_step,
    make_nar_train_step,
)
from vptr_tpu.train.summary import (
    SummaryWriter,
    setup_logging,
    visualize_batch_clips,
)
from vptr_tpu.utils.misc import AverageMeters, count_params, set_seed


def _dtype_of(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float16": jnp.float16}[name]


def _expand_metrics(tagged):
    """Flatten multi-step dispatch metrics. Takes (stacked, metrics) pairs
    — the dispatcher that produced each dict knows whether its values are
    (K,) stacked arrays, so the mode is explicit rather than inferred from
    value shapes (a future 1-D per-step metric must not be misread as a
    K-step stack)."""
    out = []
    for stacked, m in tagged:
        if stacked:
            kk = np.shape(next(iter(m.values())))[0]
            out.extend({key: v[i] for key, v in m.items()}
                       for i in range(kk))
        else:
            out.append(m)
    return out


class Trainer:
    def __init__(self, cfg: ExperimentConfig, mesh=None,
                 write_outputs: bool = True):
        self.cfg = cfg
        self.dtype = _dtype_of(cfg.dtype)
        if cfg.ckpt_per_epochs < 1:
            # fail at config time, not at the end of the first epoch (the
            # cadence is used as a modulus; 0 is NOT "never" — disable
            # checkpoints with write_outputs=False instead)
            raise ValueError(
                f"ckpt_per_epochs must be >= 1, got {cfg.ckpt_per_epochs}")
        if cfg.debug_nans:
            # sanitizer mode: every op checked for NaNs (slow; debugging only)
            jax.config.update("jax_debug_nans", True)
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.mesh.data, cfg.mesh.model)
        self.batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        self.replicated = NamedSharding(self.mesh, P())
        self.write_outputs = write_outputs

        self.renorm = ReNormalize(cfg.data.mean, cfg.data.std)
        self._build_models()
        self._build_steps()
        # Observability (logs/TB/GIFs) is rank-0-only, like the reference's
        # DDP drivers (reference: train_FAR_mp.py:247-274 gate on rank == 0).
        # Checkpointing stays on ALL processes — orbax multihost saves are
        # collective.
        is_host0 = jax.process_index() == 0
        if write_outputs:
            self.ckpt = CheckpointManager(str(Path(cfg.ckpt_dir) / "ckpt"),
                                          keep=cfg.ckpt_keep)
        else:
            self.ckpt = None
        if write_outputs and is_host0:
            self.logger = setup_logging(cfg.ckpt_dir)
            self.writer = SummaryWriter(str(Path(cfg.ckpt_dir) / "tb"))
        else:
            import logging

            self.logger = logging.getLogger("vptr_tpu.silent")
            self.writer = None
        self.write_outputs = write_outputs and is_host0
        self.history: Dict[str, Any] = {}
        self._warned_ragged: set = set()

    # ------------------------------------------------------------------
    def _build_models(self):
        cfg = self.cfg
        self.enc, self.dec = build_autoencoder(cfg.ae, dtype=self.dtype)
        self.use_gan = cfg.loss.lam_gan is not None
        self.disc = (build_discriminator(cfg.disc, dtype=self.dtype)
                     if self.use_gan else None)
        self.transformer = (build_transformer(cfg.transformer,
                                              dtype=self.dtype)
                            if cfg.stage in ("far", "nar") else None)
        self.g_opt = build_optimizer(
            cfg.optim, d_model=cfg.transformer.d_model)
        self.d_opt = (build_optimizer(cfg.optim_d)
                      if self.use_gan else None)

    def _build_steps(self):
        cfg = self.cfg
        if cfg.stage == "ae":
            train_step = make_ae_train_step(self.enc, self.dec, self.disc,
                                            self.g_opt, self.d_opt, cfg.loss)
            eval_step = make_ae_eval_step(self.enc, self.dec, self.disc,
                                          cfg.loss)
        elif cfg.stage == "far":
            train_step = make_far_train_step(
                self.enc, self.dec, self.transformer, self.disc,
                self.g_opt, self.d_opt, cfg.loss,
                remat_decoder=cfg.transformer.remat)
            eval_step = make_far_eval_step(self.enc, self.dec,
                                           self.transformer, cfg.loss)
        elif cfg.stage == "nar":
            train_step = make_nar_train_step(
                self.enc, self.dec, self.transformer, self.disc,
                self.g_opt, self.d_opt, cfg.loss,
                remat_decoder=cfg.transformer.remat)
            eval_step = make_nar_eval_step(self.enc, self.dec,
                                           self.transformer, cfg.loss)
        else:
            raise ValueError(f"unknown stage {self.cfg.stage!r}")
        jitted_train = jax.jit(train_step, donate_argnums=(0,))
        jitted_eval = jax.jit(eval_step)

        # trace under the mesh context so bare-PartitionSpec sharding
        # constraints (sequence_parallel) resolve against our mesh
        def train_in_mesh(*args):
            with self.mesh:
                return jitted_train(*args)

        def eval_in_mesh(*args):
            with self.mesh:
                return jitted_eval(*args)

        self.train_step = train_in_mesh
        self.eval_step = eval_in_mesh
        self.raw_train_step = train_step   # un-jitted (scan/probe tooling)

        # multi-step dispatch: fold K steps into one jitted lax.scan so the
        # residual per-jit-call host dispatch cost is paid once per K steps.
        # Measured ~2 ms/step on the relay TPU (not the ~11 ms small-program
        # floor — async dispatch pipelines under the ~160 ms of device work;
        # scripts/dispatch_overhead_probe.py). 0 = auto.
        k = cfg.steps_per_dispatch
        if k == 0:
            k = 8 if jax.default_backend() == "tpu" else 1
        self.steps_per_dispatch = k
        self.multi_train_step = None
        if k > 1:
            def multi_step(state, past_k, future_k):
                def body(s, batch):
                    return train_step(s, *batch)
                return jax.lax.scan(body, state, (past_k, future_k))

            jitted_multi = jax.jit(multi_step, donate_argnums=(0,))

            def multi_in_mesh(*args):
                with self.mesh:
                    return jitted_multi(*args)

            self.multi_train_step = multi_in_mesh

    # ------------------------------------------------------------------
    def init_state(self, rng: Optional[jax.Array] = None):
        with self.mesh:
            return self._init_state(rng)

    def _init_state(self, rng: Optional[jax.Array] = None):
        cfg = self.cfg
        rng = rng if rng is not None else set_seed(cfg.seed, cfg.rng_impl)
        d = cfg.data
        rngs = jax.random.split(rng, 8)
        past = jnp.zeros((2, d.num_past_frames, d.img_size, d.img_size,
                          d.img_channels), self.dtype)
        future = jnp.zeros((2, d.num_future_frames, d.img_size, d.img_size,
                            d.img_channels), self.dtype)
        x = jnp.concatenate([past, future], axis=1)

        enc_vars = self.enc.init(rngs[0], x, train=False)
        feats = self.enc.apply(enc_vars, x, train=False)
        dec_vars = self.dec.init(rngs[1], feats, train=False)
        enc_state = ModuleState.from_variables(enc_vars)
        dec_state = ModuleState.from_variables(dec_vars)

        disc_state = None
        if self.use_gan:
            frames = x.reshape((-1,) + x.shape[2:])
            disc_state = ModuleState.from_variables(
                self.disc.init(rngs[2], frames, train=False))

        if cfg.stage == "ae":
            g_params = (enc_state.params, dec_state.params)
            state = AETrainState(
                step=jnp.zeros((), jnp.int32), rng=rngs[3],
                enc=enc_state, dec=dec_state, disc=disc_state,
                g_opt=self.g_opt.init(g_params),
                d_opt=self.d_opt.init(disc_state.params)
                if self.use_gan else None)
        else:
            # load the frozen stage-1 AE (reference: train_FAR.py:210)
            if cfg.ae_ckpt:
                enc_state, dec_state = load_ae_modules(cfg.ae_ckpt)

            t = cfg.transformer
            tp = d.num_past_frames if cfg.stage == "nar" else None
            feats_t = (feats[:, :d.num_past_frames] if cfg.stage == "nar"
                       else feats[:, :-1])
            init_method = ("init_all" if hasattr(self.transformer, "init_all")
                           else "__call__")
            t_vars = self.transformer.init(
                {"params": rngs[4], "dropout": rngs[5]}, feats_t, train=False,
                method=init_method)
            t_state = ModuleState.from_variables(t_vars)
            state = Stage2TrainState(
                step=jnp.zeros((), jnp.int32), rng=rngs[3],
                transformer=t_state, t_opt=self.g_opt.init(t_state.params),
                enc=enc_state, dec=dec_state, disc=disc_state,
                d_opt=self.d_opt.init(disc_state.params)
                if self.use_gan else None)

        state = jax.device_put(state, self.replicated)
        return state

    # ------------------------------------------------------------------
    def param_counts(self, state) -> Dict[str, int]:
        out = {"enc": count_params(state.enc.params),
               "dec": count_params(state.dec.params)}
        if getattr(state, "transformer", None) is not None:
            out["transformer"] = count_params(state.transformer.params)
        if state.disc is not None:
            out["disc"] = count_params(state.disc.params)
        return out

    def put_batch(self, past: np.ndarray, future: np.ndarray):
        # ragged batches (e.g. the last test batch, drop_last=False) cannot
        # shard evenly over the data axis — replicate those instead. Under
        # multi-host each process stages its LOCAL shard of the global batch
        # (build_loader: per-host batch = batch // num_hosts), so the
        # divisibility check is on the GLOBAL row count.
        n_data = self.mesh.shape[DATA_AXIS]
        ragged = (past.shape[0] * jax.process_count()) % n_data != 0
        if ragged and past.shape[0] not in self._warned_ragged:
            # meant for occasional eval tails; if EVERY batch hits this
            # (batch_size % data-axis != 0) the run silently forfeits data
            # parallelism — warn once per shape so that is visible
            self._warned_ragged.add(past.shape[0])
            self.logger.warning(
                "batch of %d does not divide the data axis (%d devices); "
                "replicating — all devices compute the full batch. Pick a "
                "batch_size divisible by the data axis for real DP.",
                past.shape[0], n_data)
        sharding = self.replicated if ragged else self.batch_sharding
        return (self._stage(past, sharding), self._stage(future, sharding))

    def put_batch_stacked(self, past_k: np.ndarray, future_k: np.ndarray):
        """Stage (K, B, ...) stacked batches for a multi-step dispatch —
        the batch axis to shard over the data mesh axis is axis 1."""
        n_data = self.mesh.shape[DATA_AXIS]
        ragged = (past_k.shape[1] * jax.process_count()) % n_data != 0
        if ragged and past_k.shape[1] not in self._warned_ragged:
            # same once-per-shape signal as put_batch: a steps_per_dispatch>1
            # run with batch_size % data-axis != 0 would otherwise forfeit
            # data parallelism on every step silently
            self._warned_ragged.add(past_k.shape[1])
            self.logger.warning(
                "stacked batch of %d does not divide the data axis (%d "
                "devices); replicating — all devices compute the full batch. "
                "Pick a batch_size divisible by the data axis for real DP.",
                past_k.shape[1], n_data)
        sharding = (self.replicated if ragged
                    else NamedSharding(self.mesh, P(None, DATA_AXIS)))
        return (self._stage(past_k, sharding), self._stage(future_k, sharding))

    @staticmethod
    def _local_rows(arr) -> np.ndarray:
        """Host-local rows of a batch-sharded device array. Single-process:
        the whole array. Multi-host: a global jax.Array is not fully
        addressable from one process, so assemble this host's rows (the ones
        its loader staged — process-major device order keeps them contiguous
        and in global row order) from the addressable shards; replicated
        shards (index start None) dedupe to one copy."""
        if jax.process_count() == 1:
            return np.asarray(jax.device_get(arr))
        rows = {}
        for s in arr.addressable_shards:
            rows[s.index[0].start or 0] = np.asarray(s.data)
        return np.concatenate([rows[k] for k in sorted(rows)], axis=0)

    def _stage(self, arr: np.ndarray, sharding):
        # cast to the compute dtype on the HOST (ml_dtypes-backed numpy
        # cast — identical round-to-nearest values to a device-side cast):
        # halves the per-step host->device bytes, which on the tunneled
        # chip ride a CPU-bound relay serialization path
        arr = arr.astype(self.dtype)
        if jax.process_count() > 1:
            # each host's loader holds a DIFFERENT shard of the global batch
            # (build_loader: per-host batch = batch_size // num_hosts), so
            # device_put's same-value-on-all-processes contract does not
            # hold — assemble the global array from process-local shards
            if sharding is self.replicated:
                raise ValueError(
                    "ragged batch under multi-host: per-host batches differ "
                    "so replication is ill-defined; use batch sizes "
                    "divisible by the data axis (drop_last=True)")
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)

    # ------------------------------------------------------------------
    def train(self, state=None, epochs: Optional[int] = None):
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        epochs = epochs if epochs is not None else cfg.epochs
        counts = self.param_counts(state)
        self.logger.info("param counts: %s", counts)

        start_epoch = 0
        if self.ckpt is not None and cfg.resume:
            latest = self.ckpt.latest_step()
            if latest is not None:
                state = self.ckpt.restore(state)
                self.history = self.ckpt.load_history()
                start_epoch = int(self.history.get("epoch", 0))
                self.logger.info("resumed from step %s (epoch %d)",
                                 latest, start_epoch)

        train_loader = build_loader(cfg.data, split="train", seed=cfg.seed,
                                    host_id=jax.process_index(),
                                    num_hosts=jax.process_count())
        # val is host-sharded too: each host stages its shard of the global
        # val batch (like the reference's val DistributedSampler,
        # train_FAR_mp.py:76) — without this every host would redundantly
        # iterate the full val set and put_batch would assemble a global
        # batch of identical per-host copies
        val_loader = build_loader(cfg.data, split="val", seed=cfg.seed,
                                  host_id=jax.process_index(),
                                  num_hosts=jax.process_count())

        profiling = False
        for epoch in range(start_epoch + 1, start_epoch + epochs + 1):
            epoch_start = datetime.now()
            meters = AverageMeters()
            step_metrics = []
            t0, n_steps = time.perf_counter(), 0
            # multi-step dispatch groups K batches per jit call; profiling
            # epochs run per-step dispatches so traces stay per-step
            use_k = self.steps_per_dispatch
            if cfg.profile_dir and epoch == start_epoch + 1:
                use_k = 1
            pending = []

            def run_group(state, group):
                """One dispatch for a full K-group; singles otherwise (a
                partial tail group would compile a second scan shape)."""
                if len(group) == use_k and use_k > 1:
                    past_k = np.stack([p for p, _ in group])
                    future_k = np.stack([f for _, f in group])
                    state, ms = self.multi_train_step(
                        state, *self.put_batch_stacked(past_k, future_k))
                    return state, [(True, ms)]  # metrics stacked (K,) per key
                out = []
                for p, f in group:
                    state, m = self.train_step(state, *self.put_batch(p, f))
                    out.append((False, m))
                return state, out

            for bi, (past, future) in enumerate(train_loader):
                if (cfg.steps_per_epoch is not None
                        and bi >= cfg.steps_per_epoch):
                    break
                if cfg.profile_dir and epoch == start_epoch + 1:
                    # trace a few steady-state steps (jax.profiler; the
                    # reference only logs wall clock, train_FAR.py:218)
                    if bi == 2 and not profiling:
                        jax.profiler.start_trace(cfg.profile_dir)
                        profiling = True
                    elif profiling and bi == 2 + cfg.profile_steps:
                        jax.block_until_ready(state.step)
                        jax.profiler.stop_trace()
                        profiling = False
                        self.logger.info("profiler trace written to %s",
                                         cfg.profile_dir)
                if pending and pending[0][0].shape != past.shape:
                    # ragged batch: flush the group before shapes mix
                    state, ms = run_group(state, pending)
                    pending = []
                    step_metrics.extend(ms)
                pending.append((past, future))
                n_steps += 1
                if len(pending) >= use_k:
                    state, ms = run_group(state, pending)
                    pending = []
                    # keep metrics ON DEVICE: a per-step device_get would
                    # sync the host to every step and stall dispatch
                    # pipelining (measured ~40% step-rate loss); fetch in
                    # bounded chunks instead
                    step_metrics.extend(ms)
                if len(step_metrics) >= 128:
                    for m in _expand_metrics(jax.device_get(step_metrics)):
                        meters.update(m)
                    step_metrics = []
            state, ms = run_group(state, pending)
            step_metrics.extend(ms)
            for m in _expand_metrics(jax.device_get(step_metrics)):
                meters.update(m)
            jax.block_until_ready(state.step)
            if profiling:
                jax.profiler.stop_trace()
                profiling = False
            dt = time.perf_counter() - t0
            # long remote-relay runs accumulate dead client-side buffer
            # handles whose remote frees lag; an explicit collection each
            # epoch keeps the release queue drained
            import gc

            gc.collect()

            avg = meters.averages()
            avg["steps_per_sec"] = n_steps / max(dt, 1e-9)
            if cfg.stage in ("far", "nar"):
                # rough model FLOPs utilization for the transformer stack —
                # the NAR estimator counts decoder layers + cross-attention
                # too, matching bench.py's accounting (bench.py:145)
                from vptr_tpu.utils.misc import (
                    nar_step_flops,
                    transformer_step_flops,
                )

                t = cfg.transformer
                d = cfg.data
                if cfg.stage == "far":
                    flops = transformer_step_flops(
                        d.batch_size,
                        d.num_past_frames + d.num_future_frames - 1,
                        t.enc_h, t.enc_w, t.d_model, t.n_heads,
                        t.num_encoder_layers, t.window_size,
                        t.spatial_ffn_hidden_ratio)
                else:
                    flops = nar_step_flops(
                        d.batch_size, d.num_past_frames, d.num_future_frames,
                        t.enc_h, t.enc_w, t.d_model, t.n_heads,
                        t.num_encoder_layers, t.num_decoder_layers,
                        t.window_size, t.spatial_ffn_hidden_ratio)
                avg["transformer_tflops_per_sec"] = (
                    flops * avg["steps_per_sec"] / 1e12)
            if self.writer is not None:
                self.writer.write_scalars(epoch, avg, prefix="train/")
            self.logger.info("epoch %d train: %s", epoch,
                             {k: round(v, 5) for k, v in avg.items()})
            self._update_history("train", epoch, avg)

            if epoch % cfg.val_per_epochs == 0:
                vmeters = AverageMeters()
                sample = None
                for past, future in val_loader:
                    metrics, pred = self.eval_step(
                        state, *self.put_batch(past, future))
                    # metrics are global-batch means (replicated — safe to
                    # fetch on every host); the GIF sample fetches only this
                    # host's rows, since a cross-process global jax.Array is
                    # not fully addressable from one host
                    vmeters.update(jax.device_get(metrics))
                    sample = (past, future, self._local_rows(pred))
                vavg = vmeters.averages()
                if self.writer is not None:
                    self.writer.write_scalars(epoch, vavg, prefix="val/")
                self.logger.info("epoch %d val: %s", epoch,
                                 {k: round(v, 5) for k, v in vavg.items()})
                self._update_history("val", epoch, vavg)
                if sample is not None and self.write_outputs:
                    self._dump_gifs(epoch, *sample)

            last = epoch == start_epoch + epochs
            if self.ckpt is not None and (last or
                                          epoch % cfg.ckpt_per_epochs == 0):
                self.history["epoch"] = epoch
                self.ckpt.save(int(jax.device_get(state.step)), state,
                               config_json=cfg.to_json(),
                               history=self.history)
            self.logger.info("epoch %d took %s", epoch,
                             datetime.now() - epoch_start)
        return state

    def _update_history(self, split: str, epoch: int, avg: Dict[str, float]):
        hist = self.history.setdefault(split, {})
        for k, v in avg.items():
            hist.setdefault(k, []).append([epoch, float(v)])

    def _dump_gifs(self, epoch: int, past, future, pred):
        out = Path(self.cfg.ckpt_dir) / f"val_gifs_epoch{epoch}"
        try:
            pred_future = pred[:, -future.shape[1]:]
            visualize_batch_clips(past, future, pred_future, str(out),
                                  renorm=self.renorm, desc="pred_future")
        except Exception as e:  # GIF failures must never kill training
            self.logger.warning("gif dump failed: %s", e)
