"""Device mesh + sharding helpers: the framework's parallelism substrate.

The reference's only distributed mode is single-node DDP over NCCL
(reference: train_FAR_mp.py:200-204, 320-326). Here parallelism is expressed
the TPU way: a ``jax.sharding.Mesh`` with named axes

* ``data``  — data parallel: the global batch is split along it; gradient
  all-reduce is inserted by XLA (the DDP bucket all-reduce equivalent).
* ``model`` — tensor parallel: attention-head / FFN-hidden dimensions of the
  transformer are sharded along it (GSPMD inserts the all-gathers /
  reduce-scatters over ICI).

Everything downstream talks in ``PartitionSpec``s; no user-level collectives.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` consumes all remaining chips;
    an explicit ``data`` smaller than the device count uses the first
    ``data * model`` devices (e.g. a single-device mesh on a multi-chip host).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, (
        f"mesh {data}x{model} needs more than the {n} available devices")
    if data * model < n:
        import logging

        # legal (tests build subset meshes on purpose) but worth a signal:
        # a mis-specified config (e.g. forgetting data=-1) would otherwise
        # silently train on a subset of the available chips
        logging.getLogger("vptr_tpu").warning(
            "mesh %dx%d uses only %d of %d available devices",
            data, model, data * model, n)
    arr = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Tensor-parallel partition rules for the transformer parameter tree.
#
# Megatron-style: q/k/v projections and FFN fc1 shard their OUTPUT features
# (heads / hidden) over the model axis; out-projections and fc2 shard their
# INPUT features, so each block needs a single reduce per sublayer (GSPMD
# inserts it). Everything else is replicated.
# ---------------------------------------------------------------------------

_TP_RULES = (
    # (regex on 'path/to/param', PartitionSpec)
    (r".*(q_proj|k_proj|v_proj)/kernel$", P(None, MODEL_AXIS)),
    (r".*(q_proj|k_proj|v_proj)/bias$", P(MODEL_AXIS)),
    (r".*out_proj/kernel$", P(MODEL_AXIS, None)),
    (r".*linear1/kernel$", P(None, MODEL_AXIS)),
    (r".*linear1/bias$", P(MODEL_AXIS)),
    (r".*linear2/kernel$", P(MODEL_AXIS, None)),
    (r".*ffn2?/fc1/kernel$", P(None, None, None, MODEL_AXIS)),
    (r".*ffn2?/fc1/bias$", P(MODEL_AXIS)),
    (r".*ffn2?/dw3x3/kernel$", P(None, None, None, MODEL_AXIS)),
    (r".*ffn2?/dw3x3/bias$", P(MODEL_AXIS)),
    (r".*ffn2?/fc2/kernel$", P(None, None, MODEL_AXIS, None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def tp_param_specs(params: Any) -> Any:
    """PartitionSpec pytree for a transformer param tree under TP rules."""

    def spec_for(path, leaf):
        s = _path_str(path)
        for pattern, spec in _TP_RULES:
            if re.match(pattern, s):
                if len(spec) <= leaf.ndim:
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def state_sharding(state_template: Any, mesh: Mesh,
                   tensor_parallel: bool = True) -> Any:
    """NamedSharding pytree for a full train state (params, optimizer
    moments, batch stats, ...) from the TP rules. Optimizer moments mirror
    the param tree structure, so path-suffix matching shards them
    consistently with their parameters. Use with
    ``jax.jit(init_fn, out_shardings=...)`` or ``jax.device_put``.
    """

    def spec_for(path, leaf):
        ndim = getattr(leaf, "ndim", None)
        if ndim is None:
            return NamedSharding(mesh, P())
        if tensor_parallel and mesh.shape.get(MODEL_AXIS, 1) > 1:
            s = _path_str(path)
            for pattern, spec in _TP_RULES:
                if re.match(pattern, s) and len(spec) <= ndim:
                    # only shard when the dimension divides evenly
                    ok = all(
                        ax is None or
                        leaf.shape[i] % mesh.shape[MODEL_AXIS] == 0
                        for i, ax in enumerate(spec))
                    if ok:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, state_template)


def shard_params(params: Any, mesh: Mesh,
                 specs: Optional[Any] = None) -> Any:
    """Place a param tree on the mesh. With ``specs`` (e.g. from
    :func:`tp_param_specs`) parameters are tensor-sharded; otherwise
    replicated."""
    if specs is None:
        sharding = replicated(mesh)
        return jax.device_put(params, sharding)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def num_hosts() -> int:
    return jax.process_count()


def host_id() -> int:
    return jax.process_index()


def maybe_initialize_distributed():
    """Initialize jax.distributed when a multi-host launch environment is
    detected (GKE/Borg TPU env vars or explicit JAX coordinator settings).
    No-op on single host. Replaces the reference's hand-rolled NCCL
    rendezvous (reference: train_FAR_mp.py:200-204).
    """
    import os

    already = jax.process_count() > 1
    if already:
        return
    markers = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
               "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")
    if any(os.environ.get(m) for m in markers) and \
            os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") != "localhost":
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-host fallback; jax.devices() still works
