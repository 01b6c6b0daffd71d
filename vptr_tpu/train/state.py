"""Train state pytrees. flax.struct dataclasses — jit/ckpt-friendly."""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import struct


@struct.dataclass
class ModuleState:
    """Variables of one module: params + (optional) batch norm stats."""

    params: Any
    stats: Any = struct.field(default_factory=dict)

    @classmethod
    def from_variables(cls, variables) -> "ModuleState":
        return cls(params=variables["params"],
                   stats=variables.get("batch_stats", {}))

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.stats:
            v["batch_stats"] = self.stats
        return v


@struct.dataclass
class AETrainState:
    """Stage-1 state: generator (enc+dec) + discriminator, two optimizers
    (reference: train_AutoEncoder.py:137-139)."""

    step: jax.Array
    rng: jax.Array
    enc: ModuleState
    dec: ModuleState
    disc: Optional[ModuleState]
    g_opt: Any
    d_opt: Any


@struct.dataclass
class Stage2TrainState:
    """Stage-2 state: trainable transformer + frozen AE (+ optional disc)
    (reference: train_FAR.py:179-197)."""

    step: jax.Array
    rng: jax.Array
    transformer: ModuleState
    t_opt: Any
    enc: ModuleState          # frozen
    dec: ModuleState          # frozen
    disc: Optional[ModuleState]
    d_opt: Any
