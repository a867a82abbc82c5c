"""Train-state pytrees for the three-network GAN.

The reference keeps three (net, Adam, StepLR) triples
(train_tempo.py:165-172); here each is a NetState and the whole trainer is
one GanTrainState pytree, so a single jitted step updates everything and a
single orbax/msgpack dump checkpoints it (schema parity with SURVEY.md
§2.2).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


def make_optimizer(
    lr: float,
    decay_steps: int,
    decay_rate: float,
) -> optax.GradientTransformation:
    """Adam + staircase exponential decay == torch Adam + StepLR
    (reference train_tempo.py:165-172: StepLR(10000, gamma=0.7))."""
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=decay_steps,
        decay_rate=decay_rate,
        staircase=True,
    )
    return optax.adam(learning_rate=schedule)


class NetState(struct.PyTreeNode):
    params: Any
    batch_stats: Any           # BN running stats + spectral-norm u/sigma
    opt_state: Any

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


class GanTrainState(struct.PyTreeNode):
    n_iter: jnp.ndarray        # [] int32
    sr: NetState
    tempo: NetState
    spatial: NetState

    @classmethod
    def create(cls, sr, tempo, spatial):
        return cls(
            n_iter=jnp.zeros((), jnp.int32), sr=sr, tempo=tempo, spatial=spatial
        )


def param_count(params) -> int:
    return sum(int(a.size) for a in jax.tree_util.tree_leaves(params))
