"""Device-mesh scale-out for the env engine and learners.

The reference is single-process/single-env with no distributed layer at all
(SURVEY.md §2: no multiprocessing, no vector env, no NCCL/MPI anywhere).  The
TPU build's scale axis is the env batch: lanes shard along a "data" mesh axis
over chips (ICI) and hosts (DCN), params replicate, and XLA GSPMD inserts the
gradient all-reduce when replicated params meet sharded batches — the
collectives are compiler-scheduled psum/all-gather over ICI, no hand-written
communication backend (the NCCL-equivalent role, SURVEY.md §5).

Rollouts are embarrassingly parallel: lanes never communicate, so the env
step has zero collectives; cross-device traffic exists only in the learner's
gradient reduction and metric reductions.

An optional "model" axis tensor-parallelizes the MLP hidden layers
(column-parallel kernels) — included for completeness and exercised by the
multichip dry-run, though at SB3-scale networks (~1e5 params) replication is
the right default.

Multi-host: call `jax.distributed.initialize()` before building the mesh;
`make_mesh` then spans all processes' devices and per-host lane shards stay
host-local (standard JAX SPMD).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """Mesh over the first n_devices devices, shaped (data, model)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if n % model_parallel != 0:
        raise ValueError(f"n_devices {n} not divisible by model_parallel {model_parallel}")
    grid = np.array(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (data_axis, model_axis))


# Fields of SACState / TD3State holding network/optimizer leaves (replicated,
# or model-sharded when a model axis is used).
_PARAM_FIELDS = frozenset(
    {
        "actor_params", "critic_params", "target_actor_params",
        "target_critic_params", "log_alpha", "actor_opt", "critic_opt",
        "alpha_opt", "n_updates", "step",
        "params", "opt",  # DQNState / PPOState naming
    }
)
# Fields whose leaves carry a leading lanes axis.
_ENV_FIELDS = frozenset({"env_state", "obs"})
# The packed replay ring is (rows, W, lanes): lanes is the MINOR axis 2
# (models/replay.py round-2 layout).
_REPLAY_FIELDS = frozenset({"replay"})


def _spec_env(x) -> P:
    return P("data", *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()


def _spec_replay(x) -> P:
    # data ring (rows, W, lanes); cursor/filled scalars replicate.
    return P(None, None, "data") if x.ndim == 3 else P()


def _spec_param(model_parallel: int):
    def spec(x) -> P:
        # Column-parallel: shard the output axis of kernels/biases that divide
        # the model axis; everything else (scalars, counts) replicates.
        if (
            model_parallel > 1
            and x.ndim >= 1
            and x.shape[-1] >= model_parallel
            and x.shape[-1] % model_parallel == 0
        ):
            return P(*([None] * (x.ndim - 1)), "model")
        return P()

    return spec


def state_shardings(state, mesh: Mesh):
    """NamedSharding tree for a batched engine EnvState (+obs tuple ok)."""
    return jax.tree.map(lambda x: NamedSharding(mesh, _spec_env(x)), state)


def trainer_state_shardings(state, mesh: Mesh, model_parallel: int = 1):
    """NamedSharding tree for a SACState/TD3State.

    Env/replay leaves shard along "data"; params/opt leaves replicate (or
    column-shard along "model" when model_parallel > 1).
    """
    param_spec = _spec_param(model_parallel)
    fields = {}
    for name in state._fields:
        sub = getattr(state, name)
        if name in _ENV_FIELDS:
            spec_fn = _spec_env
        elif name in _REPLAY_FIELDS:
            spec_fn = _spec_replay
        elif name in _PARAM_FIELDS:
            spec_fn = param_spec
        else:
            spec_fn = lambda x: P()
        fields[name] = jax.tree.map(
            lambda x, f=spec_fn: NamedSharding(mesh, f(x)), sub
        )
    return type(state)(**fields)


def place(tree, shardings):
    """device_put a pytree onto its sharding tree (GSPMD then propagates the
    layout through any jitted computation consuming it)."""
    return jax.device_put(tree, shardings)
