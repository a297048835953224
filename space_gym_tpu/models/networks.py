"""Actor/critic networks for the on-device learners.

The reference repo ships no models — published results came from external
SB3/rl-zoo SAC & TD3 (reference README.md:57-59) whose default networks are
2x256 MLPs.  These are their JAX twins, sized so the parameter PyTree is tiny
(~1e5 params) and replicated across the device mesh; only the env batch and
replay shard (SURVEY.md §2, parallelism table).

All dense layers hit the MXU; obs dims are small (7-17) so the networks are
deliberately batch-heavy: train with thousands of lanes so the (B, 256)
matmuls tile well.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

LOG_STD_MIN = -20.0
LOG_STD_MAX = 2.0


class MLP(nn.Module):
    features: Sequence[int]
    activate_final: bool = False

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = nn.relu(x)
        return x


class TanhGaussianActor(nn.Module):
    """SAC actor: tanh-squashed diagonal Gaussian over [-1, 1]^action_dim."""

    action_dim: int = 2
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        h = MLP(self.hidden, activate_final=True)(obs)
        mean = nn.Dense(self.action_dim)(h)
        log_std = nn.Dense(self.action_dim)(h)
        log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
        return mean, log_std


def sample_tanh_gaussian(key, mean, log_std):
    """Reparameterized sample + log-prob with the tanh change of variables."""
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    pre = mean + std * eps
    action = jnp.tanh(pre)
    # N(pre; mean, std) log-density minus log|d tanh/d pre|.
    logp = -0.5 * (eps**2 + 2 * log_std + jnp.log(2 * jnp.pi))
    # log(1 - tanh(x)^2) = 2*(log2 - x - softplus(-2x)), numerically stable.
    logp = logp - 2 * (jnp.log(2.0) - pre - jax.nn.softplus(-2 * pre))
    return action, logp.sum(-1)


class DeterministicActor(nn.Module):
    """TD3 actor: tanh-bounded deterministic policy."""

    action_dim: int = 2
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        h = MLP(self.hidden, activate_final=True)(obs)
        return jnp.tanh(nn.Dense(self.action_dim)(h))


class DoubleCritic(nn.Module):
    """Twin Q networks evaluated in one call (clipped double-Q trick)."""

    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        q1 = MLP((*self.hidden, 1))(x)
        q2 = MLP((*self.hidden, 1))(x)
        return jnp.squeeze(q1, -1), jnp.squeeze(q2, -1)


class GaussianActorValue(nn.Module):
    """PPO actor-critic: diagonal Gaussian policy with STATE-INDEPENDENT
    log_std (SB3 MlpPolicy default) + a separate value MLP, one module so a
    single params tree serves both heads (SB3 shares the optimizer, not the
    torso, under its default net_arch for Box spaces)."""

    action_dim: int = 2
    hidden: Sequence[int] = (64, 64)   # SB3 PPO MlpPolicy default width

    def setup(self):
        # Explicit names keep the param tree identical to the original
        # @nn.compact layout (checkpoint compatibility).
        self.torso = MLP(self.hidden, activate_final=True, name="MLP_0")
        self.mean_head = nn.Dense(self.action_dim, name="Dense_0")
        self.log_std = self.param(
            "log_std", nn.initializers.zeros, (self.action_dim,))
        self.vf = MLP(self.hidden, activate_final=True, name="vf")
        self.vhead = nn.Dense(1, name="vhead")

    def __call__(self, obs):
        mean = self.mean_head(self.torso(obs))
        return mean, jnp.broadcast_to(self.log_std, mean.shape), self.value(obs)

    def value(self, obs):
        """Value tower only — the PPO rollout bootstraps V(final_obs) each
        step and the actor tower's outputs there would be discarded."""
        return self.vhead(self.vf(obs))[..., 0]


def gaussian_logp(action, mean, log_std):
    """Diagonal Gaussian log-density (no squash; PPO clips at the env)."""
    z = (action - mean) * jnp.exp(-log_std)
    return jnp.sum(-0.5 * z**2 - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
