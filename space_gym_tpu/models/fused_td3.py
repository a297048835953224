"""Fused TD3 update: the K-minibatch learner phase as ONE Pallas TPU kernel.

Twin of models/fused_sac.py for the second algorithm the reference's
published results used (reference README.md:36: GoalContinuous2P "easily
solved by SAC and TD3 with default hyperparameters").  Same TPU design:
params + Adam moments + BOTH target networks live as two VMEM-resident
matrices for the whole K-update loop; per-sample small tensors are
FEATURE-MAJOR (f, BT); minibatch tiles DMA straight from the lanes-minor
replay ring via scalar-prefetched row indices.

TD3-specific semantics (mirrors models/td3.py::_update_once exactly):
* critic target uses the TARGET ACTOR + clipped Gaussian smoothing noise,
  next_a = clip(tanh-actor_t(x') + clip(eps*std, +-c), -1, 1);
* actor loss is -q1 (critic 0 only, no min, no entropy);
* actor Adam step + BOTH polyak updates happen only every `policy_delay`-th
  update (the gradient computed on other steps is discarded — identical to
  not computing it);
* actor Adam count advances only on applied steps (optax-equivalent).

`update_k_reference` is the pure-jax autodiff oracle used by the tests.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_sac import _dg, _dot
from .replay import pack_slab, replay_cols

IN1 = 128     # padded first-layer input width
AH = 2        # actor head rows (deterministic: action_dim only)
B1, B2, EPS = 0.9, 0.999, 1e-8  # optax.adam defaults


class PackedParams(NamedTuple):
    """TD3 learner state in kernel layout (all f32)."""

    a_w1: jax.Array    # (IN1, H)
    a_b1: jax.Array    # (H,)
    a_w2: jax.Array    # (H, H)
    a_b2: jax.Array    # (H,)
    a_wh: jax.Array    # (H, AH)
    a_bh: jax.Array    # (AH,)
    ta_w1: jax.Array   # target actor mirror
    ta_b1: jax.Array
    ta_w2: jax.Array
    ta_b2: jax.Array
    ta_wh: jax.Array
    ta_bh: jax.Array
    c_w1: jax.Array    # (2, IN1, H)
    c_b1: jax.Array
    c_w2: jax.Array
    c_b2: jax.Array
    c_w3: jax.Array    # (2, H)
    c_b3: jax.Array    # (2,)
    t_w1: jax.Array    # target critics
    t_b1: jax.Array
    t_w2: jax.Array
    t_b2: jax.Array
    t_w3: jax.Array
    t_b3: jax.Array


ACTOR_FIELDS = ("a_w1", "a_b1", "a_w2", "a_b2", "a_wh", "a_bh")
TACTOR_FIELDS = ("ta_w1", "ta_b1", "ta_w2", "ta_b2", "ta_wh", "ta_bh")
CRITIC_FIELDS = ("c_w1", "c_b1", "c_w2", "c_b2", "c_w3", "c_b3")
TARGET_FIELDS = ("t_w1", "t_b1", "t_w2", "t_b2", "t_w3", "t_b3")


class PackedAdam(NamedTuple):
    m: PackedParams
    v: PackedParams
    count: jax.Array    # () int32 critic Adam count == n_updates
    count_a: jax.Array  # () int32 actor Adam count (delayed steps only)


# ------------------------------------------------------------ flax <-> pack --

def _actor_leaves(actor_params):
    p = actor_params["params"]
    mlp = p["MLP_0"]
    return (
        mlp["Dense_0"]["kernel"], mlp["Dense_0"]["bias"],
        mlp["Dense_1"]["kernel"], mlp["Dense_1"]["bias"],
        p["Dense_0"]["kernel"], p["Dense_0"]["bias"],
    )


def _critic_leaves(critic_params):
    p = critic_params["params"]
    return [
        tuple(p[f"MLP_{i}"][f"Dense_{j}"][k] for j in range(3)
              for k in ("kernel", "bias"))
        for i in (0, 1)
    ]


from types import SimpleNamespace as _SimpleNamespace


def _build_width(h: int):
    """Width-dependent layout + kernel functions closed over hidden width
    `h` (VERDICT r3 item 4; see fused_sac._build_width).  build(256) is the
    flagship layout, re-exported at module level."""
    H = h
    def _pad1(w):
        return jnp.zeros((IN1, H), jnp.float32).at[: w.shape[0]].set(w)


    def _pack_critic(leaves):
        (w1a, b1a, w2a, b2a, w3a, b3a), (w1b, b1b, w2b, b2b, w3b, b3b) = leaves
        return (
            jnp.stack([_pad1(w1a), _pad1(w1b)]),
            jnp.stack([b1a, b1b]),
            jnp.stack([w2a, w2b]),
            jnp.stack([b2a, b2b]),
            jnp.stack([w3a[:, 0], w3b[:, 0]]),
            jnp.stack([b3a[0], b3b[0]]),
        )


    def pack_params(actor, target_actor, critic, target_critic) -> PackedParams:
        def actor_group(tree):
            w1, b1, w2, b2, wh, bh = _actor_leaves(tree)
            return (_pad1(w1), b1, w2, b2, wh, bh)

        a = actor_group(actor)
        ta = actor_group(target_actor)
        c = _pack_critic(_critic_leaves(critic))
        t = _pack_critic(_critic_leaves(target_critic))
        return PackedParams(*(a + ta + c + t))


    def unpack_params(packed: PackedParams, actor_tpl, critic_tpl):
        d_a = actor_tpl["params"]["MLP_0"]["Dense_0"]["kernel"].shape[0]
        d_c = critic_tpl["params"]["MLP_0"]["Dense_0"]["kernel"].shape[0]

        def actor_tree(w1, b1, w2, b2, wh, bh):
            return {"params": {
                "MLP_0": {
                    "Dense_0": {"kernel": w1[:d_a], "bias": b1},
                    "Dense_1": {"kernel": w2, "bias": b2},
                },
                "Dense_0": {"kernel": wh, "bias": bh},
            }}

        def critic_tree(w1, b1, w2, b2, w3, b3):
            return {"params": {
                f"MLP_{i}": {
                    "Dense_0": {"kernel": w1[i, :d_c], "bias": b1[i]},
                    "Dense_1": {"kernel": w2[i], "bias": b2[i]},
                    "Dense_2": {"kernel": w3[i][:, None], "bias": b3[i][None]},
                }
                for i in (0, 1)
            }}

        actor = actor_tree(*(getattr(packed, f) for f in ACTOR_FIELDS))
        tactor = actor_tree(*(getattr(packed, f) for f in TACTOR_FIELDS))
        critic = critic_tree(*(getattr(packed, f) for f in CRITIC_FIELDS))
        target = critic_tree(*(getattr(packed, f) for f in TARGET_FIELDS))
        return actor, tactor, critic, target


    def adam_init(packed: PackedParams) -> PackedAdam:
        zeros = PackedParams(*[jnp.zeros_like(x) for x in packed])
        z32 = jnp.asarray(0, jnp.int32)
        return PackedAdam(m=zeros, v=zeros, count=z32, count_a=z32)


    # ------------------------------------------------------ pure-jax reference --

    def _adam(g, m, v, lr, t):
        m = B1 * m + (1 - B1) * g
        v = B2 * v + (1 - B2) * g * g
        # Scalar-folded bias corrections (== lr*(m/bc1)/(sqrt(v/bc2)+EPS)); the
        # kernel applies the same form — see fused_sac._adam.
        sb2 = jnp.sqrt(1 - B2**t)
        return -(lr * sb2 / (1 - B1**t)) * m / (jnp.sqrt(v) + EPS * sb2), m, v


    def _actor_fwd_ref(w1, b1, w2, b2, wh, bh, x):
        h1 = jnp.maximum(x @ w1 + b1, 0.0)
        h2 = jnp.maximum(h1 @ w2 + b2, 0.0)
        return jnp.tanh(h2 @ wh + bh)


    def _critic_fwd_ref(w1, b1, w2, b2, w3, b3, x):
        h1 = jnp.maximum(x @ w1 + b1, 0.0)
        h2 = jnp.maximum(h1 @ w2 + b2, 0.0)
        return h2 @ w3 + b3


    def _pad_x(obs, act, obs_dim):
        b = obs.shape[0]
        x = jnp.zeros((b, IN1), jnp.float32)
        x = x.at[:, :obs_dim].set(obs[:, :obs_dim])
        if act is not None:
            x = x.at[:, obs_dim : obs_dim + act.shape[1]].set(act)
        return x


    def update_k_reference(packed: PackedParams, adam: PackedAdam, batches, noises,
                           obs_dim: int, gamma: float, tau: float, lr: float,
                           smooth_std: float = 0.2, smooth_clip: float = 0.5,
                           policy_delay: int = 2):
        """K sequential TD3 updates in plain jax (autodiff) on the packed layout —
        the oracle for the Pallas kernel (mirrors models/td3.py::_update_once).
        batches: Transition with leading (K, B); noises: (K, B, adim) normals."""

        def one(carry, inp):
            p, ad = carry
            batch, noise = inp
            t_c = (ad.count + 1).astype(jnp.float32)
            obs = _pad_x(batch.obs, batch.action, obs_dim)
            obs_only = _pad_x(batch.obs, None, obs_dim)
            nobs_only = _pad_x(batch.next_obs, None, obs_dim)

            # -- critic loss (target actor + smoothing) --
            eps = jnp.clip(smooth_std * noise, -smooth_clip, smooth_clip)
            na = jnp.clip(
                _actor_fwd_ref(*(getattr(p, f) for f in TACTOR_FIELDS), nobs_only)
                + eps, -1.0, 1.0)
            nx = _pad_x(batch.next_obs, na, obs_dim)
            q1t = _critic_fwd_ref(p.t_w1[0], p.t_b1[0], p.t_w2[0], p.t_b2[0],
                                  p.t_w3[0], p.t_b3[0], nx)
            q2t = _critic_fwd_ref(p.t_w1[1], p.t_b1[1], p.t_w2[1], p.t_b2[1],
                                  p.t_w3[1], p.t_b3[1], nx)
            tq = jax.lax.stop_gradient(
                batch.reward + gamma * batch.discount * jnp.minimum(q1t, q2t))

            def closs(cw):
                w1, b1, w2, b2, w3, b3 = cw
                q1 = _critic_fwd_ref(w1[0], b1[0], w2[0], b2[0], w3[0], b3[0], obs)
                q2 = _critic_fwd_ref(w1[1], b1[1], w2[1], b2[1], w3[1], b3[1], obs)
                return ((q1 - tq) ** 2 + (q2 - tq) ** 2).mean()

            cw = tuple(getattr(p, f) for f in CRITIC_FIELDS)
            closs_val, cg = jax.value_and_grad(closs)(cw)
            new_m, new_v = dict(ad.m._asdict()), dict(ad.v._asdict())
            new_c = []
            for f, g in zip(CRITIC_FIELDS, cg):
                upd, m_, v_ = _adam(g, getattr(ad.m, f), getattr(ad.v, f), lr, t_c)
                new_c.append(getattr(p, f) + upd)
                new_m[f], new_v[f] = m_, v_
            p = p._replace(**dict(zip(CRITIC_FIELDS, new_c)))

            # -- actor (delayed apply; grads vs the UPDATED critic 0) --
            do_actor = jnp.mod(ad.count, policy_delay) == 0
            t_a = (ad.count_a + 1).astype(jnp.float32)

            def aloss(aw):
                w1, b1, w2, b2, wh, bh = aw
                a = _actor_fwd_ref(w1, b1, w2, b2, wh, bh, obs_only)
                ax = _pad_x(batch.obs, a, obs_dim)
                q1 = _critic_fwd_ref(p.c_w1[0], p.c_b1[0], p.c_w2[0], p.c_b2[0],
                                     p.c_w3[0], p.c_b3[0], ax)
                return -q1.mean()

            aw = tuple(getattr(p, f) for f in ACTOR_FIELDS)
            aloss_val, ag = jax.value_and_grad(aloss)(aw)
            for f, g in zip(ACTOR_FIELDS, ag):
                upd, m_, v_ = _adam(g, getattr(ad.m, f), getattr(ad.v, f), lr, t_a)
                new_p = getattr(p, f) + upd
                sel = lambda n, o: jnp.where(do_actor, n, o)
                p = p._replace(**{f: sel(new_p, getattr(p, f))})
                new_m[f] = sel(m_, new_m[f])
                new_v[f] = sel(v_, new_v[f])

            # -- polyak (both targets, delayed) --
            pol = lambda tgt, src: jnp.where(
                do_actor, tgt * (1 - tau) + src * tau, tgt)
            p = p._replace(**{
                tf: pol(getattr(p, tf), getattr(p, sf))
                for tf, sf in list(zip(TACTOR_FIELDS, ACTOR_FIELDS))
                + list(zip(TARGET_FIELDS, CRITIC_FIELDS))
            })
            ad = PackedAdam(
                m=PackedParams(**new_m), v=PackedParams(**new_v),
                count=ad.count + 1,
                count_a=ad.count_a + do_actor.astype(jnp.int32),
            )
            return (p, ad), (closs_val, aloss_val)

        (p, ad), (closs, aloss) = jax.lax.scan(one, (packed, adam), (batches, noises))
        return p, ad, closs, aloss


    # ---------------------------------------------------------- Pallas kernel --
    #
    # WMAT (2312, 256): [a_w1 | a_w2 | ta_w1 | ta_w2 | c0 w1 w2 | c1 w1 w2 |
    #                    t0 | t1 | a_wh^T (2) | ta_wh^T (2) | pad]
    # VEC  (24, 256): biases / w3 rows / misc (see V_* below)

    R_AW1 = 0
    R_AW2 = IN1
    R_TAW1 = R_AW2 + H
    R_TAW2 = R_TAW1 + IN1
    R_CW1 = (R_TAW2 + H, R_TAW2 + H + IN1 + H)
    R_TW1 = (R_CW1[1] + IN1 + H, R_CW1[1] + 2 * (IN1 + H))
    R_AWH = R_TW1[1] + IN1 + H       # 2304
    R_TAWH = R_AWH + AH              # 2306
    WROWS = -(-(R_TAWH + AH) // 8) * 8      # pad to 8 (2312 at H=256)
    V_AB1, V_AB2, V_TAB1, V_TAB2 = 0, 1, 2, 3
    V_CB1, V_CB2 = (4, 5), (6, 7)
    V_TB1, V_TB2 = (8, 9), (10, 11)
    V_CW3, V_TW3 = (12, 13), (14, 15)
    V_MISC = 16
    VROWS = 24
    M_ABH = (0, AH)
    M_TABH = (AH, 2 * AH)
    M_CB3 = (2 * AH, 2 * AH + 2)
    M_TB3 = (2 * AH + 2, 2 * AH + 4)
    # grad scratch rows: actor (384) | critic 0 (384) | critic 1 (384) | head (2)
    G_AW1 = 0
    G_CW1 = (R_AW2 + H, R_AW2 + H + IN1 + H)
    G_AWH = G_CW1[1] + IN1 + H       # 1152
    GROWS = -(-(G_AWH + AH) // 8) * 8       # pad to 8 (1160 at H=256)
    (S_GAMMA, S_TAU, S_LR, S_STD, S_CLIP, S_COUNT0, S_COUNTA0, S_INVB,
     S_DELAY) = range(9)


    def pack_wmat(p: PackedParams):
        w = jnp.zeros((WROWS, H), jnp.float32)
        w = w.at[R_AW1:R_AW1 + IN1].set(p.a_w1)
        w = w.at[R_AW2:R_AW2 + H].set(p.a_w2)
        w = w.at[R_TAW1:R_TAW1 + IN1].set(p.ta_w1)
        w = w.at[R_TAW2:R_TAW2 + H].set(p.ta_w2)
        for c in (0, 1):
            w = w.at[R_CW1[c]:R_CW1[c] + IN1].set(p.c_w1[c])
            w = w.at[R_CW1[c] + IN1:R_CW1[c] + IN1 + H].set(p.c_w2[c])
            w = w.at[R_TW1[c]:R_TW1[c] + IN1].set(p.t_w1[c])
            w = w.at[R_TW1[c] + IN1:R_TW1[c] + IN1 + H].set(p.t_w2[c])
        w = w.at[R_AWH:R_AWH + AH].set(p.a_wh.T)
        w = w.at[R_TAWH:R_TAWH + AH].set(p.ta_wh.T)
        v = jnp.zeros((VROWS, H), jnp.float32)
        v = v.at[V_AB1].set(p.a_b1).at[V_AB2].set(p.a_b2)
        v = v.at[V_TAB1].set(p.ta_b1).at[V_TAB2].set(p.ta_b2)
        for c in (0, 1):
            v = v.at[V_CB1[c]].set(p.c_b1[c]).at[V_CB2[c]].set(p.c_b2[c])
            v = v.at[V_TB1[c]].set(p.t_b1[c]).at[V_TB2[c]].set(p.t_b2[c])
            v = v.at[V_CW3[c]].set(p.c_w3[c]).at[V_TW3[c]].set(p.t_w3[c])
        misc = jnp.zeros((H,), jnp.float32)
        misc = misc.at[M_ABH[0]:M_ABH[1]].set(p.a_bh)
        misc = misc.at[M_TABH[0]:M_TABH[1]].set(p.ta_bh)
        misc = misc.at[M_CB3[0]:M_CB3[1]].set(p.c_b3)
        misc = misc.at[M_TB3[0]:M_TB3[1]].set(p.t_b3)
        v = v.at[V_MISC].set(misc)
        return w, v


    def unpack_wmat(w, v) -> PackedParams:
        misc = v[V_MISC]
        return PackedParams(
            a_w1=w[R_AW1:R_AW1 + IN1], a_b1=v[V_AB1],
            a_w2=w[R_AW2:R_AW2 + H], a_b2=v[V_AB2],
            a_wh=w[R_AWH:R_AWH + AH].T, a_bh=misc[M_ABH[0]:M_ABH[1]],
            ta_w1=w[R_TAW1:R_TAW1 + IN1], ta_b1=v[V_TAB1],
            ta_w2=w[R_TAW2:R_TAW2 + H], ta_b2=v[V_TAB2],
            ta_wh=w[R_TAWH:R_TAWH + AH].T, ta_bh=misc[M_TABH[0]:M_TABH[1]],
            c_w1=jnp.stack([w[R_CW1[c]:R_CW1[c] + IN1] for c in (0, 1)]),
            c_b1=jnp.stack([v[V_CB1[c]] for c in (0, 1)]),
            c_w2=jnp.stack([w[R_CW1[c] + IN1:R_CW1[c] + IN1 + H] for c in (0, 1)]),
            c_b2=jnp.stack([v[V_CB2[c]] for c in (0, 1)]),
            c_w3=jnp.stack([v[V_CW3[c]] for c in (0, 1)]),
            c_b3=misc[M_CB3[0]:M_CB3[1]],
            t_w1=jnp.stack([w[R_TW1[c]:R_TW1[c] + IN1] for c in (0, 1)]),
            t_b1=jnp.stack([v[V_TB1[c]] for c in (0, 1)]),
            t_w2=jnp.stack([w[R_TW1[c] + IN1:R_TW1[c] + IN1 + H] for c in (0, 1)]),
            t_b2=jnp.stack([v[V_TB2[c]] for c in (0, 1)]),
            t_w3=jnp.stack([v[V_TW3[c]] for c in (0, 1)]),
            t_b3=misc[M_TB3[0]:M_TB3[1]],
        )


    class FusedState(NamedTuple):
        """Kernel-layout TD3 learner state cached across train_iters."""

        w: jax.Array
        vec: jax.Array
        mw: jax.Array
        mvec: jax.Array
        vw: jax.Array
        vvec: jax.Array
        count: jax.Array    # critic Adam count == n_updates
        count_a: jax.Array  # actor Adam count


    def fused_init(packed: PackedParams, adam: PackedAdam) -> FusedState:
        w, vec = pack_wmat(packed)
        mw, mvec = pack_wmat(adam.m)
        vw, vvec = pack_wmat(adam.v)
        return FusedState(w=w, vec=vec, mw=mw, mvec=mvec, vw=vw, vvec=vvec,
                          count=adam.count, count_a=adam.count_a)


    def fused_unpack(f: FusedState):
        return unpack_wmat(f.w, f.vec), PackedAdam(
            m=unpack_wmat(f.mw, f.mvec), v=unpack_wmat(f.vw, f.vvec),
            count=f.count, count_a=f.count_a)


    def unpack_actor(w, vec, obs_dim: int, action_dim: int = 2):
        """Flax DeterministicActor tree straight from the wmat rows."""
        misc = vec[V_MISC]
        return {"params": {
            "MLP_0": {
                "Dense_0": {"kernel": w[R_AW1:R_AW1 + obs_dim], "bias": vec[V_AB1]},
                "Dense_1": {"kernel": w[R_AW2:R_AW2 + H], "bias": vec[V_AB2]},
            },
            "Dense_0": {"kernel": w[R_AWH:R_AWH + action_dim].T,
                        "bias": misc[M_ABH[0]:M_ABH[0] + action_dim]},
        }}


    def _make_kernel(obs_dim: int, n_tiles: int, policy_delay: int,
                     mm_bf16: bool = True):
        """Grid (K, 2, T).  Phase 0: critic grads + Adam; phase 1: actor fwd +
        loss always, backward/Adam/polyak only on delayed steps.  Layout rules
        as in fused_sac (feature-major small tensors, bf16 post-relu, critic
        first-layer biases folded into the f32 [action|ones] matmul against the
        working w rows at r0+obs_dim+2 — see fused_sac._make_kernel)."""
        o0, n0, a0, rr, dd, _ = replay_cols(obs_dim, 2)
        one0 = dd + 1  # constant-1.0 row (replay_ones_row)

        def kernel(scal, data, noise,
                   _w_in, _vec_in, _mw_in, _vw_in, _mvec_in, _vvec_in,
                   w_ref, vec_ref, mw_ref, vw_ref, mvec_ref, vvec_ref,
                   losses_ref, gw, gvec, acc):
            mmd = jnp.bfloat16 if mm_bf16 else None
            adt = jnp.bfloat16 if mm_bf16 else jnp.float32
            dot = lambda a, b: _dot(a, b, mm_dtype=mmd)
            dg = lambda a, b, ca, cb: _dg(a, b, ca, cb, mm_dtype=mmd)
            relu = lambda z: jnp.maximum(z, 0.0).astype(adt)
            ph = pl.program_id(1)
            t = pl.program_id(2)
            k_id = pl.program_id(0)
            last_k = k_id == pl.num_programs(0) - 1
            kf = k_id.astype(jnp.float32)

            gamma, tau, lr = scal[0, S_GAMMA], scal[0, S_TAU], scal[0, S_LR]
            sstd, sclip, invb = scal[0, S_STD], scal[0, S_CLIP], scal[0, S_INVB]
            n_upd = scal[0, S_COUNT0] + kf          # n_updates BEFORE update k
            delay = scal[0, S_DELAY]
            # do_actor = (n_updates % delay == 0), f32 modular arithmetic
            do_actor = (n_upd - delay * jnp.floor(n_upd / delay)) < 0.5
            tstep_c = n_upd + 1.0
            # actor count: applied steps among 0..k (k included) given the phase
            off = jnp.ceil(scal[0, S_COUNT0] / delay) * delay - scal[0, S_COUNT0]
            tstep_a = scal[0, S_COUNTA0] + jnp.floor((kf - off) / delay) + 1.0
            logb = lambda b: jnp.float32(math.log(b))
            bca1 = 1.0 - jnp.exp(tstep_a * logb(B1))
            bca2 = 1.0 - jnp.exp(tstep_a * logb(B2))
            bcc1 = 1.0 - jnp.exp(tstep_c * logb(B1))
            bcc2 = 1.0 - jnp.exp(tstep_c * logb(B2))
            # Scalar-folded Adam bias corrections (see fused_sac): per-element
            # update is -a_lr*m/(sqrt(v)+c_eps); two scalar pairs (actor delayed
            # count vs critic count).
            sba2, sbc2 = jnp.sqrt(bca2), jnp.sqrt(bcc2)
            alr_a, ceps_a = lr * sba2 / bca1, EPS * sba2
            alr_c, ceps_c = lr * sbc2 / bcc1, EPS * sbc2

            # Critic/target first-layer bias fold (see fused_sac._bias_in/_out):
            # canonical storage stays the vec rows; the kernel works on the w
            # rows at r0+obs_dim+2 contracted against the replay ones row.
            @pl.when((k_id == 0) & (ph == 0) & (t == 0))
            def _bias_in():
                for c in (0, 1):
                    rb = R_CW1[c] + obs_dim + 2
                    tb = R_TW1[c] + obs_dim + 2
                    w_ref[rb:rb + 1, :] = vec_ref[V_CB1[c]:V_CB1[c] + 1, :]
                    w_ref[tb:tb + 1, :] = vec_ref[V_TB1[c]:V_TB1[c] + 1, :]
                    mw_ref[rb:rb + 1, :] = mvec_ref[V_CB1[c]:V_CB1[c] + 1, :]
                    vw_ref[rb:rb + 1, :] = vvec_ref[V_CB1[c]:V_CB1[c] + 1, :]
                    mvec_ref[V_CB1[c]:V_CB1[c] + 1, :] = jnp.zeros((1, H), jnp.float32)
                    vvec_ref[V_CB1[c]:V_CB1[c] + 1, :] = jnp.zeros((1, H), jnp.float32)

            @pl.when(t == 0)
            def _zero():
                gw[:] = jnp.zeros_like(gw)
                gvec[:] = jnp.zeros_like(gvec)
                acc[0] = 0.0

            def actor_fwd(x, r1, r2, rh, vb1, vb2, mb):
                z1 = dg(x, w_ref[r1:r1 + obs_dim], 0, 0) + vec_ref[vb1:vb1 + 1, :]
                h1 = relu(z1)
                z2 = dot(h1, w_ref[r2:r2 + H]) + vec_ref[vb2:vb2 + 1, :]
                h2 = relu(z2)
                head = dg(w_ref[rh:rh + AH], h2, 1, 1)           # (2, BT) f32
                head = head + jnp.transpose(
                    vec_ref[V_MISC:V_MISC + 1, mb[0]:mb[1]], (1, 0))
                return jnp.tanh(head), z1, h1, z2, h2

            def critic_fwd(x, a1, r0, vb2, vw3, b3col):
                # a1: (3, BT) f32 [action(2) | ones]; the ones row applies the
                # first-layer bias inside the matmul accumulator.
                z1 = dg(x, w_ref[r0:r0 + obs_dim], 0, 0)
                z1 = z1 + _dg(a1, w_ref[r0 + obs_dim:r0 + obs_dim + 3], 0, 0)
                h1 = relu(z1)
                z2 = dot(h1, w_ref[r0 + IN1:r0 + IN1 + H]) + vec_ref[vb2:vb2 + 1, :]
                h2 = relu(z2)
                q = dg(vec_ref[vw3:vw3 + 1, :], h2, 1, 1)        # (1, BT) f32
                return q + vec_ref[V_MISC:V_MISC + 1, b3col:b3col + 1], z1, h1, z2, h2

            def adam_rows(ref_w, ref_m, ref_v, ref_g, lo, hi, alr, ceps, glo):
                g = ref_g[glo:glo + (hi - lo), :]
                m = B1 * ref_m[lo:hi, :] + (1 - B1) * g
                v = B2 * ref_v[lo:hi, :] + (1 - B2) * g * g
                ref_m[lo:hi, :] = m
                ref_v[lo:hi, :] = v
                ref_w[lo:hi, :] = ref_w[lo:hi, :] - alr * m / (jnp.sqrt(v) + ceps)

            od = obs_dim

            # ---------------------------------------------------- phase 0: critic
            @pl.when(ph == 0)
            def _critic_phase():
                d0 = data[0]
                x_o = d0[o0:o0 + od].astype(adt)
                x_n = d0[n0:n0 + od].astype(adt)
                ones = d0[one0:one0 + 1]                         # (1, BT) = 1.0
                a1_t = jnp.concatenate([d0[a0:a0 + 2], ones], axis=0)  # (3, BT)
                r = d0[rr:rr + 1]
                d = d0[dd:dd + 1]
                eps = jnp.clip(noise[0][0:2] * sstd, -sclip, sclip)

                ta, *_ = actor_fwd(x_n, R_TAW1, R_TAW2, R_TAWH,
                                   V_TAB1, V_TAB2, M_TABH)
                na1 = jnp.concatenate([jnp.clip(ta + eps, -1.0, 1.0), ones], axis=0)
                q1t, *_ = critic_fwd(x_n, na1, R_TW1[0], V_TB2[0],
                                     V_TW3[0], M_TB3[0])
                q2t, *_ = critic_fwd(x_n, na1, R_TW1[1], V_TB2[1],
                                     V_TW3[1], M_TB3[0] + 1)
                tq = r + gamma * d * jnp.minimum(q1t, q2t)

                loss = 0.0
                for c in (0, 1):
                    q, z1, h1, z2, h2 = critic_fwd(
                        x_o, a1_t, R_CW1[c], V_CB2[c], V_CW3[c],
                        M_CB3[0] + c)
                    dq = 2.0 * (q - tq) * invb                   # (1, BT)
                    loss = loss + jnp.sum((q - tq) ** 2) * invb
                    gvec[V_CW3[c]:V_CW3[c] + 1, :] += dg(dq, h2, 1, 0)
                    gvec[V_MISC:V_MISC + 1, M_CB3[0] + c:M_CB3[0] + c + 1] += (
                        jnp.sum(dq)[None, None])
                    dh2 = _dg(dq, vec_ref[V_CW3[c]:V_CW3[c] + 1, :], 0, 0)
                    dz2 = jnp.where(z2 > 0, dh2, 0.0)
                    gw[G_CW1[c] + IN1:G_CW1[c] + IN1 + H, :] += dg(h1, dz2, 0, 0)
                    gvec[V_CB2[c]:V_CB2[c] + 1, :] += jnp.sum(dz2, axis=0, keepdims=True)
                    dh1 = dg(dz2, w_ref[R_CW1[c] + IN1:R_CW1[c] + IN1 + H], 1, 1)
                    dz1 = jnp.where(z1 > 0, dh1, 0.0)
                    gw[G_CW1[c]:G_CW1[c] + obs_dim, :] += dg(x_o, dz1, 1, 0)
                    # ones-row grad == bias grad; rides this matmul
                    gw[G_CW1[c] + obs_dim:G_CW1[c] + obs_dim + 3, :] += _dg(
                        a1_t, dz1, 1, 0)
                acc[0] += loss

                @pl.when(t == n_tiles - 1)
                def _apply_critic():
                    for c in (0, 1):
                        adam_rows(w_ref, mw_ref, vw_ref, gw,
                                  R_CW1[c], R_CW1[c] + IN1 + H, alr_c, ceps_c,
                                  glo=G_CW1[c])
                    adam_rows(vec_ref, mvec_ref, vvec_ref, gvec,
                              V_CB1[0], V_CW3[1] + 1, alr_c, ceps_c, glo=V_CB1[0])
                    g = gvec[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]]
                    m = B1 * mvec_ref[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]] + (1 - B1) * g
                    v = B2 * vvec_ref[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]] + (1 - B2) * g * g
                    mvec_ref[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]] = m
                    vvec_ref[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]] = v
                    vec_ref[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]] = (
                        vec_ref[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]]
                        - alr_c * m / (jnp.sqrt(v) + ceps_c))
                    losses_ref[0, 0:1, 0:1] = jnp.full((1, 1), acc[0])

            # ----------------------------------------------------- phase 1: actor
            @pl.when(ph == 1)
            def _actor_phase():
                x_o = data[0][o0:o0 + od].astype(adt)
                ones = data[0][one0:one0 + 1]                    # (1, BT) = 1.0

                a, z1a, h1a, z2a, h2a = actor_fwd(
                    x_o, R_AW1, R_AW2, R_AWH, V_AB1, V_AB2, M_ABH)
                a1 = jnp.concatenate([a, ones], axis=0)          # (3, BT)
                q1, z1, h1, z2, h2 = critic_fwd(
                    x_o, a1, R_CW1[0], V_CB2[0], V_CW3[0], M_CB3[0])
                acc[0] += -jnp.sum(q1) * invb

                @pl.when(do_actor)
                def _actor_bwd():
                    # dL/da through critic 0 only; dq = -invb is a constant row
                    dh2 = -invb * vec_ref[V_CW3[0]:V_CW3[0] + 1, :]  # (1, H)
                    dz2 = jnp.where(z2 > 0, dh2, 0.0)                # (BT, H)
                    dh1 = dg(dz2, w_ref[R_CW1[0] + IN1:R_CW1[0] + IN1 + H], 1, 1)
                    dz1 = jnp.where(z1 > 0, dh1, 0.0)
                    da = dg(w_ref[R_CW1[0] + obs_dim:R_CW1[0] + obs_dim + 2],
                            dz1, 1, 1)                               # (2, BT)
                    ghead = da * (1.0 - a * a)                       # tanh bwd
                    gw[G_AWH:G_AWH + AH, :] += dg(ghead, h2a, 1, 0)
                    gvec[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]] += jnp.transpose(
                        jnp.sum(ghead, axis=1, keepdims=True), (1, 0))
                    dh2a = dg(ghead, w_ref[R_AWH:R_AWH + AH], 0, 0)
                    dz2a = jnp.where(z2a > 0, dh2a, 0.0)
                    gw[G_AW1 + IN1:G_AW1 + IN1 + H, :] += dg(h1a, dz2a, 0, 0)
                    gvec[V_AB2:V_AB2 + 1, :] += jnp.sum(dz2a, axis=0, keepdims=True)
                    dh1a = dg(dz2a, w_ref[R_AW2:R_AW2 + H], 1, 1)
                    dz1a = jnp.where(z1a > 0, dh1a, 0.0)
                    gw[G_AW1:G_AW1 + obs_dim, :] += dg(x_o, dz1a, 1, 0)
                    gvec[V_AB1:V_AB1 + 1, :] += jnp.sum(dz1a, axis=0, keepdims=True)

                @pl.when((t == n_tiles - 1) & do_actor)
                def _apply_actor():
                    adam_rows(w_ref, mw_ref, vw_ref, gw, R_AW1, R_AW1 + IN1,
                              alr_a, ceps_a, glo=G_AW1)
                    adam_rows(w_ref, mw_ref, vw_ref, gw, R_AW2, R_AW2 + H,
                              alr_a, ceps_a, glo=G_AW1 + IN1)
                    adam_rows(w_ref, mw_ref, vw_ref, gw, R_AWH, R_AWH + AH,
                              alr_a, ceps_a, glo=G_AWH)
                    adam_rows(vec_ref, mvec_ref, vvec_ref, gvec, V_AB1, V_AB2 + 1,
                              alr_a, ceps_a, glo=V_AB1)
                    g = gvec[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]]
                    m = B1 * mvec_ref[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]] + (1 - B1) * g
                    v = B2 * vvec_ref[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]] + (1 - B2) * g * g
                    mvec_ref[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]] = m
                    vvec_ref[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]] = v
                    vec_ref[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]] = (
                        vec_ref[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]]
                        - alr_a * m / (jnp.sqrt(v) + ceps_a))
                    # polyak: BOTH targets <- online (delayed, post-update)
                    w_ref[R_TAW1:R_TAW1 + IN1, :] = (
                        (1 - tau) * w_ref[R_TAW1:R_TAW1 + IN1, :]
                        + tau * w_ref[R_AW1:R_AW1 + IN1, :])
                    w_ref[R_TAW2:R_TAW2 + H, :] = (
                        (1 - tau) * w_ref[R_TAW2:R_TAW2 + H, :]
                        + tau * w_ref[R_AW2:R_AW2 + H, :])
                    w_ref[R_TAWH:R_TAWH + AH, :] = (
                        (1 - tau) * w_ref[R_TAWH:R_TAWH + AH, :]
                        + tau * w_ref[R_AWH:R_AWH + AH, :])
                    w_ref[R_TW1[0]:R_TW1[1] + IN1 + H, :] = (
                        (1 - tau) * w_ref[R_TW1[0]:R_TW1[1] + IN1 + H, :]
                        + tau * w_ref[R_CW1[0]:R_CW1[1] + IN1 + H, :])
                    vec_ref[V_TAB1:V_TAB2 + 1, :] = (
                        (1 - tau) * vec_ref[V_TAB1:V_TAB2 + 1, :]
                        + tau * vec_ref[V_AB1:V_AB2 + 1, :])
                    vec_ref[V_TB1[0]:V_TB2[1] + 1, :] = (
                        (1 - tau) * vec_ref[V_TB1[0]:V_TB2[1] + 1, :]
                        + tau * vec_ref[V_CB1[0]:V_CB2[1] + 1, :])
                    vec_ref[V_TW3[0]:V_TW3[1] + 1, :] = (
                        (1 - tau) * vec_ref[V_TW3[0]:V_TW3[1] + 1, :]
                        + tau * vec_ref[V_CW3[0]:V_CW3[1] + 1, :])
                    vec_ref[V_MISC:V_MISC + 1, M_TABH[0]:M_TABH[1]] = (
                        (1 - tau) * vec_ref[V_MISC:V_MISC + 1, M_TABH[0]:M_TABH[1]]
                        + tau * vec_ref[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]])
                    vec_ref[V_MISC:V_MISC + 1, M_TB3[0]:M_TB3[1]] = (
                        (1 - tau) * vec_ref[V_MISC:V_MISC + 1, M_TB3[0]:M_TB3[1]]
                        + tau * vec_ref[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]])

                @pl.when(t == n_tiles - 1)
                def _write_aloss():
                    losses_ref[0, 0:1, 1:2] = jnp.full((1, 1), acc[0])

                    # True last grid step (runs regardless of do_actor): sync the
                    # critic/target first-layer biases back to their canonical
                    # vec rows and re-zero the padded w rows (see _bias_in).
                    @pl.when(last_k)
                    def _bias_out():
                        z = jnp.zeros((1, H), jnp.float32)
                        for c in (0, 1):
                            rb = R_CW1[c] + obs_dim + 2
                            tb = R_TW1[c] + obs_dim + 2
                            vec_ref[V_CB1[c]:V_CB1[c] + 1, :] = w_ref[rb:rb + 1, :]
                            vec_ref[V_TB1[c]:V_TB1[c] + 1, :] = w_ref[tb:tb + 1, :]
                            mvec_ref[V_CB1[c]:V_CB1[c] + 1, :] = mw_ref[rb:rb + 1, :]
                            vvec_ref[V_CB1[c]:V_CB1[c] + 1, :] = vw_ref[rb:rb + 1, :]
                            w_ref[rb:rb + 1, :] = z
                            w_ref[tb:tb + 1, :] = z
                            mw_ref[rb:rb + 1, :] = z
                            vw_ref[rb:rb + 1, :] = z

        return kernel


    def _kernel_call(f: FusedState, data, row_idx, noises, *, obs_dim, gamma, tau,
                     lr, smooth_std, smooth_clip, policy_delay, block, interpret,
                     mm_bf16):
        """Shared pallas_call driver, same structure as fused_sac._kernel_call.
        noises: (K, B, adim) target-smoothing normals."""
        K, B = noises.shape[0], noises.shape[1]
        f32 = jnp.float32
        noise = jnp.swapaxes(noises.astype(f32), 1, 2)           # (K, adim, B)

        scal = jnp.zeros((1, 16), f32)
        scal = scal.at[0, :S_DELAY + 1].set(jnp.asarray([
            gamma, tau, lr, smooth_std, smooth_clip,
            f.count.astype(f32), f.count_a.astype(f32), 1.0 / B,
            float(policy_delay),
        ], f32))

        if row_idx is None:
            W = data.shape[1]
            bt = min(block, B)
            if B % bt:
                raise ValueError(f"batch {B} not divisible by block {bt}")
            n_tiles = B // bt
            extra, prefetch = (), 0
            data_spec = pl.BlockSpec(
                (1, W, bt), lambda k, ph, t, *a: (k, 0, t), memory_space=pltpu.VMEM)
        else:
            R, W, L = data.shape
            rpb, rem = divmod(B, L)
            if rem:
                raise ValueError(f"batch {B} must be a multiple of lanes {L}")
            bt = min(block, L)
            if L % bt:
                raise ValueError(f"lanes {L} not divisible by block {bt}")
            tpr = L // bt
            n_tiles = rpb * tpr
            extra, prefetch = (row_idx.astype(jnp.int32),), 1
            data_spec = pl.BlockSpec(
                (1, W, bt),
                lambda k, ph, t, idx: (idx[k * rpb + t // tpr], 0, t % tpr),
                memory_space=pltpu.VMEM)

        kernel = _make_kernel(obs_dim, n_tiles, policy_delay, mm_bf16)
        nadim = noises.shape[2]
        batch_spec = lambda rows: pl.BlockSpec(
            (1, rows, bt), lambda k, ph, t, *a: (k, 0, t), memory_space=pltpu.VMEM)
        full = lambda shape: pl.BlockSpec(
            shape, lambda k, ph, t, *a: (0,) * len(shape), memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=prefetch,
            grid=(K, 2, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 16), lambda k, ph, t, *a: (0, 0),
                             memory_space=pltpu.SMEM),
                data_spec, batch_spec(nadim),
                full((WROWS, H)), full((VROWS, H)),
                full((WROWS, H)), full((WROWS, H)),
                full((VROWS, H)), full((VROWS, H)),
            ],
            out_specs=[
                full((WROWS, H)), full((VROWS, H)),
                full((WROWS, H)), full((WROWS, H)),
                full((VROWS, H)), full((VROWS, H)),
                pl.BlockSpec((1, 8, 128), lambda k, ph, t, *a: (k, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((GROWS, H), f32),
                pltpu.VMEM((VROWS, H), f32),
                pltpu.SMEM((4,), f32),
            ],
        )

        body = ((lambda idx_ref, *refs: kernel(*refs)) if prefetch else kernel)
        out = pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((WROWS, H), f32),
                jax.ShapeDtypeStruct((VROWS, H), f32),
                jax.ShapeDtypeStruct((WROWS, H), f32),
                jax.ShapeDtypeStruct((WROWS, H), f32),
                jax.ShapeDtypeStruct((VROWS, H), f32),
                jax.ShapeDtypeStruct((VROWS, H), f32),
                jax.ShapeDtypeStruct((K, 8, 128), f32),
            ],
            input_output_aliases={prefetch + 3 + i: i for i in range(6)},
            # 64 MiB, not 100: a larger claim inside lax.scan silently corrupted
            # the aliased buffers at H=512 (see fused_sac._kernel_call).
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(*extra, scal, data, noise, f.w, f.vec, f.mw, f.vw, f.mvec, f.vvec)

        w2, vec2, mw2, vw2, mvec2, vvec2, losses3 = out
        losses = losses3[:, 0, :2]
        # delayed steps among n_upd0..n_upd0+K-1: those ≡ 0 (mod delay)
        first = (-f.count) % policy_delay
        n_act = jnp.maximum(0, (K - first + policy_delay - 1) // policy_delay)
        f2 = FusedState(w=w2, vec=vec2, mw=mw2, mvec=mvec2, vw=vw2, vvec=vvec2,
                        count=f.count + K, count_a=f.count_a + n_act)
        return f2, losses[:, 0], losses[:, 1]


    def fused_update_k_wmat(f: FusedState, ring, row_idx, noises, **kw):
        """K TD3 updates on the cached kernel-layout state, sampling the replay
        ring in-kernel (production path)."""
        return _kernel_call(f, ring, row_idx, noises,
                            **{"block": 2048, "interpret": False, "mm_bf16": True,
                               **kw})


    def fused_update_k_wmat_batches(f: FusedState, batches, noises, **kw):
        data = pack_slab(batches, kw["obs_dim"], 2).astype(jnp.float32)
        return _kernel_call(f, data, None, noises,
                            **{"block": 2048, "interpret": False, "mm_bf16": True,
                               **kw})


    @functools.partial(
        jax.jit,
        static_argnames=("obs_dim", "gamma", "tau", "lr", "smooth_std",
                         "smooth_clip", "policy_delay", "block", "interpret",
                         "mm_bf16"),
    )
    def fused_update_k(packed: PackedParams, adam: PackedAdam, batches, noises,
                       obs_dim: int, gamma: float, tau: float, lr: float,
                       smooth_std: float = 0.2, smooth_clip: float = 0.5,
                       policy_delay: int = 2, block: int = 2048,
                       interpret: bool = False, mm_bf16: bool = True):
        """PackedParams-boundary wrapper (tests); the trainer keeps a FusedState."""
        f = fused_init(packed, adam)
        f2, closs, aloss = fused_update_k_wmat_batches(
            f, batches, noises, obs_dim=obs_dim, gamma=gamma, tau=tau, lr=lr,
            smooth_std=smooth_std, smooth_clip=smooth_clip,
            policy_delay=policy_delay, block=block, interpret=interpret,
            mm_bf16=mm_bf16)
        packed2, adam2 = fused_unpack(f2)
        return packed2, adam2, closs, aloss

    ns = _SimpleNamespace(
        **{k: v for k, v in list(locals().items()) if k not in ("ns", "h")})
    # module-level (width-independent) names consumers reach through the
    # namespace too
    ns.PackedParams = PackedParams
    ns.PackedAdam = PackedAdam
    ns.IN1 = IN1
    ns.AH = AH
    return ns


@functools.lru_cache(maxsize=None)
def build(h: int = 256):
    """Width-h fused-TD3 namespace (memoized; build(256) == module level)."""
    if h % 128:
        raise ValueError(f"fused hidden width must be a multiple of 128, got {h}")
    return _build_width(int(h))


_DEFAULT = build(256)
globals().update({k: v for k, v in vars(_DEFAULT).items() if k != "H"})
H = 256  # default hidden width (SB3-default 2x256 MLPs)
