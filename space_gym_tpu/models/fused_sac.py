"""Fused SAC update: the K-minibatch learner phase as ONE Pallas TPU kernel.

Motivation (VERDICT r1 item 2): profiling showed `SACTrainer._train_iter` is
~90% update math — each XLA update re-streams every (batch, 256) activation
through HBM, leaving the flagship config at ~0.5M env-steps/s while the bare
env does 80M.  The fused kernel keeps ALL parameters + Adam state + targets
resident in VMEM for the whole K-update loop and streams only the minibatch
tiles, so per-update HBM traffic drops from ~250 MB to ~2 MB.

Structure: grid (K, 2, T) — for each minibatch k, phase 0 accumulates critic
gradients over T batch tiles and applies Adam + the polyak target update on
the last tile; phase 1 accumulates actor gradients (against the *updated*
critic, SAC ordering) and applies the actor Adam + temperature update.  This
reproduces models/sac.py::_update_once semantically (same losses, same Adam,
same polyak), with sampling noise passed in as explicit normals.

Layout: first-layer inputs are padded to IN1=128 columns (obs | action | 0);
hidden width 256; the actor's two heads are one (256, 4) matrix
[mean(2) | log_std(2)].  Padded weight rows start at zero and receive zero
gradients, so they stay zero — padding never leaks into the math.

`update_k_reference` is the pure-jax twin (autodiff) used by the tests to
validate the hand-written backward; `fused_update_k` is the kernel.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .replay import pack_slab, replay_cols

IN1 = 128     # padded first-layer input width (obs | action | zeros)
NHEAD = 4     # actor head columns: [mean(2) | log_std(2)]
LOG_STD_MIN = -20.0
LOG_STD_MAX = 2.0
B1, B2, EPS = 0.9, 0.999, 1e-8  # optax.adam defaults (eps_root=0)
LOG2PI = 1.8378770664093453  # log(2*pi)
LOG2 = 0.6931471805599453


class PackedParams(NamedTuple):
    """SAC learner state in kernel layout (all f32)."""

    a_w1: jax.Array   # (IN1, H)
    a_b1: jax.Array   # (H,)
    a_w2: jax.Array   # (H, H)
    a_b2: jax.Array   # (H,)
    a_wh: jax.Array   # (H, NHEAD)
    a_bh: jax.Array   # (NHEAD,)
    c_w1: jax.Array   # (2, IN1, H)
    c_b1: jax.Array   # (2, H)
    c_w2: jax.Array   # (2, H, H)
    c_b2: jax.Array   # (2, H)
    c_w3: jax.Array   # (2, H)
    c_b3: jax.Array   # (2,)
    t_w1: jax.Array
    t_b1: jax.Array
    t_w2: jax.Array
    t_b2: jax.Array
    t_w3: jax.Array
    t_b3: jax.Array
    log_alpha: jax.Array  # ()


ACTOR_FIELDS = ("a_w1", "a_b1", "a_w2", "a_b2", "a_wh", "a_bh")
CRITIC_FIELDS = ("c_w1", "c_b1", "c_w2", "c_b2", "c_w3", "c_b3")
TARGET_FIELDS = ("t_w1", "t_b1", "t_w2", "t_b2", "t_w3", "t_b3")


class PackedAdam(NamedTuple):
    """First/second moments for actor group, critic group and log_alpha,
    plus the shared step count (optax adam count equivalent)."""

    m: PackedParams   # moments for actor+critic fields (targets unused=0)
    v: PackedParams
    count: jax.Array  # () int32


from types import SimpleNamespace as _SimpleNamespace


def _build_width(h: int):
    """All width-dependent layout constants + kernel/pack functions, closed
    over hidden width `h` (VERDICT r3 item 4: the flagship kernels were
    hard-coded to H=256, foreclosing capacity sweeps).  IN1/NHEAD stay fixed
    (obs<=126, action_dim=2).  Returned as a namespace; `build(256)` is the
    flagship layout and is re-exported at module level for back-compat."""
    H = h
    # ------------------------------------------------------------- flax <-> pack --

    def _actor_leaves(actor_params):
        p = actor_params["params"]
        mlp = p["MLP_0"]
        return (
            mlp["Dense_0"]["kernel"], mlp["Dense_0"]["bias"],
            mlp["Dense_1"]["kernel"], mlp["Dense_1"]["bias"],
            p["Dense_0"]["kernel"], p["Dense_0"]["bias"],   # mean head
            p["Dense_1"]["kernel"], p["Dense_1"]["bias"],   # log_std head
        )


    def _critic_leaves(critic_params):
        p = critic_params["params"]
        out = []
        for i in (0, 1):
            mlp = p[f"MLP_{i}"]
            out.append((
                mlp["Dense_0"]["kernel"], mlp["Dense_0"]["bias"],
                mlp["Dense_1"]["kernel"], mlp["Dense_1"]["bias"],
                mlp["Dense_2"]["kernel"], mlp["Dense_2"]["bias"],
            ))
        return out


    def pack_params(actor_params, critic_params, target_params, log_alpha) -> PackedParams:
        aw1, ab1, aw2, ab2, awm, abm, aws, abs_ = _actor_leaves(actor_params)
        d = aw1.shape[0]

        def pad1(w):
            return jnp.zeros((IN1, H), jnp.float32).at[: w.shape[0]].set(w)

        def pack_critic(leaves):
            (w1a, b1a, w2a, b2a, w3a, b3a), (w1b, b1b, w2b, b2b, w3b, b3b) = leaves
            return (
                jnp.stack([pad1(w1a), pad1(w1b)]),
                jnp.stack([b1a, b1b]),
                jnp.stack([w2a, w2b]),
                jnp.stack([b2a, b2b]),
                jnp.stack([w3a[:, 0], w3b[:, 0]]),
                jnp.stack([b3a[0], b3b[0]]),
            )

        cw1, cb1, cw2, cb2, cw3, cb3 = pack_critic(_critic_leaves(critic_params))
        tw1, tb1, tw2, tb2, tw3, tb3 = pack_critic(_critic_leaves(target_params))
        return PackedParams(
            a_w1=pad1(aw1), a_b1=ab1, a_w2=aw2, a_b2=ab2,
            a_wh=jnp.concatenate([awm, aws], axis=1), a_bh=jnp.concatenate([abm, abs_]),
            c_w1=cw1, c_b1=cb1, c_w2=cw2, c_b2=cb2, c_w3=cw3, c_b3=cb3,
            t_w1=tw1, t_b1=tb1, t_w2=tw2, t_b2=tb2, t_w3=tw3, t_b3=tb3,
            log_alpha=jnp.asarray(log_alpha, jnp.float32),
        )


    def unpack_params(packed: PackedParams, actor_tpl, critic_tpl):
        """Back to flax trees (slicing away the padding)."""
        d_a = actor_tpl["params"]["MLP_0"]["Dense_0"]["kernel"].shape[0]
        d_c = critic_tpl["params"]["MLP_0"]["Dense_0"]["kernel"].shape[0]
        adim = actor_tpl["params"]["Dense_0"]["kernel"].shape[1]

        actor = {"params": {
            "MLP_0": {
                "Dense_0": {"kernel": packed.a_w1[:d_a], "bias": packed.a_b1},
                "Dense_1": {"kernel": packed.a_w2, "bias": packed.a_b2},
            },
            "Dense_0": {"kernel": packed.a_wh[:, :adim], "bias": packed.a_bh[:adim]},
            "Dense_1": {"kernel": packed.a_wh[:, adim:], "bias": packed.a_bh[adim:]},
        }}

        def unpack_critic(w1, b1, w2, b2, w3, b3):
            return {"params": {
                f"MLP_{i}": {
                    "Dense_0": {"kernel": w1[i, :d_c], "bias": b1[i]},
                    "Dense_1": {"kernel": w2[i], "bias": b2[i]},
                    "Dense_2": {"kernel": w3[i][:, None], "bias": b3[i][None]},
                }
                for i in (0, 1)
            }}

        critic = unpack_critic(packed.c_w1, packed.c_b1, packed.c_w2, packed.c_b2,
                               packed.c_w3, packed.c_b3)
        target = unpack_critic(packed.t_w1, packed.t_b1, packed.t_w2, packed.t_b2,
                               packed.t_w3, packed.t_b3)
        return actor, critic, target, packed.log_alpha


    # ------------------------------------------------------ pure-jax reference --

    def _actor_fwd(p: PackedParams, x):
        """x: (B, IN1) padded obs.  Returns (mean, log_std_raw, h2, z1, z2)."""
        z1 = x @ p.a_w1 + p.a_b1
        h1 = jnp.maximum(z1, 0.0)
        z2 = h1 @ p.a_w2 + p.a_b2
        h2 = jnp.maximum(z2, 0.0)
        head = h2 @ p.a_wh + p.a_bh
        return head[:, :2], head[:, 2:], h2, z1, z2


    def _critic_fwd(w1, b1, w2, b2, w3, b3, x):
        """One critic on (B, IN1) inputs -> q (B,)."""
        z1 = x @ w1 + b1
        h1 = jnp.maximum(z1, 0.0)
        z2 = h1 @ w2 + b2
        h2 = jnp.maximum(z2, 0.0)
        return h2 @ w3 + b3, h1, h2, z1, z2


    def _sample(mean, log_std_raw, noise):
        log_std = jnp.clip(log_std_raw, LOG_STD_MIN, LOG_STD_MAX)
        std = jnp.exp(log_std)
        pre = mean + std * noise
        a = jnp.tanh(pre)
        logp = -0.5 * (noise**2 + 2 * log_std + LOG2PI)
        logp = logp - 2 * (LOG2 - pre - jax.nn.softplus(-2 * pre))
        return a, logp.sum(-1), pre


    def _pad_x(obs, act, obs_dim):
        b = obs.shape[0]
        x = jnp.zeros((b, IN1), jnp.float32)
        x = x.at[:, :obs_dim].set(obs[:, :obs_dim])
        if act is not None:
            x = x.at[:, obs_dim : obs_dim + act.shape[1]].set(act)
        return x


    def _adam(g, m, v, lr, t):
        m = B1 * m + (1 - B1) * g
        v = B2 * v + (1 - B2) * g * g
        # Scalar-folded bias corrections (algebraically identical to
        # lr*(m/bc1)/(sqrt(v/bc2)+EPS)): one per-element division instead of
        # three, with the bias-correction scalars hoisted out of the tensor ops.
        # The kernel applies the same form, so kernel-vs-reference stays tight.
        sb2 = jnp.sqrt(1 - B2**t)
        return -(lr * sb2 / (1 - B1**t)) * m / (jnp.sqrt(v) + EPS * sb2), m, v


    def update_k_reference(packed: PackedParams, adam: PackedAdam, batches, noises,
                           obs_dim: int, gamma: float, tau: float, lr: float,
                           target_entropy: float, alpha_floor: float = 0.0):
        """K sequential SAC updates in plain jax (autodiff) on the packed layout —
        the oracle for the Pallas kernel.  batches: Transition with leading (K, B);
        noises: (K, B, 2, 2) normals [0]=critic next-action, [1]=actor action."""

        def one(carry, inp):
            p, ad = carry
            batch, noise = inp
            t = (ad.count + 1).astype(jnp.float32)
            alpha = jnp.exp(p.log_alpha)
            obs = _pad_x(batch.obs, batch.action, obs_dim)
            obs_only = _pad_x(batch.obs, None, obs_dim)
            nobs_only = _pad_x(batch.next_obs, None, obs_dim)

            # -- critic loss --
            mean, lsr, _, _, _ = _actor_fwd(p, nobs_only)
            na, nlogp, _ = _sample(mean, lsr, noise[:, 0])
            nx = _pad_x(batch.next_obs, na, obs_dim)
            q1t = _critic_fwd(p.t_w1[0], p.t_b1[0], p.t_w2[0], p.t_b2[0], p.t_w3[0], p.t_b3[0], nx)[0]
            q2t = _critic_fwd(p.t_w1[1], p.t_b1[1], p.t_w2[1], p.t_b2[1], p.t_w3[1], p.t_b3[1], nx)[0]
            tq = batch.reward + gamma * batch.discount * (
                jnp.minimum(q1t, q2t) - alpha * nlogp
            )
            tq = jax.lax.stop_gradient(tq)

            def closs(cw):
                w1, b1, w2, b2, w3, b3 = cw
                q1 = _critic_fwd(w1[0], b1[0], w2[0], b2[0], w3[0], b3[0], obs)[0]
                q2 = _critic_fwd(w1[1], b1[1], w2[1], b2[1], w3[1], b3[1], obs)[0]
                return ((q1 - tq) ** 2 + (q2 - tq) ** 2).mean()

            cw = tuple(getattr(p, f) for f in CRITIC_FIELDS)
            closs_val, cg = jax.value_and_grad(closs)(cw)
            new_c = []
            new_m, new_v = dict(ad.m._asdict()), dict(ad.v._asdict())
            for f, g in zip(CRITIC_FIELDS, cg):
                upd, m_, v_ = _adam(g, getattr(ad.m, f), getattr(ad.v, f), lr, t)
                new_c.append(getattr(p, f) + upd)
                new_m[f], new_v[f] = m_, v_
            p = p._replace(**dict(zip(CRITIC_FIELDS, new_c)))

            # -- actor loss (uses updated critic) --
            def aloss(aw):
                p2 = p._replace(**dict(zip(ACTOR_FIELDS, aw)))
                mean, lsr, _, _, _ = _actor_fwd(p2, obs_only)
                a, logp, _ = _sample(mean, lsr, noise[:, 1])
                ax = _pad_x(batch.obs, a, obs_dim)
                q1 = _critic_fwd(p.c_w1[0], p.c_b1[0], p.c_w2[0], p.c_b2[0], p.c_w3[0], p.c_b3[0], ax)[0]
                q2 = _critic_fwd(p.c_w1[1], p.c_b1[1], p.c_w2[1], p.c_b2[1], p.c_w3[1], p.c_b3[1], ax)[0]
                return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

            aw = tuple(getattr(p, f) for f in ACTOR_FIELDS)
            (aloss_val, logp), ag = jax.value_and_grad(aloss, has_aux=True)(aw)
            new_a = []
            for f, g in zip(ACTOR_FIELDS, ag):
                upd, m_, v_ = _adam(g, getattr(ad.m, f), getattr(ad.v, f), lr, t)
                new_a.append(getattr(p, f) + upd)
                new_m[f], new_v[f] = m_, v_
            p = p._replace(**dict(zip(ACTOR_FIELDS, new_a)))

            # -- temperature --
            g_la = -(jnp.mean(logp) + target_entropy)
            upd, m_, v_ = _adam(g_la, ad.m.log_alpha, ad.v.log_alpha, lr, t)
            la = p.log_alpha + upd
            if alpha_floor > 0:
                la = jnp.maximum(la, jnp.log(alpha_floor))
            new_m["log_alpha"], new_v["log_alpha"] = m_, v_
            p = p._replace(log_alpha=la)

            # -- polyak (after critic update, like _update_once) --
            new_t = {
                tf: getattr(p, tf) * (1 - tau) + getattr(p, cf) * tau
                for tf, cf in zip(TARGET_FIELDS, CRITIC_FIELDS)
            }
            p = p._replace(**new_t)
            ad = PackedAdam(
                m=PackedParams(**new_m), v=PackedParams(**new_v), count=ad.count + 1
            )
            return (p, ad), (closs_val, aloss_val)

        (p, ad), (closs, aloss) = jax.lax.scan(one, (packed, adam), (batches, noises))
        return p, ad, closs, aloss


    def adam_init(packed: PackedParams) -> PackedAdam:
        zeros = PackedParams(*[jnp.zeros_like(x) for x in packed])
        return PackedAdam(m=zeros, v=zeros, count=jnp.asarray(0, jnp.int32))


    # ---------------------------------------------------------- Pallas kernel --
    #
    # All weights live in TWO VMEM-resident matrices for the whole K-update loop
    # (in-place via input_output_aliases):
    #
    #   WMAT (1928, 256): [actor w1 | actor w2 | c0 w1 | c0 w2 | c1 w1 | c1 w2 |
    #                      t0 w1 | t0 w2 | t1 w1 | t1 w2 | actor head^T (4) | pad]
    #   VEC  (16, 256):   row 0 a_b1, 1 a_b2, 2-3 c_b1, 4-5 c_b2, 6-7 t_b1,
    #                     8-9 t_b2, 10-11 c_w3, 12-13 t_w3,
    #                     14 misc [a_bh(0:4) | c_b3(4:6) | t_b3(6:8) | log_alpha(8)]
    #
    # Adam moments MW/VW and MVEC/VVEC mirror the same layout (target rows unused).

    R_AW1 = 0
    R_AW2 = R_AW1 + IN1
    R_CW1 = (R_AW2 + H, R_AW2 + H + IN1 + H)            # per critic
    R_TW1 = (R_CW1[1] + IN1 + H, R_CW1[1] + 2 * (IN1 + H))
    R_AWH = R_TW1[1] + IN1 + H                           # 4 rows of head^T
    WROWS = -(-(R_AWH + NHEAD) // 8) * 8                 # pad to 8 (1928 at H=256)
    V_AB1, V_AB2 = 0, 1
    V_CB1, V_CB2 = (2, 3), (4, 5)
    V_TB1, V_TB2 = (6, 7), (8, 9)
    V_CW3, V_TW3 = (10, 11), (12, 13)
    V_MISC = 14
    VROWS = 16
    # grad scratch: same row layout as WMAT for rows 0..R_TW1[0] (trainable actor
    # + critic weights), with the actor head remapped to follow (target rows
    # never receive gradients and are not allocated).
    G_AWH = R_TW1[0]
    GROWS = G_AWH + NHEAD + 4          # 1160 (8-aligned)
    # misc-row column spans
    M_ABH = (0, NHEAD)
    M_CB3 = (NHEAD, NHEAD + 2)
    M_TB3 = (NHEAD + 2, NHEAD + 4)
    M_LA = NHEAD + 4
    # scalar-vector layout (SMEM input, shape (1, 8))
    S_GAMMA, S_TAU, S_LR, S_TE, S_COUNT0, S_LOGFLOOR, S_INVB, S_ALOSS0 = range(8)


    def pack_wmat(p: PackedParams):
        w = jnp.zeros((WROWS, H), jnp.float32)
        w = w.at[R_AW1:R_AW1 + IN1].set(p.a_w1)
        w = w.at[R_AW2:R_AW2 + H].set(p.a_w2)
        for c in (0, 1):
            w = w.at[R_CW1[c]:R_CW1[c] + IN1].set(p.c_w1[c])
            w = w.at[R_CW1[c] + IN1:R_CW1[c] + IN1 + H].set(p.c_w2[c])
            w = w.at[R_TW1[c]:R_TW1[c] + IN1].set(p.t_w1[c])
            w = w.at[R_TW1[c] + IN1:R_TW1[c] + IN1 + H].set(p.t_w2[c])
        w = w.at[R_AWH:R_AWH + NHEAD].set(p.a_wh.T)
        v = jnp.zeros((VROWS, H), jnp.float32)
        v = v.at[V_AB1].set(p.a_b1).at[V_AB2].set(p.a_b2)
        for c in (0, 1):
            v = v.at[V_CB1[c]].set(p.c_b1[c]).at[V_CB2[c]].set(p.c_b2[c])
            v = v.at[V_TB1[c]].set(p.t_b1[c]).at[V_TB2[c]].set(p.t_b2[c])
            v = v.at[V_CW3[c]].set(p.c_w3[c]).at[V_TW3[c]].set(p.t_w3[c])
        misc = jnp.zeros((H,), jnp.float32)
        misc = misc.at[M_ABH[0]:M_ABH[1]].set(p.a_bh)
        misc = misc.at[M_CB3[0]:M_CB3[1]].set(p.c_b3)
        misc = misc.at[M_TB3[0]:M_TB3[1]].set(p.t_b3)
        misc = misc.at[M_LA].set(p.log_alpha)
        v = v.at[V_MISC].set(misc)
        return w, v


    def unpack_wmat(w, v) -> PackedParams:
        misc = v[V_MISC]
        return PackedParams(
            a_w1=w[R_AW1:R_AW1 + IN1], a_b1=v[V_AB1],
            a_w2=w[R_AW2:R_AW2 + H], a_b2=v[V_AB2],
            a_wh=w[R_AWH:R_AWH + NHEAD].T, a_bh=misc[M_ABH[0]:M_ABH[1]],
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
            log_alpha=misc[M_LA],
        )


    def _dot(a, b, mm_dtype=None):
        if mm_dtype is not None:
            a, b = a.astype(mm_dtype), b.astype(mm_dtype)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)


    def _dg(a, b, ca, cb, mm_dtype=None):
        """dot_general contracting a-dim `ca` with b-dim `cb`."""
        if mm_dtype is not None:
            a, b = a.astype(mm_dtype), b.astype(mm_dtype)
        return jax.lax.dot_general(
            a, b, (((ca,), (cb,)), ((), ())), preferred_element_type=jnp.float32
        )


    def _make_bodies(obs_dim: int, alpha_floor: float, mm_bf16: bool = True):
        """Phase math shared by BOTH kernel schedules: the legacy (K, 2, T)
        grid (`_make_kernel`) and the folded (K,) grid (`_make_kernel_fold`,
        VERDICT r4 item 3).  Every function takes an explicit refs namespace
        `r` — aliased params (w/vec/mw/vw/mvec/vvec), accumulators (gw/gvec/
        acc) and the losses output — so each kernel wires its own grid/DMA
        structure around IDENTICAL math; the interpret-mode autodiff-oracle
        tests pin both schedules to `update_k_reference`.

        Layout rules (unchanged from the original single-kernel version):
        the batch tile d0 is ONE packed (W, BT) lanes-minor slab (obs/
        next_obs/action/reward/discount at 8-aligned W-row offsets,
        models/replay.py).  EVERY per-sample small tensor (action, reward,
        discount, noise, q, tq, logp, actor head, head grads) lives
        FEATURE-MAJOR, shape (f<=4, BT) with the batch on the 128-lane axis —
        batch-major would waste 126/128 lanes of every vreg (~16x more VPU
        work; measured ~13% MFU).  Rank-1 broadcasts like dq * w3_row become
        K=1 matmuls on the MXU instead of lane-broadcast relayouts.  Only the
        (BT, H) activations stay batch-major — there the lane axis is full."""
        o0, n0, a0, rr, dd, _ = replay_cols(obs_dim, 2)
        one0 = dd + 1  # constant-1.0 row (replay_ones_row): first-layer bias fold
        od = obs_dim
        mmd = jnp.bfloat16 if mm_bf16 else None
        # adt: POST-RELU activation dtype.  With mm_bf16 the h1/h2 live in
        # bf16 so every consumer matmul (forward next layer AND backward
        # weight grad) reads them cast-free.  Heads, q-values, logp and all
        # gradients remain f32 (MXU accumulation is f32 either way).
        adt = jnp.bfloat16 if mm_bf16 else jnp.float32
        dot = lambda a, b: _dot(a, b, mm_dtype=mmd)
        dg = lambda a, b, ca, cb: _dg(a, b, ca, cb, mm_dtype=mmd)
        # Mosaic's tpu.matmul requires a 32-bit accumulator and this target
        # has no bf16 compare, so pre-activations z stay f32 (backward relu
        # masks compare on them); only the post-relu h is cast to adt.
        relu = lambda z: jnp.maximum(z, 0.0).astype(adt)

        def consts(scal, kf):
            """Per-update scalars.  b**t via exp(t*log b): Mosaic has no powf
            lowering.  Adam bias corrections are scalar-folded:
            update = -a_lr*m/(sqrt(v)+c_eps) == -lr*(m/bc1)/(sqrt(v/bc2)+EPS),
            so each element pays one division instead of three (same fold in
            the pure-jax reference `_adam`)."""
            tstep = scal[0, S_COUNT0] + kf + 1.0
            bc1 = 1.0 - jnp.exp(tstep * jnp.float32(math.log(B1)))
            bc2 = 1.0 - jnp.exp(tstep * jnp.float32(math.log(B2)))
            sb2 = jnp.sqrt(bc2)
            return _SimpleNamespace(
                gamma=scal[0, S_GAMMA], tau=scal[0, S_TAU],
                te=scal[0, S_TE], invb=scal[0, S_INVB],
                a_lr=scal[0, S_LR] * sb2 / bc1, c_eps=EPS * sb2,
                logfloor=scal[0, S_LOGFLOOR])

        def bias_in(r):
            """Critic first-layer biases ride the f32 action matmul: the
            weight rows at r0+obs_dim+2 (inside the IN1 padding) hold b1 for
            the kernel's duration, contracted against the replay tile's ONES
            row (replay_ones_row).  Canonical storage stays the vec rows
            (checkpoint layout unchanged): copy in at the first grid step,
            back out after the last actor apply.  Moments move with them;
            the vec-row Adam then sees zero grads AND zero moments -> no-op."""
            for c in (0, 1):
                rb = R_CW1[c] + obs_dim + 2
                tb = R_TW1[c] + obs_dim + 2
                r.w[rb:rb + 1, :] = r.vec[V_CB1[c]:V_CB1[c] + 1, :]
                r.w[tb:tb + 1, :] = r.vec[V_TB1[c]:V_TB1[c] + 1, :]
                r.mw[rb:rb + 1, :] = r.mvec[V_CB1[c]:V_CB1[c] + 1, :]
                r.vw[rb:rb + 1, :] = r.vvec[V_CB1[c]:V_CB1[c] + 1, :]
                r.mvec[V_CB1[c]:V_CB1[c] + 1, :] = jnp.zeros((1, H), jnp.float32)
                r.vvec[V_CB1[c]:V_CB1[c] + 1, :] = jnp.zeros((1, H), jnp.float32)

        def bias_out(r):
            """Sync the critic/target first-layer biases (+ moments) from the
            working w rows back to their canonical vec rows and re-zero the
            padded rows, so the EXTERNAL wmat layout is exactly as before the
            fold (see bias_in)."""
            z = jnp.zeros((1, H), jnp.float32)
            for c in (0, 1):
                rb = R_CW1[c] + obs_dim + 2
                tb = R_TW1[c] + obs_dim + 2
                r.vec[V_CB1[c]:V_CB1[c] + 1, :] = r.w[rb:rb + 1, :]
                r.vec[V_TB1[c]:V_TB1[c] + 1, :] = r.w[tb:tb + 1, :]
                r.mvec[V_CB1[c]:V_CB1[c] + 1, :] = r.mw[rb:rb + 1, :]
                r.vvec[V_CB1[c]:V_CB1[c] + 1, :] = r.vw[rb:rb + 1, :]
                r.w[rb:rb + 1, :] = z
                r.w[tb:tb + 1, :] = z
                r.mw[rb:rb + 1, :] = z
                r.vw[rb:rb + 1, :] = z

        def zero_accums(r):
            r.gw[:] = jnp.zeros_like(r.gw)
            r.gvec[:] = jnp.zeros_like(r.gvec)
            r.acc[0] = 0.0  # loss accumulator
            r.acc[1] = 0.0  # logp-sum accumulator (actor phase)

        def _alpha(r):
            la = r.vec[V_MISC:V_MISC + 1, M_LA:M_LA + 1]      # (1, 1)
            return la, jnp.exp(la)

        def actor_fwd(r, x):
            # x arrives FEATURE-MAJOR (obs_dim, BT); contract dim 0.
            # Hidden activations in adt (bf16 on the fast path); the head
            # comes out f32 so the sampling math keeps full precision.
            z1 = dg(x, r.w[R_AW1:R_AW1 + od], 0, 0) + r.vec[V_AB1:V_AB1 + 1, :]
            h1 = relu(z1)
            z2 = dot(h1, r.w[R_AW2:R_AW2 + H]) + r.vec[V_AB2:V_AB2 + 1, :]
            h2 = relu(z2)
            head = dg(r.w[R_AWH:R_AWH + NHEAD], h2, 1, 1)  # (4, BT) f32
            head = head + jnp.transpose(
                r.vec[V_MISC:V_MISC + 1, :NHEAD], (1, 0))
            return head[:2], head[2:NHEAD], z1, h1, z2, h2

        def pair_z1(r, x, a1, r0a, r0b):
            # BOTH critics' first layers in ONE (od, 2H) + (3, 2H) matmul
            # pair.  First-layer input is [obs | action | 1]: obs enters
            # feature-major via its own matmul; a1 is (3, BT) f32
            # [action(2) | ones] whose contraction against
            # [W1_action | b1-row] applies the first-layer bias INSIDE the
            # matmul accumulator (NEXT.md ones-row fold).  The separate
            # (BT, od~15)x(od, H) matmuls waste the MXU's contraction
            # depth — pairing along the N axis halves the invocations
            # (measured 3.3x on the standalone pattern, r4).
            wx = jnp.concatenate(
                [r.w[r0a:r0a + od], r.w[r0b:r0b + od]], axis=1)
            wa = jnp.concatenate(
                [r.w[r0a + od:r0a + od + 3],
                 r.w[r0b + od:r0b + od + 3]], axis=1)
            z1b = dg(x, wx, 0, 0) + _dg(a1, wa, 0, 0)        # (BT, 2H)
            return z1b[:, :H], z1b[:, H:]

        def critic_tail(r, z1, r0, vb2, vw3, b3col):
            h1 = relu(z1)
            z2 = dot(h1, r.w[r0 + IN1:r0 + IN1 + H]) + r.vec[vb2:vb2 + 1, :]
            h2 = relu(z2)
            q = dg(r.vec[vw3:vw3 + 1, :], h2, 1, 1)          # (1, BT) f32
            return q + r.vec[V_MISC:V_MISC + 1, b3col:b3col + 1], z1, h1, z2, h2

        def sample(mean, lsr, eps):
            # all (2, BT) feature-major
            ls = jnp.clip(lsr, LOG_STD_MIN, LOG_STD_MAX)
            std = jnp.exp(ls)
            pre = mean + std * eps
            a = jnp.tanh(pre)
            lp = -0.5 * (eps * eps + 2 * ls + LOG2PI)
            lp = lp - 2 * (LOG2 - pre - jax.nn.softplus(-2 * pre))
            return a, jnp.sum(lp, axis=0, keepdims=True), pre, ls, std

        def adam_rows(cn, ref_w, ref_m, ref_v, ref_g, lo, hi, glo=None):
            glo = lo if glo is None else glo
            g = ref_g[glo:glo + (hi - lo), :]
            m = B1 * ref_m[lo:hi, :] + (1 - B1) * g
            v = B2 * ref_v[lo:hi, :] + (1 - B2) * g * g
            ref_m[lo:hi, :] = m
            ref_v[lo:hi, :] = v
            ref_w[lo:hi, :] = ref_w[lo:hi, :] - cn.a_lr * m / (
                jnp.sqrt(v) + cn.c_eps)

        # ---------------------------------------------------- phase 0: critic
        def critic_tile(r, cn, d0, eps_c):
            """Accumulate critic gradients for one (W, BT) batch tile."""
            _, alpha = _alpha(r)
            x_o = d0[o0:o0 + od].astype(adt)               # (od, BT)
            x_n = d0[n0:n0 + od].astype(adt)
            ones = d0[one0:one0 + 1]                       # (1, BT) f32 = 1.0
            a1_t = jnp.concatenate([d0[a0:a0 + 2], ones], axis=0)  # (3, BT)
            rw = d0[rr:rr + 1]                             # (1, BT)
            dc = d0[dd:dd + 1]

            mean, lsr, *_ = actor_fwd(r, x_n)
            na, nlogp, _, _, _ = sample(mean, lsr, eps_c)
            na1 = jnp.concatenate([na, ones], axis=0)
            z1t = pair_z1(r, x_n, na1, R_TW1[0], R_TW1[1])
            q1t, *_ = critic_tail(r, z1t[0], R_TW1[0], V_TB2[0], V_TW3[0], M_TB3[0])
            q2t, *_ = critic_tail(r, z1t[1], R_TW1[1], V_TB2[1], V_TW3[1], M_TB3[0] + 1)
            tq = rw + cn.gamma * dc * (jnp.minimum(q1t, q2t) - alpha * nlogp)

            loss = 0.0
            z1p = pair_z1(r, x_o, a1_t, R_CW1[0], R_CW1[1])
            dz1s = []
            for c in (0, 1):
                q, z1, h1, z2, h2 = critic_tail(
                    r, z1p[c], R_CW1[c], V_CB2[c], V_CW3[c], M_CB3[0] + c)
                dq = 2.0 * (q - tq) * cn.invb                   # (1, BT)
                loss = loss + jnp.sum((q - tq) ** 2) * cn.invb
                r.gvec[V_CW3[c]:V_CW3[c] + 1, :] += dg(dq, h2, 1, 0)
                r.gvec[V_MISC:V_MISC + 1, M_CB3[0] + c:M_CB3[0] + c + 1] += jnp.sum(dq)[None, None]
                # rank-1 outer product on the MXU, not a lane-broadcast
                dh2 = _dg(dq, r.vec[V_CW3[c]:V_CW3[c] + 1, :], 0, 0)  # (BT, H)
                dz2 = jnp.where(z2 > 0, dh2, 0.0)
                r.gw[R_CW1[c] + IN1:R_CW1[c] + IN1 + H, :] += dg(h1, dz2, 0, 0)
                r.gvec[V_CB2[c]:V_CB2[c] + 1, :] += jnp.sum(dz2, axis=0, keepdims=True)
                dh1 = dg(dz2, r.w[R_CW1[c] + IN1:R_CW1[c] + IN1 + H], 1, 1)
                dz1s.append(jnp.where(z1 > 0, dh1, 0.0))
            # paired weight-grad matmuls: both critics' dz1 against the
            # SHARED x_o / [action | ones] inputs, split back to rows.
            # (the ones row's grad IS the bias grad — rides this matmul.)
            dz1b = jnp.concatenate(dz1s, axis=1)                # (BT, 2H)
            gx = dg(x_o, dz1b, 1, 0)                            # (od, 2H)
            ga = _dg(a1_t, dz1b, 1, 0)                          # (3, 2H)
            for c in (0, 1):
                r.gw[R_CW1[c]:R_CW1[c] + od, :] += gx[:, c * H:(c + 1) * H]
                r.gw[R_CW1[c] + od:R_CW1[c] + od + 3, :] += ga[:, c * H:(c + 1) * H]
            r.acc[0] += loss

        def critic_apply(r, cn):
            adam_rows(cn, r.w, r.mw, r.vw, r.gw, R_CW1[0], R_CW1[1] + IN1 + H)
            adam_rows(cn, r.vec, r.mvec, r.vvec, r.gvec, V_CB1[0], V_CW3[1] + 1)
            # misc-row c_b3 columns
            g = r.gvec[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]]
            m = B1 * r.mvec[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]] + (1 - B1) * g
            v = B2 * r.vvec[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]] + (1 - B2) * g * g
            r.mvec[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]] = m
            r.vvec[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]] = v
            r.vec[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]] = (
                r.vec[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]]
                - cn.a_lr * m / (jnp.sqrt(v) + cn.c_eps))
            # polyak: target <- (1-tau) target + tau critic
            r.w[R_TW1[0]:R_TW1[1] + IN1 + H, :] = (
                (1 - cn.tau) * r.w[R_TW1[0]:R_TW1[1] + IN1 + H, :]
                + cn.tau * r.w[R_CW1[0]:R_CW1[1] + IN1 + H, :])
            r.vec[V_TB1[0]:V_TB2[1] + 1, :] = (
                (1 - cn.tau) * r.vec[V_TB1[0]:V_TB2[1] + 1, :]
                + cn.tau * r.vec[V_CB1[0]:V_CB2[1] + 1, :])
            r.vec[V_TW3[0]:V_TW3[1] + 1, :] = (
                (1 - cn.tau) * r.vec[V_TW3[0]:V_TW3[1] + 1, :]
                + cn.tau * r.vec[V_CW3[0]:V_CW3[1] + 1, :])
            r.vec[V_MISC:V_MISC + 1, M_TB3[0]:M_TB3[1]] = (
                (1 - cn.tau) * r.vec[V_MISC:V_MISC + 1, M_TB3[0]:M_TB3[1]]
                + cn.tau * r.vec[V_MISC:V_MISC + 1, M_CB3[0]:M_CB3[1]])
            r.losses[0, 0:1, 0:1] = jnp.full((1, 1), r.acc[0])

        # ----------------------------------------------------- phase 1: actor
        def actor_tile(r, cn, d0, eps_a):
            """Accumulate actor gradients for one tile (against the UPDATED
            critic, SAC ordering — critic_apply must precede)."""
            _, alpha = _alpha(r)
            x_o = d0[o0:o0 + od].astype(adt)               # (od, BT)
            ones = d0[one0:one0 + 1]                       # (1, BT) f32 = 1.0

            mean, lsr, z1a, h1a, z2a, h2a = actor_fwd(r, x_o)
            a, logp, pre, ls, std = sample(mean, lsr, eps_a)
            a1 = jnp.concatenate([a, ones], axis=0)        # (3, BT)

            qs, caches = [], []
            z1p = pair_z1(r, x_o, a1, R_CW1[0], R_CW1[1])
            for c in (0, 1):
                q, z1, h1, z2, h2 = critic_tail(
                    r, z1p[c], R_CW1[c], V_CB2[c], V_CW3[c],
                    M_CB3[0] + c)
                qs.append(q)
                caches.append((z1, h1, z2, h2))
            minq = jnp.minimum(qs[0], qs[1])               # (1, BT)
            pick0 = (qs[0] <= qs[1]).astype(jnp.float32)
            r.acc[0] += jnp.sum(alpha * logp - minq) * cn.invb
            r.acc[1] += jnp.sum(logp)

            # dL/da through the min critic's input columns
            da = jnp.zeros_like(a)                         # (2, BT)
            for c in (0, 1):
                z1, h1, z2, h2 = caches[c]
                sel = pick0 if c == 0 else (1.0 - pick0)
                dq = -cn.invb * sel                             # (1, BT)
                dh2 = _dg(dq, r.vec[V_CW3[c]:V_CW3[c] + 1, :], 0, 0)  # (BT, H)
                dz2 = jnp.where(z2 > 0, dh2, 0.0)
                dh1 = dg(dz2, r.w[R_CW1[c] + IN1:R_CW1[c] + IN1 + H], 1, 1)
                dz1 = jnp.where(z1 > 0, dh1, 0.0)
                # only the ACTION columns of the input gradient are needed:
                # da (2,BT) = W1[action rows] (2,H) . dz1^T (H,BT)
                da = da + dg(r.w[R_CW1[c] + od:R_CW1[c] + od + 2], dz1, 1, 1)

            dlogp = alpha * cn.invb                             # (1, 1)
            sig = jax.nn.sigmoid(-2.0 * pre)
            dpre = da * (1.0 - a * a) + dlogp * (2.0 - 4.0 * sig)
            dmean = dpre
            clipmask = ((lsr > LOG_STD_MIN) & (lsr < LOG_STD_MAX)).astype(jnp.float32)
            dlsr = (dpre * std * eps_a - dlogp) * clipmask
            ghead = jnp.concatenate([dmean, dlsr], axis=0)      # (4, BT)

            r.gw[G_AWH:G_AWH + NHEAD, :] += dg(ghead, h2a, 1, 0)
            r.gvec[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]] += jnp.transpose(
                jnp.sum(ghead, axis=1, keepdims=True), (1, 0))
            dh2 = dg(ghead, r.w[R_AWH:R_AWH + NHEAD], 0, 0)
            dz2 = jnp.where(z2a > 0, dh2, 0.0)
            r.gw[R_AW2:R_AW2 + H, :] += dg(h1a, dz2, 0, 0)
            r.gvec[V_AB2:V_AB2 + 1, :] += jnp.sum(dz2, axis=0, keepdims=True)
            dh1 = dg(dz2, r.w[R_AW2:R_AW2 + H], 1, 1)
            dz1 = jnp.where(z1a > 0, dh1, 0.0)
            r.gw[R_AW1:R_AW1 + od, :] += dg(x_o, dz1, 1, 0)
            r.gvec[V_AB1:V_AB1 + 1, :] += jnp.sum(dz1, axis=0, keepdims=True)

        def actor_apply(r, cn):
            la, _ = _alpha(r)
            adam_rows(cn, r.w, r.mw, r.vw, r.gw, R_AW1, R_AW2 + H)
            adam_rows(cn, r.w, r.mw, r.vw, r.gw, R_AWH, R_AWH + NHEAD,
                      glo=G_AWH)
            adam_rows(cn, r.vec, r.mvec, r.vvec, r.gvec, V_AB1, V_AB2 + 1)
            # a_bh columns of the misc row
            g = r.gvec[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]]
            m = B1 * r.mvec[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]] + (1 - B1) * g
            v = B2 * r.vvec[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]] + (1 - B2) * g * g
            r.mvec[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]] = m
            r.vvec[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]] = v
            r.vec[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]] = (
                r.vec[V_MISC:V_MISC + 1, M_ABH[0]:M_ABH[1]]
                - cn.a_lr * m / (jnp.sqrt(v) + cn.c_eps))
            # temperature
            g_la = jnp.full((1, 1), -(r.acc[1] * cn.invb + cn.te))
            m = B1 * r.mvec[V_MISC:V_MISC + 1, M_LA:M_LA + 1] + (1 - B1) * g_la
            v = B2 * r.vvec[V_MISC:V_MISC + 1, M_LA:M_LA + 1] + (1 - B2) * g_la * g_la
            r.mvec[V_MISC:V_MISC + 1, M_LA:M_LA + 1] = m
            r.vvec[V_MISC:V_MISC + 1, M_LA:M_LA + 1] = v
            new_la = la - cn.a_lr * m / (jnp.sqrt(v) + cn.c_eps)
            if alpha_floor > 0:
                new_la = jnp.maximum(new_la, cn.logfloor)
            r.vec[V_MISC:V_MISC + 1, M_LA:M_LA + 1] = new_la
            r.losses[0, 0:1, 1:2] = jnp.full((1, 1), r.acc[0])

        return _SimpleNamespace(
            consts=consts, bias_in=bias_in, bias_out=bias_out,
            zero_accums=zero_accums, critic_tile=critic_tile,
            critic_apply=critic_apply, actor_tile=actor_tile,
            actor_apply=actor_apply)


    def _make_kernel(obs_dim: int, n_tiles: int, alpha_floor: float,
                     mm_bf16: bool = True):
        """Legacy schedule: grid (K, 2, T).  Phase 0: critic grads + Adam +
        polyak; phase 1: actor grads + Adam + temperature.  The batch arrives
        as ONE packed (1, W, BT) tile per grid step via BlockSpec — no
        128-column input padding: obs/action enter the first layer via split
        matmuls, and the padded W1 rows past obs_dim+2 keep zero gradients so
        the packed weight layout is unchanged."""
        bodies = _make_bodies(obs_dim, alpha_floor, mm_bf16)
        import os as _os
        _ablate = _os.environ.get("SGT_FUSED_ABLATE", "")  # timing experiments only

        def kernel(scal, data, noise,
                   _w_in, _vec_in, _mw_in, _vw_in, _mvec_in, _vvec_in,
                   w_ref, vec_ref, mw_ref, vw_ref, mvec_ref, vvec_ref,
                   losses_ref, gw, gvec, acc):
            # The six *_in refs alias the six *_ref outputs (input_output_aliases)
            # — same memory; all reads/writes go through the output refs.
            r = _SimpleNamespace(w=w_ref, vec=vec_ref, mw=mw_ref, vw=vw_ref,
                                 mvec=mvec_ref, vvec=vvec_ref,
                                 gw=gw, gvec=gvec, acc=acc, losses=losses_ref)
            ph = pl.program_id(1)
            t = pl.program_id(2)
            k_id = pl.program_id(0)
            last_k = k_id == pl.num_programs(0) - 1
            cn = bodies.consts(scal, k_id.astype(jnp.float32))

            @pl.when((k_id == 0) & (ph == 0) & (t == 0))
            def _bias_in():
                bodies.bias_in(r)

            @pl.when(t == 0)
            def _zero():
                bodies.zero_accums(r)

            @pl.when(ph == 0 if "nophase0" not in _ablate else ph == -1)
            def _critic_phase():
                bodies.critic_tile(r, cn, data[0], noise[0][0:2])

                @pl.when(t == n_tiles - 1 if "noapply" not in _ablate else t == -1)
                def _apply_critic():
                    bodies.critic_apply(r, cn)

            @pl.when(ph == 1 if "nophase1" not in _ablate else ph == -1)
            def _actor_phase():
                bodies.actor_tile(r, cn, data[0], noise[0][2:NHEAD])

                @pl.when(t == n_tiles - 1 if "noapply" not in _ablate else t == -1)
                def _apply_actor():
                    bodies.actor_apply(r, cn)

                    @pl.when(last_k)
                    def _bias_out():
                        bodies.bias_out(r)

        return kernel


    def _make_kernel_fold(obs_dim: int, n_tiles: int, alpha_floor: float,
                          mm_bf16: bool, rpb: int, L: int, bt: int):
        """Folded schedule: grid (K,) — ONE grid step per SAC update
        (VERDICT r4 item 3).  The (K, 2, T) schedule pays ~3.9 ms/call of
        per-grid-step fixed cost at the flagship's 256 grid steps (r4
        ablation); folding both phases and all batch tiles into one step
        cuts the step count 8x AND halves the batch DMA traffic (each tile
        was fetched twice — once per phase; here the minibatch is resident
        for both).

        Two data modes, mirroring `_kernel_call`:
        - rpb == 0 (batches mode): `data` is the (1, W, B) whole-minibatch
          VMEM block per grid step (Mosaic double-buffers it across k);
          tiles are lane-slices.
        - rpb > 0 (ring mode): `data` is the UNBLOCKED (rows, W, lanes)
          replay ring in ANY memory space; the kernel manually DMAs the
          update's rpb rows into a (2, W, rpb*L) VMEM scratch (row j at lane
          offset j*L, so the minibatch is CONTIGUOUS and compute tiles may
          span multiple replay rows — bt up to B), with the NEXT update's
          rows prefetched during the current update's compute (cross-k
          double buffering on `sem`)."""
        bodies = _make_bodies(obs_dim, alpha_floor, mm_bf16)
        ring_mode = rpb > 0

        def _compute(r, cn, k_id, get_tile, noise):
            last_k = k_id == pl.num_programs(0) - 1

            @pl.when(k_id == 0)
            def _bias_in():
                bodies.bias_in(r)

            bodies.zero_accums(r)
            for t in range(n_tiles):
                bodies.critic_tile(r, cn, get_tile(t),
                                   noise[0][0:2, t * bt:(t + 1) * bt])
            bodies.critic_apply(r, cn)
            bodies.zero_accums(r)
            for t in range(n_tiles):
                bodies.actor_tile(r, cn, get_tile(t),
                                  noise[0][2:NHEAD, t * bt:(t + 1) * bt])
            bodies.actor_apply(r, cn)

            @pl.when(last_k)
            def _bias_out():
                bodies.bias_out(r)

        if not ring_mode:
            def kernel(scal, data, noise,
                       _w_in, _vec_in, _mw_in, _vw_in, _mvec_in, _vvec_in,
                       w_ref, vec_ref, mw_ref, vw_ref, mvec_ref, vvec_ref,
                       losses_ref, gw, gvec, acc):
                r = _SimpleNamespace(w=w_ref, vec=vec_ref, mw=mw_ref, vw=vw_ref,
                                     mvec=mvec_ref, vvec=vvec_ref,
                                     gw=gw, gvec=gvec, acc=acc, losses=losses_ref)
                k_id = pl.program_id(0)
                cn = bodies.consts(scal, k_id.astype(jnp.float32))
                _compute(r, cn, k_id,
                         lambda t: data[0][:, t * bt:(t + 1) * bt], noise)

            return kernel

        def kernel(idx_ref, scal, ring, noise,
                   _w_in, _vec_in, _mw_in, _vw_in, _mvec_in, _vvec_in,
                   w_ref, vec_ref, mw_ref, vw_ref, mvec_ref, vvec_ref,
                   losses_ref, gw, gvec, acc, buf, sem):
            r = _SimpleNamespace(w=w_ref, vec=vec_ref, mw=mw_ref, vw=vw_ref,
                                 mvec=mvec_ref, vvec=vvec_ref,
                                 gw=gw, gvec=gvec, acc=acc, losses=losses_ref)
            k_id = pl.program_id(0)
            nk = pl.num_programs(0)
            cn = bodies.consts(scal, k_id.astype(jnp.float32))

            def row_copy(kk, j):
                kk = jnp.asarray(kk, jnp.int32)
                slot = jax.lax.rem(kk, jnp.int32(2))
                return pltpu.make_async_copy(
                    ring.at[idx_ref[kk * rpb + j]],
                    buf.at[slot, :, pl.ds(j * L, L)],
                    sem.at[slot, j])

            # Warm-up: k=0 fetches its own rows; every step prefetches k+1's
            # rows so their DMA overlaps this update's compute.
            @pl.when(k_id == 0)
            def _warm():
                for j in range(rpb):
                    row_copy(0, j).start()

            @pl.when(k_id + 1 < nk)
            def _prefetch():
                for j in range(rpb):
                    row_copy(k_id + 1, j).start()

            for j in range(rpb):
                row_copy(k_id, j).wait()

            slot = jax.lax.rem(jnp.asarray(k_id, jnp.int32), jnp.int32(2))

            def get_tile(t):
                return buf[slot, :, t * bt:(t + 1) * bt]

            _compute(r, cn, k_id, get_tile, noise)

        return kernel


    class FusedState(NamedTuple):
        """Kernel-layout learner state cached ACROSS train_iters.

        Re-deriving the (WROWS, H) weight matrices from the flax trees every
        train_iter cost ~2.4 ms of XLA op soup (pack_params/pack_wmat x3 +
        unpack x3) — a third of the whole iteration.  Keeping the canonical
        learner state in kernel layout makes the per-iter pack cost zero; the
        flax actor tree needed for rollouts is re-sliced from `w`/`vec` in a
        handful of cheap ops (see `unpack_actor`)."""

        w: jax.Array      # (WROWS, H) weights (actor | critics | targets | head)
        vec: jax.Array    # (VROWS, H) biases / w3 rows / misc
        mw: jax.Array     # Adam first moments, same layouts
        mvec: jax.Array
        vw: jax.Array     # Adam second moments
        vvec: jax.Array
        count: jax.Array  # () int32 optax-equivalent step count


    def fused_init(packed: PackedParams, adam: PackedAdam) -> FusedState:
        w, vec = pack_wmat(packed)
        mw, mvec = pack_wmat(adam.m)
        vw, vvec = pack_wmat(adam.v)
        return FusedState(w=w, vec=vec, mw=mw, mvec=mvec, vw=vw, vvec=vvec,
                          count=adam.count)


    def fused_unpack(f: FusedState) -> tuple[PackedParams, PackedAdam]:
        return unpack_wmat(f.w, f.vec), PackedAdam(
            m=unpack_wmat(f.mw, f.mvec), v=unpack_wmat(f.vw, f.vvec), count=f.count)


    def unpack_actor(w, vec, obs_dim: int, action_dim: int = 2):
        """Flax actor tree straight from the wmat rows — 8 slices, no staging
        through PackedParams (cheap enough to run every train_iter)."""
        misc = vec[V_MISC]
        wh = w[R_AWH:R_AWH + NHEAD]          # (4, H) head^T
        return {"params": {
            "MLP_0": {
                "Dense_0": {"kernel": w[R_AW1:R_AW1 + obs_dim], "bias": vec[V_AB1]},
                "Dense_1": {"kernel": w[R_AW2:R_AW2 + H], "bias": vec[V_AB2]},
            },
            "Dense_0": {"kernel": wh[:action_dim].T,
                        "bias": misc[M_ABH[0]:M_ABH[0] + action_dim]},
            "Dense_1": {"kernel": wh[action_dim:NHEAD].T,
                        "bias": misc[M_ABH[0] + action_dim:M_ABH[1]]},
        }}


    def _kernel_call(f: FusedState, data, row_idx, noises, *, obs_dim, gamma, tau,
                     lr, target_entropy, alpha_floor, block, interpret, mm_bf16,
                     fold=False):
        """Shared pallas_call driver for both sampling modes and both grid
        schedules.

        row_idx None: `data` is the packed (K, W, B) minibatch tensor (lanes
        minor) and tiles index it directly.  row_idx given: `data` is the whole
        (rows, W, lanes) replay ring; the indices are scalar-prefetched and each
        tile is DMA'd straight out of the ring (XLA row-gathers from HBM
        measured ~11 ms for 262K transitions — slower than the entire K-update
        kernel; the in-kernel DMA is free, double-buffered behind compute).

        fold=False: legacy (K, 2, T) grid — one batch tile per grid step via
        BlockSpec.  fold=True: (K,) grid — one grid step per update; batches
        mode fetches the whole minibatch as one block, ring mode manually DMAs
        the rpb replay rows with cross-k double buffering (see
        _make_kernel_fold).  Returns (FusedState', critic_losses (K,),
        actor_losses (K,))."""
        K, B = noises.shape[0], noises.shape[1]
        f32 = jnp.float32
        noise = jnp.swapaxes(noises.astype(f32).reshape(K, B, 4), 1, 2)  # (K, 4, B)

        scal = jnp.asarray([[
            gamma, tau, lr, target_entropy, f.count.astype(f32),
            jnp.log(alpha_floor) if alpha_floor > 0 else 0.0, 1.0 / B, 0.0,
        ]], f32)

        fold_scratch = []
        if row_idx is None:
            W = data.shape[1]
            bt = min(block, B)
            if B % bt:
                raise ValueError(f"batch {B} not divisible by block {bt}")
            n_tiles = B // bt
            extra, prefetch = (), 0
            rpb = tpr = 0
            if fold:
                data_spec = pl.BlockSpec(
                    (1, W, B), lambda k, *a: (k, 0, 0), memory_space=pltpu.VMEM)
            else:
                data_spec = pl.BlockSpec(
                    (1, W, bt), lambda k, ph, t, *a: (k, 0, t),
                    memory_space=pltpu.VMEM)
        else:
            R, W, L = data.shape
            rpb, rem = divmod(B, L)
            if rem:
                raise ValueError(f"batch {B} must be a multiple of lanes {L}")
            if row_idx.shape != (K * rpb,):
                raise ValueError(f"row_idx {row_idx.shape} != ({K * rpb},)")
            bt = min(block, L)
            if L % bt:
                raise ValueError(f"lanes {L} not divisible by block {bt}")
            tpr = L // bt                 # tiles per replay row
            n_tiles = rpb * tpr           # tiles per minibatch
            extra, prefetch = (row_idx.astype(jnp.int32),), 1
            if fold:
                # Unblocked ring in ANY: the kernel DMAs rows itself, row j
                # landing at lane offset j*L of a contiguous (W, B) buffer —
                # so compute tiles may span MULTIPLE replay rows (the legacy
                # grid caps bt at L; bigger tiles amortize the per-matmul
                # latency that dominates at these sizes).
                bt = min(block, B)
                if B % bt:
                    raise ValueError(f"batch {B} not divisible by block {bt}")
                tpr = 0
                n_tiles = B // bt
                data_spec = pl.BlockSpec(memory_space=pl.ANY)
                fold_scratch = [
                    pltpu.VMEM((2, W, rpb * L), f32),
                    pltpu.SemaphoreType.DMA((2, rpb)),
                ]
            else:
                # tile t of minibatch k covers lane-block t % tpr of replay row
                # row_idx[k*rpb + t//tpr]
                data_spec = pl.BlockSpec(
                    (1, W, bt),
                    lambda k, ph, t, idx: (idx[k * rpb + t // tpr], 0, t % tpr),
                    memory_space=pltpu.VMEM)

        if fold:
            kernel = _make_kernel_fold(obs_dim, n_tiles, alpha_floor, mm_bf16,
                                       rpb, (data.shape[2] if row_idx is not None
                                             else 0), bt)
            grid = (K,)
            kmap = lambda k, *a: (k, 0, 0)
            fullmap = lambda shape: (lambda k, *a: (0,) * len(shape))
            noise_spec = pl.BlockSpec((1, 4, B), lambda k, *a: (k, 0, 0),
                                      memory_space=pltpu.VMEM)
            smem_map = lambda k, *a: (0, 0)
        else:
            kernel = _make_kernel(obs_dim, n_tiles, alpha_floor, mm_bf16)
            grid = (K, 2, n_tiles)
            kmap = lambda k, ph, t, *a: (k, 0, 0)
            fullmap = lambda shape: (lambda k, ph, t, *a: (0,) * len(shape))
            noise_spec = pl.BlockSpec((1, 4, bt), lambda k, ph, t, *a: (k, 0, t),
                                      memory_space=pltpu.VMEM)
            smem_map = lambda k, ph, t, *a: (0, 0)
        full = lambda shape: pl.BlockSpec(shape, fullmap(shape),
                                          memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=prefetch,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 8), smem_map, memory_space=pltpu.SMEM),
                data_spec, noise_spec,
                full((WROWS, H)), full((VROWS, H)),
                full((WROWS, H)), full((WROWS, H)),
                full((VROWS, H)), full((VROWS, H)),
            ],
            out_specs=[
                full((WROWS, H)), full((VROWS, H)),
                full((WROWS, H)), full((WROWS, H)),
                full((VROWS, H)), full((VROWS, H)),
                pl.BlockSpec((1, 8, 128), kmap, memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((GROWS, H), f32),
                pltpu.VMEM((VROWS, H), f32),
                pltpu.SMEM((4,), f32),
            ] + fold_scratch,
        )

        needs_idx = bool(prefetch) and not (fold and row_idx is not None)
        body = ((lambda idx_ref, *refs: kernel(*refs)) if needs_idx else kernel)
        nargs = prefetch
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
            # the six param operands alias the six outputs (offset by the
            # scalar-prefetch operand + scal + data + noise)
            input_output_aliases={nargs + 3 + i: i for i in range(6)},
            # v5e has 128 MiB of VMEM; the compiler's default scoped limit is
            # 16 MiB.  The resident params+moments (12.2 MiB at H=256) plus
            # per-tile activations want more headroom at larger K/tiles —
            # but do NOT hand the kernel everything: at H=512 a 100 MiB claim
            # inside a lax.scan SILENTLY CORRUPTED the aliased buffers
            # (deterministic garbage -> NaN; the enclosing loop's VMEM and
            # the kernel's claim overlapped).  64 MiB is measured-safe and
            # fits both widths' working sets (~25 MiB at 256, ~45 at 512).
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(*extra, scal, data, noise, f.w, f.vec, f.mw, f.vw, f.mvec, f.vvec)

        w2, vec2, mw2, vw2, mvec2, vvec2, losses3 = out
        losses = losses3[:, 0, :2]
        f2 = FusedState(w=w2, vec=vec2, mw=mw2, mvec=mvec2, vw=vw2, vvec=vvec2,
                        count=f.count + K)
        return f2, losses[:, 0], losses[:, 1]


    def fused_update_k_wmat(f: FusedState, ring, row_idx, noises, **kw):
        """K SAC updates on the cached kernel-layout state, sampling the replay
        ring in-kernel.  The zero-copy production path (models/sac.py)."""
        return _kernel_call(f, ring, row_idx, noises,
                            **{"block": 2048, "interpret": False, "mm_bf16": True, **kw})


    def fused_update_k_wmat_batches(f: FusedState, batches, noises, **kw):
        """Same, on explicitly gathered (K, B) Transition minibatches."""
        obs_dim = kw["obs_dim"]
        data = pack_slab(batches, obs_dim, 2).astype(jnp.float32)  # (K, W, B)
        return _kernel_call(f, data, None, noises,
                            **{"block": 2048, "interpret": False, "mm_bf16": True, **kw})


    @functools.partial(
        jax.jit,
        static_argnames=("obs_dim", "gamma", "tau", "lr", "target_entropy",
                         "alpha_floor", "block", "interpret", "mm_bf16", "fold"),
    )
    def fused_update_k(packed: PackedParams, adam: PackedAdam, batches, noises,
                       obs_dim: int, gamma: float, tau: float, lr: float,
                       target_entropy: float, alpha_floor: float = 0.0,
                       block: int = 512, interpret: bool = False,
                       mm_bf16: bool = True, fold: bool = False):
        """K sequential SAC updates in one Pallas kernel launch (PackedParams
        boundary; tests and one-off callers — the trainer keeps a FusedState and
        calls fused_update_k_wmat* to skip the pack/unpack).

        batches: Transition with leading (K, B); noises: (K, B, 2, 2) as in
        update_k_reference.  Returns (packed', adam', critic_losses (K,),
        actor_losses (K,))."""
        f = fused_init(packed, adam)
        f2, closs, aloss = fused_update_k_wmat_batches(
            f, batches, noises, obs_dim=obs_dim, gamma=gamma, tau=tau, lr=lr,
            target_entropy=target_entropy, alpha_floor=alpha_floor, block=block,
            interpret=interpret, mm_bf16=mm_bf16, fold=fold)
        packed2, adam2 = fused_unpack(f2)
        return packed2, adam2, closs, aloss


    @functools.partial(
        jax.jit,
        static_argnames=("obs_dim", "gamma", "tau", "lr", "target_entropy",
                         "alpha_floor", "block", "interpret", "mm_bf16", "fold"),
    )
    def fused_update_k_from_replay(packed: PackedParams, adam: PackedAdam,
                                   data, row_idx, noises,
                                   obs_dim: int, gamma: float, tau: float, lr: float,
                                   target_entropy: float, alpha_floor: float = 0.0,
                                   block: int = 512, interpret: bool = False,
                                   mm_bf16: bool = True, fold: bool = False):
        """K sequential SAC updates sampling the replay buffer IN-KERNEL, from
        the PackedParams boundary (see fused_update_k docstring and _kernel_call
        for the sampling mechanics).

        data: the packed (rows, W, lanes) ReplayState.data ring (f32, lanes
        minor); row_idx: (K * B//lanes,) int32 rows (caller bounds by `filled`);
        noises: (K, B, 2, 2).  B = rows-per-minibatch * lanes."""
        f = fused_init(packed, adam)
        f2, closs, aloss = fused_update_k_wmat(
            f, data, row_idx, noises, obs_dim=obs_dim, gamma=gamma, tau=tau,
            lr=lr, target_entropy=target_entropy, alpha_floor=alpha_floor,
            block=block, interpret=interpret, mm_bf16=mm_bf16, fold=fold)
        packed2, adam2 = fused_unpack(f2)
        return packed2, adam2, closs, aloss

    ns = _SimpleNamespace(
        **{k: v for k, v in list(locals().items()) if k not in ("ns", "h")})
    # module-level (width-independent) names consumers reach through the
    # namespace too
    ns.PackedParams = PackedParams
    ns.PackedAdam = PackedAdam
    ns.IN1 = IN1
    ns.NHEAD = NHEAD
    return ns


@functools.lru_cache(maxsize=None)
def build(h: int = 256):
    """Width-h fused-SAC namespace (memoized; build(256) == module level)."""
    if h % 128:
        raise ValueError(f"fused hidden width must be a multiple of 128, got {h}")
    return _build_width(int(h))


_DEFAULT = build(256)
globals().update({k: v for k, v in vars(_DEFAULT).items() if k != "H"})
H = 256  # default hidden width (flagship SB3-default 2x256 MLPs)
