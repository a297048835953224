#!/usr/bin/env python
"""Rebuild a resumable orbax checkpoint from a compact learner-state npz
(docs/kepler_sac_learner_r2c.npz, or a train.py `<ckpt>.best.npz` sidecar).

The npz holds the fused kernel-layout learner (FusedState fields + log_alpha
+ step); env state and the replay ring are reinitialized — off-policy SAC
refills the ring within a few rollouts, so training continues with only a
brief dip instead of losing the ~1.4B-step learner to a /tmp wipe.

With --obs-features the target run uses engine-level obs featurization
(engine/core.py obs_features), whose obs_dim is wider than the saved
learner's.  The learner is then migrated function-preservingly: the new
feature columns enter through ZERO first-layer weight rows (actor appends
them after the obs block; critics also shift their action rows up), so the
restored policy behaves exactly like the saved one until training moves the
new rows off zero.

Usage (matches the Kepler runbook hyperparameters in NEXT.md):
  python tools/restore_learner.py --npz docs/kepler_sac_learner_r2c.npz \
      --env KeplerCircleOrbit-v0 --out /tmp/sac_kepler_feat \
      --obs-features kepler --from-obs-dim 10 \
      --lanes 2048 --rollout-len 8 --updates-per-iter 32 --batch-size 8192 \
      --replay-rows 2048
then: tools/train.py ... --obs-features kepler --ckpt /tmp/sac_kepler_feat \
      --resume --fused
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def expand_first_layer(tree, old_d: int, new_d: int, has_action: bool):
    """Zero-pad a flax MLP tree's first Dense kernel from old_d to new_d obs
    columns.  Actor input is [obs]; critic input is [obs | action], so its
    action rows move from old_d: to new_d: with zeros in between.

    Raises if NO first-layer kernel matched old_d (a wrong --from-obs-dim, or
    re-migrating an already-expanded learner, would otherwise silently no-op
    and still print the success message — ADVICE r3)."""
    import jax
    import jax.numpy as jnp

    grow = new_d - old_d
    n_expanded = [0]

    def fix(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if names[-1] != "kernel" or "Dense_0" not in names[-2]:
            return leaf
        # only first-layer kernels fed by obs have old_d or old_d+2 rows
        if leaf.ndim != 2 or leaf.shape[0] not in (old_d, old_d + 2):
            return leaf
        if leaf.shape[0] == old_d and not has_action:
            n_expanded[0] += 1
            return jnp.concatenate(
                [leaf, jnp.zeros((grow, leaf.shape[1]), leaf.dtype)])
        if leaf.shape[0] == old_d + 2 and has_action:
            n_expanded[0] += 1
            return jnp.concatenate(
                [leaf[:old_d], jnp.zeros((grow, leaf.shape[1]), leaf.dtype),
                 leaf[old_d:]])
        return leaf

    out = jax.tree_util.tree_map_with_path(fix, tree)
    if n_expanded[0] == 0:
        raise SystemExit(
            f"expand_first_layer: no first-layer kernel has {old_d} "
            f"(or {old_d + 2}) input rows — wrong --from-obs-dim, or the "
            "learner was already migrated")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", required=True)
    ap.add_argument("--env", default="KeplerCircleOrbit-v0")
    ap.add_argument("--out", required=True, help="orbax checkpoint dir to write")
    ap.add_argument("--obs-features", default=None, choices=["kepler", "goal", "dnc"],
                    help="target engine obs featurization (must match the "
                         "training run's --obs-features)")
    ap.add_argument("--from-obs-dim", type=int, default=None,
                    help="obs_dim the npz learner was trained with; when it "
                         "differs from the target engine's obs_dim the "
                         "learner is migrated via zero first-layer rows")
    ap.add_argument("--lanes", type=int, default=2048)
    ap.add_argument("--rollout-len", type=int, default=8)
    ap.add_argument("--updates-per-iter", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--replay-rows", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from space_gym_tpu.utils.jaxplat import pin_cpu_if_requested

    pin_cpu_if_requested()
    import jax.numpy as jnp
    import numpy as np

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine
    from space_gym_tpu.models import SACConfig, SACTrainer, networks
    from space_gym_tpu.models import fused_sac as fs
    from space_gym_tpu.models.fused_sac import FusedState, unpack_actor
    from space_gym_tpu.utils import checkpoint as ckpt

    eng = EnvEngine(space_gym_tpu.get_config(args.env),
                    physics="pallas" if jax.default_backend() == "tpu" else "fixed",
                    obs_features=args.obs_features)
    tr = SACTrainer(eng, SACConfig(
        lanes=args.lanes, rollout_len=args.rollout_len,
        updates_per_iter=args.updates_per_iter, batch_size=args.batch_size,
        replay_rows=args.replay_rows, fused_updates=True,
        fused_block=min(2048, args.batch_size)))
    state = tr.init(jax.random.key(args.seed))

    z = np.load(args.npz)
    fused = FusedState(**{f: jnp.asarray(z[f]) for f in FusedState._fields})
    # Newer npzs record their training obs_dim/obs_features (train.py
    # save_learner_npz); trust them over the CLI so a wrong/omitted
    # --from-obs-dim can't silently mis-slice the packed learner (ADVICE r3).
    if "obs_dim" in z.files:
        npz_d = int(z["obs_dim"])
        if args.from_obs_dim is not None and args.from_obs_dim != npz_d:
            raise SystemExit(
                f"--from-obs-dim {args.from_obs_dim} contradicts the npz's "
                f"recorded obs_dim {npz_d}")
        old_d = npz_d
    else:
        old_d = args.from_obs_dim or tr.obs_dim
    if "obs_features" in z.files:
        npz_feats = str(z["obs_features"]) or None
        if npz_feats != args.obs_features and old_d == tr.obs_dim:
            raise SystemExit(
                f"npz was trained with obs_features={npz_feats!r} but the "
                f"target engine uses {args.obs_features!r} (same obs_dim — "
                "the learner would read the wrong columns)")

    if old_d != tr.obs_dim:
        # Migrate through the flax bridges: unpack at the OLD obs_dim,
        # zero-expand the first-layer kernels (params AND Adam moments),
        # re-pack at the new obs_dim.
        hidden = tr.cfg.hidden
        k = jax.random.key(0)
        a_tpl = networks.TanhGaussianActor(tr.action_dim, hidden).init(
            k, jnp.zeros((1, old_d), jnp.float32))
        c_tpl = networks.DoubleCritic(hidden).init(
            k, jnp.zeros((1, old_d), jnp.float32),
            jnp.zeros((1, tr.action_dim), jnp.float32))
        packed, adam = fs.fused_unpack(fused)

        def expand_packed(p):
            a, c, t, la = fs.unpack_params(p, a_tpl, c_tpl)
            a = expand_first_layer(a, old_d, tr.obs_dim, has_action=False)
            c = expand_first_layer(c, old_d, tr.obs_dim, has_action=True)
            t = expand_first_layer(t, old_d, tr.obs_dim, has_action=True)
            return fs.pack_params(a, c, t, la)

        fused = fs.fused_init(
            expand_packed(packed),
            fs.PackedAdam(m=expand_packed(adam.m), v=expand_packed(adam.v),
                          count=adam.count))
        print(f"expanded learner obs_dim {old_d} -> {tr.obs_dim} "
              "(zero rows for the new feature columns)")

    state = state._replace(
        fused=fused,
        actor_params=unpack_actor(fused.w, fused.vec, tr.obs_dim, tr.action_dim),
        log_alpha=jnp.asarray(z["log_alpha"]),
        step=jnp.asarray(z["step"], jnp.int32),
    )
    ckpt.save(args.out, state)
    print(f"wrote {args.out}: step {int(z['step'])}, "
          f"fused count {int(z['count'])} (replay/env state fresh)")


if __name__ == "__main__":
    main()
