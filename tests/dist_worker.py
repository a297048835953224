"""Worker process for the two-process jax.distributed CPU test
(tests/test_distributed.py).  Not a pytest module.

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent); after
`init_distributed` the global view is 2 processes x 4 devices = 8.  Both
processes build the sharded SAC trainer over the global mesh, run two train
iterations, and print a checksum of the (replicated) learner parameters —
the parent asserts the checksums agree across processes, i.e. the gradient
all-reduce produced identical replicated params on every host.

Usage: python tests/dist_worker.py <rank> <nproc> <coordinator_port>
"""
import os
import sys


def main():
    rank, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from space_gym_tpu.parallel.distributed import init_distributed, local_lane_slice

    idx = init_distributed(f"127.0.0.1:{port}", num_processes=nproc, process_id=rank)
    assert idx == rank, (idx, rank)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    sl = local_lane_slice(32)
    assert sl == slice(rank * 16, (rank + 1) * 16), sl

    import numpy as np

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine
    from space_gym_tpu.models import SACConfig, SACTrainer
    from space_gym_tpu.parallel import make_mesh, place, trainer_state_shardings

    mesh = make_mesh(4 * nproc, model_parallel=2)
    eng = EnvEngine(space_gym_tpu.get_config("GoalContinuous2P-v0"))
    cfg = SACConfig(
        lanes=32, rollout_len=4, replay_rows=16, batch_size=64,
        updates_per_iter=1, warmup_rows=4,
    )
    tr = SACTrainer(eng, cfg)
    state = tr.init(jax.random.key(0))
    shardings = trainer_state_shardings(state, mesh, 2)
    state = place(state, shardings)

    with mesh:
        for i in range(2):
            state, metrics = tr.train_iter(state, jax.random.key(1 + i))
        vals = {k: float(np.asarray(v)) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals

    # Params are replicated: identical on every process iff the gradient
    # all-reduce is consistent.  Checksum only fully-replicated leaves.
    from jax.flatten_util import ravel_pytree

    flat, _ = ravel_pytree(jax.tree.map(lambda x: np.asarray(x), state.actor_params))
    checksum = float(np.sum(np.abs(flat))) + float(np.asarray(state.log_alpha))
    print(f"CHECKSUM {checksum:.17e}", flush=True)
    print(f"METRICS {sorted(vals.items())}", flush=True)

    # FUSED flagship path over the same global mesh: the kernel-layout
    # FusedState (wmat) is replicated; it must also agree bit-for-bit across
    # processes after the scanned train_iters' gradient all-reduce.
    trf = SACTrainer(eng, SACConfig(
        lanes=32, rollout_len=4, replay_rows=16, batch_size=64,
        updates_per_iter=2, warmup_rows=4, fused_updates=True, fused_block=64,
    ))
    statef = trf.init(jax.random.key(0))
    statef = place(statef, trainer_state_shardings(statef, mesh, 2))
    with mesh:
        statef, mf = trf.train_iters(statef, jax.random.key(9), n=2)
        valsf = {k: float(np.asarray(v)) for k, v in mf.items()}
    assert all(np.isfinite(v) for v in valsf.values()), valsf
    wsum = float(np.sum(np.abs(np.asarray(statef.fused.w))))
    vsum = float(np.sum(np.abs(np.asarray(statef.fused.vec))))
    print(f"FUSED_CHECKSUM {wsum:.17e} {vsum:.17e}", flush=True)
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
