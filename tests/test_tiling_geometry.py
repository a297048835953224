"""Closed-form tiling geometry vs brute force (the reference derives
compute_tiling_rows_cols_a symbolically in notebooks/hexagonal_tiling.ipynb;
this is the executable version of that proof artifact)."""
import math

import numpy as np
import pytest

from space_gym_tpu.tiling.geometry import compute_tiling_rows_cols_a, make_tiling


@pytest.mark.parametrize("min_tiles", list(range(2, 40)))
@pytest.mark.parametrize("world_size", [1.0, 2.0, 3.0, 6.0])
def test_rows_cols_satisfy_min_tiles(min_tiles, world_size):
    r, c, a = compute_tiling_rows_cols_a(min_tiles, world_size)
    assert r * c >= min_tiles
    # Hexagons must fit the world: vertical extent (2r+1)*hex_height/2 fits,
    # horizontal extent 3a(c-1)/2 + 2a fits.
    hex_height = a * math.sqrt(3)
    assert (2 * r + 1) * hex_height / 2 <= world_size * (1 + 1e-9)
    assert 3 * a * (c - 1) / 2 + 2 * a <= world_size * (1 + 1e-9)


@pytest.mark.parametrize("min_tiles,world_size", [(m, 3.0) for m in range(2, 30)])
def test_rows_minimal(min_tiles, world_size):
    """r is the smallest row count whose induced column count reaches
    min_tiles (the reference increments r until r*c >= m)."""
    r, c, a = compute_tiling_rows_cols_a(min_tiles, world_size)
    if r > 1:
        rm = r - 1
        cm = int(math.floor(2 * math.sqrt(3) * rm / 3 - 1 / 3 + math.sqrt(3) / 3))
        assert rm * cm < min_tiles


def test_reference_configs_geometry():
    """The three registered Goal configs produce the known tilings:
    2P -> 2x2, 3P -> 3x3, 4P -> 4x4 (SURVEY analysis of min_tiles)."""
    t2 = make_tiling(2, 3.0)
    assert (t2.rows, t2.cols, t2.n_tiles) == (2, 2, 4)
    t3 = make_tiling(3, 3.0)
    assert (t3.rows, t3.cols, t3.n_tiles) == (3, 3, 9)
    t4 = make_tiling(4, 3.0)
    assert (t4.rows, t4.cols, t4.n_tiles) == (4, 4, 16)
    for t in (t2, t3, t4):
        assert t.goal_radius == t.ship_radius == t.planets_radius / 2
        assert t.planets_radius == pytest.approx(t.hex_height / 2 * 0.75)


def test_engine_discrete_matches_host_single_steps():
    """Discrete-action physics: engine fixed integrator vs host adapter from
    identical states (DNC has no RNG in step, so trajectories align)."""
    import jax
    import jax.numpy as jnp

    import space_gym_tpu
    from space_gym_tpu.engine import EnvEngine

    env = space_gym_tpu.make("DoNotCrashDiscrete-v0", physics="host")
    env.seed(5)
    env.reset()
    eng = EnvEngine(env.config, physics="fixed", dtype=jnp.float64, substeps=4)
    phys = jax.jit(eng._physics)
    planets = jnp.asarray(env.config.fixed_planet_pos, jnp.float64)
    rng = np.random.RandomState(0)
    for t in range(60):
        raw = int(rng.randint(6))
        y0 = env._state_vec.copy()
        obs, r, done, _ = env.step(raw)
        a = eng._translate_action(jnp.asarray(raw))
        y, term = phys(jnp.asarray(y0), a, planets)
        y = np.asarray(y)
        np.testing.assert_allclose(y, env._state_vec, rtol=0, atol=5e-5, err_msg=f"t={t}")
        if done:
            env.reset()
