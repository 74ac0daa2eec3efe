"""Multi-device sharding tests on the virtual 8-device CPU mesh
(the JAX-native 'multi-node without a cluster' strategy, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as graft
from othello_reinforcement_learning_test_tpu.models import OthelloResNet, init_variables
from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine
from othello_reinforcement_learning_test_tpu.parallel import (
    leading_axis_sharding,
    make_mesh,
)
from othello_reinforcement_learning_test_tpu.train import apply_eval, play_games


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_entry_compiles():
    fn, (variables, x) = graft.entry()
    jitted = jax.jit(fn)
    log_p, v = jitted(variables, x)
    assert log_p.shape == (256, 65) and v.shape == (256, 1)


def test_dryrun_multichip():
    graft.dryrun_multichip(8)


def test_sharded_selfplay_matches_semantics():
    """play_games with a dp mesh produces valid trajectories sharded over
    devices and identical results to the unsharded run (same seed)."""
    engine = get_engine(8)
    model = OthelloResNet(num_blocks=1, num_filters=8)
    variables = init_variables(model, jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    kwargs = dict(
        num_games=16, num_simulations=2, temperature_threshold=10
    )
    t_sharded = play_games(
        engine, apply_eval(model), variables, jax.random.PRNGKey(7),
        mesh=mesh, **kwargs,
    )
    t_plain = play_games(
        engine, apply_eval(model), variables, jax.random.PRNGKey(7), **kwargs
    )
    np.testing.assert_array_equal(
        np.asarray(t_sharded.mask), np.asarray(t_plain.mask)
    )
    np.testing.assert_array_equal(
        np.asarray(t_sharded.me), np.asarray(t_plain.me)
    )
    np.testing.assert_allclose(
        np.asarray(t_sharded.value), np.asarray(t_plain.value)
    )
    # the games axis is actually distributed
    shard_devs = {s.device for s in t_sharded.mask.addressable_shards}
    assert len(shard_devs) == 8


def test_sharded_cond_decimation_bit_identical():
    """The decimated-cond program (self_play.cond_interval > 1) must compile
    and execute under the dp mesh — where the liveness conds lower to
    cross-shard all-reduces — and stay bit-identical to the k=1 sharded
    run (the lever exists FOR meshes; the unsharded identity is covered in
    tests/test_train.py)."""
    engine = get_engine(8)
    model = OthelloResNet(num_blocks=1, num_filters=8)
    variables = init_variables(model, jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    kwargs = dict(
        num_games=16, num_simulations=2, temperature_threshold=10, mesh=mesh
    )
    t_k1 = play_games(
        engine, apply_eval(model), variables, jax.random.PRNGKey(7), **kwargs
    )
    t_k4 = play_games(
        engine, apply_eval(model), variables, jax.random.PRNGKey(7),
        cond_interval=4, **kwargs,
    )
    for a, b in zip(t_k1, t_k4):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    shard_devs = {s.device for s in t_k4.mask.addressable_shards}
    assert len(shard_devs) == 8


def test_leading_axis_sharding_spec():
    mesh = make_mesh(4)
    s = leading_axis_sharding(mesh, 3)
    x = jax.device_put(jnp.zeros((8, 2, 2)), s)
    assert len({sh.device for sh in x.addressable_shards}) == 4


def test_arena_sharded_matches_unsharded():
    """A dp-sharded arena match returns the same results as unsharded
    (same rng => same games; only the device layout differs)."""
    from othello_reinforcement_learning_test_tpu.evaluation.arena import Arena
    from othello_reinforcement_learning_test_tpu.evaluation.players import (
        GreedyPlayer,
        RandomPlayer,
    )
    from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine

    engine = get_engine(8, "reference")
    mesh = make_mesh(8)
    p1, p2 = RandomPlayer(engine), GreedyPlayer(engine)
    s_plain = Arena(engine).play_matches(
        p1, p2, num_games=16, rng=jax.random.PRNGKey(5),
        opening_random_plies=2,
    )
    s_shard = Arena(engine, mesh=mesh).play_matches(
        p1, p2, num_games=16, rng=jax.random.PRNGKey(5),
        opening_random_plies=2,
    )
    assert (s_plain.wins, s_plain.losses, s_plain.draws) == (
        s_shard.wins, s_shard.losses, s_shard.draws
    )
    assert s_plain.avg_score == s_shard.avg_score
    assert s_plain.avg_moves == s_shard.avg_moves
