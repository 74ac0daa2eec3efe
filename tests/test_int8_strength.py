"""Play-strength validation of int8 quantized inference (the check
``models/quantized.py``'s design notes promise): the quantized net must
agree with bf16 on move choice almost everywhere, and an int8-backed MCTS
player must hold its own in a head-to-head arena match against the same
network in bf16.

Runs on CPU via the lax-only ``int8_xla`` path (identical weights/scales
to the Pallas kernel — cross-checked in test_pallas_resnet.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from othello_reinforcement_learning_test_tpu.evaluation import Arena, MCTSPlayer
from othello_reinforcement_learning_test_tpu.models.pallas_resnet import (
    FusedInference,
)
from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine
from othello_reinforcement_learning_test_tpu.train import checkpoint as ckpt_lib
from othello_reinforcement_learning_test_tpu.train.trainer import apply_eval

@pytest.fixture(scope="module")
def setup(test_checkpoint):
    eng = get_engine(8, "reference")
    bf16_player = MCTSPlayer.from_checkpoint(test_checkpoint, engine=eng,
                                             num_simulations=10)
    model = bf16_player.model if hasattr(bf16_player, "model") else None
    return eng, bf16_player, model, test_checkpoint


def _random_positions(eng, rng, n=256, plies=12):
    boards = eng.initial_state((n,))
    for _ in range(plies):
        legal, term, _ = eng.observe(boards, with_features=False)
        rng, k = jax.random.split(rng)
        act = jax.random.categorical(
            k, jnp.where(legal, 0.0, -jnp.inf), axis=-1).astype(jnp.int32)
        nxt, _ = eng.step(boards, act, pass_legal=legal[..., eng.pass_action])
        live = ~term
        boards = jax.tree.map(
            lambda a, b: jnp.where(
                live.reshape(live.shape + (1,) * (a.ndim - 1)), a, b),
            nxt, boards)
    return boards


def test_int8_agrees_with_bf16_on_move_choice(setup):
    """Direct net outputs: the int8 policy's argmax matches bf16's on the
    overwhelming majority of diverse midgame positions."""
    eng, bf16_player, _, ckpt = setup
    from othello_reinforcement_learning_test_tpu.models import OthelloResNet

    cfg = ckpt_lib.load_config(ckpt)["model"]
    model = OthelloResNet(num_blocks=cfg["num_blocks"],
                          num_filters=cfg["num_filters"],
                          board_size=cfg.get("board_size", 8))
    variables = bf16_player.variables
    fused = FusedInference(model, variant="int8_xla")

    boards = _random_positions(eng, jax.random.PRNGKey(0))
    legal, _, _, feats = eng.observe(boards, with_features=True)
    lp_a, v_a = apply_eval(model)(variables, feats)
    lp_b, v_b = fused(variables, feats)
    best_a = jnp.argmax(jnp.where(legal, lp_a, -jnp.inf), axis=-1)
    best_b = jnp.argmax(jnp.where(legal, lp_b, -jnp.inf), axis=-1)
    agreement = float((best_a == best_b).mean())
    assert agreement >= 0.9, f"int8 move agreement only {agreement:.1%}"
    # values highly correlated too
    corr = float(jnp.corrcoef(v_a.ravel(), v_b.ravel())[0, 1])
    assert corr > 0.95, f"int8 value correlation only {corr:.3f}"


def test_int8_mcts_holds_its_own_in_arena(setup):
    """Head-to-head: int8-inference MCTS vs bf16 MCTS over 16 randomized-
    opening games must not be one-sided (quantization preserves strength)."""
    eng, bf16_player, _, ckpt = setup
    from othello_reinforcement_learning_test_tpu.models import OthelloResNet

    cfg = ckpt_lib.load_config(ckpt)["model"]
    model = OthelloResNet(num_blocks=cfg["num_blocks"],
                          num_filters=cfg["num_filters"],
                          board_size=cfg.get("board_size", 8))
    int8_player = MCTSPlayer(
        eng, FusedInference(model, variant="int8_xla"),
        bf16_player.variables, num_simulations=10)
    int8_player.name = "MCTS-int8"

    summary = Arena(eng).play_matches(
        int8_player, bf16_player, 16, jax.random.PRNGKey(5),
        opening_random_plies=6)
    assert summary.wins + summary.losses + summary.draws == 16
    # not one-sided: the quantized player wins a meaningful share
    assert 0.2 <= (summary.wins + 0.5 * summary.draws) / 16 <= 0.8, (
        f"int8 vs bf16 lopsided: {summary.wins}W-{summary.losses}L-"
        f"{summary.draws}D")
