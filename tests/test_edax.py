"""Edax subprocess adapter (VERDICT round 1 item 9).

Drives ``EdaxPlayer`` against the checked-in fake binary
(``tests/fake_edax.py``), which speaks the same console protocol with an
independent plain-Python rules implementation. The reference's EdaxPlayer
never implements its protocol (``/root/reference/src/eval/players.py:
226-262``); here it is real, with a declared random fallback when no
binary exists."""

import os
import stat

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from othello_reinforcement_learning_test_tpu.evaluation.players import (
    EdaxPlayer,
    GreedyPlayer,
)
from othello_reinforcement_learning_test_tpu.evaluation.arena import Arena
from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine

FAKE = os.path.join(os.path.dirname(__file__), "fake_edax.py")


@pytest.fixture(scope="module")
def fake_edax():
    st = os.stat(FAKE)
    os.chmod(FAKE, st.st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    return FAKE


@pytest.fixture(scope="module")
def engine():
    # standard rules so the adapter's legality agrees with the fake engine
    return get_engine(8, "standard")


def test_no_binary_falls_back_to_random(engine):
    p = EdaxPlayer(engine, binary_path="/nonexistent/edax")
    assert p.name == "Edax(random-fallback)"
    boards = engine.initial_state((4,))
    a = p.act(jax.random.PRNGKey(0), boards)
    legal = engine.legal_actions(boards)
    assert all(bool(legal[i, int(a[i])]) for i in range(4))


def test_fake_binary_first_legal_move(engine, fake_edax):
    p = EdaxPlayer(engine, binary_path=fake_edax)
    assert p.name.startswith("Edax(L")
    boards = engine.initial_state((3,))
    a = np.asarray(p.act(jax.random.PRNGKey(0), boards))
    # initial position, black to move: legal = {19, 26, 37, 44}; fake picks
    # the first in row-major order = 19 (row 2, col 3 -> D3)
    assert (a == 19).all()
    p.close()


def test_protocol_midgame_and_both_colors(engine, fake_edax):
    p = EdaxPlayer(engine, binary_path=fake_edax)
    boards = engine.initial_state((1,))
    legal = engine.legal_actions(boards)
    for _ in range(6):  # walk plies, alternating colors, engine vs itself
        a = p.act(jax.random.PRNGKey(0), boards)
        assert bool(legal[0, int(a[0])]), f"illegal reply {int(a[0])}"
        boards, ok = engine.step(boards, a)
        assert bool(ok[0])
        legal = engine.legal_actions(boards)
    p.close()


def test_edax_in_batched_arena(engine, fake_edax):
    """The adapter composes with the jitted lockstep arena via io_callback."""
    p = EdaxPlayer(engine, binary_path=fake_edax)
    g = GreedyPlayer(engine)
    arena = Arena(engine)
    s = arena.play_matches(p, g, num_games=2, rng=jax.random.PRNGKey(1))
    assert s.wins + s.losses + s.draws == 2
    assert all(r.num_moves > 10 for r in s.results)
    p.close()


def test_illegal_reply_falls_back_to_first_legal(engine, tmp_path):
    """A binary that answers garbage can't crash a match."""
    bad = tmp_path / "bad_edax.py"
    bad.write_text(
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "for line in sys.stdin:\n"
        "    if line.strip() == 'quit': break\n"
        "    if line.startswith('go'): print('Edax plays Z9', flush=True)\n"
        "    else: print('ok', flush=True)\n"
    )
    bad.chmod(0o755)
    p = EdaxPlayer(engine, binary_path=str(bad))
    boards = engine.initial_state((2,))
    a = np.asarray(p.act(jax.random.PRNGKey(0), boards))
    legal = np.asarray(engine.legal_actions(boards))
    assert all(legal[i, a[i]] for i in range(2))
    assert (a == np.argmax(legal, axis=1)).all()
    p.close()


def test_dead_binary_falls_back(engine, tmp_path):
    """A binary that exits immediately degrades to first-legal, no crash."""
    dead = tmp_path / "dead_edax.sh"
    dead.write_text("#!/bin/sh\nexit 0\n")
    dead.chmod(0o755)
    p = EdaxPlayer(engine, binary_path=str(dead))
    boards = engine.initial_state((1,))
    a = np.asarray(p.act(jax.random.PRNGKey(0), boards))
    legal = np.asarray(engine.legal_actions(boards))
    assert legal[0, a[0]]
    p.close()


def test_env_var_discovery(engine, fake_edax, monkeypatch):
    monkeypatch.setenv("EDAX_BINARY", fake_edax)
    p = EdaxPlayer(engine)
    assert p.binary == fake_edax
    p.close()


VARIANT = os.path.join(os.path.dirname(__file__), "fake_edax_variant.py")


@pytest.fixture(scope="module")
def fake_edax_variant():
    st = os.stat(VARIANT)
    os.chmod(VARIANT, st.st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    return VARIANT


def test_variant_dialect_parsed(engine, fake_edax_variant):
    """A second engine dialect — banner noise, 'thinking...' chatter, and
    lowercase 'move d3' / 'move pass' replies — drives the same adapter
    without configuration (the default reply pattern tolerates it)."""
    p = EdaxPlayer(engine, binary_path=fake_edax_variant)
    boards = engine.initial_state((2,))
    a = np.asarray(p.act(jax.random.PRNGKey(0), boards))
    assert (a == 19).all()  # same first-legal-move policy as fake_edax
    p.close()


def test_variant_dialect_full_plies(engine, fake_edax_variant):
    p = EdaxPlayer(engine, binary_path=fake_edax_variant)
    boards = engine.initial_state((1,))
    for _ in range(4):
        legal = engine.legal_actions(boards)
        a = p.act(jax.random.PRNGKey(0), boards)
        assert bool(legal[0, int(a[0])])
        boards, ok = engine.step(boards, a)
        assert bool(ok[0])
    p.close()


def test_custom_args_and_reply_pattern(engine, fake_edax, monkeypatch):
    """args= replaces the full argv (fakes ignore argv, so we assert via the
    spawned process's cmdline) and reply_pattern= replaces the parser."""
    p = EdaxPlayer(engine, binary_path=fake_edax,
                   args=["--custom-flag", "off"],
                   reply_pattern=r"plays\s+([A-Ha-h][1-8]|PS)")
    boards = engine.initial_state((1,))
    a = p.act(jax.random.PRNGKey(0), boards)
    assert int(a[0]) == 19
    assert p._proc.args[1:] == ["--custom-flag", "off"]
    p.close()

    # env-var form (shlex split)
    monkeypatch.setenv("EDAX_ARGS", "-q --level 21")
    p2 = EdaxPlayer(engine, binary_path=fake_edax)
    assert p2.args == ["-q", "--level", "21"]
    p2.close()


def test_unmatchable_pattern_falls_back_legal(engine, fake_edax):
    """A reply pattern that never matches must not crash: the adapter falls
    back to the first legal action for each board."""
    p = EdaxPlayer(engine, binary_path=fake_edax,
                   reply_pattern=r"NEVERMATCHES(x)")
    boards = engine.initial_state((1,))
    legal = engine.legal_actions(boards)
    a = p.act(jax.random.PRNGKey(0), boards)
    assert bool(legal[0, int(a[0])])
    p.close()
