"""Training-system tests: buffer units, self-play data contract, train step,
and a 1-iteration end-to-end loop with checkpoint+resume
(mirrors reference tests/test_train.py coverage, SURVEY.md §4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from othello_reinforcement_learning_test_tpu.models import OthelloResNet, init_variables
from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine
from othello_reinforcement_learning_test_tpu.train import (
    AlphaZeroTrainer,
    apply_eval,
    buffer as buffer_lib,
    checkpoint as ckpt_lib,
    play_games,
)
from othello_reinforcement_learning_test_tpu.train.self_play import Trajectory
from othello_reinforcement_learning_test_tpu.utils import load_config


def make_traj(n_steps, n_slots=6, A=65, value=0.5):
    mask = jnp.arange(n_slots) < n_steps
    return Trajectory(
        me=jnp.ones((1, n_slots, 2), jnp.uint32),
        opp=jnp.zeros((1, n_slots, 2), jnp.uint32),
        pi=jnp.full((1, n_slots, A), 1.0 / A, jnp.float32),
        value=jnp.where(mask, value, 0.0)[None].astype(jnp.float32),
        mask=mask[None],
        final_me_count=jnp.array([3]),
        final_opp_count=jnp.array([1]),
        winner_black=jnp.array([1]),
        num_moves=jnp.array([n_steps]),
    )


class TestBuffer:
    def test_add_and_sample_shapes(self):
        eng = get_engine(8)
        buf = buffer_lib.create(32, 65)
        buf = buffer_lib.add(buf, make_traj(4))
        assert int(buf.filled) == 4 and int(buf.cursor) == 4
        feats, pi, v = buffer_lib.sample(buf, jax.random.PRNGKey(0), eng, 8)
        assert feats.shape == (8, 8, 8, 3)
        assert pi.shape == (8, 65) and v.shape == (8, 1)

    def test_ring_overflow(self):
        buf = buffer_lib.create(10, 65)
        for _ in range(4):
            buf = buffer_lib.add(buf, make_traj(4))
        assert int(buf.filled) == 10
        assert int(buf.total_added) == 16
        assert int(buf.cursor) == 6

    def test_sample_without_replacement(self):
        # like the reference's random.sample (buffer.py:76): when the buffer
        # holds >= batch_size entries, a minibatch never repeats a slot.
        # With filled == batch_size the sample must be a permutation.
        eng = get_engine(8)
        buf = buffer_lib.create(32, 65)
        for i in range(4):
            buf = buffer_lib.add(buf, make_traj(4, value=0.1 * (i + 1)))
        assert int(buf.filled) == 16
        for seed in range(5):
            _, _, v = buffer_lib.sample(buf, jax.random.PRNGKey(seed), eng, 16)
            got = np.sort(np.asarray(v).ravel())
            want = np.sort(np.asarray(buf.value[:16]))
            np.testing.assert_allclose(got, want, atol=1e-7)

    def test_sample_smaller_than_filled_is_distinct(self):
        eng = get_engine(8)
        buf = buffer_lib.create(64, 65)
        # distinct values per slot so a value collision implies a slot repeat
        for i in range(8):
            buf = buffer_lib.add(buf, make_traj(4, value=(i + 1) / 9.0))
        assert int(buf.filled) == 32
        for seed in range(5):
            _, _, v = buffer_lib.sample(buf, jax.random.PRNGKey(seed), eng, 8)
            vals = np.asarray(v).ravel()
            # 4 slots share each value; 8 draws may repeat a value but the
            # count of any value can't exceed its multiplicity (4)
            _, counts = np.unique(vals, return_counts=True)
            assert counts.max() <= 4

    def test_is_ready(self):
        buf = buffer_lib.create(32, 65)
        assert not buffer_lib.is_ready(buf, 1)
        buf = buffer_lib.add(buf, make_traj(4))
        assert buffer_lib.is_ready(buf, 4)
        assert not buffer_lib.is_ready(buf, 5)

    def test_statistics(self):
        buf = buffer_lib.create(16, 65)
        buf = buffer_lib.add(buf, make_traj(4, value=1.0))
        stats = jax.device_get(buffer_lib.statistics(buf))
        assert stats["size"] == 4
        np.testing.assert_allclose(stats["value_mean"], 1.0)
        np.testing.assert_allclose(stats["value_std"], 0.0, atol=1e-6)
        np.testing.assert_allclose(stats["fill_rate"], 4 / 16)


class TestSelfPlay:
    @pytest.fixture(scope="class")
    def traj(self):
        eng = get_engine(8)
        model = OthelloResNet(num_blocks=1, num_filters=8)
        variables = init_variables(model, jax.random.PRNGKey(0))
        return play_games(
            eng,
            apply_eval(model),
            variables,
            jax.random.PRNGKey(1),
            num_games=4,
            num_simulations=4,
            temperature_threshold=10,
        )

    def test_games_complete(self, traj):
        n = np.asarray(traj.num_moves)
        assert (n >= 58).all() and (n <= 132).all()
        np.testing.assert_array_equal(np.asarray(traj.mask).sum(1), n)

    def test_policy_targets(self, traj):
        pi = np.asarray(traj.pi)
        mask = np.asarray(traj.mask)
        sums = pi.sum(-1)
        np.testing.assert_allclose(sums[mask], 1.0, rtol=1e-4)
        np.testing.assert_allclose(sums[~mask], 0.0, atol=1e-8)

    def test_cond_interval_bit_identical(self, traj):
        """Liveness-cond decimation (self_play.cond_interval) must not change
        results: the loop bodies are masked no-ops for finished games, so
        checking the cond every k=4 iterations is bit-identical to k=1."""
        eng = get_engine(8)
        model = OthelloResNet(num_blocks=1, num_filters=8)
        variables = init_variables(model, jax.random.PRNGKey(0))
        traj_k4 = play_games(
            eng,
            apply_eval(model),
            variables,
            jax.random.PRNGKey(1),
            num_games=4,
            num_simulations=4,
            temperature_threshold=10,
            cond_interval=4,
        )
        for a, b in zip(traj, traj_k4):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_root_eval_reuse_bit_identical(self, traj):
        """Root-eval reuse (round 4: the new root's evaluation is the chosen
        child's cached evaluation from the previous search tree) must be
        bit-identical to re-evaluating every root — the network is
        deterministic, so the cached prior/value ARE the fresh ones."""
        eng = get_engine(8)
        model = OthelloResNet(num_blocks=1, num_filters=8)
        variables = init_variables(model, jax.random.PRNGKey(0))
        traj_fresh = play_games(
            eng,
            apply_eval(model),
            variables,
            jax.random.PRNGKey(1),
            num_games=4,
            num_simulations=4,
            temperature_threshold=10,
            reuse_root_eval=False,
        )
        for a, b in zip(traj, traj_fresh):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_root_eval_reuse_bit_identical_with_passes(self):
        """4x4 games pass frequently, so this pins the root-cache gather
        through pass-action children (the cached child of action 16) and
        terminal children, batch-wide."""
        eng = get_engine(4)
        model = OthelloResNet(num_blocks=1, num_filters=8, board_size=4)
        variables = init_variables(model, jax.random.PRNGKey(0))
        kwargs = dict(num_games=32, num_simulations=3,
                      temperature_threshold=4)
        a = play_games(eng, apply_eval(model), variables,
                       jax.random.PRNGKey(9), reuse_root_eval=True, **kwargs)
        b = play_games(eng, apply_eval(model), variables,
                       jax.random.PRNGKey(9), reuse_root_eval=False, **kwargs)
        # make sure the scenario actually exercises passes
        assert (np.asarray(a.num_moves) > 2 * 4 * 4 - 4).any() or (
            np.asarray(a.pi)[..., eng.pass_action] > 0).any()
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_auto_cond_interval_selection(self):
        """Transport-aware cond_interval default (VERDICT r3 item 4): k=4
        only on multi-process non-TPU transports (where the liveness conds
        are latency-bound — measured +15.4% at N=4), k=1 everywhere else."""
        from othello_reinforcement_learning_test_tpu.train.self_play import (
            auto_cond_interval,
        )

        assert auto_cond_interval(process_count=1, platform="cpu") == 1
        assert auto_cond_interval(process_count=1, platform="tpu") == 1
        assert auto_cond_interval(process_count=2, platform="tpu") == 1
        assert auto_cond_interval(process_count=2, platform="cpu") == 4
        assert auto_cond_interval(process_count=4, platform="gpu") == 4

    def test_trainer_cond_interval_default_and_override(self, tmp_path):
        """The trainer resolves unset/"auto" via auto_cond_interval (this
        process is single-process -> 1) and honors an explicit override."""
        from othello_reinforcement_learning_test_tpu.train.trainer import (
            AlphaZeroTrainer,
        )

        base = {
            "game": {"size": 4},
            "model": {"num_blocks": 1, "num_filters": 8, "board_size": 4},
            "training": {"batch_size": 8, "num_iterations": 1,
                         "self_play_episodes_per_iter": 1,
                         "replay_buffer_size": 64},
            "mcts": {"num_simulations": 2},
            "paths": {"checkpoint_dir": str(tmp_path / "m"),
                      "log_dir": str(tmp_path / "l")},
        }
        tr = AlphaZeroTrainer(dict(base), log_cb=None)
        assert tr.cond_interval == 1  # single-process auto
        tr.close()
        cfg = dict(base)
        cfg["self_play"] = {"cond_interval": 3}
        tr = AlphaZeroTrainer(cfg, log_cb=None)
        assert tr.cond_interval == 3  # explicit override wins
        tr.close()
        cfg["self_play"] = {"cond_interval": "auto"}
        tr = AlphaZeroTrainer(cfg, log_cb=None)
        assert tr.cond_interval == 1
        tr.close()

    def test_values_consistent(self, traj):
        """Step values are ±winner alternating with mover parity, 0 on draws
        (correct-parity version of reference self_play.py:119-133)."""
        v = np.asarray(traj.value)
        mask = np.asarray(traj.mask)
        assert set(np.unique(v[mask])).issubset({-1.0, 0.0, 1.0})
        c_me = np.asarray(traj.final_me_count)
        c_opp = np.asarray(traj.final_opp_count)
        n = np.asarray(traj.num_moves)
        wb = np.asarray(traj.winner_black)
        for g in range(v.shape[0]):
            # black = parity-0 mover; check its recorded value sign
            final_me_is_black = n[g] % 2 == 0
            black_count = c_me[g] if final_me_is_black else c_opp[g]
            white_count = c_opp[g] if final_me_is_black else c_me[g]
            expect_black = np.sign(black_count - white_count)
            assert wb[g] == expect_black
            steps = np.where(mask[g])[0]
            for t in steps:
                mover_is_black = t % 2 == 0  # parity tracks move_count
                expect = expect_black if mover_is_black else -expect_black
                assert v[g, t] == expect, (g, t)


class TestEndToEnd:
    def test_one_iteration_train_and_resume(self, tmp_path):
        cfg = load_config(os.path.join(os.path.dirname(__file__), "..", "configs", "test.yaml"))
        cfg["training"]["self_play_episodes_per_iter"] = 2
        cfg["training"]["num_iterations"] = 1
        cfg["model"]["num_blocks"] = 1
        cfg["model"]["num_filters"] = 8
        cfg["mcts"]["num_simulations"] = 4
        cfg["paths"]["checkpoint_dir"] = str(tmp_path / "models")
        cfg["paths"]["log_dir"] = str(tmp_path / "logs")

        trainer = AlphaZeroTrainer(cfg, log_cb=None)
        metrics = trainer.train()
        assert metrics["Loss/train"] > 0
        assert os.path.isdir(os.path.join(trainer.checkpoint_dir, "final_model"))
        assert os.path.isdir(
            os.path.join(trainer.checkpoint_dir, "checkpoint_iter_000001")
        )
        # metrics stream exists
        assert os.path.exists(os.path.join(trainer.log_dir, "metrics.jsonl"))

        # resume restores iteration and params exactly
        trainer2 = AlphaZeroTrainer(cfg, log_cb=None)
        trainer2.load_checkpoint(os.path.join(trainer.checkpoint_dir, "final_model"))
        assert int(trainer2.state.iteration) == 1
        for a, b in zip(
            jax.tree.leaves(trainer.state.params),
            jax.tree.leaves(trainer2.state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # config sidecar exists and round-trips
        side = ckpt_lib.load_config(
            os.path.join(trainer.checkpoint_dir, "final_model")
        )
        assert side["model"]["num_blocks"] == 1

    def test_fused_self_play_variant(self, tmp_path):
        """system.self_play_net_variant routes self-play inference through
        the fused/quantized path; one full iteration trains and the metrics
        contract is unchanged (int8_xla = the backend-agnostic variant)."""
        cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                       "configs", "test.yaml"))
        cfg["training"]["self_play_episodes_per_iter"] = 2
        cfg["training"]["num_iterations"] = 1
        cfg["model"]["num_blocks"] = 1
        cfg["model"]["num_filters"] = 8
        cfg["mcts"]["num_simulations"] = 4
        cfg["system"]["self_play_net_variant"] = "int8_xla"
        cfg["paths"]["checkpoint_dir"] = str(tmp_path / "models")
        cfg["paths"]["log_dir"] = str(tmp_path / "logs")

        trainer = AlphaZeroTrainer(cfg, log_cb=None)
        assert trainer._apply_selfplay is not trainer._apply_eval
        metrics = trainer.train()
        assert metrics["Loss/train"] > 0

    def test_train_step_decreases_loss_on_fixed_batch(self):
        """Optimization sanity: repeated steps on one buffer lower the loss."""
        from othello_reinforcement_learning_test_tpu.train.trainer import (
            TrainState,
            make_optimizer,
            train_step,
        )

        eng = get_engine(8)
        model = OthelloResNet(num_blocks=1, num_filters=8)
        variables = init_variables(model, jax.random.PRNGKey(0))
        cfg = {"training": {"lr": 0.05, "train_epochs_per_iter": 1}}
        tx = make_optimizer(cfg)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.int32(0),
            iteration=jnp.int32(0),
        )
        buf = buffer_lib.create(64, 65)
        buf = buffer_lib.add(buf, make_traj(6, n_slots=8, value=1.0))
        losses = []
        for i in range(12):
            state, m = train_step(
                model, eng, tx, state, buf, jax.random.PRNGKey(5), batch_size=8
            )
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]


def test_train_steps_scan_matches_loop():
    """The scanned multi-epoch program (round 4: one dispatch instead of
    epochs_per_iter) must be bit-identical to looping train_step with the
    same per-step keys."""
    from othello_reinforcement_learning_test_tpu.train import buffer as buffer_lib
    from othello_reinforcement_learning_test_tpu.train.trainer import (
        TrainState, make_optimizer, train_step, train_steps)

    eng = get_engine(4)
    model = OthelloResNet(num_blocks=1, num_filters=8, board_size=4)
    variables = init_variables(model, jax.random.PRNGKey(0))
    cfg = {"training": {"lr": 0.01}}
    tx = make_optimizer(cfg)
    state0 = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0), iteration=jnp.int32(0),
    )
    buf = buffer_lib.create(64, eng.num_actions)
    buf = buffer_lib.add(buf, make_traj(40, A=eng.num_actions))

    rng = jax.random.PRNGKey(3)
    k = 4
    s_scan, metrics = train_steps(
        model, eng, tx, state0, buf, rng, batch_size=8, num_steps=k)
    assert metrics["loss"].shape == (k,)

    s_loop = state0
    keys = jax.random.split(rng, k)
    for i in range(k):
        s_loop, m = train_step(model, eng, tx, s_loop, buf, keys[i],
                               batch_size=8)
    for a, b in zip(jax.tree.leaves(s_scan.params),
                    jax.tree.leaves(s_loop.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s_scan.step) == k


def test_lr_schedule_staircase():
    from othello_reinforcement_learning_test_tpu.train.trainer import make_lr_schedule

    sched = make_lr_schedule(
        {"training": {"lr": 0.1, "lr_gamma": 0.1, "lr_step_size": 2,
                      "train_epochs_per_iter": 3}}
    )
    np.testing.assert_allclose(float(sched(0)), 0.1)
    np.testing.assert_allclose(float(sched(5)), 0.1)
    np.testing.assert_allclose(float(sched(6)), 0.01, rtol=1e-6)


def test_lr_schedule_constant():
    """training.lr_schedule: constant reproduces the reference's ACTUAL
    behavior — it builds StepLR but never steps it
    (/root/reference/src/train/trainer.py:63-76), so lr never decays."""
    from othello_reinforcement_learning_test_tpu.train.trainer import make_lr_schedule

    sched = make_lr_schedule(
        {"training": {"lr": 0.1, "lr_schedule": "constant", "lr_gamma": 0.1,
                      "lr_step_size": 2, "train_epochs_per_iter": 3}}
    )
    for step in (0, 6, 600, 10_000):
        np.testing.assert_allclose(float(sched(step)), 0.1)

    from othello_reinforcement_learning_test_tpu.utils.config import load_config

    with pytest.raises(ValueError, match="lr_schedule"):
        cfg = load_config()
        cfg["training"]["lr_schedule"] = "cosine"
        from othello_reinforcement_learning_test_tpu.utils.config import _validate

        _validate(cfg)


def test_config_loader_warns_unknown(tmp_path):
    import warnings

    p = tmp_path / "c.yaml"
    p.write_text("training:\n  bogus_key: 1\nnosection:\n  a: 2\n")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = load_config(str(p))
    msgs = " ".join(str(x.message) for x in w)
    assert "bogus_key" in msgs and "nosection" in msgs
    assert cfg["training"]["batch_size"] == 256  # defaults intact


def test_config_validation_rejects_bad():
    import copy

    from othello_reinforcement_learning_test_tpu.utils.config import DEFAULTS, _validate

    bad = copy.deepcopy(DEFAULTS)
    bad["training"]["batch_size"] = 0
    with pytest.raises(ValueError):
        _validate(bad)


class TestSelfHealing:
    """VERDICT r2 item 4: a training run survives a wedged backend/dispatch
    unattended — catch, re-init the backend, reload the newest checkpoint,
    continue (bounded retries)."""

    def _cfg(self, tmp_path):
        cfg = load_config(
            os.path.join(os.path.dirname(__file__), "..", "configs", "test.yaml")
        )
        cfg["training"].update(
            self_play_episodes_per_iter=2, num_iterations=2,
            checkpoint_interval=1, batch_size=8,
        )
        cfg["model"].update(num_blocks=1, num_filters=8)
        cfg["mcts"]["num_simulations"] = 4
        cfg["paths"]["checkpoint_dir"] = str(tmp_path / "models")
        cfg["paths"]["log_dir"] = str(tmp_path / "logs")
        return cfg

    def test_recovers_from_transient_fault(self, tmp_path, monkeypatch):
        trainer = AlphaZeroTrainer(self._cfg(tmp_path), log_cb=None)
        calls = {"n": 0}
        orig = trainer.run_self_play

        def flaky(episodes, **kw):
            calls["n"] += 1
            if calls["n"] == 2:  # wedge on iteration 2, after a checkpoint
                raise RuntimeError("injected backend wedge")
            return orig(episodes, **kw)

        monkeypatch.setattr(trainer, "run_self_play", flaky)
        metrics = trainer.train()
        assert int(trainer.state.iteration) == 2
        assert calls["n"] == 3  # iter1 ok, iter2 wedged, iter2 retried
        assert metrics["Loss/train"] > 0
        assert os.path.isdir(os.path.join(trainer.checkpoint_dir, "final_model"))

    def test_recovers_before_first_checkpoint(self, tmp_path, monkeypatch):
        # fault on the very first iteration: nothing to restore yet, the
        # live state is re-materialized through host memory and retried
        trainer = AlphaZeroTrainer(self._cfg(tmp_path), log_cb=None)
        calls = {"n": 0}
        orig = trainer.run_self_play

        def flaky(episodes, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected wedge before any checkpoint")
            return orig(episodes, **kw)

        monkeypatch.setattr(trainer, "run_self_play", flaky)
        trainer.train()
        assert int(trainer.state.iteration) == 2
        assert calls["n"] == 3

    def test_gives_up_after_bounded_retries(self, tmp_path, monkeypatch):
        cfg = self._cfg(tmp_path)
        cfg["system"]["max_recovery_retries"] = 2
        trainer = AlphaZeroTrainer(cfg, log_cb=None)
        calls = {"n": 0}

        def dead(episodes, **kw):
            calls["n"] += 1
            raise RuntimeError("permanently wedged")

        monkeypatch.setattr(trainer, "run_self_play", dead)
        with pytest.raises(RuntimeError, match="permanently wedged"):
            trainer.train()
        assert calls["n"] == 3  # initial try + 2 bounded retries

    def test_deterministic_fault_gives_up_despite_rewind(
        self, tmp_path, monkeypatch
    ):
        """A deterministic fault past the last checkpoint must trip the
        retry bound, not livelock: the rewind replays good iterations, and
        if those reset the failure counter the same fault loops forever.
        The streak is keyed to the failing iteration instead."""
        cfg = self._cfg(tmp_path)
        cfg["training"].update(num_iterations=4, checkpoint_interval=2)
        cfg["system"]["max_recovery_retries"] = 2
        trainer = AlphaZeroTrainer(cfg, log_cb=None)
        calls = {"n": 0}
        orig = trainer.run_self_play

        def flaky(episodes, **kw):
            calls["n"] += 1
            if int(trainer.state.iteration) == 3:
                raise RuntimeError("deterministic fault at iteration 4")
            return orig(episodes, **kw)

        monkeypatch.setattr(trainer, "run_self_play", flaky)
        with pytest.raises(RuntimeError, match="deterministic fault"):
            trainer.train()
        # 3 good + fail, then 2 heal cycles of (replay iter 3, fail): 8
        assert calls["n"] == 8

    def test_reused_dir_foreign_checkpoint_not_adopted(
        self, tmp_path, monkeypatch
    ):
        """Healing must restore only checkpoints THIS run wrote or loaded.
        An mtime scan of a reused checkpoint_dir would adopt a finished
        previous run's final_model — silently skipping the whole new run."""
        cfg = self._cfg(tmp_path)
        AlphaZeroTrainer(cfg, log_cb=None).train()  # run A leaves final_model
        trainer = AlphaZeroTrainer(cfg, log_cb=None)  # run B, same dir
        calls = {"n": 0}
        orig = trainer.run_self_play

        def flaky(episodes, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient wedge before any checkpoint")
            return orig(episodes, **kw)

        monkeypatch.setattr(trainer, "run_self_play", flaky)
        trainer.train()
        # B retried from its own pre-iteration snapshot and trained both
        # iterations itself (adopting A's final_model would leave calls at 1)
        assert calls["n"] == 3
        assert int(trainer.state.iteration) == 2

    def test_partial_iteration_rolled_back(self, tmp_path, monkeypatch):
        """A fault AFTER the buffer add and SGD epochs (injected in
        run_gating) must roll the half-applied iteration back before the
        replay — otherwise the trajectory is double-added and the epochs
        double-applied versus an unfaulted run."""
        clean = AlphaZeroTrainer(self._cfg(tmp_path / "clean"), log_cb=None)
        clean.train()
        expect_added = int(clean.buffer.total_added)
        expect_step = int(clean.state.step)

        trainer = AlphaZeroTrainer(self._cfg(tmp_path / "fault"), log_cb=None)
        calls = {"n": 0}
        orig_gate = trainer.run_gating

        def flaky_gate(iteration):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("wedge after buffer add + epochs")
            return orig_gate(iteration)

        monkeypatch.setattr(trainer, "run_gating", flaky_gate)
        trainer.train()
        assert int(trainer.state.iteration) == 2
        # identical to the unfaulted run: nothing double-added/applied
        assert int(trainer.buffer.total_added) == expect_added
        assert int(trainer.state.step) == expect_step
