"""AlphaZero trainer: self-play → replay buffer → SGD, all hot paths jitted.

TPU-native counterpart of the reference trainer
(``/root/reference/src/train/trainer.py``): per iteration it (1) runs the
fully-jitted batched self-play, (2) scatters trajectories into the on-device
replay buffer, (3) takes ``train_epochs_per_iter`` SGD minibatch steps (the
reference's "epoch" == one minibatch, trainer.py:243-281 — semantics kept),
(4) logs metrics, (5) checkpoints with Orbax every ``checkpoint_interval``
iterations plus a final model (trainer.py:224-241).

Losses match the reference exactly: policy cross-entropy
``-mean(sum(target * log_probs))`` + value MSE, summed unweighted
(trainer.py:330-364). Optimizer is SGD(momentum, weight-decay) like the
reference (trainer.py:63-76); the LR follows a real StepLR staircase over
iterations — the reference constructs StepLR but never calls
``scheduler.step()`` so its LR never decays (quirk; we implement the
documented intent, decaying every ``lr_step_size`` iterations).

Mixed precision: the network computes in bfloat16 with float32 params — the
TPU equivalent of the reference's CUDA AMP + GradScaler (trainer.py:79,
303-315; no loss scaling needed for bf16).

Divergence from reference (documented): checkpoint/resume is actually wired
(the reference's ``load_checkpoint`` exists but no entry point calls it —
SURVEY.md §5), and optional symmetry augmentation is implemented (the
reference's ``augment_data_with_symmetries`` is a no-op stub, quirk #8).
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.resnet import OthelloResNet, init_variables, param_count
from ..ops.bitboard import OthelloEngine, get_engine
from ..utils.metrics import MetricsWriter
from . import buffer as buffer_lib
from . import checkpoint as ckpt_lib
from .self_play import Trajectory, play_games


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # () int32 — optimizer steps taken
    iteration: jnp.ndarray  # () int32 — completed iterations


def make_lr_schedule(config: Dict) -> optax.Schedule:
    """LR schedule over optimizer steps, selected by ``training.lr_schedule``:

    - ``"step"`` (default): StepLR staircase — decay by ``lr_gamma`` every
      ``lr_step_size`` *iterations* (each iteration = train_epochs_per_iter
      optimizer steps). This is the reference's *declared* intent.
    - ``"constant"``: no decay — the reference's *actual* behavior: it
      constructs StepLR but never calls ``scheduler.step()``
      (/root/reference/src/train/trainer.py:63-76), so its canonical
      ``default_8x8.yaml`` run trains at a constant lr the whole way.
    """
    tc = config.get("training", {})
    lr = float(tc.get("lr", 1e-3))
    if str(tc.get("lr_schedule", "step")) == "constant":
        return optax.constant_schedule(lr)
    gamma = float(tc.get("lr_gamma", 0.1))
    step_size = int(tc.get("lr_step_size", 100))
    epochs_per_iter = max(int(tc.get("train_epochs_per_iter", 10)), 1)
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=step_size * epochs_per_iter,
        decay_rate=gamma,
        staircase=True,
    )


def make_optimizer(config: Dict) -> optax.GradientTransformation:
    tc = config.get("training", {})
    return optax.chain(
        optax.add_decayed_weights(float(tc.get("weight_decay", 1e-4))),
        optax.sgd(make_lr_schedule(config), momentum=float(tc.get("momentum", 0.9))),
    )


def loss_fn(
    model: OthelloResNet,
    params,
    batch_stats,
    feats: jnp.ndarray,
    target_pi: jnp.ndarray,
    target_v: jnp.ndarray,
):
    """Policy CE + value MSE (reference trainer.py:330-364)."""
    (log_probs, value), updates = model.apply(
        {"params": params, "batch_stats": batch_stats},
        feats,
        train=True,
        mutable=["batch_stats"],
    )
    policy_loss = -jnp.mean(jnp.sum(target_pi * log_probs, axis=-1))
    value_loss = jnp.mean((value - target_v) ** 2)
    total = policy_loss + value_loss
    return total, (policy_loss, value_loss, updates["batch_stats"])


@functools.partial(
    jax.jit,
    static_argnames=("model", "engine", "tx", "batch_size", "augment", "mesh"),
)
def train_step(
    model: OthelloResNet,
    engine: OthelloEngine,
    tx: optax.GradientTransformation,
    state: TrainState,
    buf: buffer_lib.ReplayBuffer,
    rng: jax.Array,
    batch_size: int,
    augment: bool = False,
    mesh=None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD minibatch step sampled from the buffer (= one reference
    "epoch", trainer.py:283-328). With ``mesh``, the minibatch shards over
    the ``dp`` axis and parameters replicate; XLA inserts the gradient
    all-reduce. The random D4 symmetry (``augment``) is coverage-equivalent
    to the reference's intended-but-stubbed 8x expansion
    (self_play.py:166-212)."""
    return _train_step_inner(
        model, engine, tx, state, buf, rng, batch_size, augment, mesh
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "engine", "tx", "batch_size", "augment", "mesh"),
)
def train_step_prioritized(
    model: OthelloResNet,
    engine: OthelloEngine,
    tx: optax.GradientTransformation,
    state: TrainState,
    buf: buffer_lib.PrioritizedReplayBuffer,
    rng: jax.Array,
    batch_size: int,
    augment: bool = False,
    mesh=None,
) -> Tuple[TrainState, buffer_lib.PrioritizedReplayBuffer, Dict[str, jnp.ndarray]]:
    """Prioritized variant: proportional sampling with importance-weighted
    losses, then TD-error priority updates (a real implementation of the
    reference's uniform-fallback PrioritizedReplayBuffer stub,
    buffer.py:139-177)."""
    rng_sample, rng_aug = jax.random.split(rng)
    feats, pi, v, idx, weights = buffer_lib.sample_prioritized(
        buf, rng_sample, engine, batch_size
    )
    if mesh is not None:
        from ..parallel.mesh import replicate, shard_leading

        feats, pi, v, weights = shard_leading((feats, pi, v, weights), mesh)
        state = replicate(state, mesh)
    if augment:
        f8, p8 = engine.symmetries(feats, pi)
        which = jax.random.randint(rng_aug, (feats.shape[0],), 0, 8)
        feats = jnp.take_along_axis(
            f8, which[:, None, None, None, None], axis=1
        ).squeeze(1)
        pi = jnp.take_along_axis(p8, which[:, None, None], axis=1).squeeze(1)

    def weighted_loss(params):
        (log_probs, value), updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            feats,
            train=True,
            mutable=["batch_stats"],
        )
        pl = -jnp.sum(weights * jnp.sum(pi * log_probs, axis=-1)) / weights.sum()
        per_sample_vl = (value[:, 0] - v[:, 0]) ** 2
        vl = jnp.sum(weights * per_sample_vl) / weights.sum()
        td = jnp.abs(value[:, 0] - v[:, 0])
        return pl + vl, (pl, vl, updates["batch_stats"], td)

    (total, (pl, vl, new_stats, td)), grads = jax.value_and_grad(
        weighted_loss, has_aux=True
    )(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        params=params, batch_stats=new_stats, opt_state=opt_state,
        step=state.step + 1,
    )
    buf = buffer_lib.update_priorities(buf, idx, td)
    return new_state, buf, {"loss": total, "policy_loss": pl, "value_loss": vl}


@functools.partial(
    jax.jit,
    static_argnames=("model", "engine", "tx", "batch_size", "augment",
                     "mesh", "num_steps"),
)
def train_steps(
    model: OthelloResNet,
    engine: OthelloEngine,
    tx: optax.GradientTransformation,
    state: TrainState,
    buf: buffer_lib.ReplayBuffer,
    rng: jax.Array,
    batch_size: int,
    num_steps: int,
    augment: bool = False,
    mesh=None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """``num_steps`` SGD minibatch steps scanned inside ONE jit (round 4:
    the per-step dispatch of the former host loop — 10 dispatches per
    iteration, each a device round-trip (~ms over the axon tunnel) —
    dominated the train phase at the default regime). Semantics are the
    uniform-buffer ``train_step`` repeated; returns per-step stacked
    metrics. The prioritized variant keeps the host loop (its buffer
    priority updates thread through each step)."""

    def body(carry, step_rng):
        st, _ = carry
        st, metrics = _train_step_inner(
            model, engine, tx, st, buf, step_rng, batch_size, augment, mesh
        )
        return (st, 0), metrics

    keys = jax.random.split(rng, num_steps)
    (state, _), metrics = jax.lax.scan(body, (state, 0), keys)
    return state, metrics


def _train_step_inner(model, engine, tx, state, buf, rng, batch_size,
                      augment, mesh):
    """Shared body of train_step/train_steps (one SGD minibatch step)."""
    rng_sample, rng_aug = jax.random.split(rng)
    feats, pi, v = buffer_lib.sample(buf, rng_sample, engine, batch_size)
    if mesh is not None:
        from ..parallel.mesh import replicate, shard_leading

        feats, pi, v = shard_leading((feats, pi, v), mesh)
        state = replicate(state, mesh)

    if augment:
        f8, p8 = engine.symmetries(feats, pi)
        which = jax.random.randint(rng_aug, (feats.shape[0],), 0, 8)
        feats = jnp.take_along_axis(
            f8, which[:, None, None, None, None], axis=1
        ).squeeze(1)
        pi = jnp.take_along_axis(p8, which[:, None, None], axis=1).squeeze(1)

    (total, (pl, vl, new_stats)), grads = jax.value_and_grad(
        lambda p: loss_fn(model, p, state.batch_stats, feats, pi, v),
        has_aux=True,
    )(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        params=params,
        batch_stats=new_stats,
        opt_state=opt_state,
        step=state.step + 1,
    )
    return new_state, {"loss": total, "policy_loss": pl, "value_loss": vl}


@functools.lru_cache(maxsize=None)
def apply_eval(model: OthelloResNet):
    """Stable eval-mode apply wrapper usable as a jit static argument
    (cached per model so repeated calls don't retrigger compilation)."""

    def fn(variables, x):
        return model.apply(variables, x, train=False)

    return fn


class AlphaZeroTrainer:
    """Host-side orchestration; everything hot is jitted on device.

    API mirrors the reference trainer (train / save_checkpoint /
    load_checkpoint, trainer.py:136-404) with resume actually wired.
    """

    def __init__(
        self,
        config: Dict,
        engine: Optional[OthelloEngine] = None,
        model: Optional[OthelloResNet] = None,
        seed: Optional[int] = None,
        log_cb: Optional[Callable[[str], None]] = print,
    ):
        self.config = config
        gc = config.get("game", {})
        size = int(gc.get("size", config.get("model", {}).get("board_size", 8)))
        self.engine = engine or get_engine(size, gc.get("rules", "reference"))
        mc = dict(config.get("model", {}))
        mc.setdefault("board_size", size)
        self.model = model or OthelloResNet(
            num_blocks=int(mc.get("num_blocks", 10)),
            num_filters=int(mc.get("num_filters", 128)),
            board_size=size,
        )
        self.log = log_cb or (lambda s: None)

        sc = config.get("system", {})
        self.seed = seed if seed is not None else int(sc.get("seed", 42))
        self.rng = jax.random.PRNGKey(self.seed)
        # self-healing: max CONSECUTIVE iteration failures tolerated before
        # the training run gives up (reference has no recovery at all,
        # SURVEY.md §5 "Failure detection")
        self.max_recovery_retries = int(sc.get("max_recovery_retries", 3))

        tc = config.get("training", {})
        self.batch_size = int(tc.get("batch_size", 256))
        self.num_iterations = int(tc.get("num_iterations", 1000))
        self.episodes_per_iter = int(tc.get("self_play_episodes_per_iter", 100))
        self.epochs_per_iter = int(tc.get("train_epochs_per_iter", 10))
        self.checkpoint_interval = int(tc.get("checkpoint_interval", 10))
        self.buffer_capacity = int(tc.get("replay_buffer_size", 100_000))
        self.augment = bool(tc.get("augment_symmetries", False))
        if self.augment and self.engine.rules == "reference":
            # the reference rule set is NOT D4-symmetric (its east/west
            # edge-mask quirks don't map onto the unmasked vertical rays
            # under rotation), so rotated (features, pi) pairs would be
            # inconsistent with the engine. Augmentation needs
            # game.rules: standard.
            self.log(
                "warning: augment_symmetries disabled — reference rules are "
                "not D4-symmetric (use game.rules: standard)"
            )
            self.augment = False
        self.prioritized = bool(tc.get("prioritized_replay", False))
        gate = tc.get("gating") or {}
        if not isinstance(gate, dict):
            raise ValueError(
                "training.gating must be a mapping, e.g. {enabled: true, "
                f"games: 40, win_threshold: 0.55}}; got {gate!r}"
            )
        self.gating_enabled = bool(gate.get("enabled", False))
        self.gating_games = int(gate.get("games", 40) or 40)
        self.gating_threshold = float(gate.get("win_threshold", 0.55))
        self.gating_interval = int(
            gate.get("interval") or tc.get("checkpoint_interval", 10)
        )
        self.gating_sims = int(
            gate.get("num_simulations")
            or config.get("mcts", {}).get("num_simulations", 25)
        )
        self.gating_opening = int(gate.get("opening_random_plies", 4))

        mcc = config.get("mcts", {})
        self.num_simulations = int(mcc.get("num_simulations", 25))
        self.c_puct = float(mcc.get("c_puct", 1.0))
        self.dirichlet_alpha = float(mcc.get("dirichlet_alpha", 0.3))
        self.dirichlet_epsilon = float(mcc.get("dirichlet_epsilon", 0.25))
        spc = config.get("self_play", {})
        self.temperature_threshold = int(spc.get("temperature_threshold", 15))
        # reference-compat lockstep-batch cap (parallel_self_play chosen when
        # >1, reference main.py:111-115): self-play runs in chunks of at most
        # this many games; None/0 = all episodes in one batch (fastest).
        npg = spc.get("num_parallel_games")
        self.num_parallel_games = int(npg) if npg else None
        # liveness-cond decimation (self_play.cond_interval): check the
        # lockstep loops' scalar conds every k iterations — bit-identical
        # results, ~k x fewer cross-shard sync rounds. Unset/"auto" picks
        # the measured winner per transport (k=4 on multi-process non-TPU
        # where the conds are latency-bound, else k=1 — see
        # train/self_play.py:auto_cond_interval); an explicit int overrides.
        ci = spc.get("cond_interval")
        if ci in (None, 0, "auto"):
            from .self_play import auto_cond_interval

            self.cond_interval = auto_cond_interval()
            if self.cond_interval > 1:
                self.log(
                    f"self_play.cond_interval auto-selected: "
                    f"{self.cond_interval} (multi-process "
                    f"{jax.devices()[0].platform} transport is cond-latency-"
                    "bound; set self_play.cond_interval to override)"
                )
        else:
            self.cond_interval = int(ci)

        # distributed self-play design (multi-host only):
        #   local  — each process plays its shard with a LOCAL jit, then the
        #            shards assemble into one global trajectory through host
        #            memory (zero cross-host syncs during play; pays a host
        #            round-trip per iteration)
        #   global — one mesh-spanning jitted program plays all games SPMD
        #            (no host bounce; pays the lockstep liveness conds as
        #            cross-host all-reduces, decimated by cond_interval)
        #   auto   — global on TPU (conds ride ICI at us latency), local on
        #            CPU/GPU process groups (conds are latency-bound even at
        #            k=4 — measured head-to-head in
        #            results/multihost_scaling.md round 4)
        self.distributed_self_play = str(
            sc.get("distributed_self_play") or "auto")
        if self.distributed_self_play not in ("auto", "local", "global"):
            raise ValueError(
                "system.distributed_self_play must be auto|local|global, "
                f"got {self.distributed_self_play!r}")
        sc_mesh = sc.get("mesh_devices")
        self.mesh = None
        # single-process mesh size, kept so _reset_backend can rebuild the
        # mesh after clear_backends (Device handles die with the client)
        self._mesh_devices = int(sc_mesh) if sc_mesh else None
        # self-healing bookkeeping: the last checkpoint THIS run wrote or
        # resumed from (never an mtime scan of checkpoint_dir, which could
        # adopt a previous run's final_model in a reused directory), and a
        # pristine pre-iteration host snapshot used until the first
        # checkpoint exists (the live state mid-failure may carry a
        # partially applied iteration)
        self._heal_ckpt: Optional[str] = None
        self._pre_iter_snapshot = None
        self.process_count = jax.process_count()
        self.distributed = self.process_count > 1
        self._warned_game_rounding = False
        if self.distributed:
            # multi-host SPMD: one dp mesh over every device of every
            # process (jax.distributed must already be initialized — cli.py
            # does this from --coordinator/--num-processes/--process-id)
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh()
            self.log(
                f"multi-host: {self.process_count} processes x "
                f"{jax.local_device_count()} local devices -> "
                f"{jax.device_count()}-device dp mesh"
            )
        elif sc_mesh:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(int(sc_mesh))
            self.log(f"data-parallel mesh over {int(sc_mesh)} devices")

        paths = config.get("paths", {})
        self.checkpoint_dir = paths.get("checkpoint_dir", "data/models")
        self.log_dir = paths.get("log_dir", "data/logs")
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self.writer = MetricsWriter(self.log_dir)

        self.tx = make_optimizer(config)
        self.rng, init_rng = jax.random.split(self.rng)
        variables = init_variables(self.model, init_rng)
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
            step=jnp.int32(0),
            iteration=jnp.int32(0),
        )
        if self.prioritized:
            self.buffer = buffer_lib.create_prioritized(
                self.buffer_capacity, self.engine.num_actions
            )
        else:
            self.buffer = buffer_lib.create(
                self.buffer_capacity, self.engine.num_actions
            )
        self._apply_eval = apply_eval(self.model)
        # optional fused-trunk inference for the self-play/gating hot path
        # (system.self_play_net_variant; training fwd/bwd stays XLA bf16).
        # One instance per trainer: play_games caches jit per apply_fn id.
        variant = str(sc.get("self_play_net_variant") or "xla")
        if variant != "xla":
            from ..models.pallas_resnet import FusedInference

            # Pallas kernels run natively on TPU only; elsewhere fall back
            # to interpret mode (slow but correct — tests/debug).
            interpret = (jax.devices()[0].platform != "tpu"
                         and variant != "int8_xla")
            self._apply_selfplay = FusedInference(
                self.model, variant=variant, interpret=interpret
            )
            self.log(f"self-play inference: fused Pallas trunk ({variant})")
        else:
            self._apply_selfplay = self._apply_eval
        if self.distributed:
            # multi-controller rule: every input of a mesh-spanning jit must
            # be a global jax.Array — lift the (identical-per-process)
            # state/buffer once here
            from ..parallel.mesh import to_global_replicated

            self.state = to_global_replicated(self.state, self.mesh)
            self.buffer = to_global_replicated(self.buffer, self.mesh)
        # arena gating: self-play always uses the best-so-far network; the
        # candidate must beat it in a gate match to be adopted
        self.best_variables = self.variables() if self.gating_enabled else None
        self.log(
            f"model: {self.model.num_blocks} blocks x {self.model.num_filters} "
            f"filters, {param_count(self.state.params):,} params; "
            f"engine: {self.engine}"
        )

    # -- checkpointing -----------------------------------------------------
    def save_checkpoint(self, name: str) -> str:
        """Full checkpoint: TrainState + replay buffer + host RNG, so resume
        is bit-identical to an uninterrupted run (the reference drops its
        deque buffer on restart; its load_checkpoint is never wired,
        /root/reference/src/train/trainer.py:387-404)."""
        path = os.path.join(self.checkpoint_dir, name)
        rng = self.rng
        best = self.best_variables
        if self.distributed:
            # orbax multi-host serialization requires global arrays; the host
            # RNG key (and the gating best-network before its first adoption)
            # are the process-local leaves in the composite
            from ..parallel.mesh import to_global_replicated

            rng = to_global_replicated(rng, self.mesh)
            if best is not None:
                best = to_global_replicated(jax.device_get(best), self.mesh)
        ckpt_lib.save_full(
            path,
            train_state=self.state,
            buffer=self.buffer,
            rng=rng,
            config=self.config,
            best=best,
        )
        # this checkpoint is now the self-heal restore point; the pristine
        # pre-iteration snapshot is no longer needed
        self._heal_ckpt = path
        self._pre_iter_snapshot = None
        return path

    def load_checkpoint(self, path: str) -> None:
        """Restore TrainState (+ buffer + RNG for format-2 checkpoints);
        format-1 checkpoints resume with an empty buffer and the seed RNG
        (a warning says so)."""
        meta = ckpt_lib.load_meta(path)
        restored_best = False
        if meta.get("format", 1) >= 2:
            if (int(meta.get("buffer_capacity", -1)) != self.buffer.capacity
                    or meta.get("buffer_class") != type(self.buffer).__name__):
                # config changed buffer shape since the checkpoint: restore
                # the train state only, keep the fresh buffer
                self.state = ckpt_lib.load_train_state(path, self.state)
                self.log(
                    "warning: checkpoint buffer "
                    f"({meta.get('buffer_class')}, cap {meta.get('buffer_capacity')}) "
                    f"doesn't match config ({type(self.buffer).__name__}, cap "
                    f"{self.buffer.capacity}); resuming with an empty buffer"
                )
            else:
                restored = ckpt_lib.load_full(
                    path, self.state, self.buffer, self.rng
                )
                self.state = restored["train_state"]
                self.buffer = restored["buffer"]
                self.rng = restored["rng"]
                if "best" in restored:
                    if self.gating_enabled:
                        self.best_variables = restored["best"]
                        restored_best = True
                    else:
                        # the config's gating setting wins over the
                        # checkpoint's — don't silently re-enable
                        self.log(
                            "note: checkpoint has a gating best-network but "
                            "training.gating.enabled is false; ignoring it"
                        )
        else:
            self.state = ckpt_lib.load(path, self.state)
            self.log(
                "warning: format-1 checkpoint (no buffer/RNG state); "
                "resuming with an empty buffer"
            )
        if self.gating_enabled and not restored_best:
            # never leave gated self-play pointing at the pre-resume
            # (random-init) network: the restored candidate is the best
            # approximation of "best so far" we have
            self.best_variables = self.variables()
        # a checkpoint this run explicitly loaded is a valid heal target
        self._heal_ckpt = path
        self.log(f"resumed from {path} at iteration {int(self.state.iteration)}")

    # -- main loop ---------------------------------------------------------
    def variables(self) -> Dict:
        return {"params": self.state.params, "batch_stats": self.state.batch_stats}

    def run_self_play(self, num_games: int, add_noise: bool = True) -> Trajectory:
        # with gating on, self-play data comes from the BEST network (the
        # AlphaZero scheme); otherwise from the current candidate
        sp_variables = self.best_variables if self.gating_enabled else self.variables()
        if self.distributed:
            design = self.distributed_self_play
            if design == "auto":
                # conds are us-cheap over ICI -> play globally (no host
                # bounce); latency-bound on CPU/GPU transports -> play
                # locally (measured head-to-head:
                # results/multihost_scaling.md round 4)
                design = ("global" if jax.devices()[0].platform == "tpu"
                          else "local")
            # even per-process share, rounded UP to a multiple of the local
            # device count so the leading axis shards cleanly (a floor split
            # silently dropped the remainder — e.g. 100 games over 3 hosts
            # played 99)
            ldc = max(jax.local_device_count(), 1)
            per = -(-num_games // self.process_count)  # ceil
            local_games = -(-per // ldc) * ldc
            total = local_games * self.process_count
            if total != num_games and not self._warned_game_rounding:
                self._warned_game_rounding = True
                self.log(
                    f"distributed: rounding {num_games} games/iter up to "
                    f"{total} ({local_games}/process) for even sharding"
                )
            self.rng, sub = jax.random.split(self.rng)
            if design == "global":
                # one SPMD program over the whole mesh: all inputs global,
                # one identical RNG key everywhere (per-game keys fold out
                # inside), trajectory comes back already games-sharded
                from ..parallel.mesh import to_global_replicated

                g_vars = to_global_replicated(
                    jax.device_get(sp_variables), self.mesh)
                g_rng = to_global_replicated(jax.device_get(sub), self.mesh)
                return play_games(
                    self.engine,
                    self._apply_selfplay,
                    g_vars,
                    g_rng,
                    num_games=total,
                    num_simulations=self.num_simulations,
                    c_puct=self.c_puct,
                    dirichlet_alpha=self.dirichlet_alpha,
                    dirichlet_epsilon=self.dirichlet_epsilon,
                    temperature_threshold=self.temperature_threshold,
                    add_noise=add_noise,
                    mesh=self.mesh,
                    cond_interval=self.cond_interval,
                )
            # "local": each process plays its share with a LOCAL jit and a
            # per-process folded RNG, then the shards assemble into one
            # global trajectory (games x hosts DP — SURVEY §2)
            from ..parallel.mesh import fold_in_process, global_from_local_leading

            local_vars = jax.device_get(sp_variables)  # host copy, local jit
            traj_local = play_games(
                self.engine,
                self._apply_selfplay,
                local_vars,
                fold_in_process(sub),
                num_games=local_games,
                num_simulations=self.num_simulations,
                c_puct=self.c_puct,
                dirichlet_alpha=self.dirichlet_alpha,
                dirichlet_epsilon=self.dirichlet_epsilon,
                temperature_threshold=self.temperature_threshold,
                add_noise=add_noise,
                cond_interval=self.cond_interval,
            )
            return global_from_local_leading(
                jax.device_get(traj_local), self.mesh
            )
        chunk = self.num_parallel_games or num_games
        chunks = []
        remaining = num_games
        while remaining > 0:
            n = min(chunk, remaining)
            self.rng, sub = jax.random.split(self.rng)
            chunks.append(
                play_games(
                    self.engine,
                    self._apply_selfplay,
                    sp_variables,
                    sub,
                    num_games=n,
                    num_simulations=self.num_simulations,
                    c_puct=self.c_puct,
                    dirichlet_alpha=self.dirichlet_alpha,
                    dirichlet_epsilon=self.dirichlet_epsilon,
                    temperature_threshold=self.temperature_threshold,
                    add_noise=add_noise,
                    mesh=self.mesh,
                    cond_interval=self.cond_interval,
                )
            )
            remaining -= n
        if len(chunks) == 1:
            return chunks[0]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)

    def _gate_match(self, rng: jax.Array):
        """Candidate (current params) vs best-so-far: returns
        ``(decisive_win_rate, summary)``. Decisive win rate = wins /
        (wins + losses), draws excluded; 0.5 if every game draws. Separated
        out so tests can rig the outcome."""
        from ..evaluation.arena import Arena
        from ..evaluation.players import MCTSPlayer

        cand_vars, best_vars = self.variables(), self.best_variables
        if self.distributed:
            # every input to the mesh-spanning match program must be a
            # global array; best_variables may still be the host-local init
            # copy, so lift both through host memory (identical on every
            # process by determinism)
            from ..parallel.mesh import to_global_replicated

            cand_vars = to_global_replicated(
                jax.device_get(cand_vars), self.mesh
            )
            best_vars = to_global_replicated(
                jax.device_get(best_vars), self.mesh
            )
            rng = to_global_replicated(jax.device_get(rng), self.mesh)
        candidate = MCTSPlayer(
            self.engine, self._apply_selfplay, cand_vars,
            num_simulations=self.gating_sims, c_puct=self.c_puct,
        )
        best = MCTSPlayer(
            self.engine, self._apply_selfplay, best_vars,
            num_simulations=self.gating_sims, c_puct=self.c_puct,
        )
        # with a mesh the gate match shards its games across all devices
        # (multi-host included) and the match results are gathered to every
        # process, so the ADOPT/REJECT decision is computed identically
        # everywhere — no coordinator round needed
        arena = Arena(self.engine, mesh=self.mesh)
        s = arena.play_matches(
            candidate, best, self.gating_games, rng,
            opening_random_plies=self.gating_opening,
        )
        decisive = s.wins + s.losses
        win_rate = s.wins / decisive if decisive else 0.5
        return win_rate, s

    def run_gating(self, iteration: int) -> Optional[bool]:
        """Gate the candidate if due this iteration. Returns the decision
        (True adopted / False rejected) or None when not due / disabled."""
        if not self.gating_enabled or iteration % self.gating_interval != 0:
            return None
        self.rng, sub = jax.random.split(self.rng)
        t0 = time.time()
        win_rate, s = self._gate_match(sub)
        accepted = win_rate >= self.gating_threshold
        if accepted:
            self.best_variables = self.variables()
        self.writer.scalar("Gating/win_rate", win_rate, iteration)
        self.writer.scalar("Gating/accepted", float(accepted), iteration)
        self.log(
            f"gating @ iter {iteration}: candidate "
            f"{s.wins}W-{s.losses}L-{s.draws}D (decisive {win_rate:.1%}) -> "
            f"{'ADOPTED as best' if accepted else 'rejected (best kept)'} "
            f"[{time.time() - t0:.1f}s]"
        )
        return accepted

    def train(
        self,
        num_iterations: Optional[int] = None,
        episodes_per_iter: Optional[int] = None,
    ) -> Dict[str, float]:
        num_iterations = num_iterations or self.num_iterations
        episodes = episodes_per_iter or self.episodes_per_iter
        start_iter = int(self.state.iteration)
        last: Dict[str, float] = {}
        recent_iter_times: list = []
        recent_losses: list = []
        it = start_iter
        # the failure streak is keyed to the FAILING iteration, not reset on
        # success: after a checkpoint rewind the replayed good iterations
        # would otherwise mask a deterministic fault and livelock the run
        fail_streak = 0
        last_failed_it = -1
        while it < num_iterations:
            try:
                if (self.max_recovery_retries > 0 and not self.distributed
                        and self._heal_ckpt is None):
                    # pristine pre-iteration rollback point until the first
                    # checkpoint lands (a failure can leave a partially
                    # applied iteration: buffer already extended, some SGD
                    # epochs already taken — replaying on the live state
                    # would double-apply them)
                    self._pre_iter_snapshot = (
                        it,
                        jax.device_get(
                            (self.state, self.buffer, self.rng,
                             self.best_variables)
                        ),
                    )
                last = self._train_iteration(
                    it, episodes, num_iterations,
                    recent_iter_times, recent_losses,
                )
                it += 1
            except (KeyboardInterrupt, SystemExit):
                raise
            except Exception as e:  # noqa: BLE001 — backend/dispatch wedges
                if self.distributed:
                    # single-host only: a local collective restore while the
                    # peers sit in training collectives would deadlock the
                    # fleet — fail fast and let the job scheduler restart
                    # every process (resume is wired via --resume latest)
                    self.log(
                        f"iteration {it + 1} failed in a multi-host run "
                        f"({type(e).__name__}: {e}); self-healing is "
                        "single-host only — re-raising"
                    )
                    raise
                fail_streak = fail_streak + 1 if it == last_failed_it else 1
                last_failed_it = it
                if fail_streak > self.max_recovery_retries:
                    self.log(
                        f"iteration {it + 1} failed {fail_streak} times; "
                        "giving up"
                    )
                    raise
                if self._heal_ckpt is None and self._pre_iter_snapshot is None:
                    raise  # recovery disabled: nothing to roll back to
                self.log(
                    f"iteration {it + 1} failed ({type(e).__name__}: {e}); "
                    f"self-healing attempt "
                    f"{fail_streak}/{self.max_recovery_retries}"
                )
                it = self._self_heal(it)
        self.save_checkpoint("final_model")
        self.writer.flush()
        return last

    def _reset_backend(self) -> None:
        """Drop the PJRT client so a dead device tunnel reconnects, then
        rebuild the mesh — its Device handles die with the old client.
        Single-host only (tearing down the client in a multi-host run would
        break the process group; train() never heals there)."""
        try:
            import jax.extend.backend as _backend

            _backend.clear_backends()
        except Exception as e:  # noqa: BLE001
            self.log(f"self-heal: clear_backends failed ({e})")
        if self.mesh is not None:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(self._mesh_devices)

    def _self_heal(self, it: int) -> int:
        """Recover from a wedged accelerator backend or a poisoned dispatch
        mid-run (the tpu5 1000-iter run needed a human `--resume latest` at
        iter 641; this automates that): drop compiled/backend state, then
        restore the last checkpoint THIS run wrote or loaded — or, before
        any checkpoint exists, roll back to the pristine pre-iteration host
        snapshot. Returns the iteration to resume from. Single-host only
        (train() re-raises in multi-host runs)."""
        try:
            jax.clear_caches()
        except Exception as e:  # noqa: BLE001
            self.log(f"self-heal: clear_caches failed ({e}); continuing")
        self._reset_backend()
        if self._heal_ckpt is not None:
            # never an mtime scan of checkpoint_dir: a reused directory may
            # hold a previous run's final_model, and restoring that would
            # silently adopt foreign weights (or end the run instantly)
            self.log(f"self-heal: restoring {self._heal_ckpt}")
            self.load_checkpoint(self._heal_ckpt)
            # orbax restores into the template's shardings, whose Device
            # handles belong to the torn-down client — the host round-trip
            # below re-commits everything onto the fresh backend (mixing
            # clients inside one pytree fails the next jitted step)
            snapshot = jax.device_get(
                (self.state, self.buffer, self.rng, self.best_variables)
            )
            resume_it = int(self.state.iteration)
        else:
            # no checkpoint yet: roll back to the state captured at this
            # iteration's start (the live state may carry a partially
            # applied iteration)
            resume_it, snapshot = self._pre_iter_snapshot
            self.log(
                "self-heal: no checkpoint yet; rolling back to the start "
                f"of iteration {resume_it + 1}"
            )
        state, buffer, rng, best = jax.device_put(snapshot)
        self.state, self.buffer, self.rng = state, buffer, rng
        if self.gating_enabled:
            self.best_variables = best
        return resume_it

    def _train_iteration(
        self,
        it: int,
        episodes: int,
        num_iterations: int,
        recent_iter_times: list,
        recent_losses: list,
    ) -> Dict[str, float]:
        """One full training iteration (self-play -> buffer -> SGD steps ->
        metrics -> gating -> periodic checkpoint). Raising anywhere leaves
        recovery to ``train``'s self-healing wrapper."""
        t0 = time.time()
        traj = self.run_self_play(episodes)
        jax.block_until_ready(traj.mask)
        sp_time = time.time() - t0

        if self.prioritized:
            self.buffer = buffer_lib.add_prioritized(self.buffer, traj)
        else:
            self.buffer = buffer_lib.add(self.buffer, traj)

        t1 = time.time()
        losses = []
        if buffer_lib.is_ready(self.buffer, self.batch_size):
            if self.prioritized:
                # per-step host loop: the priority updates thread the
                # buffer through each step
                for _ in range(self.epochs_per_iter):
                    self.rng, sub = jax.random.split(self.rng)
                    if self.distributed:
                        from ..parallel.mesh import to_global_replicated

                        sub = to_global_replicated(sub, self.mesh)
                    self.state, self.buffer, metrics = train_step_prioritized(
                        self.model,
                        self.engine,
                        self.tx,
                        self.state,
                        self.buffer,
                        sub,
                        batch_size=self.batch_size,
                        augment=self.augment,
                        mesh=self.mesh,
                    )
                    losses.append(metrics)
            else:
                # all epochs scanned inside ONE jit (round 4): one dispatch
                # instead of epochs_per_iter device round-trips
                self.rng, sub = jax.random.split(self.rng)
                if self.distributed:
                    from ..parallel.mesh import to_global_replicated

                    sub = to_global_replicated(sub, self.mesh)
                self.state, stacked = train_steps(
                    self.model,
                    self.engine,
                    self.tx,
                    self.state,
                    self.buffer,
                    sub,
                    batch_size=self.batch_size,
                    num_steps=self.epochs_per_iter,
                    augment=self.augment,
                    mesh=self.mesh,
                )
                stacked = jax.device_get(stacked)
                losses = [
                    {k: stacked[k][i] for k in stacked}
                    for i in range(self.epochs_per_iter)
                ]
        jax.block_until_ready(self.state.params)
        tr_time = time.time() - t1

        new_iter = jnp.int32(it + 1)
        if self.distributed:
            from ..parallel.mesh import to_global_replicated

            new_iter = to_global_replicated(new_iter, self.mesh)
        self.state = self.state.replace(iteration=new_iter)
        stats = jax.device_get(buffer_lib.statistics(self.buffer))
        avg = lambda k: (  # noqa: E731
            float(jnp.mean(jnp.stack([m[k] for m in losses]))) if losses else 0.0
        )
        scalars = {
            "Loss/train": avg("loss"),
            "Loss/policy": avg("policy_loss"),
            "Loss/value": avg("value_loss"),
            "Time/self_play": sp_time,
            "Time/train": tr_time,
            "Buffer/size": float(stats["size"]),
            "Buffer/value_mean": float(stats["value_mean"]),
            "Buffer/value_std": float(stats["value_std"]),
            "SelfPlay/avg_moves": float(jnp.mean(traj.num_moves)),
        }
        for k, v in scalars.items():
            self.writer.scalar(k, v, it + 1)
        self.writer.flush()
        # console UX: ETA from recent iteration times + loss trend arrow
        # (reference trainer.py:93-134,165-232)
        recent_iter_times.append(sp_time + tr_time)
        del recent_iter_times[:-10]
        recent_losses.append(scalars["Loss/train"])
        del recent_losses[:-5]
        eta = (num_iterations - it - 1) * (
            sum(recent_iter_times) / len(recent_iter_times)
        )
        trend = ""
        if len(recent_losses) >= 2:
            trend = " ↓" if recent_losses[-1] < recent_losses[0] else " ↑"
        self.log(
            f"iter {it + 1}/{num_iterations} loss={scalars['Loss/train']:.4f}"
            f"{trend} self_play={sp_time:.1f}s train={tr_time:.1f}s "
            f"buffer={int(stats['size'])} eta={eta / 60:.1f}m"
        )

        self.run_gating(it + 1)

        if (it + 1) % self.checkpoint_interval == 0:
            self.save_checkpoint(f"checkpoint_iter_{it + 1:06d}")
        return scalars

    def close(self) -> None:
        self.writer.close()
