"""Interop proven by the REFERENCE'S OWN CODE, not a repo-built mirror.

``tests/test_torch_bridge.py`` validates exports against a torch mirror that
lives in this repo; these tests go the last mile: they import the reference
system itself (via ``scripts/setup_refbuild.py``, which symlinks
``/root/reference`` and compiles its pre-generated Cython engine), load an
exported checkpoint with the reference's ``OthelloResNet``
(``/root/reference/src/model/net.py:158-180``) under ``strict=True``, assert
forward parity against the JAX model, and run the reference's
``MCTSPlayer.from_checkpoint`` shape inference + a real move on the
reference's own ``OthelloBitboard``
(``/root/reference/src/eval/players.py:160-223``).

This turns docs/migration.md's "the reference's CLI/GUI/web load exported
checkpoints unmodified" from an inference into a tested fact.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from othello_reinforcement_learning_test_tpu.models import torch_bridge as tb
from othello_reinforcement_learning_test_tpu.models.resnet import (
    OthelloResNet,
    init_variables,
)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


@pytest.fixture(scope="module")
def refbuild():
    """Materialize (or reuse) the runnable reference copy; skip when the
    reference tree or a C compiler is unavailable."""
    import setup_refbuild

    try:
        path = setup_refbuild.build(verbose=False)
    except (FileNotFoundError, subprocess.CalledProcessError) as e:
        pytest.skip(f"reference not buildable here: {e}")
    if str(path) not in sys.path:
        sys.path.insert(0, str(path))
    return path


@pytest.fixture(scope="module")
def exported_pt(tmp_path_factory):
    """A small repo-trained-shape model exported to reference .pt format."""
    model = OthelloResNet(
        num_blocks=3, num_filters=24, board_size=8, dtype=jnp.float32
    )
    variables = init_variables(model, jax.random.PRNGKey(7))
    # non-identity BN running stats so a mean/var mapping bug cannot hide
    # (perturbing the weights too would blow up the activations and reduce
    # the parity assert to a loose relative check)
    rng = np.random.RandomState(11)
    variables = dict(jax.device_get(variables))
    variables["batch_stats"] = jax.tree.map(
        lambda x: x + rng.uniform(0.01, 0.2, x.shape).astype(np.float32),
        variables["batch_stats"],
    )
    path = tmp_path_factory.mktemp("interop") / "exported.pt"
    tb.save_reference_checkpoint(
        variables, str(path),
        config={"model": {"num_blocks": 3, "num_filters": 24},
                "training": {"lr": 0.005, "momentum": 0.8}},
    )
    return model, variables, str(path)


def test_reference_net_loads_export_strict(refbuild, exported_pt):
    """reference OthelloResNet.load_state_dict(export, strict=True) + forward
    parity with the JAX model on random boards."""
    from src.model.net import OthelloResNet as RefNet  # reference code

    model, variables, path = exported_pt
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    ref = RefNet(num_blocks=3, num_filters=24)
    # strict=True: every exported key consumed, none missing
    ref.load_state_dict(ckpt["model_state_dict"], strict=True)
    ref.eval()

    x = np.random.RandomState(0).rand(5, 8, 8, 3).astype(np.float32)
    lp_j, v_j = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        lp_t, v_t = ref(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.asarray(lp_j), lp_t.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(v_j), v_t.numpy(), atol=2e-5, rtol=1e-4
    )


def test_reference_mcts_player_from_checkpoint(refbuild, exported_pt):
    """The reference's own shape inference (players.py:183-204) detects the
    architecture from the exported state dict and its MCTSPlayer plays a
    legal move on the reference's Cython bitboard."""
    from src.eval.players import MCTSPlayer as RefMCTSPlayer
    from src.cython.bitboard import OthelloBitboard

    _, _, path = exported_pt
    player = RefMCTSPlayer.from_checkpoint(
        path, device=torch.device("cpu"), num_simulations=8
    )
    assert player.model.num_blocks == 3
    assert player.model.num_filters == 24

    board = OthelloBitboard()
    action = player.get_action(board)
    assert action in board.get_legal_moves()


def test_reference_resume_from_export(refbuild, exported_pt, tmp_path):
    """The reference trainer's load_checkpoint (trainer.py:387-404) restores
    the exported optimizer/scheduler state — i.e. the reference can RESUME
    TRAINING from a model trained here, with the configured lr/momentum
    (not defaults) carried through the exported SGD state."""
    from src.model.net import OthelloResNet as RefNet

    _, _, path = exported_pt
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    ref = RefNet(num_blocks=3, num_filters=24)
    ref.load_state_dict(ckpt["model_state_dict"], strict=True)
    opt = torch.optim.SGD(ref.parameters(), lr=0.1)
    opt.load_state_dict(ckpt["optimizer_state_dict"])
    group = opt.param_groups[0]
    assert group["lr"] == pytest.approx(0.005)   # training.lr, not default
    assert group["momentum"] == pytest.approx(0.8)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1)
    sched.load_state_dict(ckpt["scheduler_state_dict"])
    # one real training step runs end to end
    x = torch.rand(4, 3, 8, 8)
    lp, v = ref(x)
    loss = -(lp.exp() * lp).sum(-1).mean() + (v**2).mean()
    loss.backward()
    opt.step()
