"""Reference-checkpoint bridge: export/import `.pt`, torch parity, ONNX.

The reference persists models as torch checkpoints and every one of its
loaders re-derives the architecture from state-dict key names and shapes
(``/root/reference/src/eval/players.py:183-204``, gui app.py:173-188, web
game_manager.py:219-239). These tests pin:

1. the exported state dict has exactly the key layout those loaders walk;
2. a torch mirror loaded from it computes the *identical function* as the
   JAX model (f32, atol ~1e-5 — NHWC->NCHW conv transposes plus the policy
   FC flatten permutation must all be right for this to hold);
3. export -> import round-trips bit-exactly at the weight level;
4. a reference-format ``.pt`` file loads back through
   ``MCTSPlayer.from_checkpoint`` and plays legal moves;
5. the CLI ``export`` command converts a real orbax checkpoint.
"""

import os

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


@pytest.fixture(scope="module")
def small_f32():
    """f32-compute model so torch parity is exact, not bf16-fuzzy."""
    model = OthelloResNet(
        num_blocks=2, num_filters=16, board_size=8, dtype=jnp.float32
    )
    variables = init_variables(model, jax.random.PRNGKey(1))
    return model, variables


def _randomize_stats(variables, seed=3):
    """BN running stats are identity at init; make them non-trivial so a
    mean/var mapping bug cannot hide."""
    rng = np.random.RandomState(seed)
    return jax.tree.map(
        lambda x: x + rng.uniform(0.01, 0.2, x.shape).astype(np.float32)
        if x.ndim >= 1
        else x,
        jax.device_get(variables),
    )


def test_state_dict_key_layout(small_f32):
    _, variables = small_f32
    sd = tb.to_reference_state_dict(variables)
    expected = {"conv_block.conv.weight"}
    for bn in ("conv_block.bn", "policy_head.bn", "value_head.bn"):
        expected |= {
            f"{bn}.weight", f"{bn}.bias", f"{bn}.running_mean",
            f"{bn}.running_var", f"{bn}.num_batches_tracked",
        }
    for i in range(2):
        for c, b in (("conv1", "bn1"), ("conv2", "bn2")):
            expected.add(f"res_blocks.{i}.{c}.weight")
            expected |= {
                f"res_blocks.{i}.{b}.weight", f"res_blocks.{i}.{b}.bias",
                f"res_blocks.{i}.{b}.running_mean",
                f"res_blocks.{i}.{b}.running_var",
                f"res_blocks.{i}.{b}.num_batches_tracked",
            }
    expected |= {
        "policy_head.conv.weight", "policy_head.fc.weight",
        "policy_head.fc.bias", "value_head.conv.weight",
        "value_head.fc1.weight", "value_head.fc1.bias",
        "value_head.fc2.weight", "value_head.fc2.bias",
    }
    assert set(sd) == expected
    # the shapes the reference's inference walks (players.py:188-204)
    assert sd["conv_block.conv.weight"].shape == (16, 3, 3, 3)
    assert sd["policy_head.fc.weight"].shape == (65, 2 * 64)
    assert tb.infer_architecture(sd) == (2, 16, 8)


def test_torch_mirror_computes_identical_function(small_f32):
    model, variables = small_f32
    variables = _randomize_stats(variables)
    sd = tb.to_reference_state_dict(variables)
    mirror = tb.build_torch_mirror(2, 16, 8)
    mirror.load_state_dict(sd, strict=True)
    mirror.eval()

    x = np.random.RandomState(0).rand(8, 8, 8, 3).astype(np.float32)
    lp_j, v_j = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        lp_t, v_t = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(lp_j), lp_t.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(v_j), v_t.numpy(), atol=2e-5, rtol=1e-4
    )


def test_roundtrip_weights_bit_exact(small_f32):
    _, variables = small_f32
    variables = _randomize_stats(variables)
    sd = tb.to_reference_state_dict(variables)
    model2, v2 = tb.from_reference_state_dict(sd)
    assert (model2.num_blocks, model2.num_filters, model2.board_size) == (
        2, 16, 8,
    )
    for orig, back in zip(
        jax.tree.leaves(jax.device_get(variables)), jax.tree.leaves(v2)
    ):
        np.testing.assert_array_equal(np.asarray(orig), np.asarray(back))


def test_policy_fc_perm_is_a_permutation():
    perm = tb._policy_fc_perm(8)
    assert sorted(perm) == list(range(128))
    # spot-check the formula: torch col (c=1, h=2, w=3) reads flax row
    # (h*8+w)*2 + 1
    t = 1 * 64 + 2 * 8 + 3
    assert perm[t] == (2 * 8 + 3) * 2 + 1


def test_reference_checkpoint_file_loads_as_player(small_f32, tmp_path):
    from othello_reinforcement_learning_test_tpu.evaluation.players import (
        MCTSPlayer,
    )
    from othello_reinforcement_learning_test_tpu.ops.bitboard import (
        get_engine,
    )

    _, variables = small_f32
    path = str(tmp_path / "ref_model.pt")
    tb.save_reference_checkpoint(
        variables, path,
        config={"model": {"num_blocks": 2, "num_filters": 16}},
        global_step=7,
    )
    # the file has the reference trainer's full dict shape
    obj = torch.load(path, map_location="cpu", weights_only=True)
    assert set(obj) >= {
        "model_state_dict", "optimizer_state_dict", "scheduler_state_dict",
        "global_step", "epoch", "config",
    }
    assert obj["global_step"] == 7

    player = MCTSPlayer.from_checkpoint(path, num_simulations=4)
    engine = get_engine(8)
    boards = engine.initial_state((1,))
    action = player.act(jax.random.PRNGKey(0), boards)
    legal = engine.legal_actions(boards)
    assert bool(legal[0, int(action[0])])


def test_torchscript_export_parity(small_f32, tmp_path):
    model, variables = small_f32
    variables = _randomize_stats(variables)
    path = str(tmp_path / "model.ts.pt")
    tb.save_torchscript(variables, path, batch_size=4)
    loaded = torch.jit.load(path)
    x = np.random.RandomState(5).rand(4, 8, 8, 3).astype(np.float32)
    lp_j, v_j = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        lp_t, v_t = loaded(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(lp_j), lp_t.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(v_j), v_t.numpy(), atol=2e-5, rtol=1e-4
    )


def test_onnx_export_when_available(small_f32, tmp_path):
    _, variables = small_f32
    path = str(tmp_path / "model.onnx")
    try:
        tb.save_onnx(variables, path)
    except RuntimeError as e:
        pytest.skip(f"no ONNX serializer in this image: {e}")
    assert os.path.getsize(path) > 10_000


def test_cli_export_reference_pt(test_checkpoint, tmp_path, capsys):
    from othello_reinforcement_learning_test_tpu.cli import main

    out = str(tmp_path / "exported.pt")
    main([
        "export", "--checkpoint", test_checkpoint, "--out", out,
        "--format", "reference-pt",
    ])
    assert os.path.isfile(out)
    obj = torch.load(out, map_location="cpu", weights_only=True)
    # architecture inference the reference loaders perform must see the
    # tiny test net (2 blocks x 16 filters)
    assert tb.infer_architecture(obj["model_state_dict"]) == (2, 16, 8)
    # config sidecar travels inside the checkpoint like the reference's
    assert obj["config"].get("model", {}).get("num_filters") == 16
