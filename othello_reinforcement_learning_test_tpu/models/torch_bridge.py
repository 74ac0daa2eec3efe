"""Bidirectional bridge to the reference's PyTorch checkpoint format.

The reference persists models as ``torch.save`` dicts whose
``model_state_dict`` uses the module names of its ``OthelloResNet``
(``/root/reference/src/model/net.py:139-205``: ``conv_block.{conv,bn}``,
``res_blocks.{i}.{conv1,bn1,conv2,bn2}``, ``policy_head.{conv,bn,fc}``,
``value_head.{conv,bn,fc1,fc2}``), and every reference loader
(``MCTSPlayer.from_checkpoint`` players.py:159-223, the GUI app.py:161-208,
the web game_manager.py:219-239) re-derives num_blocks/num_filters from
those key names and shapes. This module makes migration bidirectional:

- **export**: a model trained here becomes a reference-loadable ``.pt``
  checkpoint (``save_reference_checkpoint``) — drop it in the reference's
  ``data/models/`` and its CLI/GUI/web load it unmodified;
- **import**: a checkpoint trained on the reference loads here
  (``load_reference_checkpoint`` / ``MCTSPlayer.from_checkpoint`` on a
  ``.pt`` file) and plays through the TPU inference stack;
- **ONNX**: ``save_onnx`` exports through a torch mirror module — the
  reference's declared-but-never-implemented task
  (``/root/reference/REMAINING_TASKS.md`` §3, ``pyproject.toml`` onnx extra).

Layout conversion, both directions:

- conv kernels: flax HWIO ``(kh, kw, cin, cout)`` <-> torch ``(cout, cin,
  kh, kw)``;
- dense kernels: flax ``(in, out)`` <-> torch ``(out, in)``;
- BatchNorm: flax ``scale/bias`` + ``batch_stats mean/var`` <-> torch
  ``weight/bias/running_mean/running_var`` (both use eps=1e-5);
- the policy FC input is a *flatten of a 2-channel spatial map*, so its
  column order differs between our NHWC flatten (index ``(h*S+w)*2 + c``)
  and the reference's NCHW flatten (index ``c*S*S + h*S + w``,
  net.py:83-93); ``_policy_fc_perm`` permutes columns so the exported
  weights compute the identical function. The value FC flatten is a single
  channel, where both orders coincide (net.py:119-129).

torch is an optional dependency of this module only (baked into this image,
CPU build); everything else in the framework stays torch-free.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from .resnet import OthelloResNet, init_variables


def _require_torch():
    try:
        import torch  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - torch is in this image
        raise ImportError(
            "torch is required for the reference-checkpoint bridge"
        ) from e
    return torch


def _policy_fc_perm(board_size: int) -> np.ndarray:
    """``perm[t] = f``: torch input column ``t = c*S*S + h*S + w`` reads our
    flax Dense input row ``f = (h*S + w)*2 + c`` (2 policy channels)."""
    ss = board_size * board_size
    t = np.arange(2 * ss)
    c, hw = t // ss, t % ss
    return hw * 2 + c


# ---------------------------------------------------------------------------
# variables -> reference state_dict
# ---------------------------------------------------------------------------


def to_reference_state_dict(variables: Dict) -> Dict[str, Any]:
    """Convert ``{params, batch_stats}`` of :class:`OthelloResNet` into a
    state dict keyed exactly like the reference model's (net.py:158-180)."""
    torch = _require_torch()
    params = variables["params"]
    stats = variables["batch_stats"]

    def t(x) -> "torch.Tensor":
        # np.array (not asarray): torch.from_numpy needs a writable copy
        return torch.from_numpy(np.array(x, dtype=np.float32))

    def conv_w(p) -> "torch.Tensor":
        return t(np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)))

    sd: Dict[str, Any] = {}

    def bn(prefix: str, pname: str):
        sd[f"{prefix}.weight"] = t(params[pname]["scale"])
        sd[f"{prefix}.bias"] = t(params[pname]["bias"])
        sd[f"{prefix}.running_mean"] = t(stats[pname]["mean"])
        sd[f"{prefix}.running_var"] = t(stats[pname]["var"])
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)

    # stem (reference ConvBlock, net.py:15-31)
    sd["conv_block.conv.weight"] = conv_w(params["Conv_0"])
    bn("conv_block.bn", "BatchNorm_0")

    # residual tower (net.py:34-61)
    n_blocks = sum(1 for k in params if k.startswith("ResBlock_"))
    for i in range(n_blocks):
        blk = params[f"ResBlock_{i}"]
        sd[f"res_blocks.{i}.conv1.weight"] = conv_w(blk["Conv_0"])
        sd[f"res_blocks.{i}.conv2.weight"] = conv_w(blk["Conv_1"])
        for bn_t, bn_f in (("bn1", "BatchNorm_0"), ("bn2", "BatchNorm_1")):
            p = blk[bn_f]
            s = stats[f"ResBlock_{i}"][bn_f]
            sd[f"res_blocks.{i}.{bn_t}.weight"] = t(p["scale"])
            sd[f"res_blocks.{i}.{bn_t}.bias"] = t(p["bias"])
            sd[f"res_blocks.{i}.{bn_t}.running_mean"] = t(s["mean"])
            sd[f"res_blocks.{i}.{bn_t}.running_var"] = t(s["var"])
            sd[f"res_blocks.{i}.{bn_t}.num_batches_tracked"] = torch.tensor(
                0, dtype=torch.long
            )

    # policy head (net.py:64-96)
    sd["policy_head.conv.weight"] = conv_w(params["Conv_1"])
    bn("policy_head.bn", "BatchNorm_1")
    fc_k = np.asarray(params["Dense_0"]["kernel"], dtype=np.float32)
    board_size = int(np.sqrt(fc_k.shape[0] // 2))
    perm = _policy_fc_perm(board_size)
    sd["policy_head.fc.weight"] = t(fc_k.T[:, perm])
    sd["policy_head.fc.bias"] = t(params["Dense_0"]["bias"])

    # value head (net.py:99-136); single-channel flatten -> no permutation
    sd["value_head.conv.weight"] = conv_w(params["Conv_2"])
    bn("value_head.bn", "BatchNorm_2")
    sd["value_head.fc1.weight"] = t(np.asarray(params["Dense_1"]["kernel"]).T)
    sd["value_head.fc1.bias"] = t(params["Dense_1"]["bias"])
    sd["value_head.fc2.weight"] = t(np.asarray(params["Dense_2"]["kernel"]).T)
    sd["value_head.fc2.bias"] = t(params["Dense_2"]["bias"])
    return sd


# ---------------------------------------------------------------------------
# reference state_dict -> variables
# ---------------------------------------------------------------------------


def infer_architecture(state_dict: Dict[str, Any]) -> Tuple[int, int, int]:
    """``(num_blocks, num_filters, board_size)`` from key names/shapes, the
    same inference every reference loader performs (players.py:183-204)."""
    num_filters = int(state_dict["conv_block.conv.weight"].shape[0])
    num_blocks = 0
    for key in state_dict:
        if key.startswith("res_blocks."):
            num_blocks = max(num_blocks, int(key.split(".")[1]) + 1)
    n_actions = int(state_dict["policy_head.fc.weight"].shape[0])
    board_size = int(np.sqrt(n_actions - 1))
    return num_blocks, num_filters, board_size


def from_reference_state_dict(
    state_dict: Dict[str, Any],
) -> Tuple[OthelloResNet, Dict]:
    """Build an :class:`OthelloResNet` + ``{params, batch_stats}`` computing
    the same function as a reference model with this state dict."""
    import jax  # noqa: PLC0415
    from flax.core import unfreeze  # noqa: PLC0415

    num_blocks, num_filters, board_size = infer_architecture(state_dict)
    value_hidden = int(state_dict["value_head.fc1.weight"].shape[0])
    model = OthelloResNet(
        num_blocks=num_blocks,
        num_filters=num_filters,
        board_size=board_size,
        value_hidden=value_hidden,
    )
    variables = unfreeze(
        jax.tree.map(
            lambda x: np.asarray(x),
            init_variables(model, jax.random.PRNGKey(0)),
        )
    )
    params, stats = variables["params"], variables["batch_stats"]

    def a(key: str) -> np.ndarray:
        v = state_dict[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    def set_conv(p, key: str):
        p["kernel"] = np.transpose(a(key), (2, 3, 1, 0))

    def set_bn(pname: str, prefix: str):
        params[pname]["scale"] = a(f"{prefix}.weight")
        params[pname]["bias"] = a(f"{prefix}.bias")

    set_conv(params["Conv_0"], "conv_block.conv.weight")
    set_bn("BatchNorm_0", "conv_block.bn")
    stats["BatchNorm_0"]["mean"] = a("conv_block.bn.running_mean")
    stats["BatchNorm_0"]["var"] = a("conv_block.bn.running_var")

    for i in range(num_blocks):
        blk_p, blk_s = params[f"ResBlock_{i}"], stats[f"ResBlock_{i}"]
        set_conv(blk_p["Conv_0"], f"res_blocks.{i}.conv1.weight")
        set_conv(blk_p["Conv_1"], f"res_blocks.{i}.conv2.weight")
        for bn_t, bn_f in (("bn1", "BatchNorm_0"), ("bn2", "BatchNorm_1")):
            blk_p[bn_f]["scale"] = a(f"res_blocks.{i}.{bn_t}.weight")
            blk_p[bn_f]["bias"] = a(f"res_blocks.{i}.{bn_t}.bias")
            blk_s[bn_f]["mean"] = a(f"res_blocks.{i}.{bn_t}.running_mean")
            blk_s[bn_f]["var"] = a(f"res_blocks.{i}.{bn_t}.running_var")

    set_conv(params["Conv_1"], "policy_head.conv.weight")
    set_bn("BatchNorm_1", "policy_head.bn")
    stats["BatchNorm_1"]["mean"] = a("policy_head.bn.running_mean")
    stats["BatchNorm_1"]["var"] = a("policy_head.bn.running_var")
    perm = _policy_fc_perm(board_size)
    inv = np.argsort(perm)
    params["Dense_0"]["kernel"] = a("policy_head.fc.weight")[:, inv].T
    params["Dense_0"]["bias"] = a("policy_head.fc.bias")

    set_conv(params["Conv_2"], "value_head.conv.weight")
    set_bn("BatchNorm_2", "value_head.bn")
    stats["BatchNorm_2"]["mean"] = a("value_head.bn.running_mean")
    stats["BatchNorm_2"]["var"] = a("value_head.bn.running_var")
    params["Dense_1"]["kernel"] = a("value_head.fc1.weight").T
    params["Dense_1"]["bias"] = a("value_head.fc1.bias")
    params["Dense_2"]["kernel"] = a("value_head.fc2.weight").T
    params["Dense_2"]["bias"] = a("value_head.fc2.bias")

    return model, variables


# ---------------------------------------------------------------------------
# checkpoint files
# ---------------------------------------------------------------------------


def save_reference_checkpoint(
    variables: Dict,
    path: str,
    config: Optional[Dict] = None,
    global_step: int = 0,
    epoch: int = 0,
) -> str:
    """Write a ``.pt`` checkpoint with the reference trainer's exact dict
    shape (trainer.py:374-383): model/optimizer/scheduler state dicts +
    global_step/epoch/config, so even ``AlphaZeroTrainer.load_checkpoint``
    (trainer.py:387-404) accepts it. Optimizer/scheduler states are freshly
    initialized over a torch mirror of the model (there is no torch
    optimizer in this framework to carry over — training here is optax)."""
    torch = _require_torch()
    sd = to_reference_state_dict(variables)
    num_blocks, num_filters, board_size = infer_architecture(sd)
    mirror = build_torch_mirror(
        num_blocks, num_filters, board_size,
        value_hidden=int(sd["value_head.fc1.weight"].shape[0]),
    )
    mirror.load_state_dict(sd)
    tr = (config or {}).get("training", {})
    optimizer = torch.optim.SGD(
        mirror.parameters(),
        # repo configs use training.lr (same key as the reference yamls);
        # accept the long form too so neither spelling silently falls back
        lr=float(tr.get("lr", tr.get("learning_rate", 1e-3))),
        momentum=float(tr.get("momentum", 0.9)),
        weight_decay=float(tr.get("weight_decay", 1e-4)),
    )
    scheduler = torch.optim.lr_scheduler.StepLR(
        optimizer,
        step_size=int(tr.get("lr_step_size", 100)),
        gamma=float(tr.get("lr_gamma", 0.1)),
    )
    torch.save(
        {
            "model_state_dict": sd,
            "optimizer_state_dict": optimizer.state_dict(),
            "scheduler_state_dict": scheduler.state_dict(),
            "global_step": int(global_step),
            "epoch": int(epoch),
            "config": config or {},
        },
        path,
    )
    return path


def load_reference_checkpoint(
    path: str,
) -> Tuple[OthelloResNet, Dict, Dict]:
    """Load a reference ``.pt`` checkpoint (or a bare state dict) into
    ``(model, variables, config)``."""
    torch = _require_torch()
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        sd, config = obj["model_state_dict"], obj.get("config", {}) or {}
    else:
        sd, config = obj, {}
    model, variables = from_reference_state_dict(sd)
    return model, variables, config


# ---------------------------------------------------------------------------
# torch mirror module (for ONNX export + parity validation)
# ---------------------------------------------------------------------------


def build_torch_mirror(
    num_blocks: int,
    num_filters: int,
    board_size: int = 8,
    value_hidden: int = 256,
):
    """A torch module with the reference's exact state-dict key layout and
    I/O contract (NCHW in, ``(log_probs, value)`` out — net.py:182-205), so
    ``to_reference_state_dict`` output loads strict and parity can be
    asserted against the JAX forward without importing reference code."""
    torch = _require_torch()
    nn = torch.nn

    class Stem(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, num_filters, 3, padding=1, bias=False)
            self.bn = nn.BatchNorm2d(num_filters)

        def forward(self, x):
            return torch.relu(self.bn(self.conv(x)))

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(num_filters, num_filters, 3, padding=1,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(num_filters)
            self.conv2 = nn.Conv2d(num_filters, num_filters, 3, padding=1,
                                   bias=False)
            self.bn2 = nn.BatchNorm2d(num_filters)

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(x + y)

    class PolicyHead(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(num_filters, 2, 1, bias=False)
            self.bn = nn.BatchNorm2d(2)
            self.fc = nn.Linear(2 * board_size * board_size,
                                board_size * board_size + 1)

        def forward(self, x):
            x = torch.relu(self.bn(self.conv(x)))
            return torch.log_softmax(self.fc(x.flatten(1)), dim=-1)

    class ValueHead(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(num_filters, 1, 1, bias=False)
            self.bn = nn.BatchNorm2d(1)
            self.fc1 = nn.Linear(board_size * board_size, value_hidden)
            self.fc2 = nn.Linear(value_hidden, 1)

        def forward(self, x):
            x = torch.relu(self.bn(self.conv(x)))
            x = torch.relu(self.fc1(x.flatten(1)))
            return torch.tanh(self.fc2(x))

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_block = Stem()
            self.res_blocks = nn.ModuleList(
                [Block() for _ in range(num_blocks)]
            )
            self.policy_head = PolicyHead()
            self.value_head = ValueHead()

        def forward(self, x):
            x = self.conv_block(x)
            for blk in self.res_blocks:
                x = blk(x)
            return self.policy_head(x), self.value_head(x)

    return Mirror()


def _loaded_mirror(variables: Dict):
    torch = _require_torch()
    sd = to_reference_state_dict(variables)
    num_blocks, num_filters, board_size = infer_architecture(sd)
    mirror = build_torch_mirror(
        num_blocks, num_filters, board_size,
        value_hidden=int(sd["value_head.fc1.weight"].shape[0]),
    )
    mirror.load_state_dict(sd)
    mirror.eval()
    return torch, mirror, board_size


def save_torchscript(variables: Dict, path: str, batch_size: int = 1) -> str:
    """Serialize a traced TorchScript module (NCHW input, reference I/O
    contract). Unlike ONNX this needs no extra packages — a portable
    serving artifact loadable with ``torch.jit.load`` anywhere torch runs."""
    torch, mirror, board_size = _loaded_mirror(variables)
    dummy = torch.zeros(batch_size, 3, board_size, board_size)
    with torch.no_grad():
        traced = torch.jit.trace(mirror, (dummy,))
    traced.save(path)
    return path


def save_onnx(
    variables: Dict,
    path: str,
    batch_size: int = 1,
    opset: int = 17,
) -> str:
    """Export the model to ONNX via the torch mirror (the reference's
    unimplemented REMAINING_TASKS §3 item). Input is the reference's NCHW
    ``(B, 3, S, S)`` layout so downstream ONNX consumers match its docs.
    Raises RuntimeError when no usable exporter is present (this torch
    build needs the ``onnx`` package to serialize, matching the reference's
    optional onnx extra — use :func:`save_torchscript` or the StableHLO
    export (``models/export.py``) where it is absent)."""
    torch, mirror, board_size = _loaded_mirror(variables)
    dummy = torch.zeros(batch_size, 3, board_size, board_size)
    try:
        torch.onnx.export(
            mirror,
            (dummy,),
            path,
            input_names=["board"],
            output_names=["policy_log_probs", "value"],
            opset_version=opset,
            dynamo=False,
        )
    except Exception as e:  # exporter backends vary by torch build
        raise RuntimeError(f"torch ONNX export unavailable: {e}") from e
    return path
