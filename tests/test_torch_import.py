"""Torch checkpoint import/export (models/torch_import.py).

Validates layout conversion against torch itself (conv OIHW→HWIO, BN
running stats), and that a reference-layout state dict round-trips exactly
through the flax PVNet variable tree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.models import make_network
from clean_pvnet_tpu.models.torch_import import (
    export_pvnet_state_dict,
    import_pvnet_state_dict,
    import_resnet_backbone,
)

torch = pytest.importorskip("torch")


def _init_variables():
    cfg = Config().with_overrides({"network.use_bfloat16": False})
    model = make_network(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    return cfg, model, variables


def test_conv_layout_conversion_matches_torch():
    # the same weights must produce the same outputs through torch Conv2d
    # (OIHW, NCHW) and flax Conv (HWIO, NHWC)
    import flax.linen as nn

    rng = np.random.RandomState(0)
    w = rng.randn(8, 3, 3, 3).astype(np.float32)  # OIHW
    x = rng.randn(1, 3, 16, 16).astype(np.float32)  # NCHW

    tconv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        ty = tconv(torch.from_numpy(x)).numpy()  # NCHW

    fconv = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    kernel = w.transpose(2, 3, 1, 0)  # HWIO, same as _conv_kernel
    fy = fconv.apply({"params": {"kernel": jnp.asarray(kernel)}},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ty, np.asarray(fy).transpose(0, 3, 1, 2),
                               rtol=1e-4, atol=1e-4)


def test_batchnorm_conversion_matches_torch():
    import flax.linen as nn

    rng = np.random.RandomState(1)
    c = 6
    weight = rng.rand(c).astype(np.float32) + 0.5
    bias = rng.randn(c).astype(np.float32)
    mean = rng.randn(c).astype(np.float32)
    var = rng.rand(c).astype(np.float32) + 0.1
    x = rng.randn(2, c, 5, 5).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(weight))
        tbn.bias.copy_(torch.from_numpy(bias))
        tbn.running_mean.copy_(torch.from_numpy(mean))
        tbn.running_var.copy_(torch.from_numpy(var))
        ty = tbn(torch.from_numpy(x)).numpy()

    fbn = nn.BatchNorm(use_running_average=True)
    fy = fbn.apply(
        {
            "params": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)},
            "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
        },
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(ty, np.asarray(fy).transpose(0, 3, 1, 2),
                               rtol=1e-4, atol=1e-4)


def test_pvnet_state_dict_roundtrip():
    _, model, variables = _init_variables()
    state = export_pvnet_state_dict(variables)
    # reference-layout keys present (spot-check the naming contract)
    for key in (
        "resnet18_8s.conv1.weight",
        "resnet18_8s.layer1.0.conv1.weight",
        "resnet18_8s.layer2.0.downsample.0.weight",
        "resnet18_8s.fc.0.weight",
        "conv8s.0.weight",
        "convraw.3.bias",
    ):
        assert key in state, key
    # ResNet-18 layer1 keeps the identity shortcut — no downsample keys
    assert "resnet18_8s.layer1.0.downsample.0.weight" not in state

    back = import_pvnet_state_dict(state, variables)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = jax.tree_util.tree_leaves_with_path(back["params"])
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(variables["batch_stats"]),
        jax.tree_util.tree_leaves_with_path(back["batch_stats"]),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_imported_variables_run_forward():
    _, model, variables = _init_variables()
    state = export_pvnet_state_dict(variables)
    # perturb one tensor so we can see the import actually takes effect
    state["convraw.3.bias"] = state["convraw.3.bias"] + 1.0
    imported = import_pvnet_state_dict(state, variables)
    x = jnp.zeros((1, 32, 32, 3))
    out0 = model.apply(variables, x, train=False)
    out1 = model.apply(imported, x, train=False)
    assert out1["seg"].shape == out0["seg"].shape
    diff = np.abs(np.asarray(out1["seg"]) - np.asarray(out0["seg"]))
    assert diff.max() > 0.5  # the +1 bias shift reached the output


def test_import_torchvision_backbone_only():
    _, model, variables = _init_variables()
    full = export_pvnet_state_dict(variables)
    # synthesize a torchvision-style ImageNet state dict: trunk keys without
    # the resnet18_8s. prefix, values offset so the import is observable
    tv = {
        k[len("resnet18_8s."):]: np.asarray(v) + 0.25
        for k, v in full.items()
        if k.startswith("resnet18_8s.") and not k.startswith("resnet18_8s.fc.")
    }
    out = import_resnet_backbone(tv, variables)
    got = np.asarray(out["params"]["backbone"]["Conv_0"]["kernel"])
    want = np.asarray(variables["params"]["backbone"]["Conv_0"]["kernel"]) + 0.25
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # decoder untouched
    np.testing.assert_array_equal(
        np.asarray(out["params"]["head"]["kernel"]),
        np.asarray(variables["params"]["head"]["kernel"]),
    )
    # fc head untouched (not part of torchvision checkpoints)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["backbone"]["Conv_1"]["kernel"]),
        np.asarray(variables["params"]["backbone"]["Conv_1"]["kernel"]),
    )


def test_import_torch_cli_roundtrip(tmp_path):
    """run.py --type import_torch writes a checkpoint that restore() loads."""
    import argparse

    from clean_pvnet_tpu.parallel import make_mesh
    from clean_pvnet_tpu.train import CheckpointIO, Trainer
    from run import run_import_torch

    cfg, model, variables = _init_variables()
    state_dict = export_pvnet_state_dict(variables)
    tstate = {k: torch.from_numpy(np.asarray(v).copy())
              for k, v in state_dict.items()}
    pth = tmp_path / "ref.pth"
    torch.save({"net": tstate, "epoch": 42}, str(pth))

    cfg = cfg.with_overrides({"model_dir": str(tmp_path / "models")})
    args = argparse.Namespace(torch_ckpt=str(pth))
    run_import_torch(cfg, args)

    mesh = make_mesh(cfg.mesh)
    trainer = Trainer(cfg, model, steps_per_epoch=1, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(1), (1, 32, 32, 3))
    ckpt = CheckpointIO(f"{cfg.model_dir}/{cfg.task}/{cfg.model}")
    state, epoch = ckpt.restore(state)
    assert epoch == 0
    np.testing.assert_allclose(
        np.asarray(state.params["head"]["bias"]),
        np.asarray(variables["params"]["head"]["bias"]),
    )


def test_torch_checkpoint_file_loading(tmp_path):
    from clean_pvnet_tpu.models.torch_import import load_torch_checkpoint

    _, model, variables = _init_variables()
    state = export_pvnet_state_dict(variables)
    tstate = {"module." + k: torch.from_numpy(np.asarray(v))
              for k, v in state.items()}
    path = tmp_path / "199.pth"
    torch.save({"net": tstate, "epoch": 199}, str(path))

    loaded = load_torch_checkpoint(str(path))
    assert "resnet18_8s.conv1.weight" in loaded  # module. prefix stripped
    imported = import_pvnet_state_dict(loaded, variables)
    np.testing.assert_allclose(
        np.asarray(imported["params"]["head"]["bias"]),
        np.asarray(variables["params"]["head"]["bias"]),
    )
