"""Roundtrip test for the float16 params export (tools/export_params_f16)."""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from export_params_f16 import load_params_f16, save_params_f16


def test_roundtrip(tmp_path):
    variables = {
        "params": {
            "conv": {"kernel": jnp.asarray(
                np.random.RandomState(0).randn(3, 3, 4, 8), jnp.float32)},
            "bn": {"scale": jnp.ones((8,), jnp.float32)},
        },
        "batch_stats": {"bn": {"mean": jnp.zeros((8,), jnp.float32),
                               "count": jnp.asarray(7, jnp.int32)}},
    }
    path = str(tmp_path / "p.npz")
    save_params_f16(path, variables)
    like = {
        "params": {
            "conv": {"kernel": jnp.zeros((3, 3, 4, 8), jnp.float32)},
            "bn": {"scale": jnp.zeros((8,), jnp.float32)},
        },
        "batch_stats": {"bn": {"mean": jnp.ones((8,), jnp.float32),
                               "count": jnp.asarray(0, jnp.int32)}},
    }
    back = load_params_f16(path, like)
    np.testing.assert_allclose(
        back["params"]["conv"]["kernel"],
        np.asarray(variables["params"]["conv"]["kernel"]),
        atol=2e-3, rtol=2e-3,  # f16 quantization
    )
    assert back["params"]["conv"]["kernel"].dtype == np.float32
    assert int(back["batch_stats"]["bn"]["count"]) == 7  # int passes through
    np.testing.assert_allclose(back["batch_stats"]["bn"]["mean"], 0.0)
