"""UpKern weight inflation (reference ``mednext_models.py:487``): transfer a
trained small-kernel MedNeXt into a large-kernel one by trilinear kernel
interpolation."""

import numpy as np
import pytest

from pytorch_connectomics_tpu.training.model_weights import (
    load_external_weights,
    upkern_resize_kernel,
    upkern_transfer,
)


def test_upkern_resize_constant_kernel_preserved():
    # trilinear interpolation of a constant field is constant
    w = np.full((3, 3, 3, 4, 8), 0.5, np.float32)
    out = upkern_resize_kernel(w, (5, 5, 5))
    assert out.shape == (5, 5, 5, 4, 8)
    np.testing.assert_allclose(out, 0.5, rtol=1e-6)


def test_upkern_resize_same_shape_is_identity():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 3, 3, 2, 2)).astype(np.float32)
    np.testing.assert_array_equal(upkern_resize_kernel(w, (3, 3, 3)), w)


def test_upkern_resize_matches_torch_interpolate():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    w = rng.standard_normal((3, 3, 3, 2, 4)).astype(np.float32)
    out = upkern_resize_kernel(w, (5, 5, 5))
    # independent reference computation, per (i, o) slice
    for i in range(2):
        for o in range(4):
            t = torch.from_numpy(w[:, :, :, i, o])[None, None]
            ref = F.interpolate(t, size=(5, 5, 5), mode="trilinear")[0, 0].numpy()
            np.testing.assert_allclose(out[:, :, :, i, o], ref, rtol=1e-5, atol=1e-6)


def _tiny_mednext_params(kernel):
    import jax

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.models import build_model, init_model

    cfg = build_dataclass(
        ModelConfig,
        {
            "arch": {"type": "mednext"},
            "in_channels": 1,
            "out_channels": 2,
            "input_size": [16, 16, 16],
            "mednext": {
                "size": "custom",
                "kernel_size": kernel,
                "base_channels": 4,
                "exp_ratio": 2,
                "block_counts": [1] * 9,
            },
        },
    )
    model = build_model(cfg)
    return cfg, model, init_model(model, cfg, jax.random.PRNGKey(0))


def test_upkern_transfer_k3_to_k5_forward_runs():
    import jax
    import jax.numpy as jnp

    _, _, src_vars = _tiny_mednext_params(3)
    cfg5, model5, tgt_vars = _tiny_mednext_params(5)
    new_params, stats = upkern_transfer(tgt_vars["params"], src_vars["params"])
    assert stats["inflated"] > 0, "no kernels were inflated"
    assert stats["kept"] == 0, f"unexpected unmatched leaves: {stats}"

    # same-shape leaves (1x1x1 convs, norms) copied verbatim
    flat_src = jax.tree_util.tree_leaves_with_path(src_vars["params"])
    flat_new = dict(jax.tree_util.tree_leaves_with_path(new_params))
    checked_copy = checked_inflate = 0
    for path, leaf in flat_src:
        nv = flat_new[path]
        if leaf.shape == nv.shape:
            np.testing.assert_array_equal(np.asarray(nv), np.asarray(leaf))
            checked_copy += 1
        else:
            assert nv.shape[:3] == (5, 5, 5) and leaf.shape[:3] == (3, 3, 3)
            checked_inflate += 1
    assert checked_copy > 0 and checked_inflate > 0

    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    out = jax.jit(model5.apply)({"params": new_params}, x)
    assert np.asarray(out).shape == (1, 16, 16, 16, 2)


def test_load_external_weights_upkern_inflates_torch_kernels(tmp_path):
    torch = pytest.importorskip("torch")

    # fake small-kernel torch state: one 3^3 conv (O,I,Z,Y,X) + bias
    state = {
        "conv.weight": torch.randn(8, 4, 3, 3, 3),
        "conv.bias": torch.randn(8),
    }
    torch.save(state, tmp_path / "small.pt")
    flax_params = {
        "conv": {
            "kernel": np.zeros((5, 5, 5, 4, 8), np.float32),
            "bias": np.zeros((8,), np.float32),
        }
    }
    new, stats = load_external_weights(
        flax_params, str(tmp_path / "small.pt"), upkern=True
    )
    assert stats["inflated"] == 1 and stats["loaded"] == 1 and stats["missed"] == 0
    assert not np.allclose(new["conv"]["kernel"], 0.0)


def test_upkern_initialize_from_native_checkpoint(tmp_path):
    import orbax.checkpoint as ocp

    _, _, src_vars = _tiny_mednext_params(3)
    cfg5, model5, tgt_vars = _tiny_mednext_params(5)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        (tmp_path / "src" / "state").resolve(),
        {"step": np.zeros((), np.int32), "params": {"model": src_vars["params"]}},
    )
    ckptr.wait_until_finished()

    import dataclasses

    from pytorch_connectomics_tpu.training.model_weights import upkern_initialize

    cfg5 = dataclasses.replace(
        cfg5, mednext=dataclasses.replace(cfg5.mednext, upkern_from=str(tmp_path / "src"))
    )
    new_params = upkern_initialize(cfg5, tgt_vars["params"])
    # spot-check an inflated leaf is nonzero and has target shape
    import jax

    leaves = jax.tree_util.tree_leaves(new_params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
