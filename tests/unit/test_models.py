import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
from pytorch_connectomics_tpu.models import build_model, init_model, list_architectures, param_count


def make_cfg(arch, **kw):
    d = {"arch": {"type": arch}, "in_channels": 1, "out_channels": 2, "input_size": [16, 32, 32]}
    d.update(kw)
    return build_dataclass(ModelConfig, d)


def run_forward(cfg, shape=(1, 16, 32, 32, 1)):
    model = build_model(cfg)
    params = init_model(model, cfg, jax.random.PRNGKey(0))
    x = jnp.zeros(shape, jnp.float32)
    out = jax.jit(model.apply)(params, x)
    return out, params


def test_registry_lists_archs():
    archs = list_architectures()
    for name in ("rsunet", "mednext", "monai_unet", "monai_basic_unet", "monai_unetr"):
        assert name in archs


def test_rsunet_forward():
    out, params = run_forward(make_cfg("rsunet", rsunet={"width": [8, 16, 32]}))
    assert out.shape == (1, 16, 32, 32, 2)
    assert out.dtype == jnp.float32
    assert param_count(params) > 1000


def test_rsunet_anisotropic_factors():
    cfg = make_cfg("rsunet", rsunet={"width": [8, 16, 32], "down_factors": [[1, 2, 2], [2, 2, 2]]})
    out, _ = run_forward(cfg)
    assert out.shape == (1, 16, 32, 32, 2)


def test_mednext_s_forward():
    cfg = make_cfg("mednext", mednext={"size": "S", "kernel_size": 3})
    out, params = run_forward(cfg)
    assert out.shape == (1, 16, 32, 32, 2)


def test_mednext_deep_supervision():
    cfg = make_cfg(
        "mednext",
        mednext={"size": "custom", "base_channels": 8, "exp_ratio": 2, "block_counts": [1,1,1,1,1,1,1,1,1]},
        loss={"deep_supervision": True, "losses": [{"function": "DiceLoss"}]},
    )
    out, _ = run_forward(cfg)
    assert isinstance(out, dict)
    assert out["out"].shape == (1, 16, 32, 32, 2)
    assert "ds_0" in out and out["ds_0"].shape[1] == 8  # half resolution


def test_mednext_multihead():
    cfg = make_cfg(
        "mednext",
        mednext={
            "size": "custom", "base_channels": 8, "exp_ratio": 2,
            "block_counts": [1, 1, 1, 1, 1, 1, 1, 1, 1],
            "heads": [
                {"name": "mask", "out_channels": 1, "num_blocks": 1},
                {"name": "aff", "out_channels": 3, "num_blocks": 1},
            ],
        },
    )
    out, _ = run_forward(cfg)
    assert set(out) == {"mask", "aff"}
    assert out["mask"].shape[-1] == 1 and out["aff"].shape[-1] == 3


def test_monai_unet_forward():
    cfg = make_cfg("monai_unet", monai={"filters": [8, 16, 32], "num_res_units": 1})
    out, _ = run_forward(cfg)
    assert out.shape == (1, 16, 32, 32, 2)


def test_basic_unet_forward():
    cfg = make_cfg("monai_basic_unet", monai={"features": [8, 8, 16, 32, 64, 8]})
    out, _ = run_forward(cfg)
    assert out.shape == (1, 16, 32, 32, 2)


def test_unetr_forward():
    cfg = make_cfg(
        "monai_unetr",
        input_size=[32, 32, 32],
        monai={"patch_size": [16, 16, 16], "hidden_size": 64, "mlp_dim": 128, "num_heads": 4, "num_layers": 4, "feature_size": 8},
    )
    out, _ = run_forward(cfg, shape=(1, 32, 32, 32, 1))
    assert out.shape == (1, 32, 32, 32, 2)


def test_forward_is_jittable():
    cfg = make_cfg("rsunet", rsunet={"width": [8, 16]})
    model = build_model(cfg)
    params = init_model(model, cfg, jax.random.PRNGKey(0))
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    out = fwd(params, jnp.ones((2, 16, 32, 32, 1)))
    assert out.shape == (2, 16, 32, 32, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_mednext_patchify_stem_shapes_and_grads():
    """Patchify-stem variant (exact space-to-depth stem + learned 2x
    upsampling head): full-res output shape, finite grads, DS/multi-head
    contract preserved."""
    import jax
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.models import build_model, init_model

    cfg = build_dataclass(ModelConfig, {
        "arch": {"type": "mednext"}, "in_channels": 1, "out_channels": 2,
        "input_size": [32, 32, 32],
        "mednext": {"size": "custom", "base_channels": 8, "exp_ratio": 2,
                    "block_counts": [1] * 9, "patchify_stem": True,
                    "deep_supervision": True},
        "loss": {"losses": [{"function": "DiceLoss"}]},
        "compute_dtype": "float32",
    })
    model = build_model(cfg)
    v = init_model(model, cfg, jax.random.PRNGKey(0))
    x = jnp.ones((1, 32, 32, 32, 1))
    out = model.apply(v, x)
    assert out["out"].shape == (1, 32, 32, 32, 2)
    assert out["ds_0"].shape[1] == 8  # DS heads stay at model resolution

    def loss(params):
        o = model.apply({"params": params}, x)
        return jnp.mean(o["out"] ** 2)

    g = jax.grad(loss)(v["params"])
    flat = jax.tree.leaves(g)
    assert all(jnp.isfinite(leaf).all() for leaf in flat)

    # overlapping (k=4, s=2) patch embed: same stride-2 geometry, full-res out
    cfg4 = build_dataclass(ModelConfig, {
        "arch": {"type": "mednext"}, "in_channels": 1, "out_channels": 2,
        "input_size": [32, 32, 32],
        "mednext": {"size": "custom", "base_channels": 8, "exp_ratio": 2,
                    "block_counts": [1] * 9, "patchify_stem": True,
                    "patchify_kernel": 4},
        "loss": {"losses": [{"function": "DiceLoss"}]},
        "compute_dtype": "float32",
    })
    m4 = build_model(cfg4)
    v4 = init_model(m4, cfg4, jax.random.PRNGKey(0))
    assert v4["params"]["stem"]["kernel"].shape[:3] == (4, 4, 4)
    out4 = m4.apply(v4, x)
    assert out4.shape == (1, 32, 32, 32, 2)

    # multi-task heads honor patchify_kernel too (same overlapping readout
    # as the single-head project() path)
    cfg4h = build_dataclass(ModelConfig, {
        "arch": {"type": "mednext"}, "in_channels": 1, "out_channels": 2,
        "input_size": [32, 32, 32],
        "mednext": {"size": "custom", "base_channels": 8, "exp_ratio": 2,
                    "block_counts": [1] * 9, "patchify_stem": True,
                    "patchify_kernel": 4,
                    "heads": [{"name": "aff", "out_channels": 3},
                              {"name": "sem", "out_channels": 1}]},
        "loss": {"losses": [{"function": "DiceLoss"}]},
        "compute_dtype": "float32",
    })
    m4h = build_model(cfg4h)
    v4h = init_model(m4h, cfg4h, jax.random.PRNGKey(0))
    up = v4h["params"]["head_aff"]["ConvTranspose_0"]["kernel"]
    assert up.shape[:3] == (4, 4, 4)
    out4h = m4h.apply(v4h, x)
    assert out4h["aff"].shape == (1, 32, 32, 32, 3)
    assert out4h["sem"].shape == (1, 32, 32, 32, 1)


def test_mednext_patchify_refine_head():
    """patchify_head="refine": full-res pointwise refinement guided by the
    raw input — full-res shape, head params present, grads reach the raw-input
    mix layer, multi-head contract preserved."""
    import jax
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.models import build_model, init_model

    base = {
        "arch": {"type": "mednext"}, "in_channels": 1, "out_channels": 2,
        "input_size": [32, 32, 32],
        "loss": {"losses": [{"function": "DiceLoss"}]},
        "compute_dtype": "float32",
    }
    cfg = build_dataclass(ModelConfig, {**base, "mednext": {
        "size": "custom", "base_channels": 8, "exp_ratio": 2,
        "block_counts": [1] * 9, "patchify_stem": True,
        "patchify_head": "refine", "patchify_head_width": 4}})
    model = build_model(cfg)
    v = init_model(model, cfg, jax.random.PRNGKey(0))
    x = jnp.ones((1, 32, 32, 32, 1))
    out = model.apply(v, x)
    assert out.shape == (1, 32, 32, 32, 2)
    # refine layers exist; mix consumes upsampled width + 1 raw channel
    assert v["params"]["head_mix"]["kernel"].shape == (1, 1, 1, 5, 4)

    def loss(params):
        return jnp.mean(model.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(v["params"])
    assert all(jnp.isfinite(leaf).all() for leaf in jax.tree.leaves(g))
    assert float(jnp.abs(g["head_mix"]["kernel"]).sum()) > 0

    # multi-head: task heads get the refine path too
    cfgh = build_dataclass(ModelConfig, {**base, "mednext": {
        "size": "custom", "base_channels": 8, "exp_ratio": 2,
        "block_counts": [1] * 9, "patchify_stem": True,
        "patchify_head": "refine", "patchify_head_width": 4,
        "heads": [{"name": "aff", "out_channels": 3, "num_blocks": 1}]}})
    mh = build_model(cfgh)
    vh = init_model(mh, cfgh, jax.random.PRNGKey(0))
    oh = mh.apply(vh, x)
    assert oh["aff"].shape == (1, 32, 32, 32, 3)
    assert "mix" in vh["params"]["head_aff"]


def test_mednext_patchify_hybrid_full_res_stage():
    """patchify_full_res_width: one thin full-res MedNeXt stage wraps the
    half-res core — full-res output, hybrid stage params present, heads
    project 1x1 (no upsampling head)."""
    import jax
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.models import build_model, init_model

    cfg = build_dataclass(ModelConfig, {
        "arch": {"type": "mednext"}, "in_channels": 1, "out_channels": 2,
        "input_size": [32, 32, 32],
        "mednext": {"size": "custom", "base_channels": 8, "exp_ratio": 2,
                    "block_counts": [1] * 9, "patchify_stem": True,
                    "patchify_full_res_width": 4},
        "loss": {"losses": [{"function": "DiceLoss"}]},
        "compute_dtype": "float32",
    })
    model = build_model(cfg)
    v = init_model(model, cfg, jax.random.PRNGKey(0))
    x = jnp.ones((1, 32, 32, 32, 1))
    out = model.apply(v, x)
    assert out.shape == (1, 32, 32, 32, 2)
    for k in ("full_res_enc", "full_res_down", "full_res_up", "full_res_dec"):
        assert k in v["params"], k
    # head is a plain 1x1 projection at full res
    assert v["params"]["head"]["kernel"].shape == (1, 1, 1, 4, 2)

    g = jax.grad(lambda p: jnp.mean(model.apply({"params": p}, x) ** 2))(v["params"])
    assert all(jnp.isfinite(leaf).all() for leaf in jax.tree.leaves(g))
    assert float(jnp.abs(g["full_res_enc"]["Conv_0"]["kernel"]).sum()) > 0
