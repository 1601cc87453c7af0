"""Affinity-aware target groups in the loss orchestrator: terms whose target
channels overlap affinity groups get per-offset validity masks automatically
(reference ``training/losses/orchestrator.py:29-53,411``)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_connectomics_tpu.config.schema import (
    LabelTransformConfig,
    LossConfig,
    build_dataclass,
)
from pytorch_connectomics_tpu.data.targets.affinity import affinity_valid_mask
from pytorch_connectomics_tpu.data.targets.build import (
    affinity_target_groups,
    target_channel_spans,
)
from pytorch_connectomics_tpu.losses.orchestrator import (
    LossOrchestrator,
    _offset_valid_mask,
)


def _label_cfg():
    return build_dataclass(
        LabelTransformConfig,
        {
            "targets": [
                {"name": "binary"},
                {"name": "affinity", "kwargs": {"offsets": ["0-0-1", "0-1-0", "1-0-0", "0-0-8"]}},
                {"name": "instance_boundary"},
            ]
        },
    )


def test_target_channel_spans_and_groups():
    cfg = _label_cfg()
    spans = target_channel_spans(cfg)
    assert [(s["name"], s["start"], s["end"]) for s in spans] == [
        ("binary", 0, 1),
        ("affinity", 1, 5),
        ("instance_boundary", 5, 6),
    ]
    groups = affinity_target_groups(cfg)
    assert len(groups) == 1
    g = groups[0]
    assert (g["start"], g["end"]) == (1, 5)
    assert g["offsets"][3] == (0, 0, 8)


def test_offset_valid_mask_matches_numpy_reference():
    shape = (5, 6, 7)
    for off in [(0, 0, 1), (1, 0, 0), (0, 0, -3), (2, -1, 4)]:
        want = affinity_valid_mask(shape, [off])[0]
        got = np.asarray(_offset_valid_mask(shape, off))
        np.testing.assert_array_equal(got, want)


def test_orchestrator_masks_invalid_affinity_positions():
    """A long-range affinity channel's invalid border must not contribute:
    corrupting the prediction there leaves the loss unchanged."""
    loss_cfg = build_dataclass(
        LossConfig,
        {"losses": [{"function": "MSELoss", "target_slice": "1:5", "pred_slice": "1:5"}]},
    )
    groups = affinity_target_groups(_label_cfg())
    orch = LossOrchestrator(loss_cfg, affinity_groups=groups)
    n, z, y, x = 1, 4, 8, 12
    key = jax.random.PRNGKey(0)
    pred = jax.random.normal(key, (n, z, y, x, 6))
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (n, z, y, x, 6))
    base, _ = orch(pred, tgt)
    # channel 4 = offset (0,0,8): x < 8 is invalid -> perturb pred there
    corrupted = pred.at[:, :, :, :8, 4].add(100.0)
    same, _ = orch(corrupted, tgt)
    np.testing.assert_allclose(float(base), float(same), rtol=1e-6)
    # perturbing a VALID position must change the loss
    changed, _ = orch(pred.at[:, :, :, 9, 4].add(100.0), tgt)
    assert abs(float(changed) - float(base)) > 1e-3


def test_orchestrator_without_groups_unchanged():
    loss_cfg = build_dataclass(
        LossConfig, {"losses": [{"function": "MSELoss"}]}
    )
    orch = LossOrchestrator(loss_cfg)
    pred = jnp.ones((1, 4, 4, 4, 2))
    tgt = jnp.zeros((1, 4, 4, 4, 2))
    total, logs = orch(pred, tgt)
    np.testing.assert_allclose(float(total), 1.0)


def test_offset_valid_mask_banis_matches_numpy_reference():
    """banis mode stores edges at the SOURCE voxel — the orchestrator's
    on-device mask must mirror affinity_valid_mask(mode='banis'), not the
    deepem high-end convention (advisor round-4 finding)."""
    shape = (5, 6, 7)
    for off in [(0, 0, 1), (1, 0, 0), (0, 0, -3), (2, -1, 4), (0, 0, 8)]:
        want = affinity_valid_mask(shape, [off], affinity_mode="banis")[0]
        got = np.asarray(_offset_valid_mask(shape, off, "banis"))
        np.testing.assert_array_equal(got, want)
        if any(off) and all(abs(o) < n for o, n in zip(off, shape)):
            # conventions must actually differ for nonzero in-range offsets
            # ((0,0,8) exceeds x=7: both are all-invalid — and the clamped
            # _storage_slices no longer wraps to a bogus valid band)
            assert not np.array_equal(got, np.asarray(_offset_valid_mask(shape, off)))


def test_orchestrator_banis_group_masks_source_end():
    """With a banis-mode affinity group, the invalid border sits at the HIGH
    end of each offset axis (source-voxel storage): corrupting predictions
    there must not change the loss, while the deepem-side border is live."""
    cfg = build_dataclass(
        LabelTransformConfig,
        {
            "targets": [
                {"name": "binary"},
                {
                    "name": "affinity",
                    "kwargs": {"offsets": ["0-0-8"], "affinity_mode": "banis"},
                },
            ]
        },
    )
    groups = affinity_target_groups(cfg)
    assert groups[0]["mode"] == "banis"
    loss_cfg = build_dataclass(
        LossConfig,
        {"losses": [{"function": "MSELoss", "target_slice": "1:2", "pred_slice": "1:2"}]},
    )
    orch = LossOrchestrator(loss_cfg, affinity_groups=groups)
    n, z, y, x = 1, 4, 8, 12
    pred = jax.random.normal(jax.random.PRNGKey(0), (n, z, y, x, 2))
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (n, z, y, x, 2))
    base, _ = orch(pred, tgt)
    # banis invalid region for offset (0,0,8): x >= 12-8 = 4
    same, _ = orch(pred.at[:, :, :, 4:, 1].add(100.0), tgt)
    np.testing.assert_allclose(float(base), float(same), rtol=1e-6)
    # x=0 is VALID under banis (it was invalid under deepem)
    changed, _ = orch(pred.at[:, :, :, 0, 1].add(100.0), tgt)
    assert abs(float(changed) - float(base)) > 1e-3
