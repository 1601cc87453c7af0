"""Hardware auto-configuration: estimate patch size / batch size / precision
from device memory.

Reference: ``AutoConfigPlanner`` (``config/hardware/auto_config.py:235-265``)
and the sentinel resolution (``auto_config.py:142`` — our version lives in
``loader.resolve_system_sentinels``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple


@dataclass
class AutoPlan:
    patch_size: Tuple[int, int, int]
    batch_size: int
    precision: str
    sw_batch_size: int


_KNOWN_HBM_GB = {
    # per-chip HBM for common TPU generations
    "v4": 32,
    "v5 lite": 16,
    "v5e": 16,
    "v5p": 95,
    "v6e": 32,
}


def device_memory_gb(device=None) -> float:
    try:
        import jax

        device = device or jax.devices()[0]
        stats = device.memory_stats()
        if stats and "bytes_limit" in stats:
            return stats["bytes_limit"] / 1e9
        kind = getattr(device, "device_kind", "").lower()
        for key, gb in _KNOWN_HBM_GB.items():
            if key in kind:
                return float(gb)
    except Exception:
        pass
    return 16.0


def plan_for_memory(
    hbm_gb: Optional[float] = None,
    model_params_m: float = 6.0,
    channels: int = 32,
) -> AutoPlan:
    """Heuristic planner: activation memory of a U-Net step ~=
    2 (fwd+bwd) * levels_factor (~2x) * patch_voxels * channels * dtype_bytes
    per sample; solve for the largest standard patch/batch combo."""
    hbm = hbm_gb if hbm_gb is not None else device_memory_gb()
    budget = max(1.0, hbm - 2.0 - model_params_m * 4 * 3 / 1000)  # params+opt states
    combos = [
        ((128, 128, 128), 4),
        ((112, 112, 112), 4),
        ((96, 96, 96), 4),
        ((112, 112, 112), 2),
        ((64, 128, 128), 2),
        ((64, 64, 64), 4),
        ((32, 64, 64), 4),
        ((32, 64, 64), 2),
    ]
    bytes_per_voxel = 2 * 2 * channels * 8 / 1e9  # bf16, fwd+bwd, ~8 layer-activations
    for patch, batch in combos:
        vox = patch[0] * patch[1] * patch[2]
        need = vox * bytes_per_voxel * batch
        if need <= budget:
            return AutoPlan(patch, batch, "bf16-mixed", sw_batch_size=max(2, batch * 2))
    return AutoPlan((32, 64, 64), 1, "bf16-mixed", sw_batch_size=2)


def apply_auto_plan(cfg, plan: Optional[AutoPlan] = None) -> None:
    """Fill config fields that are still at their defaults."""
    plan = plan or plan_for_memory()
    if cfg.data.dataloader.patch_size == [32, 64, 64]:  # schema default
        cfg.data.dataloader.patch_size = list(plan.patch_size)
        cfg.model.input_size = list(plan.patch_size)
        cfg.model.output_size = list(plan.patch_size)
    if cfg.optimization.precision in ("16-mixed",):
        cfg.optimization.precision = plan.precision
