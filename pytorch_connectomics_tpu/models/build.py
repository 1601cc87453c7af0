"""Model construction dispatch (reference ``models/build.py:24``)."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import ModelConfig
from .registry import get_architecture

# architecture modules self-register on import
from . import rsunet as _rsunet  # noqa: F401
from . import mednext as _mednext  # noqa: F401
from . import unet3d as _unet3d  # noqa: F401
from . import swin_unetr as _swin  # noqa: F401
from . import nnunet as _nnunet  # noqa: F401


def build_model(model_cfg: ModelConfig):
    """ModelConfig -> flax Module."""
    return get_architecture(model_cfg.arch.type)(model_cfg)


def init_model(model, model_cfg: ModelConfig, rng: jax.Array, batch: int = 1):
    """Initialize params with a dummy NDHWC input patch. Parameters are
    stored in ``model.param_dtype`` (default float32 — master weights stay
    full precision while ``compute_dtype`` rides the MXU in bfloat16)."""
    z, y, x = model_cfg.input_size
    dummy = jnp.zeros((batch, z, y, x, model_cfg.in_channels), jnp.float32)
    # jit the whole init: one XLA program instead of per-op eager compiles
    params = jax.jit(model.init)(rng, dummy)
    pd = jnp.dtype(getattr(model_cfg, "param_dtype", "float32"))
    if pd != jnp.float32:
        params = jax.tree.map(
            lambda p: p.astype(pd) if jnp.issubdtype(p.dtype, jnp.floating) else p,
            params,
        )
    return params


def param_count(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))
