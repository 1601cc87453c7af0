"""Constrained MALIS loss (maximin affinity learning).

Reference: ``MalisLoss`` (``connectomics/models/losses/malis.py:22``), backed
by a vendored Cython/C++ package there; here by our native ``malis_counts``
kernel (``csrc/pytc_ops.cpp``). The maximin pair counting runs host-side via
``jax.pure_callback`` on stop-gradient affinities (the weights are constants
of the loss — standard MALIS practice), so the loss itself stays
differentiable and jit-compatible:

    L = sum_e [ w_pos(e) * (1 - a_e)^2 + w_neg(e) * a_e^2 ] / total_pairs

Positive pass counts same-segment pairs on the positive-constrained graph
``min(a, gt_aff)``; negative pass counts cross-segment pairs on
``max(a, gt_aff)`` (Funke et al.). Supports the reference's
``malis_crop_size`` random crop speedup (``malis.py:31-38``, ~4.6x).
"""

from __future__ import annotations

import ctypes
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.native import get_lib


def _bind_malis(lib):
    if getattr(lib, "_malis_bound", False):
        return
    i64 = ctypes.c_int64
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.malis_counts.restype = None
    lib.malis_counts.argtypes = [f32p, u32p, i64, i64, i64, ctypes.c_int, f32p]
    lib._malis_bound = True


def malis_counts(aff: np.ndarray, seg: np.ndarray, count_pos: bool) -> np.ndarray:
    """aff (3,Z,Y,X) float32, seg (Z,Y,X) uint32 -> per-edge pair counts."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("MALIS requires the native ops library")
    _bind_malis(lib)
    aff = np.ascontiguousarray(aff, dtype=np.float32)
    seg = np.ascontiguousarray(seg, dtype=np.uint32)
    out = np.zeros_like(aff)
    lib.malis_counts(aff, seg, *seg.shape, int(count_pos), out)
    return out


def _gt_affinity(seg: np.ndarray) -> np.ndarray:
    """Cardinal GT affinities, channel order x,y,z (high-end)."""
    from ..data.targets.affinity import seg_to_affinity

    return seg_to_affinity(seg, ["0-0-1", "0-1-0", "1-0-0"])


def _malis_weights_host(aff: np.ndarray, seg: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    seg = seg.astype(np.uint32)
    gt_aff = _gt_affinity(seg)
    pos_aff = np.minimum(aff, gt_aff)  # positive pass constraint
    neg_aff = np.maximum(aff, gt_aff)  # negative pass constraint
    w_pos = malis_counts(pos_aff, seg, count_pos=True)
    w_neg = malis_counts(neg_aff, seg, count_pos=False)
    return w_pos, w_neg


class MalisLoss:
    """Callable loss: (pred_aff NDHWC logits-or-probs, seg NDHWC) -> scalar.

    ``pred`` channels are the 3 cardinal affinities (x,y,z order matching
    ``label_aff*`` profiles' leading channels); ``sigmoid`` applies the
    activation in-graph. ``crop_size`` crops a random cube per call
    (deterministic per step via the fold-in of ``step``).
    """

    def __init__(
        self,
        sigmoid: bool = True,
        crop_size: Optional[int] = None,
        num_workers: int = 1,
    ):
        self.sigmoid = sigmoid
        self.crop_size = crop_size
        # thread-parallelize the per-batch maximin passes (the C kernel
        # releases the GIL via ctypes); auto-defaulted by the config loader
        # to min(2*batch, 8) (reference hardware/auto_config.py:96)
        self.num_workers = max(1, int(num_workers))

    def __call__(self, pred, seg, weight=None, mask=None, step: int = 0, **kw):
        p = pred.astype(jnp.float32)
        if self.sigmoid:
            p = jax.nn.sigmoid(p)
        # NDHWC -> (N, 3, Z, Y, X)
        p_cf = jnp.moveaxis(p[..., :3], -1, 1)
        s_cf = seg[..., 0] if seg.ndim == 5 else seg

        if self.crop_size:
            c = self.crop_size
            key = jax.random.fold_in(jax.random.PRNGKey(7), step)
            shape = p_cf.shape[2:]
            starts = [
                jax.random.randint(jax.random.fold_in(key, i), (), 0, max(1, shape[i] - c))
                for i in range(3)
            ]
            sizes = [min(c, shape[i]) for i in range(3)]
            p_cf = jax.lax.dynamic_slice(
                p_cf,
                (0, 0, starts[0], starts[1], starts[2]),
                (p_cf.shape[0], 3, *sizes),
            )
            s_cf = jax.lax.dynamic_slice(
                s_cf, (0, starts[0], starts[1], starts[2]), (s_cf.shape[0], *sizes)
            )

        n_workers = self.num_workers

        def weights_cb(aff_np, seg_np):
            wp = np.zeros_like(aff_np)
            wn = np.zeros_like(aff_np)
            bsz = aff_np.shape[0]
            if n_workers > 1 and bsz > 1:
                from concurrent.futures import ThreadPoolExecutor

                def one(b):
                    wp[b], wn[b] = _malis_weights_host(aff_np[b], seg_np[b])

                with ThreadPoolExecutor(max_workers=min(n_workers, bsz)) as ex:
                    list(ex.map(one, range(bsz)))
            else:
                for b in range(bsz):
                    wp[b], wn[b] = _malis_weights_host(aff_np[b], seg_np[b])
            return wp, wn

        shape = jax.ShapeDtypeStruct(p_cf.shape, jnp.float32)
        w_pos, w_neg = jax.pure_callback(
            weights_cb,
            (shape, shape),
            jax.lax.stop_gradient(p_cf),
            jax.lax.stop_gradient(s_cf),
        )
        total = jnp.maximum(w_pos.sum() + w_neg.sum(), 1.0)
        loss = (w_pos * (1.0 - p_cf) ** 2 + w_neg * p_cf**2).sum() / total
        return loss


def malis_loss(
    pred, target, weight=None, mask=None, sigmoid=True, crop_size=None,
    num_workers=1, **kw,
):
    """Functional form for the loss registry; ``target`` is the instance
    segmentation (not affinities)."""
    return MalisLoss(sigmoid=sigmoid, crop_size=crop_size, num_workers=num_workers)(
        pred, target, weight, mask
    )
