"""SwinUNETR shifted-window attention correctness: relative position bias
indexing and the roll-seam mask (ref MONAI SwinUNETR, monai_models.py:298).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_connectomics_tpu.models.swin_unetr import (
    WindowAttentionBlock,
    relative_position_index,
    shift_attention_mask,
)


def test_relative_position_index_structure():
    ws = (2, 3, 4)
    idx = relative_position_index(ws)
    t = int(np.prod(ws))
    assert idx.shape == (t, t)
    table = np.prod([2 * w - 1 for w in ws])
    assert idx.min() >= 0 and idx.max() < table
    # symmetry: idx[i, j] and idx[j, i] correspond to opposite displacements
    center = idx[0, 0]
    assert (np.diag(idx) == center).all()
    # same displacement -> same index: tokens (0,0,0)->(0,0,1) and
    # (0,0,1)->(0,0,2) have the same relative offset
    assert idx[0, 1] == idx[1, 2]
    # different displacement -> different index
    assert idx[0, 1] != idx[1, 0]


def test_shift_mask_blocks_seam_pairs():
    spatial, ws = (4, 4, 8), (2, 2, 4)
    shift = (1, 1, 2)
    mask = shift_attention_mask(spatial, ws, shift)
    n_win = int(np.prod([s // w for s, w in zip(spatial, ws)]))
    t = int(np.prod(ws))
    assert mask.shape == (n_win, t, t)
    # diagonal (self-attention) is never masked
    assert (mask[:, np.arange(t), np.arange(t)] == 0).all()
    # after rolling by -shift, the last window along x mixes tokens from
    # x < shift (wrapped) and x >= shift: some pairs must be masked
    assert (mask < -1e8).any()
    # unshifted mask is all-zero
    assert (shift_attention_mask(spatial, ws, (0, 0, 0)) == 0).all()


def test_shifted_block_does_not_attend_across_seam():
    """Perturbing voxels at the high-x edge must not change outputs at the
    low-x edge even though the cyclic roll puts them in the same window."""
    b, z, y, x, c = 1, 4, 4, 8, 8
    blk = WindowAttentionBlock(c, 2, (2, 2, 4), shift=True, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    base = jax.random.normal(key, (b, z, y, x, c))
    variables = blk.init(jax.random.PRNGKey(1), base)
    spike = base.at[:, :, :, -1, :].add(100.0)  # high-x edge
    out_a = blk.apply(variables, base)
    out_b = blk.apply(variables, spike)
    # tokens at x in [0, 2) are on the other side of the roll seam from
    # x = 7 (shift = 2): their outputs must be bit-identical
    np.testing.assert_allclose(
        np.asarray(out_a[:, :, :, :2]), np.asarray(out_b[:, :, :, :2]), atol=1e-5
    )
    # sanity: the spiked voxel's own window does change
    assert float(jnp.abs(out_a[:, :, :, -1] - out_b[:, :, :, -1]).max()) > 1.0


def test_unshifted_block_attends_within_window():
    b, z, y, x, c = 1, 2, 2, 8, 8
    blk = WindowAttentionBlock(c, 2, (2, 2, 4), shift=False, dtype=jnp.float32)
    base = jax.random.normal(jax.random.PRNGKey(0), (b, z, y, x, c))
    variables = blk.init(jax.random.PRNGKey(1), base)
    spike = base.at[:, :, :, 0, :].add(100.0)
    out_a = blk.apply(variables, base)
    out_b = blk.apply(variables, spike)
    # same window (x in [0, 4)) -> attention output changes at x=1 (the
    # spike saturates LayerNorm, so the effect is real but small)
    assert float(jnp.abs(out_a[:, :, :, 1] - out_b[:, :, :, 1]).max()) > 1e-6
    # different window (x in [4, 8)) -> residual/MLP are per-token, so
    # outputs there are identical
    np.testing.assert_allclose(
        np.asarray(out_a[:, :, :, 4:]), np.asarray(out_b[:, :, :, 4:]), atol=1e-5
    )
