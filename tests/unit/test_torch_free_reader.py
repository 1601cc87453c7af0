"""Torch-free torch-checkpoint reader (training/model_weights.py).

VERDICT r3 item 4: the reference's external-weights path assumes torch is
importable (``/root/reference/connectomics/training/model_weights.py:14``);
ours must read torch zip checkpoints WITHOUT torch so BANIS/nnU-Net imports
work in torch-less deployment images. torch IS available in this test env —
we use it only to author real fixture checkpoints and to cross-check the
torch-free reader byte-for-byte, while asserting the reader itself never
imports torch.
"""

import pickle
import sys
import zipfile

import numpy as np
import pytest

from pytorch_connectomics_tpu.training.model_weights import (
    load_torch_state_dict,
    read_torch_checkpoint,
    torch_conv_to_flax,
)

torch = pytest.importorskip("torch")


def _save(obj, path):
    torch.save(obj, str(path))
    return str(path)


def test_reader_source_never_imports_torch():
    import ast
    import inspect

    import pytorch_connectomics_tpu.training.model_weights as mw

    tree = ast.parse(inspect.getsource(mw))
    # torch imports must only appear inside function bodies (lazy fallback),
    # never at module level
    for node in tree.body:
        assert not (
            isinstance(node, (ast.Import, ast.ImportFrom))
            and "torch" in ast.dump(node)
        ), "model_weights.py must not import torch at module level"


def test_roundtrip_state_dict_matches_torch(tmp_path):
    g = torch.Generator().manual_seed(0)
    sd = {
        "conv1.weight": torch.randn(8, 3, 3, 3, 3, generator=g),
        "conv1.bias": torch.randn(8, generator=g),
        "fc.weight": torch.randn(10, 64, generator=g).double(),
        "fc.bias": torch.randn(10, generator=g).half(),
        "steps": torch.tensor(12345, dtype=torch.int64),
        "mask": torch.tensor([True, False, True]),
    }
    p = _save(sd, tmp_path / "sd.pth")
    out = read_torch_checkpoint(p)
    assert set(out) == set(sd)
    for k, v in sd.items():
        ref = v.numpy()
        got = out[k]
        assert got.dtype == ref.dtype, k
        np.testing.assert_array_equal(got, ref, err_msg=k)


def test_noncontiguous_and_parameter_tensors(tmp_path):
    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    sd = {
        "t": base.t(),  # transposed (non-contiguous strides)
        "s": base[1::2, ::2],  # strided slice with storage offset
        "p": torch.nn.Parameter(torch.randn(3, 3)),
    }
    p = _save(sd, tmp_path / "nc.pth")
    out = read_torch_checkpoint(p)
    np.testing.assert_array_equal(out["t"], base.t().numpy())
    np.testing.assert_array_equal(out["s"], base[1::2, ::2].numpy())
    np.testing.assert_array_equal(out["p"], sd["p"].detach().numpy())


def test_bfloat16_widens_to_f32(tmp_path):
    v = torch.tensor([1.0, -2.5, 3.25, 0.0], dtype=torch.bfloat16)
    p = _save({"w": v}, tmp_path / "bf16.pth")
    out = read_torch_checkpoint(p)
    np.testing.assert_array_equal(out["w"], v.float().numpy())


def test_nested_ckpt_and_wrapper_dicts(tmp_path):
    g = torch.Generator().manual_seed(1)
    inner = {"model.conv.weight": torch.randn(2, 1, 3, 3, 3, generator=g)}
    ckpt = {"state_dict": inner, "epoch": 7, "lr": 1e-3}
    p = _save(ckpt, tmp_path / "ckpt.ckpt")
    sd = load_torch_state_dict(p)
    # prefix stripped, numpy dtype, exact values
    np.testing.assert_array_equal(sd["conv.weight"], inner["model.conv.weight"].numpy())


def test_restricted_unpickler_refuses_arbitrary_classes(tmp_path):
    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    p = tmp_path / "evil.pth"
    torch.save({"x": torch.zeros(1), "evil": Evil()}, str(p))
    with pytest.raises(pickle.UnpicklingError):
        read_torch_checkpoint(str(p))
    # load_torch_state_dict falls back to torch.load and still succeeds
    sd = load_torch_state_dict(str(p))
    assert "x" in sd


def test_torch_free_in_clean_subprocess(tmp_path):
    """End-to-end without torch importable at all: author the checkpoint
    here, read it in a subprocess where import torch is blocked, and
    convert a conv kernel to flax layout (VERDICT r3 item 4 done-criterion)."""
    import subprocess

    g = torch.Generator().manual_seed(2)
    w = torch.randn(8, 4, 3, 5, 7, generator=g)  # (O, I, D, H, W)
    p = _save({"model.conv.weight": w, "model.fc.weight": torch.randn(6, 8, generator=g)},
              tmp_path / "noderps.pth")
    code = f"""
import sys
sys.modules['torch'] = None  # any 'import torch' now raises ImportError
import numpy as np
from pytorch_connectomics_tpu.training.model_weights import (
    load_torch_state_dict, torch_conv_to_flax)
sd = load_torch_state_dict({p!r})
assert set(sd) == {{'conv.weight', 'fc.weight'}}, sd.keys()
k = torch_conv_to_flax(sd['conv.weight'])
assert k.shape == (3, 5, 7, 4, 8), k.shape
np.save({str(tmp_path / 'out.npy')!r}, k)
print('OK')
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout
    got = np.load(tmp_path / "out.npy")
    np.testing.assert_array_equal(got, w.permute(2, 3, 4, 1, 0).numpy())


def test_zero_dim_tensors_survive_state_dict_load(tmp_path):
    """0-d tensors (BatchNorm num_batches_tracked, step counters) must come
    back as 0-d ndarrays from BOTH reader paths — a numpy scalar would be
    silently dropped by load_torch_state_dict's ndarray filter."""
    sd = {"w": torch.randn(2, 2), "bn.num_batches_tracked": torch.tensor(42)}
    p = _save(sd, tmp_path / "zerod.pth")
    out = load_torch_state_dict(p)
    assert set(out) == {"w", "bn.num_batches_tracked"}
    nbt = out["bn.num_batches_tracked"]
    assert isinstance(nbt, np.ndarray) and nbt.shape == () and nbt == 42


def test_torch_size_in_metadata_unpickles_as_tuple(tmp_path):
    """Lightning-style checkpoints carry torch.Size values in hparams; the
    restricted reader must map them to plain tuples, not a stand-in."""
    ckpt = {
        "state_dict": {"w": torch.randn(3)},
        "hparams": {"input_shape": torch.Size([1, 64, 64])},
    }
    p = _save(ckpt, tmp_path / "size.pth")
    out = read_torch_checkpoint(p)
    assert out["hparams"]["input_shape"] == (1, 64, 64)
    assert isinstance(out["hparams"]["input_shape"], tuple)


def test_unexpected_structure_falls_back_to_torch(tmp_path, monkeypatch):
    """Any torch-free reader failure (not just UnpicklingError) must defer
    to torch.load rather than propagate."""
    import pytorch_connectomics_tpu.training.model_weights as mw

    def boom(path):
        raise TypeError("unexpected rebuild structure")

    monkeypatch.setattr(mw, "read_torch_checkpoint", boom)
    sd = {"w": torch.randn(2)}
    p = _save(sd, tmp_path / "fb.pth")
    out = mw.load_torch_state_dict(p)
    np.testing.assert_array_equal(out["w"], sd["w"].numpy())


def test_zip_layout_assumptions(tmp_path):
    """Lock the format assumption: zip members are <stem>/data.pkl plus
    <stem>/data/<key> storages (torch >= 1.6 zipfile serialization)."""
    p = _save({"a": torch.zeros(2)}, tmp_path / "fmt.pth")
    with zipfile.ZipFile(p) as zf:
        names = zf.namelist()
    assert any(n.endswith("data.pkl") for n in names)
    assert any("/data/" in n for n in names)
