"""ABISS bridge: export affinities to a local neuroglancer precomputed layer
in ABISS conventions and drive the external ABISS shell pipeline
(watershed -> remap -> mean-edge agglomeration) out of process.

Reference: ``connectomics/runtime/abiss_chunk.py:1-45`` (STAGES_ALL :30) and
``decoding/decoders/abiss.py``. ABISS itself is an external C++ pipeline;
this bridge prepares inputs, writes the parameter JSON, and shells out to a
user-provided ABISS installation (``abiss_root``). Seuron provenance replay
(``runtime/seuron_provenance.py``) maps recorded params onto the same entry.
"""

from __future__ import annotations

import json
import logging
import subprocess
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

STAGES_ALL = ("ws", "remap", "agg")


def export_affinity_for_abiss(
    aff: np.ndarray,
    output_dir: str | Path,
    resolution: Sequence[float] = (1.0, 1.0, 1.0),
    chunk_size: Sequence[int] = (64, 64, 64),
) -> Path:
    """Write (3,Z,Y,X) affinities as an ABISS-convention precomputed layer."""
    from ..data.precomputed import abiss_affinity_convention, create_precomputed

    out = Path(output_dir) / "aff"
    conv = abiss_affinity_convention(np.asarray(aff, np.float32))
    vol = create_precomputed(
        out, conv.shape[1:], np.float32, chunk_size, resolution, num_channels=3
    )
    vol.write((slice(0, conv.shape[1]), slice(0, conv.shape[2]), slice(0, conv.shape[3])), conv)
    return out


def write_abiss_params(
    output_dir: str | Path,
    aff_path: str | Path,
    bbox: Sequence[Sequence[int]],
    ws_high: float = 0.99,
    ws_low: float = 0.01,
    ws_size: int = 200,
    agg_threshold: float = 0.2,
) -> Path:
    """ABISS parameter JSON (reference param block, ``abiss_chunk.py``)."""
    params = {
        "AFF_PATH": str(aff_path),
        "BBOX": [list(map(int, b)) for b in bbox],
        "WS_HIGH_THRESHOLD": ws_high,
        "WS_LOW_THRESHOLD": ws_low,
        "WS_SIZE_THRESHOLD": ws_size,
        "AGG_THRESHOLD": agg_threshold,
    }
    p = Path(output_dir) / "abiss_params.json"
    p.write_text(json.dumps(params, indent=2))
    return p


def run_abiss_stages(
    abiss_root: str | Path,
    params_path: str | Path,
    stages: Sequence[str] = STAGES_ALL,
    env: Optional[Dict[str, str]] = None,
) -> None:
    """Drive the vendored ABISS shell stages. Requires an external ABISS
    checkout (not bundled); raises with guidance when absent."""
    root = Path(abiss_root)
    runner = root / "scripts" / "run_local.sh"
    if not runner.exists():
        raise FileNotFoundError(
            f"ABISS installation not found at {root}; clone seung-lab/abiss and "
            "pass its path as decoding.steps[abiss].kwargs.abiss_root"
        )
    for stage in stages:
        logger.info("ABISS stage %s", stage)
        subprocess.run(
            ["bash", str(runner), stage, str(params_path)],
            check=True,
            env=env,
        )


def decode_abiss(
    pred,
    abiss_root: Optional[str] = None,
    workdir: str = "abiss_work",
    agg_threshold: float = 0.2,
    fallback: bool = True,
    **kw,
):
    """Decoder-registry entry: affinity prediction -> ABISS segmentation.

    Falls back to the in-process waterz-equivalent agglomeration when no
    ABISS installation is configured (keeps pipelines runnable everywhere).
    """
    aff = np.asarray(pred, np.float32)
    if aff.ndim == 3:
        aff = aff[None].repeat(3, axis=0)
    if abiss_root is None:
        if not fallback:
            raise ValueError("abiss decoder requires abiss_root")
        from ..decoding.decoders import decode_waterz

        logger.info("abiss_root not set: falling back to native agglomeration")
        return decode_waterz(aff, threshold=agg_threshold)
    wd = Path(workdir)
    wd.mkdir(parents=True, exist_ok=True)
    aff_path = export_affinity_for_abiss(aff, wd)
    shape = aff.shape[1:]
    params = write_abiss_params(wd, aff_path, [[0, 0, 0], list(shape)], agg_threshold=agg_threshold)
    run_abiss_stages(abiss_root, params)
    from ..data.precomputed import open_precomputed

    return open_precomputed(wd / "seg").read(tuple(slice(0, s) for s in shape)).astype(np.uint32)


def replay_seuron_provenance(provenance_path: str | Path, workdir: str = "seuron_replay") -> Dict[str, Any]:
    """Parse a Seuron provenance record into local ABISS bridge params
    (reference ``runtime/seuron_provenance.py:1-40``)."""
    rec = json.loads(Path(provenance_path).read_text())
    proc = rec.get("processing", [{}])
    params: Dict[str, Any] = {}
    for entry in proc:
        method = entry.get("method", {})
        params.update({k: v for k, v in method.items() if isinstance(v, (int, float, str))})
    out = {
        "agg_threshold": float(params.get("agg_threshold", params.get("AGG_THRESHOLD", 0.2))),
        "ws_high": float(params.get("high_threshold", 0.99)),
        "ws_low": float(params.get("low_threshold", 0.01)),
        "ws_size": int(params.get("size_threshold", 200)),
        "workdir": workdir,
    }
    return out


# register with the decoder registry
from ..decoding.registry import register_decoder  # noqa: E402

register_decoder("abiss")(decode_abiss)
