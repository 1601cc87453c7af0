"""Multi-host (DCN) initialization: the TPU-pod analog of the reference's
multi-node DDP launch (``connectomics/training/lightning/trainer.py:231-256``,
``justfile:204`` SLURM multi-node recipe).

On a TPU pod slice each host sees only its local chips; ``jax.distributed
.initialize`` stitches them into one global device set so the same
``Mesh``/``pjit`` program spans hosts, with gradient psums riding ICI and
only the control plane on DCN.

Detection is env-driven and safe by default:
  - explicit: ``PYTC_DISTRIBUTED=1`` (or ``system.distributed: force``)
  - SLURM multi-task launches (``SLURM_NTASKS > 1`` with GPUs/TPU pods)
  - Cloud TPU pod metadata (``TPU_WORKER_HOSTNAMES``/``MEGASCALE_*``)
Single-process runs never touch the network.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

logger = logging.getLogger(__name__)

_initialized = False


def detect_multiprocess_env() -> Optional[Tuple[Optional[str], int, int]]:
    """Return (coordinator_address, num_processes, process_id) when the
    environment describes a multi-process launch, else None.

    Recognized environments (first match wins):
      - explicit JAX vars: ``JAX_COORDINATOR_ADDRESS`` + ``JAX_NUM_PROCESSES``
        [+ ``JAX_PROCESS_ID``]
      - SLURM: ``SLURM_NTASKS`` > 1 (coordinator = first node via
        ``SLURM_STEP_NODELIST``, left to jax's own SLURM cluster detection)
      - Cloud TPU pods: ``TPU_WORKER_HOSTNAMES`` with >1 worker (left to
        jax's TPU cluster detection)
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if addr and nproc and int(nproc) > 1:
        pid = int(os.environ.get("JAX_PROCESS_ID", os.environ.get("SLURM_PROCID", 0)))
        return addr, int(nproc), pid
    ntasks = int(os.environ.get("SLURM_NTASKS", "1"))
    if ntasks > 1 and "SLURM_PROCID" in os.environ:
        # jax.distributed.initialize() auto-detects SLURM clusters
        return None, ntasks, int(os.environ["SLURM_PROCID"])
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if hosts.count(",") >= 1:
        return None, hosts.count(",") + 1, int(os.environ.get("TPU_WORKER_ID", 0))
    return None, 1, 0


def maybe_initialize_distributed(mode: str = "auto") -> Tuple[int, int]:
    """Initialize ``jax.distributed`` when a multi-process launch is detected
    (or forced). Returns ``(process_index, process_count)``.

    mode: "auto" (env detection), "never", or "force".
    Idempotent — subsequent calls return the live values.
    """
    global _initialized
    import jax

    if mode == "never":
        return 0, 1
    if _initialized:
        return jax.process_index(), jax.process_count()

    detected = detect_multiprocess_env()
    addr, nproc, pid = detected if detected else (None, 1, 0)
    if os.environ.get("PYTC_DISTRIBUTED") == "1":
        mode = "force"
    if nproc <= 1 and mode != "force":
        return 0, 1

    kwargs = {}
    if addr:
        kwargs = dict(
            coordinator_address=addr, num_processes=nproc, process_id=pid
        )
    jax.distributed.initialize(**kwargs)
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), jax.device_count(),
    )
    return jax.process_index(), jax.process_count()


def process_info() -> Tuple[int, int]:
    """Current (process_index, process_count) — (0, 1) when undistributed."""
    import jax

    try:
        return jax.process_index(), jax.process_count()
    except Exception:  # pragma: no cover - before backend init
        return 0, 1


def local_batch_slice(global_batch: int, process_index: int, process_count: int):
    """The slot range of the global batch owned by this process.

    The pipeline seeds each sample by its GLOBAL slot index, so the union of
    all processes' local batches is bit-identical to the single-process
    global batch (determinism across scales)."""
    if global_batch % process_count != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by process_count {process_count}"
        )
    local = global_batch // process_count
    return range(process_index * local, (process_index + 1) * local)
