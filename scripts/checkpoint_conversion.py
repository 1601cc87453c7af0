#!/usr/bin/env python
"""Convert an external torch checkpoint (.pt/.ckpt) into this framework's
orbax parameter layout for a given model config, via the shape-matching
importer (``training/model_weights.py``; reference
``scripts/checkpoint_conversion.py`` is the torch-side analog).

Usage:
    python scripts/checkpoint_conversion.py --config tutorials/mito_lucchi.yaml \
        --torch-ckpt model.ckpt --output converted_params/ [--prefix model.]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--prefix", default=None, help="state_dict key prefix to strip")
    p.add_argument("--platform", default="cpu")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)

    from pytorch_connectomics_tpu.config import load_config
    from pytorch_connectomics_tpu.models import build_model, init_model
    from pytorch_connectomics_tpu.training.model_weights import load_external_weights

    cfg = load_config(args.config, mode="test")
    model = build_model(cfg.model)
    variables = init_model(model, cfg.model, jax.random.PRNGKey(0))
    strip = ("model.", "module.", "network.")
    if args.prefix:
        strip = (args.prefix,) + strip
    new_params, stats = load_external_weights(
        variables["params"], args.torch_ckpt, strip_prefixes=strip
    )
    print(f"loaded {stats['loaded']} tensors, skipped {stats.get('skipped', 0)}")

    import orbax.checkpoint as ocp

    path = Path(args.output).resolve()
    ocp.PyTreeCheckpointer().save(path, {"params": new_params})
    print(f"saved orbax params to {path}")


if __name__ == "__main__":
    main()
