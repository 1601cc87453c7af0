"""CLI argument parsing + config setup.

Reference: ``parse_args``/``setup_config`` (``connectomics/runtime/cli.py:22,174``)
— same flag surface: --config, --mode {train,test,tune,tune-test,val},
--checkpoint, --fast-dev-run, --shard-id/--num-shards, selective resume
resets, and trailing ``key=value`` overrides applied pre+post stage merge.
"""

from __future__ import annotations

import argparse
from typing import List, Optional, Tuple

from ..config.loader import load_config
from ..config.schema import Config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="connectomics-tpu",
        description="TPU-native connectomics: train / test / tune EM segmentation",
    )
    p.add_argument("--config", "-c", default=None, help="YAML config path")
    p.add_argument(
        "--demo",
        action="store_true",
        help="install-verification run: train a small model on synthetic "
        "data (tutorials/minimal.yaml) and report success (reference "
        "scripts/main.py --demo)",
    )
    p.add_argument(
        "--mode",
        default="train",
        choices=["train", "val", "test", "tune", "tune-test"],
    )
    p.add_argument("--checkpoint", default=None, help="checkpoint to load/resume")
    p.add_argument("--fast-dev-run", action="store_true", help="1 epoch x 2 steps smoke run")
    p.add_argument("--shard-id", type=int, default=None)
    p.add_argument("--num-shards", type=int, default=None)
    p.add_argument("--reset-optimizer", action="store_true")
    p.add_argument("--reset-epoch", action="store_true")
    p.add_argument("--reset-scheduler", action="store_true")
    p.add_argument("--reset-early-stopping", action="store_true")
    p.add_argument("--output-dir", default=None, help="override run output dir")
    p.add_argument("--best-params", default=None, help="tuned params YAML for tune-test")
    p.add_argument("--params", default=None, help="alias of --best-params (reference cli.py)")
    p.add_argument("--external-prefix", default=None,
                   help="prefix to strip from external (torch) checkpoint keys")
    p.add_argument("--tune-trials", type=int, default=None,
                   help="number of tuning trials (overrides decoding.tuning.n_trials)")
    p.add_argument("--tune-trial-timeout", type=float, default=None,
                   help="per-trial timeout seconds (overrides decoding.tuning.timeout_per_trial)")
    p.add_argument(
        "overrides",
        nargs="*",
        default=[],
        help="dotted key=value config overrides",
    )
    return p


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = build_parser()
    args = parser.parse_args(argv)
    if not args.config and not getattr(args, "demo", False):
        parser.error("--config is required (or use --demo)")
    return args


def setup_config(args: argparse.Namespace) -> Config:
    if getattr(args, "demo", False) and not args.config:
        from pathlib import Path

        # repo checkout: <root>/pytorch_connectomics_tpu/runtime/cli.py;
        # pip install: tutorials/ is not under site-packages, try the cwd
        candidates = [
            Path(__file__).resolve().parents[2] / "tutorials" / "minimal.yaml",
            Path.cwd() / "tutorials" / "minimal.yaml",
        ]
        found = next((c for c in candidates if c.is_file()), None)
        if found is None:
            raise FileNotFoundError(
                "--demo could not locate tutorials/minimal.yaml (looked in "
                + ", ".join(str(c) for c in candidates)
                + "); run from a repo checkout or pass --config explicitly"
            )
        args.config = str(found)
        args.fast_dev_run = True
    cfg = load_config(args.config, overrides=args.overrides, mode=args.mode)
    if args.shard_id is not None:
        cfg.system.shard_id = args.shard_id
        cfg.system.num_shards = args.num_shards or 1
    if args.fast_dev_run:
        cfg.optimization.max_epochs = 1
        cfg.optimization.n_steps_per_epoch = 2
        cfg.optimization.limit_val_batches = 1
    if getattr(args, "params", None) and not args.best_params:
        args.best_params = args.params
    if getattr(args, "tune_trials", None):
        cfg.decoding.tuning.n_trials = args.tune_trials
    if getattr(args, "tune_trial_timeout", None):
        cfg.decoding.tuning.timeout_per_trial = args.tune_trial_timeout
    return cfg
