"""Shared CLI plumbing for tools/ (reference: argparse patterns in tools/)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_axon = "/root/.axon_site"
if os.path.isdir(_axon) and _axon not in sys.path:
    sys.path.append(_axon)


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--cfg", default=None, help="YAML config file")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                   help="dotted-path config overrides, e.g. rpn.nms_thresh=0.6")
    p.add_argument("--ckpt", default=None, help="checkpoint path to load")
    return p


def load_cfg(args, base_overrides=()):
    """Config from --cfg + tool-level defaults + --set overrides.
    --set is applied LAST so the command line always wins."""
    import yaml

    from vosdetectron_tpu.config import load_config

    overrides = list(base_overrides)
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides.append((k, yaml.safe_load(v)))
    return load_config(args.cfg, overrides)
