"""YAML config system.

Behavioral contract: espnet2/utils/config_argparse.py +
`--key value` overlay semantics and the `<name>` + `<name>_conf`
ClassChoices pairing (espnet2/train/class_choices.py:9). The resolved
config is dumped to `exp/<tag>/config.yaml` and is the contract for
inference reload (abs_task.py:1461-1471, 2477-2484).

No argparse introspection magic: a task declares `default_config()`;
YAML overlays defaults; dotted CLI overrides overlay YAML.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml


def load_yaml(path) -> Dict[str, Any]:
    with open(path, encoding="utf-8") as f:
        d = yaml.safe_load(f)
    return d or {}


def dump_yaml(d: Dict[str, Any], path):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(d, f, sort_keys=False, allow_unicode=True)


def deep_update(base: Dict, overlay: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in (overlay or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_update(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def parse_cli_overrides(argv: List[str]) -> Dict[str, Any]:
    """['--encoder_conf.output_size', '256', '--foo', 'bar'] -> nested dict.

    Values parse as YAML scalars (so numbers/bools/lists work).
    """
    out: Dict[str, Any] = {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if not a.startswith("--"):
            raise ValueError(f"expected --key, got {a!r}")
        key = a[2:]
        if "=" in key:
            key, raw = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(argv):
                raise ValueError(f"missing value for --{key}")
            raw = argv[i + 1]
            i += 2
        val = yaml.safe_load(raw)
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def resolve_config(defaults: Dict[str, Any],
                   config_path: Optional[str] = None,
                   overrides: Optional[Dict[str, Any]] = None,
                   argv: Optional[List[str]] = None) -> Dict[str, Any]:
    cfg = copy.deepcopy(defaults)
    if argv:
        cli = parse_cli_overrides(argv)
    else:
        cli = {}
    config_path = cli.pop("config", config_path)
    if config_path:
        cfg = deep_update(cfg, load_yaml(config_path))
    if overrides:
        cfg = deep_update(cfg, overrides)
    if cli:
        cfg = deep_update(cfg, cli)
    return cfg
