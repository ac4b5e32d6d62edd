"""Import every module (ci/test_import_all.py contract)."""

import importlib
import pathlib


def test_import_all():
    root = pathlib.Path(__file__).resolve().parents[1]
    fails = []
    for p in sorted((root / "espnet_tpu").rglob("*.py")):
        mod = str(p.relative_to(root).with_suffix("")).replace("/", ".")
        try:
            importlib.import_module(mod)
        except Exception as e:  # pragma: no cover
            fails.append(f"{mod}: {e}")
    assert not fails, fails
