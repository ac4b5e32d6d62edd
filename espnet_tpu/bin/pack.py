"""Model packaging (espnet2/bin/pack.py contract): bundle config.yaml +
model checkpoint (+stats) into a single directory consumable by
`*.from_pretrained(model_tag)`."""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

from espnet_tpu.utils.config import parse_cli_overrides


def pack(outpath, train_config, model_file, option=None, **kw):
    out = Path(outpath)
    out.mkdir(parents=True, exist_ok=True)
    shutil.copy(train_config, out / "config.yaml")
    src = Path(model_file)
    dst = out / "model"
    if src.is_dir():
        if dst.exists():
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
    else:
        shutil.copy(src, dst)
    for extra in (option or []):
        shutil.copy(extra, out / Path(extra).name)
    print(f"packed -> {out}")
    return out


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    pack(**args)


if __name__ == "__main__":
    main()
