"""Bulk speaker-embedding extraction (contract:
espnet2/bin/spk_embed_extract.py): embed every utterance of an scp into
an .npy-per-utt directory + embed.scp."""

import sys
from pathlib import Path

import numpy as np

from espnet_tpu.bin.spk_inference import SpeakerEmbedding


def extract(output_dir, wav_scp, train_config=None, model_file=None):
    from espnet_tpu.data.fileio import SoundScpReader
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    se = SpeakerEmbedding(train_config, model_file)
    reader = SoundScpReader(wav_scp)
    with open(out / "embed.scp", "w", encoding="utf-8") as scp:
        for k in reader.keys():
            _, wav = reader[k]
            emb = np.asarray(se(np.asarray(wav, np.float32)))
            np.save(out / f"{k}.npy", emb)
            scp.write(f"{k} {out / f'{k}.npy'}\n")
    return out / "embed.scp"


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    extract(**kw)


if __name__ == "__main__":
    main()
