"""Machine-translation inference (contract: espnet2/bin/mt_inference.py
Text2Text): beam-decode target text from source token sequences."""

from __future__ import annotations

import sys
from pathlib import Path
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from espnet_tpu.decode.beam_search import BeamSearchConfig, batch_beam_search
from espnet_tpu.tasks.st import MTTask
from espnet_tpu.text.tokenizer import TokenIDConverter, build_tokenizer


class Text2Text:
    def __init__(self, mt_train_config=None, mt_model_file=None,
                 beam_size: int = 5, maxlenratio: float = 1.5,
                 nbest: int = 1):
        self.model, self.params, self.cfg = MTTask.build_model_from_file(
            mt_train_config, mt_model_file)
        self.converter = TokenIDConverter(list(self.model.token_list))
        src_tokens = self.cfg.get("src_token_list") or self.cfg["token_list"]
        if isinstance(src_tokens, str):
            src_tokens = [t for t in
                          Path(src_tokens).read_text().splitlines() if t]
        self.src_converter = TokenIDConverter(list(src_tokens))
        self.tokenizer = build_tokenizer(self.cfg.get("token_type", "char"))
        self.config = BeamSearchConfig(beam_size=beam_size, ctc_weight=0.0,
                                       maxlenratio=maxlenratio, nbest=nbest)

    def __call__(self, src_text: str) -> List[Tuple[str, list, list]]:
        toks = self.tokenizer.text2tokens(src_text)
        ids = np.asarray(self.src_converter.tokens2ids(toks), np.int32)
        src = jnp.asarray(ids[None])
        src_lens = jnp.asarray([len(ids)], jnp.int32)
        enc, enc_lens = self.model.apply(self.params, src, src_lens,
                                         method=self.model.encode)
        nb = batch_beam_search(self.model, self.params, enc, enc_lens,
                               self.config)[0]
        out = []
        for hyp_ids, score in nb:
            hyp_toks = self.converter.ids2tokens(hyp_ids)
            out.append((self.tokenizer.tokens2text(hyp_toks), hyp_toks,
                        list(hyp_ids)))
        return out


def inference(output_dir, data_path_and_name_and_type, mt_train_config,
              mt_model_file, **kwargs):
    from espnet_tpu.data.fileio import DatadirWriter, read_2columns_text
    t2t = Text2Text(mt_train_config, mt_model_file, **kwargs)
    path = data_path_and_name_and_type[0].split(",")[0]
    texts = read_2columns_text(path)
    with DatadirWriter(output_dir) as writer:
        for key, src in texts.items():
            results = t2t(src)
            writer["1best_recog"]["text"][key] = results[0][0]
    return output_dir


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    inference(**kw)


if __name__ == "__main__":
    main()
