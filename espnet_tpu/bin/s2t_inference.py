"""OWSM-style multitask speech-to-text inference.

Behavioral contract: espnet2/bin/s2t_inference.py — Speech2Text with
language/task condition tokens (<lang>, <task>, timestamps live in the
vocabulary; s2t/espnet_model.py:25). The condition tokens are passed as
a hyp_primer to the shared on-device beam search (beam_search.py:123
contract).
"""

from __future__ import annotations

import sys
from typing import Optional

from espnet_tpu.bin.asr_inference import Speech2Text as _Speech2Text
from espnet_tpu.utils.config import parse_cli_overrides


class Speech2TextS2T(_Speech2Text):
    def __init__(self, *args, lang_sym: Optional[str] = None,
                 task_sym: Optional[str] = None, **kwargs):
        super().__init__(*args, **kwargs)
        primer = []
        for sym in (lang_sym, task_sym):
            if sym is not None:
                ids = self.converter.tokens2ids([sym])
                primer.extend(ids)
        self.hyp_primer = tuple(primer)

    def _beam_decode(self, enc, enc_lens):
        from espnet_tpu.decode.beam_search import (BeamSearchConfig,
                                                   batch_beam_search)
        results = batch_beam_search(
            model=self.model, params=self.params, enc=enc, enc_lens=enc_lens,
            config=BeamSearchConfig(
                beam_size=self.beam_size, ctc_weight=self.ctc_weight,
                length_bonus=self.penalty, maxlenratio=self.maxlenratio,
                minlenratio=self.minlenratio, nbest=self.nbest,
                lm_weight=self.lm_weight, hyp_primer=self.hyp_primer),
            lm=self.lm, lm_params=self.lm_params)
        out = []
        for hyps in results:
            nbest = []
            for ids, score in hyps[:self.nbest]:
                # strip the condition-token primer from the text output
                ids = ids[len(self.hyp_primer):]
                toks = self.converter.ids2tokens(ids)
                text = self.tokenizer.tokens2text(toks)
                nbest.append((text, toks, ids, float(score)))
            out.append(nbest)
        return out


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    from espnet_tpu.bin.asr_inference import inference as _inference
    # route through the shared writer with the S2T class
    import espnet_tpu.bin.asr_inference as asr_inf
    orig = asr_inf.Speech2Text
    asr_inf.Speech2Text = Speech2TextS2T
    try:
        _inference(**args)
    finally:
        asr_inf.Speech2Text = orig


if __name__ == "__main__":
    main()
