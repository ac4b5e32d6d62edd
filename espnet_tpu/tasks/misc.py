"""Thin task variants sharing the ASR/classification machinery.

- SLUTask: spoken language understanding — the reference trains SLU as
  seq2seq over transcript+intent token streams (espnet2/slu/); the model
  IS the ASR hybrid, so the task reuses ASRTask with its own name, and
  `Speech2Understand` (bin/slu_inference.py contract) aliases
  Speech2Text.
- S2TTask: OWSM-style multitask (espnet2/s2t/espnet_model.py): language/
  task/timestamp condition tokens live IN the token stream (the
  preprocessor emits them), so the hybrid CTC/attention model is reused
  unchanged; `text_prev` conditioning is modeled as ordinary prefix
  tokens.
- ASVSpoofTask: binary spoof detection = 2-class classification
  (espnet2/asvspoof/).
- SVSTask: singing voice synthesis on FastSpeech2 with score-derived
  durations/pitch (espnet2/svs/ naive path; VISinger-class models later).
"""

from __future__ import annotations

from espnet_tpu.tasks.asr import ASRTask
from espnet_tpu.tasks.spk import ClassificationTask
from espnet_tpu.tasks.tts import TTSTask


class SLUTask(ASRTask):
    """SLU (espnet2/tasks/slu.py): ASR spine + SLU-specific
    postencoder (conformer/transformer over the acoustic memory) and
    transcript postdecoder/deliberation (models/slu.py). Data may add a
    `transcript` text column (2-pass SLU)."""

    name = "slu"

    @classmethod
    def task_defaults(cls):
        d = dict(super().task_defaults())
        d.update({
            "slu_postencoder": None,        # transformer | conformer
            "slu_postencoder_conf": {},
            "use_transcript": False,
            "transcript_token_list": None,  # defaults to token_list
            "postdecoder_conf": {},
        })
        return d

    @classmethod
    def build_model(cls, cfg, stats_dir=None):
        base = super().build_model(cfg, stats_dir)
        if not (cfg.get("slu_postencoder") or cfg.get("use_transcript")):
            return base
        from espnet_tpu.models.slu import SLUModel
        from espnet_tpu.tasks.asr import read_token_list
        kw = {f: getattr(base, f) for f in base.__dataclass_fields__
              if f not in ("parent", "name")}
        t_vocab = 0
        if cfg.get("use_transcript"):
            tl = cfg.get("transcript_token_list") or cfg["token_list"]
            t_vocab = len(read_token_list(tl))
        return SLUModel(
            **kw,
            slu_postencoder=cfg.get("slu_postencoder"),
            slu_postencoder_conf=dict(
                cfg.get("slu_postencoder_conf") or {}),
            use_transcript=bool(cfg.get("use_transcript")),
            transcript_vocab_size=t_vocab,
            postdecoder_conf=dict(cfg.get("postdecoder_conf") or {}))

    @classmethod
    def build_preprocess_fn(cls, cfg, train: bool):
        base = super().build_preprocess_fn(cfg, train)
        if not cfg.get("use_transcript") or base is None:
            return base

        def fn(uid, data):
            transcript = data.pop("transcript", None)
            out = base(uid, data)
            if transcript is not None:
                t = base(uid, {"text": transcript})
                out["transcript"] = t["text"]
            return out

        return fn

    @classmethod
    def example_batch(cls, cfg):
        import numpy as np
        b = dict(super().example_batch(cfg))
        if cfg.get("use_transcript"):
            b["transcript"] = np.ones((1, 8), np.int32)
            b["transcript_lengths"] = np.asarray([8], np.int32)
        return b


class S2TTask(ASRTask):
    """OWSM-style multitask S2T (espnet2/tasks/s2t.py): the model is the
    prev-conditioned S2TModel; text/text_prev/text_ctc share one
    tokenizer (S2TPreprocessor role); <sop>/<na> ids resolve from the
    token list when present."""

    name = "s2t"

    @classmethod
    def build_model(cls, cfg, stats_dir=None):
        from espnet_tpu.models.s2t import S2TModel
        from espnet_tpu.tasks.asr import read_token_list
        base = super().build_model(cfg, stats_dir)
        token_list = read_token_list(cfg["token_list"])
        kw = {f.name: getattr(base, f.name)
              for f in base.__dataclass_fields__.values()
              if f.name not in ("parent", "name")}
        kw["sop"] = token_list.index("<sop>") if "<sop>" in token_list \
            else None
        kw["na"] = token_list.index("<na>") if "<na>" in token_list else None
        return S2TModel(**kw)

    @classmethod
    def build_preprocess_fn(cls, cfg, train):
        fn = super().build_preprocess_fn(cfg, train)
        if fn is not None:
            fn.text_names = ("text", "text_prev", "text_ctc")
        return fn

    @classmethod
    def example_batch(cls, cfg):
        import numpy as np
        b = super().example_batch(cfg)
        b["text_prev"] = np.zeros((1, 4), np.int32)
        b["text_prev_lengths"] = np.asarray([4], np.int32)
        b["text_ctc"] = np.zeros((1, 8), np.int32)
        b["text_ctc_lengths"] = np.asarray([8], np.int32)
        return b


class S2TCTCTask(S2TTask):
    """OWSM-CTC task (espnet2/tasks/s2t_ctc.py + s2t/espnet_ctc_model.py):
    encoder-only multitask S2T — prompt conditions the encoder, pure
    CTC objective, no attention decoder."""

    name = "s2t_ctc"

    @classmethod
    def task_defaults(cls):
        d = dict(S2TTask.task_defaults())
        d.update(ctc_weight=1.0, decoder=None)
        return d

    @classmethod
    def build_model(cls, cfg, stats_dir=None):
        from espnet_tpu.models.s2t import S2TCTCModel
        base = super().build_model(cfg, stats_dir)
        kw = {f.name: getattr(base, f.name)
              for f in base.__dataclass_fields__.values()
              if f.name not in ("parent", "name")}
        kw["ctc_weight"] = 1.0
        kw["decoder"] = None
        return S2TCTCModel(**kw)


class ASVSpoofTask(ClassificationTask):
    name = "asvspoof"

    @classmethod
    def task_defaults(cls):
        d = super().task_defaults()
        d["n_classes"] = 2
        return d


from espnet_tpu.tasks.svs import SVSTask  # noqa: F401,E402 — real task
# (was a bare TTSTask alias in round 1; see tasks/svs.py)
