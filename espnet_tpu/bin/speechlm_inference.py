"""SpeechLM inference (contract: espnet2/speechlm/bin/inference.py —
checkpointed LM + inference config -> task-conditioned generation; audio
realized through the codec, text through the token list).

`SpeechLMInference` builds the task-template prompt
([bos][tag][condition...]), runs the KV-cached on-device generation
scan (models/speechlm.SpeechLM.generate_scan — the reference's Python
`_step` loop as one fixed-shape dispatch), then routes the generated
region back through the modality decoders:

- text_to_audio / audio_continuation -> un-delay, codec.decode -> wav
- audio_to_text / text_only -> stream-0 ids -> token list -> text
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.data.speechlm import (TASK_TEMPLATES, build_example,
                                      undelay_codes)
from espnet_tpu.tasks.speechlm import SpeechLMTask, build_vocab_from_cfg


class SpeechLMInference:
    def __init__(self, train_config=None, model_file=None,
                 codec_train_config=None, codec_model_file=None,
                 temperature: float = 1.0, topk: int = 30,
                 maxlenratio: float = 4.0, seed: int = 0):
        self.model, self.params, self.cfg = \
            SpeechLMTask.build_model_from_file(train_config, model_file)
        self.vocab, self.text_to_ids = build_vocab_from_cfg(self.cfg)
        tl = self.cfg.get("text_token_list")
        if isinstance(tl, (str, Path)):
            self.token_list = [ln for ln in Path(tl).read_text(
                encoding="utf-8").splitlines() if ln]
        else:
            self.token_list = list(tl or [])
        self.coder = None
        if codec_train_config is not None:
            from espnet_tpu.bin.gan_codec_inference import CodecCoder
            self.coder = CodecCoder(codec_train_config, codec_model_file)
        self.temperature = temperature
        self.topk = topk
        self.maxlenratio = maxlenratio
        self.rng = jax.random.PRNGKey(seed)
        self._gen = jax.jit(
            lambda p, prompt, plen, rng, steps: self.model.apply(
                p, prompt, plen, steps, rng,
                temperature=self.temperature, topk=self.topk,
                eos_id=self.vocab.eos, method=self.model.generate_scan),
            static_argnums=(4,))

    def _prompt(self, task: str, text: Optional[str] = None,
                speech: Optional[np.ndarray] = None) -> np.ndarray:
        """[bos][tag][condition...] as (1, Tp, Q) global ids."""
        entries = {}
        tpl = TASK_TEMPLATES[task]
        for name in tpl["condition"]:
            if name.startswith("text"):
                entries[name] = text
            else:
                if self.coder is None:
                    raise ValueError("audio condition requires a codec "
                                     "(codec_train_config)")
                entries[name] = self.coder.encode(
                    np.asarray(speech, np.float32))[0]
        # render with a 0-length dummy target, then cut target+eos off
        for name in tpl["target"]:
            entries.setdefault(
                name, np.zeros((0,) if name.startswith("text")
                               else (0, self.vocab.n_streams), np.int32))
        ex = build_example(task, entries, self.vocab,
                           text_to_ids=self.text_to_ids,
                           delay=self.cfg.get("delay_pattern", True))
        toks = ex["tokens"]
        n_target = int(ex["loss_mask"].sum())  # dummy target frames + eos
        toks = toks[:len(toks) - n_target]
        if task == "audio_continuation" and speech is not None:
            # prompted continuation: the prefix of the TARGET region —
            # encode the prompt audio and append its (causal) delayed
            # layout after [bos][tag]
            from espnet_tpu.data.speechlm import delay_codes
            if self.coder is None:
                raise ValueError("audio prompt requires a codec "
                                 "(codec_train_config)")
            codes = self.coder.encode(np.asarray(speech, np.float32))[0]
            g = self.vocab.encode_audio(codes)
            if self.cfg.get("delay_pattern", True):
                g = delay_codes(g, self.vocab.filler)[:len(codes)]
            toks = np.concatenate([toks, g], axis=0)
        return toks[None]

    def __call__(self, task: str, text: Optional[str] = None,
                 speech: Optional[np.ndarray] = None,
                 steps: Optional[int] = None):
        """-> dict with 'tokens' and, per task, 'wav' or 'text'."""
        prompt = jnp.asarray(self._prompt(task, text=text, speech=speech))
        Tp = prompt.shape[1]
        if steps is None:
            steps = max(int(self.maxlenratio * Tp), 16)
        self.rng, k = jax.random.split(self.rng)
        out, lengths = self._gen(self.params, prompt,
                                 jnp.asarray([Tp], jnp.int32), k,
                                 int(steps))
        out = np.asarray(out)[0]
        n = int(np.asarray(lengths)[0])
        gen = out[Tp:n]                                    # generated region
        # drop the trailing eos frame if present
        if len(gen) and gen[-1, 0] == self.vocab.eos:
            gen = gen[:-1]
        result = {"tokens": gen, "prompt_len": Tp}
        wants_audio = any(e.startswith("audio")
                          for e in TASK_TEMPLATES[task]["target"])
        if wants_audio:
            codes = gen
            if self.cfg.get("delay_pattern", True) \
                    and len(codes) >= self.vocab.n_streams:
                codes = undelay_codes(codes)
            codes = self.vocab.decode_audio(codes)
            result["codes"] = codes
            if self.coder is not None and len(codes):
                result["wav"] = self.coder.decode(codes[None])[0]
        else:
            ids = self.vocab.decode_text(gen[:, 0])
            toks = [self.token_list[i] if i < len(self.token_list)
                    else "<unk>" for i in ids]
            result["text"] = "".join(
                " " if t == "<space>" else t for t in toks)
        return result


def inference(output_dir, task, train_config=None, model_file=None,
              codec_train_config=None, codec_model_file=None,
              text_scp=None, wav_scp=None, nbest: int = 1, **kw):
    """Corpus-mode generation: conditions read from text/wav scp files,
    outputs written DatadirWriter-style (text file / wav dir)."""
    from espnet_tpu.data.fileio import (SoundScpReader, read_2columns_text,
                                        write_wav)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    slm = SpeechLMInference(train_config, model_file, codec_train_config,
                            codec_model_file, **kw)
    conds = {}
    if text_scp:
        conds = {k: {"text": v}
                 for k, v in read_2columns_text(text_scp).items()}
    elif wav_scp:
        r = SoundScpReader(wav_scp)
        conds = {k: {"speech": np.asarray(r[k][1], np.float32)}
                 for k in r.keys()}
    else:
        raise ValueError("need text_scp or wav_scp")
    fs = slm.cfg.get("fs", 16000)
    text_out = []
    (out / "wav").mkdir(exist_ok=True)
    for k in sorted(conds):
        res = slm(task, **conds[k])
        if "wav" in res:
            write_wav(out / "wav" / f"{k}.wav", fs, res["wav"])
        if "text" in res:
            text_out.append(f"{k} {res['text']}")
    if text_out:
        (out / "text").write_text("\n".join(text_out) + "\n",
                                  encoding="utf-8")
    return out


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    inference(**kw)


if __name__ == "__main__":
    main()
