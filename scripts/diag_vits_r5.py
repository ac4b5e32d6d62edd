#!/usr/bin/env python3
"""Localize the trained-VITS 45% WER: duration predictor vs prior.

Probes on the 40-epoch checkpoint (egs/synth_asr/tts1/work_vits):
  A. predicted durations, noise_scale in {0.0, 0.33, 0.667}
  B. ground-truth durations (MAS on the real utterance's posterior),
     noise_scale 0.0
If B << A, the duration predictor is the bottleneck; if A(0.0) << A(.667)
the prior noise is; if all ~equal, the text->prior mapping is weak.
"""
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

WORK = ROOT / "egs/synth_asr/tts1/work_vits"
EXP = WORK / "exp/vits"
N = 25


def main():
    from espnet_tpu.bin.asr_inference import Speech2Text
    from espnet_tpu.data.batching import bucket_length
    from espnet_tpu.data.fileio import read_2columns_text
    from espnet_tpu.tasks.gan_tts import GANTTSTask
    from espnet_tpu.utils.native import score_corpus
    from espnet_tpu.ops.monotonic_align import maximum_path
    from espnet_tpu.ops.stft import stft

    ckpt = next(EXP.glob("valid.loss.ave_*best"), EXP / "valid.loss.best")
    model, params, tcfg = GANTTSTask.build_model_from_file(
        EXP / "config.yaml", ckpt)
    pre = GANTTSTask.build_preprocess_fn(tcfg, train=False)
    hop = int(tcfg["hop_length"])
    n_fft = int(tcfg["n_fft"])
    MAXF, TPAD = 640, 64

    texts = read_2columns_text(WORK / "data/valid/text")
    wavs = read_2columns_text(WORK / "data/valid/wav.scp")
    keys = sorted(texts)[:N]

    asset = ROOT / "assets/synth_asr_flagship"
    s2t = Speech2Text(asr_train_config=asset / "config.yaml",
                      asr_model_file=asset, beam_size=10, ctc_weight=0.3)

    from espnet_tpu.data.fileio import read_wav

    def asr(wav):
        Lb = bucket_length(max(len(wav), 4096), base=4096, growth=1.3)
        nb = s2t(np.pad(wav, (0, Lb - len(wav)))[None],
                 np.asarray([len(wav)], np.int32))
        return nb[0][0][0]

    gen_mod = model.inner.generator
    gp = params["generator"]

    def token_ids(k):
        ids = np.asarray(pre("<d>", {"text": texts[k],
                                     "speech": np.zeros((512,), np.float32)}
                             )["text"], np.int32)
        t = np.zeros((1, TPAD), np.int32)
        t[0, :len(ids)] = ids
        return t, len(ids)

    dec = jax.jit(lambda t, tl, r, ns: model.decode(
        params, t, tl, rng=r, max_frames=MAXF, noise_scale=ns),
        static_argnums=(3,))

    @jax.jit
    def gt_durations(t, tl, spec, sl, r):
        gen = gen_mod.bind(gp)
        h, m_p, logs_p, _ = gen._prior(t, tl)
        from espnet_tpu.utils.masks import make_non_pad_mask
        f_mask = make_non_pad_mask(sl, spec.shape[1])
        z, m_q, logs_q = gen.posterior(spec, f_mask, r)
        z_p = gen.flow(z, f_mask, reverse=False)
        neg_cent = (
            -0.5 * jnp.einsum("btd,bsd->bst", z_p ** 2, jnp.exp(-2 * logs_p))
            + jnp.einsum("btd,bsd->bst", z_p, m_p * jnp.exp(-2 * logs_p))
            - 0.5 * jnp.sum(m_p ** 2 * jnp.exp(-2 * logs_p) + 2 * logs_p,
                            axis=-1)[:, :, None]
            - 0.5 * jnp.log(2 * jnp.pi) * gen_mod.z_channels)
        path = maximum_path(neg_cent, tl, sl)
        return jnp.sum(path, axis=2)

    dec_gt = jax.jit(lambda t, tl, d, r: model.decode(
        params, t, tl, rng=r, max_frames=MAXF, noise_scale=0.0,
        score_durations=d))

    refs = [texts[k] for k in keys]
    results = {}
    import os
    parts_a = [("ns0.667", 0.667), ("ns0.33", 0.33), ("ns0.0", 0.0)] \
        if not os.environ.get("SKIP_A") else []
    for tag, ns in parts_a:
        hyps = []
        for k in keys:
            t, L = token_ids(k)
            wav, olens = dec(jnp.asarray(t), jnp.asarray([L], np.int32),
                             jax.random.PRNGKey(0), ns)
            n = int(np.asarray(olens)[0]) * hop
            hyps.append(asr(np.asarray(wav, np.float32)[0, :n]))
        wer = score_corpus(refs, hyps, unit="word")["err_rate"]
        results[tag] = wer
        print(f"{tag}: WER {wer*100:.2f}%", flush=True)

    # B: ground-truth durations
    hyps = []
    for k in keys:
        t, L = token_ids(k)
        sr, audio = read_wav(wavs[k])
        audio = audio.astype(np.float32)
        from espnet_tpu.tasks.gan_tts import _np_linear_spec
        spec = jnp.asarray(_np_linear_spec(audio, n_fft, hop))[None]
        sl = jnp.asarray([spec.shape[1]], np.int32)
        d = gt_durations(jnp.asarray(t), jnp.asarray([L], np.int32),
                         spec, sl, jax.random.PRNGKey(0))
        wav, olens = dec_gt(jnp.asarray(t), jnp.asarray([L], np.int32),
                            d.astype(jnp.int32), jax.random.PRNGKey(0))
        n = int(np.asarray(olens)[0]) * hop
        hyps.append(asr(np.asarray(wav, np.float32)[0, :n]))
    wer = score_corpus(refs, hyps, unit="word")["err_rate"]
    results["gt_dur_ns0"] = wer
    print(f"gt_dur_ns0: WER {wer*100:.2f}%", flush=True)
    Path("/tmp/diag_vits_r5.json").write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
