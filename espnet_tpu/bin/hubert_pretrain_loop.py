"""HuBERT iterative pretraining loop (contract: the espnet2/hubert/
two-stage recipe — egs2/TEMPLATE/hubert1: iteration 0 trains on MFCC
k-means pseudo-labels; each later iteration re-clusters an INTERMEDIATE
transformer layer of the previous model and re-trains — VERDICT r2
next-step #9).

Stages per iteration i:
  1. features: i == 0 -> MFCC (39-dim, host numpy/jax); i > 0 ->
     layer-`feature_layer` activations of model i-1 (the encoder's
     return_intermediates hook — no extra params, so trained params
     reload into the tapped module unchanged)
  2. k-means (utils/kmeans.py mini-batch Lloyd) -> centers
  3. pseudo-label dump `uid lab lab ...` (text_int data)
  4. HubertTask.main on (wav, labels) -> exp/iter{i}
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def mfcc_features(wav: np.ndarray, fs: int = 16000, n_mels: int = 26,
                  n_ceps: int = 13, hop_length: int = 320,
                  n_fft: int = 512) -> np.ndarray:
    """(S,) -> (T, 3*n_ceps) MFCC + delta + delta-delta (the reference
    iteration-0 feature, egs2 hubert1 stage 2).

    Runs on the host CPU backend explicitly: per-utterance small ops
    through the TPU tunnel cost seconds of dispatch latency each, which
    turned the 660-utt feature pass into an hour-long stall."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.ops.mel import log_mel
    from espnet_tpu.ops.stft import stft_power
    with jax.default_device(jax.devices("cpu")[0]):
        p, _ = stft_power(jnp.asarray(wav, jnp.float32)[None],
                          n_fft=n_fft, hop_length=hop_length)
        lm = np.asarray(log_mel(p, fs=fs, n_fft=n_fft, n_mels=n_mels))[0]
    T, M = lm.shape
    dct = np.cos(np.pi / M * (np.arange(M)[None, :] + 0.5)
                 * np.arange(n_ceps)[:, None])           # (C, M)
    ceps = lm @ dct.T                                     # (T, C)

    def delta(x):
        pad = np.pad(x, ((1, 1), (0, 0)), mode="edge")
        return (pad[2:] - pad[:-2]) / 2.0

    d1 = delta(ceps)
    return np.concatenate([ceps, d1, delta(d1)], axis=1).astype(np.float32)


def _iter_wavs(wav_scp):
    from espnet_tpu.data.fileio import SoundScpReader
    r = SoundScpReader(wav_scp)
    for k in r.keys():
        fs, wav = r[k]
        yield k, fs, np.asarray(wav, np.float32)


def _model_features(exp_dir, feature_layer: int, batch_size: int = 16):
    """Batch feature fn from a trained iteration: tap the encoder's
    intermediate output at `feature_layer` (models/ssl.py encode with
    interctc_layer_idx — shares after_norm, no new params).

    Returns fn(list[wav]) -> list[(T_i, D)]: utterances are padded to a
    power-of-1.3 bucket and run `batch_size` per dispatch — one tunnel
    round trip per batch instead of per utterance."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.tasks.ssl import HubertTask
    from espnet_tpu.utils.config import load_yaml
    cfg = load_yaml(Path(exp_dir) / "config.yaml")
    cfg = dict(cfg)
    ec = dict(cfg.get("encoder_conf") or {})
    ec["interctc_layer_idx"] = (int(feature_layer),)
    cfg["encoder_conf"] = ec
    model, params, _ = HubertTask.build_model_from_file(
        Path(exp_dir) / "config.yaml", _find_ckpt(exp_dir))
    tapped = HubertTask.build_model(cfg)

    @jax.jit
    def run(speech, lengths):
        def enc(m):
            feats, flens = m._frontend(speech, lengths)
            feats, flens = m._normalize(feats, flens)
            _, _, inters = m.encoder_mod(feats, flens, deterministic=True,
                                         return_intermediates=True)
            return inters[0][1], flens
        return tapped.apply(params, method=enc)

    def fn_batch(wavs):
        from espnet_tpu.data.batching import bucket_length
        feats = []
        for i in range(0, len(wavs), batch_size):
            chunk = wavs[i:i + batch_size]
            L = bucket_length(max(len(w) for w in chunk), base=4096,
                              growth=1.3)
            sp = np.zeros((batch_size, L), np.float32)
            ln = np.ones((batch_size,), np.int32)
            for j, w in enumerate(chunk):
                sp[j, :len(w)] = w
                ln[j] = len(w)
            h, flens = run(jnp.asarray(sp), jnp.asarray(ln))
            h, fl = np.asarray(h), np.asarray(flens)
            feats.extend(h[j, :int(fl[j])] for j in range(len(chunk)))
        return feats

    return fn_batch


def _find_ckpt(exp_dir):
    exp_dir = Path(exp_dir)
    for pat in ("valid.loss.ave_*best", "valid.loss.best", "checkpoint"):
        hit = next(exp_dir.glob(pat), None)
        if hit is not None:
            return hit
    raise FileNotFoundError(f"no checkpoint under {exp_dir}")


def hubert_pretrain_loop(output_dir, train_wav_scp, valid_wav_scp=None,
                         n_iterations: int = 2, n_clusters: int = 32,
                         feature_layer: int = 1,
                         train_conf: Optional[Dict] = None,
                         kmeans_iters: int = 20) -> Path:
    """Run the full loop; returns the last iteration's exp dir."""
    from espnet_tpu.tasks.ssl import HubertTask
    from espnet_tpu.utils.kmeans import dump_km_labels, fit_kmeans
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    valid_wav_scp = valid_wav_scp or train_wav_scp
    feat_fn = None   # None -> MFCC iteration
    exp = None
    for it in range(n_iterations):
        logger.info("=== hubert iteration %d ===", it)
        # 1-2: features + k-means over the train set
        feats_all = []
        per_utt = {}
        for scp in {str(train_wav_scp), str(valid_wav_scp)}:
            items = list(_iter_wavs(scp))
            if feat_fn is None:
                fs = [mfcc_features(w, r) for _, r, w in items]
            else:
                fs = feat_fn([w for _, _, w in items])
            for (k, _, _), f in zip(items, fs):
                per_utt[k] = f
                if scp == str(train_wav_scp):
                    feats_all.append(f)
        x = np.concatenate(feats_all, axis=0)
        centers, inertia = fit_kmeans(x, n_clusters, n_iter=kmeans_iters)
        np.save(out / f"km_centers_iter{it}.npy", centers)
        logger.info("iter %d: kmeans inertia %.4f over %d frames",
                    it, inertia, len(x))
        # 3: pseudo-label dumps
        for name, scp in (("train", train_wav_scp), ("valid", valid_wav_scp)):
            keys = [k for k, _, _ in _iter_wavs(scp)]
            dump_km_labels(((k, per_utt[k]) for k in keys), centers,
                           out / f"labels_{name}_iter{it}")
        # 4: train this iteration
        exp = out / f"iter{it}"
        cfg = {
            "output_dir": str(exp),
            "num_classes": int(n_clusters),
            "train_data_path_and_name_and_type": [
                f"{train_wav_scp},speech,sound",
                f"{out}/labels_train_iter{it},text,text_int"],
            "valid_data_path_and_name_and_type": [
                f"{valid_wav_scp},speech,sound",
                f"{out}/labels_valid_iter{it},text,text_int"],
        }
        cfg.update(dict(train_conf or {}))
        HubertTask.main(cfg)
        if it < n_iterations - 1:
            feat_fn = _model_features(exp, feature_layer)
    return exp


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    logging.basicConfig(level=logging.INFO)
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    hubert_pretrain_loop(**kw)


if __name__ == "__main__":
    main()
