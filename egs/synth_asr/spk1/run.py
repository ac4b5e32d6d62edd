#!/usr/bin/env python3
"""Speaker verification recipe on the synthetic multi-speaker corpus.

The VoxCeleb stand-in for this offline environment (reference:
egs2/voxceleb/spk1 — EER/minDCF on a trial list is the headline
metric). Stages: 1 data + trial lists, 2 train (AAM-softmax with margin
warmup, per-epoch EER via the trials hook), 3 final EER/minDCF on a
held-out test trial list (batched embedding extraction), 4 export.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))


def pick_ckpt(exp: Path) -> Path:
    """Newest of the n-best average / best checkpoint — a resumed run
    that hasn't finished yet has a fresher `valid.loss.best` than the
    previous run's average."""
    cands = [p for p in list(exp.glob("valid.loss.ave_*best"))
             + [exp / "valid.loss.best"] if (p / "params.pkl").exists()
             or (p / "params_orbax").exists()]
    if not cands:
        return exp / "valid.loss.best"
    return max(cands, key=lambda p: max(
        f.stat().st_mtime for f in p.iterdir()))


def write_trials(data_dir: Path, split: str, n_trials: int,
                 seed: int = 17) -> Path:
    """Balanced target/nontarget trial list over a split's utterances."""
    import numpy as np
    spk2utt = {}
    for line in open(data_dir / split / "utt2spk", encoding="utf-8"):
        u, s = line.split()
        spk2utt.setdefault(s, []).append(u)
    rng = np.random.RandomState(seed)
    spks = sorted(spk2utt)
    multi = [s for s in spks if len(spk2utt[s]) >= 2]
    lines = []
    for i in range(n_trials // 2):
        if multi:
            # target: two different utts of one speaker
            s = multi[rng.randint(len(multi))]
            a, b = rng.choice(len(spk2utt[s]), 2, replace=False)
            lines.append(f"1 {spk2utt[s][a]} {spk2utt[s][b]}")
        # nontarget: utts of two different speakers
        s1, s2 = rng.choice(len(spks), 2, replace=False)
        u1 = spk2utt[spks[s1]][rng.randint(len(spk2utt[spks[s1]]))]
        u2 = spk2utt[spks[s2]][rng.randint(len(spk2utt[spks[s2]]))]
        lines.append(f"0 {u1} {u2}")
    out = data_dir / split / "trials"
    out.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=4)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--n_train", type=int, default=1200)
    ap.add_argument("--n_valid", type=int, default=100)
    ap.add_argument("--n_test", type=int, default=200)
    ap.add_argument("--max_epoch", type=int, default=20)
    ap.add_argument("--encoder", default="ecapa",
                    choices=["ecapa", "rawnet3", "ska_tdnn", "xvector"])
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--num_blocks", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no_epoch_trials", action="store_true",
                    help="skip the per-epoch EER hook (one utt per "
                         "dispatch — expensive off-TPU); stage 3 still "
                         "scores the held-out list batched")
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_spk_ecapa"))
    args = ap.parse_args()
    work = Path(args.workdir)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(work / "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    data = work / "data"
    exp = work / "exp" / f"spk_{args.encoder}"

    from espnet_tpu.data.synth_speech import SynthSpeechCorpus
    corpus = SynthSpeechCorpus()
    n_spk = len(corpus.speakers)

    cfg = {
        "n_spk": n_spk,
        "frontend_conf": {"n_fft": 512, "hop_length": 160, "n_mels": 80},
        "encoder": args.encoder,
        "encoder_conf": {"channels": args.channels,
                         "num_blocks": args.num_blocks},
        "embed_dim": 128,
        "model_conf": {"aam_margin": 0.3, "aam_scale": 30.0},
        "margin_warmup_epochs": 5,
        "optim": "adam",
        "optim_conf": {"lr": 1e-3},
        "scheduler": "warmuplr",
        "scheduler_conf": {"warmup_steps": 500},
        "grad_clip": 5.0,
        "batch_type": "sorted",
        "batch_size": args.batch_size,
        "collate_fixed_lengths": {"speech": 74656},
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 3,
        "patience": None,
        "log_interval": 20,
        "steps_per_dispatch": 4,
        "train_data_path_and_name_and_type": [
            f"{data}/train/wav.scp,speech,sound",
            f"{data}/train/utt2spkid,spk_labels,text_int"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/wav.scp,speech,sound",
            f"{data}/valid/utt2spkid,spk_labels,text_int"],
        "train_shape_file": [f"{data}/train/speech_shape"],
        "valid_shape_file": [f"{data}/valid/speech_shape"],
        # per-epoch EER over a small valid trial list (trials hook)
        "valid_trial": str(data / "valid" / "trials"),
        "valid_trial_scp": str(data / "valid" / "wav.scp"),
    }
    if args.resume:
        cfg["resume"] = True
    if args.no_epoch_trials:
        cfg.pop("valid_trial")
        cfg.pop("valid_trial_scp")

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: data + trial lists ===", flush=True)
        corpus.materialize(data, n_train=args.n_train,
                           n_valid=args.n_valid, n_test=args.n_test)
        spk_ids = {f"spk{i:02d}": i for i in range(n_spk)}
        import wave as wavemod
        for split in ("train", "valid", "test"):
            d = data / split
            with open(d / "utt2spkid", "w") as f:
                for line in open(d / "utt2spk", encoding="utf-8"):
                    u, s = line.split()
                    f.write(f"{u} {spk_ids[s]}\n")
            with open(d / "speech_shape", "w") as f:
                for line in open(d / "wav.scp", encoding="utf-8"):
                    u, p = line.split(None, 1)
                    with wavemod.open(p.strip(), "rb") as w:
                        f.write(f"{u} {w.getnframes()}\n")
        # small: the per-epoch hook embeds one utt per dispatch through
        # the tunnel; the big held-out list is scored batched in stage 3
        write_trials(data, "valid", 40)
        write_trials(data, "test", 600)

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train speaker encoder ===", flush=True)
        from espnet_tpu.tasks.spk import SpeakerTask
        SpeakerTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: EER/minDCF on held-out test trials ===",
              flush=True)
        import numpy as np

        from espnet_tpu.data.fileio import SoundScpReader
        from espnet_tpu.tasks.spk import SpeakerTask
        from espnet_tpu.utils.eer import compute_eer, compute_min_dcf

        ckpt = pick_ckpt(exp)
        model, params, _ = SpeakerTask.build_model_from_file(
            exp / "config.yaml", ckpt)
        trials = [tuple(parts) for line in
                  open(data / "test" / "trials", encoding="utf-8")
                  if len(parts := line.split()) == 3]
        reader = SoundScpReader(data / "test" / "wav.scp")
        utt_ids = sorted({u for _, e, t in trials for u in (e, t)})
        embed = jax.jit(lambda p, s, sl: model.apply(
            p, s, sl, method=model.extract_embedding))
        L = 74656
        B = 25
        embs = {}
        for i in range(0, len(utt_ids), B):
            chunk = utt_ids[i:i + B]
            wavs, lens = [], []
            for u in chunk:
                _, w = reader[u]
                w = np.asarray(w, np.float32)[:L]
                lens.append(len(w))
                wavs.append(np.pad(w, (0, L - len(w))))
            pad = B - len(chunk)      # keep ONE program shape
            if pad:
                wavs += [np.zeros((L,), np.float32)] * pad
                lens += [L] * pad
            e = np.asarray(embed(params, np.stack(wavs),
                                 np.asarray(lens, np.int32)))
            for j, u in enumerate(chunk):
                v = e[j]
                embs[u] = v / max(np.linalg.norm(v), 1e-9)
        labels = np.asarray([int(l) for l, _, _ in trials])
        scores = np.asarray([float(embs[e] @ embs[t])
                             for _, e, t in trials])
        eer, _ = compute_eer(scores, labels)
        mdcf = compute_min_dcf(scores, labels)
        print(f"EER: {eer * 100:.2f}%  minDCF: {mdcf:.4f}  "
              f"({len(trials)} trials, {len(utt_ids)} utts)")
        (work / "RESULTS.json").write_text(json.dumps(
            {"eer": eer, "min_dcf": mdcf, "n_trials": len(trials)}))

    if args.stage <= 4 <= args.stop_stage:
        print("=== stage 4: export asset ===", flush=True)
        import shutil

        import numpy as np

        from espnet_tpu.train.checkpoint import load_checkpoint

        def _flatten(tree, prefix=()):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out.update(_flatten(v, prefix + (k,)))
                else:
                    out[prefix + (k,)] = v
            return out

        asset = Path(args.asset_dir)
        asset.mkdir(parents=True, exist_ok=True)
        ckpt = pick_ckpt(exp)
        params, _, _ = load_checkpoint(ckpt)
        flat = {"/".join(map(str, k)): np.asarray(v)
                for k, v in _flatten(params).items()}
        comp = {k: (v.astype(np.float16) if v.dtype == np.float32 else v)
                for k, v in flat.items()}
        np.savez_compressed(asset / "params_f16.npz", **comp)
        shutil.copy(exp / "config.yaml", asset / "config.yaml")
        if (work / "RESULTS.json").exists():
            shutil.copy(work / "RESULTS.json", asset / "RESULTS.json")


if __name__ == "__main__":
    main()
