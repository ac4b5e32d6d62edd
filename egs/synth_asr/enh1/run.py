#!/usr/bin/env python3
"""2-speaker separation recipe on the synthetic mixture corpus.

The wsj0-2mix stand-in for this offline environment (reference quality
bar: egs2/wsj0_2mix/enh1/README.md — SI-SNRi is the headline metric).
Stages: 1 data (SynthMixCorpus), 2 train (EnhancementTask -> Trainer),
3 separate + permutation-aware SI-SNR scoring vs the unprocessed
mixture baseline (SI-SNRi), 4 export asset.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=4)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--n_train", type=int, default=500)
    ap.add_argument("--n_valid", type=int, default=50)
    ap.add_argument("--n_test", type=int, default=50)
    ap.add_argument("--max_epoch", type=int, default=40)
    ap.add_argument("--separator", default="tcn")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=4.0,
                    help="training mixture window (stage-3 eval always "
                         "scores full 4 s test mixtures)")
    ap.add_argument("--hop_length", type=int, default=128)
    ap.add_argument("--separator_conf", default="{}",
                    help="JSON overrides for the separator config")
    ap.add_argument("--encoder", default="stft", choices=["stft", "conv"],
                    help="'conv' = Conv-TasNet proper: learned "
                         "time-domain filterbank encoder/decoder")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_enh_tcn"))
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
    tag = f"enh_{args.separator}" + (
        "_conv" if args.encoder == "conv" else "")
    exp = work / "exp" / tag

    from espnet_tpu.data.synth_speech import SynthMixCorpus
    corpus = SynthMixCorpus(seconds=args.seconds)
    eval_corpus = SynthMixCorpus()          # stage-3 test always 4 s

    cfg = {
        "num_spk": 2,
        "encoder": args.encoder,
        "encoder_conf": ({"n_fft": 512, "hop_length": args.hop_length}
                         if args.encoder == "stft" else
                         {"channels": 256, "kernel_size": 32,
                          "stride": 16}),
        "separator": args.separator,
        "separator_conf": json.loads(args.separator_conf),
        "loss_type": "si_snr",
        "optim": "adam",
        "optim_conf": {"lr": 1e-3},
        "scheduler": "warmuplr",
        "scheduler_conf": {"warmup_steps": 300},
        "grad_clip": 5.0,
        "batch_type": "sorted",
        "batch_size": args.batch_size,
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 3,
        "patience": None,
        "log_interval": 20,
        "steps_per_dispatch": 8,
        "train_data_path_and_name_and_type": [
            f"{data}/train/wav.scp,speech_mix,sound",
            f"{data}/train/spk1.scp,speech_ref1,sound",
            f"{data}/train/spk2.scp,speech_ref2,sound"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/wav.scp,speech_mix,sound",
            f"{data}/valid/spk1.scp,speech_ref1,sound",
            f"{data}/valid/spk2.scp,speech_ref2,sound"],
        "train_shape_file": [f"{data}/train/speech_mix_shape"],
        "valid_shape_file": [f"{data}/valid/speech_mix_shape"],
    }
    if args.resume:
        cfg["resume"] = True

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: data preparation (2-mix) ===", flush=True)
        corpus.materialize(data, n_train=args.n_train,
                           n_valid=args.n_valid, n_test=0)
        # test refs at the full 4 s eval window regardless of the
        # (possibly shorter) training crop
        eval_corpus.materialize(data, n_train=0, n_valid=0,
                                n_test=args.n_test)

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train separator ===", flush=True)
        from espnet_tpu.tasks.enh import EnhancementTask
        EnhancementTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: separate + SI-SNRi ===", flush=True)
        import numpy as np

        from espnet_tpu.bin.enh_inference import SeparateSpeech
        from espnet_tpu.bin.enh_scoring import score_pairs
        from espnet_tpu.data.fileio import write_wav

        model = next(exp.glob("valid.loss.ave_*best"),
                     exp / "valid.loss.best")
        sep = SeparateSpeech(train_config=exp / "config.yaml",
                             model_file=model, fs=16000)
        enh_dir = work / "separated"
        (enh_dir / "wav").mkdir(parents=True, exist_ok=True)
        scps = {s: open(enh_dir / f"spk{s + 1}.scp", "w")
                for s in range(2)}
        mix_scps = {s: open(enh_dir / f"mix_as_spk{s + 1}.scp", "w")
                    for s in range(2)}
        # batched separation (one program, B utts per dispatch)
        B = 10
        mixes, uids = [], []

        def flush_batch():
            if not mixes:
                return
            ests = sep(np.stack(mixes))
            for bi, uid in enumerate(uids):
                for s in range(2):
                    e = np.asarray(ests[s][bi], np.float32)
                    # SI-SNR is scale-invariant but int16 WAV is not:
                    # unbounded (ReLU-mask) estimates clip on write
                    peak = np.abs(e).max()
                    if peak > 0.95:
                        e = e * (0.95 / peak)
                    p = enh_dir / "wav" / f"{uid}_e{s + 1}.wav"
                    write_wav(p, 16000, e)
                    scps[s].write(f"{uid} {p}\n")
            mixes.clear()
            uids.clear()

        for i in range(args.n_test):
            mix, r1, r2 = eval_corpus.mixture("test", i)
            uid = f"test_{i:05d}"
            p = enh_dir / "wav" / f"{uid}_mix.wav"
            write_wav(p, 16000, mix)
            for s in range(2):
                mix_scps[s].write(f"{uid} {p}\n")
            mixes.append(mix)
            uids.append(uid)
            if len(mixes) == B:
                flush_batch()
        flush_batch()
        for f in list(scps.values()) + list(mix_scps.values()):
            f.close()

        ref_scps = [str(data / "test" / "spk1.scp"),
                    str(data / "test" / "spk2.scp")]
        enh = score_pairs(ref_scps,
                          [str(enh_dir / "spk1.scp"),
                           str(enh_dir / "spk2.scp")],
                          output_dir=enh_dir / "score")
        base = score_pairs(ref_scps,
                           [str(enh_dir / "mix_as_spk1.scp"),
                            str(enh_dir / "mix_as_spk2.scp")])
        si_snri = enh["si_snr"] - base["si_snr"]
        print(f"SI-SNR: {enh['si_snr']:.2f} dB (mixture baseline "
              f"{base['si_snr']:.2f} dB) -> SI-SNRi {si_snri:.2f} dB; "
              f"SDR {enh['sdr']:.2f} dB  ({args.n_test} utts)")
        (work / "RESULTS.json").write_text(json.dumps(
            {"si_snr": enh["si_snr"], "si_snr_mix": base["si_snr"],
             "si_snri": si_snri, "sdr": enh["sdr"],
             "n_utts": args.n_test}))

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
        model = next(exp.glob("valid.loss.ave_*best"),
                     exp / "valid.loss.best")
        params, _, _ = load_checkpoint(model)
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
