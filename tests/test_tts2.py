"""TTS2 (discrete-unit TTS): model math + task e2e + inference API."""

import numpy as np
import pytest


def _write_corpus(root, n=8, unit_vocab=16):
    """Synthetic text->unit corpus: each char maps deterministically to
    a run of unit ids (run length = duration)."""
    root.mkdir(parents=True, exist_ok=True)
    chars = "abcd"
    rng = np.random.RandomState(0)
    with open(root / "text", "w") as ft, \
            open(root / "units", "w") as fu, \
            open(root / "durations", "w") as fd:
        for i in range(n):
            L = rng.randint(2, 5)
            cs = [chars[rng.randint(len(chars))] for _ in range(L)]
            durs = [int(rng.randint(2, 4)) for _ in range(L)]
            units = []
            for c, d in zip(cs, durs):
                units.extend([2 + chars.index(c) * 3] * d)
            uid = f"u{i:03d}"
            ft.write(f"{uid} {''.join(cs)}\n")
            fu.write(f"{uid} {' '.join(map(str, units))}\n")
            fd.write(f"{uid} {' '.join(map(str, durs))}\n")
    (root / "tokens.txt").write_text(
        "\n".join(["<blank>"] + list(chars) + ["<space>", "<sos/eos>"])
        + "\n")


def test_fastspeech2_discrete_math():
    import jax
    import jax.numpy as jnp

    from espnet_tpu.models.tts.tts2 import FastSpeech2Discrete
    m = FastSpeech2Discrete(idim=7, odim=16, adim=16, aheads=2,
                            elayers=1, eunits=32, dlayers=1, dunits=32,
                            dropout_rate=0.0, max_frames=64)
    text = jnp.asarray([[1, 2, 3]], jnp.int32)
    tl = jnp.asarray([3], jnp.int32)
    units = jnp.asarray([[2, 2, 5, 5, 5, 8, 0, 0]], jnp.int32)
    ul = jnp.asarray([6], jnp.int32)
    dur = jnp.asarray([[2, 3, 1]], jnp.int32)
    p = m.init(jax.random.PRNGKey(0), text, tl, units, ul, dur)
    loss, stats, w = m.apply(p, text, tl, units, ul, dur)
    assert np.isfinite(float(loss))
    assert {"unit_ce", "duration_loss", "unit_acc"} <= set(stats)
    out, olens = m.apply(p, text, tl, method=m.inference, out_len=32)
    assert out.shape == (1, 32)
    assert int(olens[0]) > 0


def test_tts2_task_e2e(tmp_path):
    """Train on the deterministic char->unit corpus; units become
    predictable (acc rises), inference produces the right unit runs."""
    from espnet_tpu.bin.tts2_inference import Text2Discrete
    from espnet_tpu.tasks.tts2 import TTS2Task
    _write_corpus(tmp_path / "data", n=12)
    d = tmp_path / "data"
    cfg, _ = TTS2Task.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(d / "tokens.txt"),
        "unit_vocab_size": 16,
        "tts_conf": {"adim": 32, "aheads": 2, "elayers": 1, "eunits": 48,
                     "dlayers": 1, "dunits": 48, "dropout_rate": 0.0,
                     "max_frames": 64},
        "optim_conf": {"lr": 0.02},
        "batch_type": "unsorted", "batch_size": 6, "max_epoch": 30,
        "log_interval": 10,
        "train_data_path_and_name_and_type": [
            f"{d}/text,text,text",
            f"{d}/units,discrete_speech,text_int",
            f"{d}/durations,durations,text_int"],
        "valid_data_path_and_name_and_type": [
            f"{d}/text,text,text",
            f"{d}/units,discrete_speech,text_int",
            f"{d}/durations,durations,text_int"],
    })
    from espnet_tpu.train.checkpoint import load_checkpoint
    _, _, meta = load_checkpoint(tmp_path / "exp" / "checkpoint",
                                 with_opt=False)
    accs = [v["train"]["unit_acc"]
            for _, v in sorted(meta["reporter"]["stats"].items(),
                               key=lambda kv: int(kv[0]))]
    assert accs[-1] > accs[0], accs
    assert accs[-1] > 0.5, accs

    t2d = Text2Discrete(train_config=tmp_path / "exp" / "config.yaml",
                        model_file=tmp_path / "exp" / "valid.loss.best")
    out = t2d("abc")
    units = out["units"]
    assert units.ndim == 1 and len(units) > 0
    # trained mapping: char c -> unit 2 + 3*index, so 'a' run starts it
    assert units[0] == 2, units[:8]
