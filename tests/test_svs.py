"""SVS stack tests: score IO, MusicXML, SVSPreprocessor, XiaoiceSing
training + SingingGenerate (reference: espnet2/svs/, fileio/score_scp.py,
bin/svs_inference.py)."""

import numpy as np
import pytest


def test_score_reader_writer_roundtrip(tmp_path):
    from espnet_tpu.data.score_io import (SingingScoreReader,
                                          SingingScoreWriter)
    score = {"tempo": 100, "item_list": ["st", "et", "lyric", "midi", "phn"],
             "note": [[0.0, 0.5, "la", 60, "l_a"], [0.5, 1.1, "li", 64,
                                                    "l_i"]]}
    with SingingScoreWriter(tmp_path / "score", tmp_path / "score.scp") as w:
        w["utt1"] = score
    r = SingingScoreReader(tmp_path / "score.scp")
    assert r.keys() == ["utt1"]
    assert r["utt1"] == score


MUSICXML = """<?xml version="1.0"?>
<score-partwise version="3.1">
  <part id="P1">
    <measure number="1">
      <attributes><divisions>2</divisions></attributes>
      <direction><sound tempo="120"/></direction>
      <note><pitch><step>C</step><octave>4</octave></pitch>
        <duration>2</duration><lyric><text>la</text></lyric></note>
      <note><pitch><step>E</step><octave>4</octave><alter>-1</alter></pitch>
        <duration>4</duration><lyric><text>lo</text></lyric></note>
      <note><rest/><duration>2</duration></note>
    </measure>
  </part>
</score-partwise>
"""


def test_read_musicxml(tmp_path):
    from espnet_tpu.data.score_io import read_musicxml
    p = tmp_path / "song.musicxml"
    p.write_text(MUSICXML)
    score = read_musicxml(p)
    assert score["tempo"] == 120
    n = score["note"]
    assert len(n) == 3
    # C4 = midi 60, quarter at 120bpm = 0.5s
    assert n[0][:2] == [0.0, 0.5] and n[0][3] == 60
    # Eb4 = 63, half note = 1.0s
    assert n[1][0] == 0.5 and abs(n[1][1] - 1.5) < 1e-6 and n[1][3] == 63
    assert n[2][3] == 0  # rest


def test_svs_preprocessor_streams():
    from espnet_tpu.tasks.svs import SVSPreprocessor
    toks = ["<blank>", "<unk>", "a", "l", "i", "<rest>", "<sos/eos>"]
    pre = SVSPreprocessor(toks, fs=16000, hop_length=160)
    score = {"tempo": 120, "item_list": [],
             "note": [[0.0, 0.5, "la", 60, "l_a"],
                      [0.5, 1.0, "", 0, ""]]}
    out = pre("u", {"score": score})
    # l a <rest>: 50 frames split 25/25 for l_a, 50 for rest
    assert out["text"].tolist() == [3, 2, 5]
    assert out["midi"].tolist() == [60, 60, 0]
    assert out["durations"].sum() == 100
    assert out["durations"].tolist() == [25, 25, 50]


def test_svs_task_e2e_and_singing_generate(tmp_path):
    import jax
    from espnet_tpu.bin.svs_inference import SingingGenerate
    from espnet_tpu.data.synth_speech import SynthSingingCorpus
    from espnet_tpu.tasks.svs import SVSTask

    corpus = SynthSingingCorpus()
    corpus.materialize(tmp_path / "data", n_train=6, n_valid=2)
    toks = ["<blank>", "<unk>", "a", "e", "i", "o", "u", "<rest>",
            "<sos/eos>"]
    (tmp_path / "tokens.txt").write_text("\n".join(toks) + "\n")
    d = tmp_path / "data"
    cfg, _ = SVSTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(tmp_path / "tokens.txt"),
        "feats_extract_conf": {"fs": 16000, "n_fft": 256, "hop_length": 128,
                               "n_mels": 20},
        "svs_conf": {"adim": 24, "aheads": 2, "elayers": 1, "dlayers": 1,
                     "eunits": 32, "dunits": 32, "postnet_layers": 2,
                     "postnet_chans": 24},
        "optim_conf": {"lr": 0.01},
        "batch_type": "unsorted", "batch_size": 4, "max_epoch": 2,
        "train_data_path_and_name_and_type": [
            f"{d}/train/wav.scp,speech,sound",
            f"{d}/train/score.scp,score,score"],
        "valid_data_path_and_name_and_type": [
            f"{d}/valid/wav.scp,speech,sound",
            f"{d}/valid/score.scp,score,score"],
    })
    exp = tmp_path / "exp"
    model = next(exp.glob("valid.loss.ave_*best"), exp / "valid.loss.best")
    gen = SingingGenerate(train_config=exp / "config.yaml",
                          model_file=model, griffin_lim_iters=4)
    score = {"tempo": 120, "item_list": [],
             "note": [[0.0, 0.4, "a", 62, "a"], [0.4, 0.9, "i", 66, "i"]]}
    out = gen(score)
    wav = out["wav"]
    assert np.isfinite(wav).all() and len(wav) > 1000
    # frame budget ~ total duration / hop
    assert abs(out["feat_gen"].shape[0] - 0.9 * 16000 / 128) < 20


def test_singing_tacotron_forward_and_inference():
    """Singing-Tacotron (svs/singing_tacotron + GDCAttLoc contract):
    teacher-forced loss trains; GDC inference emits mel; transition
    token stays in [0, 1]."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.models.svs import SingingTacotron
    model = SingingTacotron(idim=12, odim=10, embed_dim=16, eunits=16,
                            econv_layers=1, econv_chans=16,
                            prenet_units=8, dlayers_units=16, att_dim=8,
                            postnet_layers=1, postnet_chans=8,
                            max_frames=20)
    rng = np.random.RandomState(0)
    B, L, T = 2, 5, 12
    text = jnp.asarray(rng.randint(1, 12, (B, L)), jnp.int32)
    tl = jnp.asarray([5, 4])
    midi = jnp.asarray(rng.randint(40, 80, (B, L)), jnp.int32)
    dur = jnp.asarray(rng.randint(1, 4, (B, L)), jnp.int32)
    feats = jnp.asarray(rng.randn(B, T, 10) * 0.1, jnp.float32)
    fl = jnp.asarray([12, 9])
    params = model.init({"params": jax.random.PRNGKey(0),
                         "prenet": jax.random.PRNGKey(1)},
                        text, tl, feats, fl, midi, dur,
                        deterministic=False)
    loss, stats, w = model.apply(params, text, tl, feats, fl, midi, dur,
                                 rngs={"prenet": jax.random.PRNGKey(2)},
                                 deterministic=False)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(
        p, text, tl, feats, fl, midi, dur,
        rngs={"prenet": jax.random.PRNGKey(2)}, deterministic=False)[0]
    )(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
    # transition token bounded
    _, _, tt = model.apply(params, text, tl, midi, dur,
                           method=model._encode)
    tt = np.asarray(tt)
    assert (tt >= 0).all() and (tt <= 1).all()
    mel, olens = model.apply(params, text, tl, midi, dur,
                             method=model.inference, out_len=16)
    assert mel.shape == (2, 16, 10)


def test_gan_svs_task_visinger2_e2e(tmp_path):
    """GANSVSTask (espnet2/tasks/gan_svs.py role): score+wav pairs train
    VISinger2 (DDSP conditioning from the score midi) adversarially
    through the GANTrainer spine."""
    from espnet_tpu.data.synth_speech import SynthSingingCorpus
    from espnet_tpu.tasks.svs import GANSVSTask

    corpus = SynthSingingCorpus()
    corpus.materialize(tmp_path / "data", n_train=4, n_valid=2)
    toks = ["<blank>", "<unk>", "a", "e", "i", "o", "u", "<rest>",
            "<sos/eos>"]
    (tmp_path / "tokens.txt").write_text("\n".join(toks) + "\n")
    d = tmp_path / "data"
    cfg, params = GANSVSTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(tmp_path / "tokens.txt"),
        "fs": 16000, "n_fft": 256, "hop_length": 128, "n_mels": 20,
        "tts": "visinger2",
        "tts_conf": {"z_channels": 8, "hidden": 16,
                     "segment_frames": 8, "n_harmonics": 4,
                     "noise_taps": 8,
                     "text_encoder_conf": {"output_size": 16,
                                           "attention_heads": 2,
                                           "linear_units": 24,
                                           "num_blocks": 1},
                     "generator_conf": {"channels": 16,
                                        "upsample_scales": (8, 16),
                                        "upsample_kernel_sizes": (16, 32),
                                        "resblock_kernel_sizes": (3,),
                                        "resblock_dilations": ((1, 3),)}},
        "discriminator_conf": {"periods": (2,), "scales": 1},
        "batch_size": 2, "max_epoch": 1, "log_interval": 2,
        "batch_type": "unsorted",
        "collate_fixed_lengths": {"text": 16, "midi": 16,
                                  "durations": 16, "speech": 24064,
                                  "spec": 187},
        "train_data_path_and_name_and_type": [
            f"{d}/train/wav.scp,speech,sound",
            f"{d}/train/score.scp,score,score"],
        "valid_data_path_and_name_and_type": [
            f"{d}/valid/wav.scp,speech,sound",
            f"{d}/valid/score.scp,score,score"],
    })
    assert set(params) == {"generator", "discriminator"}
    # DDSP branch exists in the trained params
    assert "ddsp" in params["generator"]["params"]
