"""SLU specializations (VERDICT r2: no postencoder/postdecoder
specializations; espnet2/slu/)."""

import jax
import jax.numpy as jnp
import numpy as np


def _speech_batch(B=2, S=4000, with_transcript=False):
    rng = np.random.RandomState(0)
    b = {"speech": jnp.asarray(rng.randn(B, S) * 0.1, jnp.float32),
         "speech_lengths": jnp.asarray([S, S - 400], jnp.int32),
         "text": jnp.asarray([[1, 2, 1, -1], [2, 1, -1, -1]], jnp.int32),
         "text_lengths": jnp.asarray([3, 2], jnp.int32)}
    if with_transcript:
        b["transcript"] = jnp.asarray([[1, 2, 2, 0], [2, 2, 0, 0]],
                                      jnp.int32)
        b["transcript_lengths"] = jnp.asarray([3, 2], jnp.int32)
    return b


def _conf():
    return dict(
        vocab_size=5,
        frontend_conf={"n_fft": 256, "hop_length": 128, "n_mels": 20},
        encoder_conf={"output_size": 16, "attention_heads": 2,
                      "linear_units": 32, "num_blocks": 1},
        decoder_conf={"attention_heads": 2, "linear_units": 32,
                      "num_blocks": 1},
        ctc_weight=0.3)


def test_slu_postencoder_forward_grad():
    """SLU conformer/transformer postencoder over the acoustic memory
    (slu/postencoder contract)."""
    from espnet_tpu.models.slu import SLUModel
    for pe in ("transformer", "conformer"):
        model = SLUModel(**_conf(), slu_postencoder=pe,
                         slu_postencoder_conf={"attention_heads": 2,
                                               "linear_units": 32,
                                               "num_blocks": 1})
        b = _speech_batch()
        params = model.init(jax.random.PRNGKey(0), **b)
        loss, stats, _ = model.apply(params, **b)
        assert np.isfinite(float(loss)), pe
        g = jax.grad(lambda p: model.apply(p, **b)[0])(params)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))


def test_slu_transcript_deliberation():
    """Transcript postdecoder fusion (slu postdecoder/deliberation
    role): transcript features extend the memory (lengths add) and
    CHANGE the loss vs no-transcript."""
    from espnet_tpu.models.slu import SLUModel
    model = SLUModel(**_conf(), use_transcript=True,
                     transcript_vocab_size=5,
                     postdecoder_conf={"attention_heads": 2,
                                       "linear_units": 32,
                                       "num_blocks": 1})
    b = _speech_batch(with_transcript=True)
    params = model.init(jax.random.PRNGKey(0), **b)
    l_with, _, _ = model.apply(params, **b)
    enc, enc_lens = model.apply(
        params, b["speech"], b["speech_lengths"],
        transcript=b["transcript"],
        transcript_lengths=b["transcript_lengths"], method=model.encode)
    enc0, enc_lens0 = model.apply(
        params, b["speech"], b["speech_lengths"], method=model.encode)
    assert int(enc_lens[0]) == int(enc_lens0[0]) + 3
    b_no = {k: v for k, v in b.items()
            if not k.startswith("transcript")}
    l_without, _, _ = model.apply(params, **b_no)
    assert np.isfinite(float(l_with)) and np.isfinite(float(l_without))
    assert abs(float(l_with) - float(l_without)) > 1e-7


def test_slu_task_e2e_with_transcript(tmp_path):
    """SLUTask trains the deliberation model end-to-end from scp data
    with a transcript column."""
    from espnet_tpu.data.fileio import write_wav
    from espnet_tpu.tasks.misc import SLUTask
    rng = np.random.RandomState(0)
    (tmp_path / "wavs").mkdir()
    wl, intents, trans = [], [], []
    for i in range(4):
        w = (rng.randn(3200) * 0.1).astype(np.float32)
        write_wav(tmp_path / "wavs" / f"u{i}.wav", 16000, w)
        wl.append(f"u{i} {tmp_path}/wavs/u{i}.wav")
        intents.append(f"u{i} ab")
        trans.append(f"u{i} ba ab")
    (tmp_path / "wav.scp").write_text("\n".join(wl) + "\n")
    (tmp_path / "text").write_text("\n".join(intents) + "\n")
    (tmp_path / "transcript").write_text("\n".join(trans) + "\n")
    (tmp_path / "tokens.txt").write_text(
        "\n".join(["<blank>", "a", "b", "<space>", "<sos/eos>"]) + "\n")
    cfg, params = SLUTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(tmp_path / "tokens.txt"),
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 32, "num_blocks": 1},
        "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                         "num_blocks": 1},
        "slu_postencoder": "transformer",
        "slu_postencoder_conf": {"attention_heads": 2,
                                 "linear_units": 32, "num_blocks": 1},
        "use_transcript": True,
        "postdecoder_conf": {"attention_heads": 2, "linear_units": 32,
                             "num_blocks": 1},
        "batch_size": 2, "max_epoch": 1, "log_interval": 2,
        "collate_fixed_lengths": {"speech": 3200, "text": 6,
                                  "transcript": 8},
        "train_data_path_and_name_and_type": [
            f"{tmp_path}/wav.scp,speech,sound",
            f"{tmp_path}/text,text,text",
            f"{tmp_path}/transcript,transcript,text"],
        "valid_data_path_and_name_and_type": [
            f"{tmp_path}/wav.scp,speech,sound",
            f"{tmp_path}/text,text,text",
            f"{tmp_path}/transcript,transcript,text"],
    })
    assert (tmp_path / "exp" / "config.yaml").exists()
