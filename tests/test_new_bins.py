"""Functional coverage for the bin inventory added for Appendix-A parity:
mt_inference, spk_embed_extract, gan_codec_inference, compute_fbank_feats,
enh_inference_streaming, maskctc task wiring."""

import jax
import numpy as np
import yaml


def test_text2text_mt_inference(tmp_path):
    from espnet_tpu.bin.mt_inference import Text2Text
    tokens = ["<blank>"] + list("abc") + ["<space>", "<sos/eos>"]
    (tmp_path / "tokens.txt").write_text("\n".join(tokens) + "\n")
    cfg = {
        "token_list": str(tmp_path / "tokens.txt"),
        "token_type": "char",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 32, "num_blocks": 1},
        "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                         "num_blocks": 1},
    }
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(cfg))
    t2t = Text2Text(mt_train_config=tmp_path / "config.yaml", beam_size=2)
    out = t2t("ab c")
    assert isinstance(out[0][0], str)


def test_spk_embed_extract_and_fbank(tmp_path):
    from espnet_tpu.bin.compute_fbank_feats import compute
    from espnet_tpu.data.fileio import write_wav
    rng = np.random.RandomState(0)
    lines = []
    for u in ("u1", "u2"):
        w = rng.randn(2000).astype(np.float32) * 0.1
        write_wav(tmp_path / f"{u}.wav", 16000, w)
        lines.append(f"{u} {tmp_path}/{u}.wav")
    (tmp_path / "wav.scp").write_text("\n".join(lines) + "\n")
    scp = compute(tmp_path / "fbank", str(tmp_path / "wav.scp"),
                  n_fft=256, hop_length=128, n_mels=20)
    feats = np.load(tmp_path / "fbank" / "u1.npy")
    assert feats.shape[1] == 20 and feats.shape[0] > 5
    assert len(scp.read_text().splitlines()) == 2


def test_codec_inference_roundtrip(tmp_path):
    from espnet_tpu.bin.gan_codec_inference import inference
    from espnet_tpu.data.fileio import write_wav
    from espnet_tpu.tasks.ssl import CodecTask
    cfg = dict(CodecTask.task_defaults())
    cfg["codec_conf"] = dict(channels=8, strides=[2, 2, 4], code_dim=16,
                             num_quantizers=2, codebook_size=16)
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(cfg))
    w = np.random.RandomState(0).randn(1600).astype(np.float32) * 0.2
    write_wav(tmp_path / "a.wav", 16000, w)
    (tmp_path / "wav.scp").write_text(f"a {tmp_path}/a.wav\n")
    out = inference(tmp_path / "out", str(tmp_path / "wav.scp"),
                    train_config=tmp_path / "config.yaml")
    codes = np.load(out / "codes" / "a.npy")
    assert codes.shape[-1] == 2
    assert (out / "wav" / "a.wav").exists()


def test_enh_streaming_overlap_add(tmp_path):
    from espnet_tpu.bin.enh_inference_streaming import \
        SeparateSpeechStreaming
    from espnet_tpu.tasks.enh import EnhancementTask
    cfg = dict(EnhancementTask.task_defaults())
    cfg.update(num_spk=1,
               separator_conf={"rnn_hidden": 16, "num_layers": 1},
               encoder_conf={"n_fft": 128, "hop_length": 64})
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(cfg))
    ss = SeparateSpeechStreaming(train_config=tmp_path / "config.yaml",
                                 segment_size=0.2)
    rng = np.random.RandomState(0)
    total = []
    for i in range(4):
        out = ss(rng.randn(1600).astype(np.float32) * 0.1,
                 is_final=i == 3)
        total.append(out[0])
    y = np.concatenate(total)
    assert y.ndim == 1 and len(y) > 3200
    assert np.all(np.isfinite(y))


def test_maskctc_via_asr_task(tmp_path):
    from espnet_tpu.tasks.asr import ASRTask
    tokens = ["<blank>", "a", "b", "<sos/eos>", "<mask>"]
    cfg = dict(ASRTask.task_defaults())
    cfg.update(token_list=tokens, frontend="none", model="maskctc",
               encoder="transformer",
               encoder_conf=dict(output_size=16, attention_heads=2,
                                 linear_units=32, num_blocks=1,
                                 input_layer="linear", input_size=5),
               decoder=None,
               decoder_conf=dict(attention_heads=2, linear_units=32,
                                 num_blocks=1),
               model_conf={"ctc_weight": 0.3})
    model = ASRTask.build_model(cfg)
    from espnet_tpu.models.maskctc import MaskCTCModel
    assert isinstance(model, MaskCTCModel)
    batch = {
        "speech": np.random.RandomState(0).randn(2, 12, 5).astype(np.float32),
        "speech_lengths": np.full((2,), 12, np.int32),
        "text": np.ones((2, 3), np.int32),
        "text_lengths": np.full((2,), 3, np.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0),
                         "mlm_mask": jax.random.PRNGKey(1)}, **batch)
    loss, _, _ = model.apply(params, **batch,
                             rngs={"mlm_mask": jax.random.PRNGKey(2),
                                   "dropout": jax.random.PRNGKey(3)},
                             deterministic=False)
    assert np.isfinite(float(loss))


def test_s2t_language_identification(tmp_path):
    """Speech2Language: rank <lang> tokens by first-step decoder score
    (s2t_inference_language.py contract)."""
    from espnet_tpu.bin.s2t_inference_language import Speech2Language
    tokens = ["<blank>", "<eng>", "<deu>", "a", "b", "<sos/eos>"]
    (tmp_path / "tokens.txt").write_text("\n".join(tokens) + "\n")
    cfg = {
        "token_list": str(tmp_path / "tokens.txt"),
        "token_type": "char",
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 20},
        "encoder": "transformer",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 32, "num_blocks": 1,
                         "input_layer": "conv2d2"},
        "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                         "num_blocks": 1},
    }
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(cfg))
    s2l = Speech2Language(s2t_train_config=tmp_path / "config.yaml",
                          nbest=2)
    assert s2l.lang_syms == ["<eng>", "<deu>"]
    res = s2l(np.random.RandomState(0).randn(2000).astype(np.float32))
    assert len(res) == 2
    assert abs(sum(p for _, p in res) - 1.0) < 1e-5 or \
        sum(p for _, p in res) <= 1.0


def test_enh_tse_task_and_extract(tmp_path):
    """EnhTSETask + ExtractSpeech bin (enh_tse contract)."""
    from espnet_tpu.bin.enh_tse_inference import ExtractSpeech
    from espnet_tpu.tasks.enh import EnhTSETask
    cfg = dict(EnhTSETask.task_defaults())
    cfg["tse_conf"] = {"n_fft": 128, "hop_length": 64, "hidden": 16,
                       "num_layers": 1, "emb_dim": 8}
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(cfg))
    m = EnhTSETask.build_model(cfg)
    ex = EnhTSETask.example_batch(cfg)
    p = m.init(jax.random.PRNGKey(0), **ex)
    loss, stats, _ = m.apply(p, **ex)
    assert np.isfinite(float(loss))
    es = ExtractSpeech(train_config=tmp_path / "config.yaml")
    rng = np.random.RandomState(0)
    out = es(rng.randn(1600).astype(np.float32),
             rng.randn(800).astype(np.float32))
    assert out.shape == (1, 1600)
    assert np.all(np.isfinite(out))


def test_s2t_ctc_model_and_inference(tmp_path):
    """OWSM-CTC (s2t/espnet_ctc_model.py contract): prompt conditions
    the encoder (changing the prompt changes the encoding), pure-CTC
    loss trains, greedy CTC inference decodes."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.bin.s2t_inference_ctc import Speech2TextCTC
    from espnet_tpu.tasks.misc import S2TCTCTask
    tokens = ["<blank>", "<eng>", "<deu>", "a", "b", "<space>",
              "<na>", "<sop>", "<sos/eos>"]
    (tmp_path / "tokens.txt").write_text("\n".join(tokens) + "\n")
    cfg = dict(S2TCTCTask.task_defaults())
    cfg.update({
        "token_list": str(tmp_path / "tokens.txt"),
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 20},
        "encoder": "transformer",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 32, "num_blocks": 1,
                         "input_layer": "conv2d2"},
    })
    model = S2TCTCTask.build_model(cfg)
    assert model.ctc_weight == 1.0 and model.decoder is None
    rng = np.random.RandomState(0)
    b = {"speech": jnp.asarray(rng.randn(2, 2000) * 0.1, jnp.float32),
         "speech_lengths": jnp.asarray([2000, 1500], jnp.int32),
         "text": jnp.asarray([[3, 4, 3], [4, 3, -1]], jnp.int32),
         "text_lengths": jnp.asarray([3, 2], jnp.int32),
         "text_prev": jnp.asarray([[1], [2]], jnp.int32),
         "text_prev_lengths": jnp.asarray([1, 1], jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), **b)
    loss, stats, w = model.apply(params, **b)
    assert np.isfinite(float(loss)) and "loss_ctc" in stats
    # the prompt reaches the encoder
    e1, _ = model.apply(params, b["speech"], b["speech_lengths"],
                        b["text_prev"], b["text_prev_lengths"],
                        method=model.encode_conditioned)
    e2, _ = model.apply(params, b["speech"], b["speech_lengths"],
                        jnp.asarray([[2], [1]], jnp.int32),
                        b["text_prev_lengths"],
                        method=model.encode_conditioned)
    assert not np.allclose(np.asarray(e1), np.asarray(e2))
    # save a config + random ckpt and decode through the bin
    import yaml as _yaml

    from espnet_tpu.train.checkpoint import save_checkpoint
    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "config.yaml").write_text(_yaml.safe_dump(cfg))
    save_checkpoint(exp / "ckpt", params, None, None)
    s2t = Speech2TextCTC(s2t_train_config=exp / "config.yaml",
                         s2t_model_file=exp / "ckpt",
                         lang_sym="<eng>")
    res = s2t(np.asarray(rng.randn(2000), np.float32))
    assert len(res) == 1 and isinstance(res[0][0], str)


def test_vocab_export_bins(tmp_path):
    """hugging_face_export_vocabulary / whisper_export_vocabulary:
    id-ordered token list written from a local tokenizer file."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel

    from espnet_tpu.bin.hugging_face_export_vocabulary import \
        export_vocabulary
    vocab = {"[UNK]": 0, "hello": 1, "world": 2}
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.save(str(tmp_path / "tok.json"))
    n = export_vocabulary(str(tmp_path / "out.txt"),
                          str(tmp_path / "tok.json"),
                          add_symbols=["<sos/eos>"])
    lines = (tmp_path / "out.txt").read_text().splitlines()
    assert n == 4 and lines[1] == "hello" and lines[-1] == "<sos/eos>"


def test_s2st_spectral_inference_bin(tmp_path):
    """s2st_inference (bin/s2st_inference.py contract): translatotron
    spectral family decodes source speech to a waveform via
    griffin-lim."""
    import yaml as _yaml

    from espnet_tpu.bin.s2st_inference import Speech2SpeechInference
    from espnet_tpu.tasks.s2st import S2STTask
    cfg = dict(S2STTask.task_defaults())
    cfg.update({
        "s2st_type": "translatotron",
        "frontend_conf": {"fs": 8000, "n_fft": 128, "hop_length": 64,
                          "n_mels": 20},
        "encoder": "transformer",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 32, "num_blocks": 1,
                         "input_layer": "conv2d2"},
        "synthesizer_conf": {"prenet_units": 8, "dlayers_units": 16,
                             "att_dim": 8, "postnet_layers": 1,
                             "postnet_chans": 8, "max_frames": 12},
    })
    model = S2STTask.build_model(cfg)
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    b = S2STTask.example_batch(cfg)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "prenet": jax.random.PRNGKey(1)},
                        **{k: jnp.asarray(v) for k, v in b.items()})
    from espnet_tpu.train.checkpoint import save_checkpoint
    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "config.yaml").write_text(_yaml.safe_dump(
        {k: v for k, v in cfg.items()}))
    save_checkpoint(exp / "ckpt", params, None, None)
    s2s = Speech2SpeechInference(train_config=exp / "config.yaml",
                                 model_file=exp / "ckpt",
                                 griffin_lim_iters=2, max_frames=12)
    wavs = s2s(np.asarray(rng.randn(1600), np.float32))
    assert len(wavs) == 1 and np.isfinite(wavs[0]).all()
