"""Streaming encoder + Speech2TextStreaming tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.nn.streaming_encoder import (StreamingConformerEncoder,
                                             chunk_attention_mask)


def test_chunk_attention_mask():
    m = np.asarray(chunk_attention_mask(8, 2, 1))
    # frame 4 (chunk 2) attends chunks 1-2 => frames 2..5
    assert m[4].tolist() == [False, False, True, True, True, True,
                             False, False]


def test_stream_step_matches_full_forward_linear():
    """With linear input layer, chunked streaming == full forward."""
    enc = StreamingConformerEncoder(
        input_size=6, output_size=16, attention_heads=2, linear_units=32,
        num_blocks=2, chunk_size=4, left_chunks=2, cnn_kernel=5,
        dropout_rate=0.0, input_layer="linear")
    T = 16  # 4 chunks
    x = jnp.asarray(np.random.RandomState(0).randn(1, T, 6), jnp.float32)
    ilens = jnp.asarray([T])
    params = enc.init(jax.random.PRNGKey(0), x, ilens)
    full, olens = enc.apply(params, x, ilens)

    state = enc.apply(params, 1, method=enc.init_stream_state)
    outs = []
    for c in range(T // 4):
        out, state = enc.apply(params, x[:, c * 4:(c + 1) * 4], state,
                               method=enc.stream_step)
        outs.append(out)
    stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               atol=2e-4)


def test_streaming_asr_e2e(tmp_path):
    """Train a streaming model on the tone corpus; stream chunks in and
    compare to non-streaming greedy output."""
    from tests.mini_corpus import make_corpus
    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.bin.asr_inference_streaming import Speech2TextStreaming
    corpus = make_corpus(tmp_path / "mini", n_train=12, n_valid=2)
    cfg, _ = ASRTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(corpus / "tokens.txt"),
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 20,
                          "fs": 8000},
        "encoder": "streaming_conformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 48, "num_blocks": 1,
                         "chunk_size": 4, "left_chunks": 2,
                         "cnn_kernel": 5, "input_layer": "conv2d2"},
        "decoder": None,
        "model_conf": {"ctc_weight": 1.0},
        "optim_conf": {"lr": 0.05},
        "batch_type": "unsorted", "batch_size": 8, "max_epoch": 25,
        "log_interval": 10,
        "train_data_path_and_name_and_type": [
            f"{corpus}/train/wav.scp,speech,sound",
            f"{corpus}/train/text,text,text"],
        "valid_data_path_and_name_and_type": [
            f"{corpus}/valid/wav.scp,speech,sound",
            f"{corpus}/valid/text,text,text"],
    })
    s2t = Speech2TextStreaming(
        asr_train_config=tmp_path / "exp" / "config.yaml",
        asr_model_file=tmp_path / "exp" / "valid.loss.best")
    from espnet_tpu.data.fileio import SoundScpReader, read_2columns_text
    reader = SoundScpReader(corpus / "train" / "wav.scp")
    texts = read_2columns_text(corpus / "train" / "text")
    key = list(reader.keys())[0]
    _, audio = reader[key]
    # stream in 1000-sample chunks
    for i in range(0, len(audio), 1000):
        last = i + 1000 >= len(audio)
        res = s2t(audio[i:i + 1000], is_final=last)
    text = res[0][0]
    # streamed hypothesis should resemble the reference transcript
    from espnet_tpu.utils.metrics import error_rate
    rate = error_rate([list(texts[key])], [list(text)])
    assert rate["err_rate"] < 0.7, (texts[key], text)


def test_block_sync_hybrid_beam(tmp_path):
    """search_type='beam': final block-synchronous hybrid beam result ==
    offline hybrid beam decode of the same streaming-encoder states
    (batch_beam_search_online_sim semantics)."""
    import yaml

    from espnet_tpu.bin.asr_inference_streaming import Speech2TextStreaming
    from espnet_tpu.decode.beam_search import (BeamSearchConfig,
                                               batch_beam_search)
    tokens = ["<blank>"] + list("abcd") + ["<space>", "<sos/eos>"]
    (tmp_path / "tokens.txt").write_text("\n".join(tokens) + "\n")
    cfg = {
        "token_list": str(tmp_path / "tokens.txt"),
        "token_type": "char",
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 20,
                          "fs": 8000},
        "encoder": "streaming_conformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 48, "num_blocks": 1,
                         "chunk_size": 4, "left_chunks": 2,
                         "cnn_kernel": 5, "input_layer": "conv2d2"},
        "decoder": "transformer",
        "decoder_conf": {"attention_heads": 2, "linear_units": 48,
                         "num_blocks": 1},
        "model_conf": {"ctc_weight": 0.3},
    }
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(cfg))
    s2t = Speech2TextStreaming(
        asr_train_config=tmp_path / "config.yaml", search_type="beam",
        beam_size=4, ctc_weight=0.3, decode_interval=2)
    audio = np.random.RandomState(3).randn(4500).astype(np.float32) * 0.1
    partials = []
    for i in range(0, len(audio), 1500):
        last = i + 1500 >= len(audio)
        res = s2t(audio[i:i + 1500], is_final=last)
        if res:
            partials.append(res[0][0])
    assert partials, "no partial results emitted"
    final_ids = res[0][2]

    # offline: full streaming-encoder forward + same beam config
    # (final padded-window tail trimmed exactly like the streamed path)
    model, params = s2t.model, s2t.params
    from espnet_tpu.frontends.streaming import (StreamingFeatureExtractor,
                                                subsampled_valid_len)
    fe = StreamingFeatureExtractor(n_fft=128, hop_length=64, n_mels=20,
                                   fs=8000)
    fe.push(audio, is_final=True)
    enc_chunks = []
    state = model.apply(params, 1,
                        method=lambda m, b: m.encoder_mod.init_stream_state(b))
    while True:
        popped = fe.pop_one_window(s2t.feat_window, s2t.feat_advance,
                                   is_final=True, with_valid=True)
        if popped is None:
            break
        win, n_valid = popped
        enc, state = model.apply(
            params, jnp.asarray(win[None]), state,
            method=lambda m, f, st: m.encoder_mod.stream_step(f, st))
        enc_chunks.append(np.asarray(enc[0])[
            :subsampled_valid_len(s2t.rate, n_valid)])
    enc = np.concatenate(enc_chunks, axis=0)
    from espnet_tpu.data.batching import bucket_length
    Tb = bucket_length(enc.shape[0], base=4 * 4, growth=1.4)
    pad = np.zeros((Tb, enc.shape[1]), enc.dtype)
    pad[:enc.shape[0]] = enc
    nb = batch_beam_search(
        model, params, jnp.asarray(pad[None]),
        jnp.asarray([enc.shape[0]], jnp.int32),
        BeamSearchConfig(beam_size=4, ctc_weight=0.3, nbest=1))[0]
    assert nb[0][0] == final_ids, (nb[0][0], final_ids)


def test_streaming_session_pool_matches_single_session(tmp_path):
    """Batched multi-session pool: two concurrent streams produce
    exactly the single-session greedy hypotheses (mask-merge keeps idle
    sessions' state frozen)."""
    import yaml

    from espnet_tpu.bin.asr_inference_streaming import (
        Speech2TextStreaming, StreamingSessionPool)
    tokens = ["<blank>"] + list("abcd") + ["<space>", "<sos/eos>"]
    (tmp_path / "tokens.txt").write_text("\n".join(tokens) + "\n")
    cfg = {
        "token_list": str(tmp_path / "tokens.txt"),
        "token_type": "char",
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 20,
                          "fs": 8000},
        "encoder": "streaming_conformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 48, "num_blocks": 1,
                         "chunk_size": 4, "left_chunks": 2,
                         "cnn_kernel": 5, "input_layer": "conv2d2"},
        "decoder": None,
        "model_conf": {"ctc_weight": 1.0},
    }
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(cfg))
    s2t = Speech2TextStreaming(asr_train_config=tmp_path / "config.yaml")
    rng = np.random.RandomState(0)
    audio_a = rng.randn(4200).astype(np.float32) * 0.1
    audio_b = rng.randn(3000).astype(np.float32) * 0.1

    def single(audio):
        s2t.reset()
        for i in range(0, len(audio), 1400):
            res = s2t(audio[i:i + 1400],
                      is_final=i + 1400 >= len(audio))
        return res[0][2]

    ref_a, ref_b = single(audio_a), single(audio_b)

    pool = StreamingSessionPool(s2t, max_sessions=4)
    sa = pool.open()
    sb = pool.open()
    assert sa != sb
    out_a = out_b = None
    # interleave pushes; different chunk cadence per session
    a_chunks = [(audio_a[i:i + 1400], i + 1400 >= 4200)
                for i in range(0, 4200, 1400)]
    b_chunks = [(audio_b[i:i + 1500], i + 1500 >= 3000)
                for i in range(0, 3000, 1500)]
    for r in range(len(a_chunks)):
        out_a = pool.push(sa, *a_chunks[r])
        if r < len(b_chunks):
            out_b = pool.push(sb, *b_chunks[r])
    assert out_a[2] == ref_a
    assert out_b[2] == ref_b
    # closed sessions free their slots
    sc = pool.open()
    assert sc in (sa, sb)
