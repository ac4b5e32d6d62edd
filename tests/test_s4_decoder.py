"""S4 (diagonal state-space) decoder: parallel-scan teacher forcing ==
single-step recurrence, and hybrid beam search integration
(s4_decoder.py contract)."""

import jax
import numpy as np


def _decoder():
    from espnet_tpu.nn.s4_decoder import S4Decoder
    return S4Decoder(vocab_size=9, encoder_output_size=12,
                     attention_heads=2, linear_units=24, num_blocks=2,
                     d_state=4)


def test_s4_teacher_forced_matches_step_chain():
    dec = _decoder()
    B, T, L = 2, 6, 5
    rng = np.random.RandomState(0)
    memory = rng.randn(B, T, 12).astype(np.float32)
    memory_lens = np.asarray([6, 4], np.int32)
    ys_in = rng.randint(0, 9, (B, L)).astype(np.int32)
    params = dec.init(jax.random.PRNGKey(0), memory, memory_lens, ys_in,
                      np.full((B,), L, np.int32))
    logits = dec.apply(params, memory, memory_lens, ys_in,
                       np.full((B,), L, np.int32))
    state = dec.apply(params, memory, memory_lens, B, L,
                      method=dec.init_state)
    for t in range(L):
        logp, state = dec.apply(params, ys_in[:, t], t, state,
                                method=dec.score_step)
        ref = jax.nn.log_softmax(logits[:, t], axis=-1)
        np.testing.assert_allclose(np.asarray(logp), np.asarray(ref),
                                   atol=1e-4, err_msg=f"step {t}")


def test_s4_layer_scan_matches_recurrence():
    from espnet_tpu.nn.s4_decoder import S4DLayer
    layer = S4DLayer(d_model=6, d_state=4)
    u = np.random.RandomState(1).randn(2, 7, 6).astype(np.float32)
    params = layer.init(jax.random.PRNGKey(0), u)
    y_par = layer.apply(params, u)
    x = layer.apply(params, 2, method=layer.init_ssm_state)
    ys = []
    for t in range(7):
        y, x = layer.apply(params, u[:, t], x, method=layer.step)
        ys.append(y)
    y_seq = np.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_par), y_seq, atol=1e-5)


def test_asr_model_with_s4_decoder_decodes():
    from espnet_tpu.decode.beam_search import (BeamSearchConfig,
                                               batch_beam_search)
    from espnet_tpu.models.asr import ASRModel
    model = ASRModel(
        vocab_size=8, frontend_conf=None, encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear", input_size=5),
        decoder="s4",
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          d_state=4),
        ctc_weight=0.3)
    B = 2
    batch = {
        "speech": np.random.RandomState(0).randn(B, 12, 5).astype(np.float32),
        "speech_lengths": np.full((B,), 12, np.int32),
        "text": np.ones((B, 3), np.int32),
        "text_lengths": np.full((B,), 3, np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)
    loss, stats, _ = model.apply(params, **batch)
    assert np.isfinite(float(loss))
    enc, enc_lens = model.apply(params, batch["speech"],
                                batch["speech_lengths"],
                                method=model.encode)
    results = batch_beam_search(
        model, params, enc, enc_lens,
        BeamSearchConfig(beam_size=3, ctc_weight=0.3, maxlenratio=0.5))
    assert len(results) == B and np.isfinite(results[0][0][1])
