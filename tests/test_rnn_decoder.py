"""RNN (location-aware attention) decoder: teacher-forced == step chain,
and hybrid beam search runs with it (rnn_decoder.py contract)."""

import jax
import numpy as np


def _decoder():
    from espnet_tpu.nn.rnn_decoder import RNNDecoder
    return RNNDecoder(vocab_size=9, encoder_output_size=12, hidden_size=16,
                      num_layers=2, att_dim=8)


def test_rnn_decoder_teacher_forced_matches_step_chain():
    dec = _decoder()
    B, T, L = 2, 7, 5
    rng = np.random.RandomState(0)
    memory = rng.randn(B, T, 12).astype(np.float32)
    memory_lens = np.asarray([7, 4], np.int32)
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
                                   atol=1e-5, err_msg=f"step {t}")


def test_rnn_decoder_select_state_gathers_rows():
    dec = _decoder()
    B, T = 3, 6
    memory = np.random.RandomState(1).randn(B, T, 12).astype(np.float32)
    lens = np.asarray([6, 5, 4], np.int32)
    params = dec.init(jax.random.PRNGKey(0), memory, lens,
                      np.zeros((B, 2), np.int32), np.full((B,), 2, np.int32))
    state = dec.apply(params, memory, lens, B, 4, method=dec.init_state)
    sel = dec.select_state(state, np.asarray([2, 0, 2]))
    # mutable leaves (recurrent cells, attention weights) follow the
    # gather; per-utterance constants (memory/enc_proj/enc_mask) are
    # exempt — beam reordering never crosses an utterance's beam block
    np.testing.assert_array_equal(np.asarray(sel["att_w"][0]),
                                  np.asarray(state["att_w"][2]))
    np.testing.assert_array_equal(np.asarray(sel["c"][1]),
                                  np.asarray(state["c"][0]))
    np.testing.assert_array_equal(np.asarray(sel["memory"]),
                                  np.asarray(state["memory"]))


def test_asr_model_with_rnn_decoder_trains_and_decodes():
    from espnet_tpu.decode.beam_search import (BeamSearchConfig,
                                               batch_beam_search)
    from espnet_tpu.models.asr import ASRModel
    model = ASRModel(
        vocab_size=8, frontend_conf=None, encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear", input_size=5),
        decoder="rnn",
        decoder_conf=dict(hidden_size=16, num_layers=1, att_dim=8),
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
    assert len(results) == B
    for hyps in results:
        ids, score = hyps[0]
        assert np.isfinite(score)
