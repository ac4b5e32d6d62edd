"""ARPA n-gram scorer: parsing, host/device agreement, beam fusion
(reference: legacy/nets/scorers/ngram.py + test/beam_search_test.arpa)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

TOKENS = ["<blank>", "a", "b", "c", "<space>", "<sos/eos>"]

ARPA = """\\data\\
ngram 1=5
ngram 2=6
ngram 3=2

\\1-grams:
-1.0\t<s>\t-0.30103
-0.8\ta\t-0.2
-0.9\tb\t-0.15
-1.2\tc\t-0.1
-1.1\t</s>

\\2-grams:
-0.30103\t<s> a\t-0.05
-0.5\ta b\t-0.08
-0.6\tb a\t-0.02
-0.7\tb c
-0.4\tc </s>
-0.9\ta </s>

\\3-grams:
-0.2\t<s> a b
-0.3\ta b c

\\end\\
"""


@pytest.fixture
def tables(tmp_path):
    from espnet_tpu.decode.ngram import read_arpa
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return read_arpa(p, TOKENS)


def test_read_arpa(tables):
    ln10 = math.log(10)
    assert tables["order"] == 3
    a = TOKENS.index("a")
    assert tables["unigram"][a] == pytest.approx(-0.8 * ln10)
    assert tables["unigram_bo"][a] == pytest.approx(-0.2 * ln10)
    assert len(tables["keys2"]) == 6
    assert len(tables["keys3"]) == 2
    assert np.all(np.diff(tables["keys2"]) > 0)  # sorted unique


def test_host_scorer_hand_check(tables):
    """p(a b </s>) = p(a|<s>) p(b|<s> a) p(</s>|a b), every factor a
    direct table hit -> plain sum of the ARPA log10 probs."""
    from espnet_tpu.decode.ngram import score_sentence_host
    ln10 = math.log(10)
    a, b = TOKENS.index("a"), TOKENS.index("b")
    got = score_sentence_host(tables, [a, b])
    # p(a|<s>): bigram hit -0.30103; p(b|<s> a): trigram hit -0.2;
    # p(</s>|a b): no trigram (a b </s>), backoff bo(a b)=-0.08 +
    #   p(</s>|b): no bigram (b </s>), backoff bo(b)=-0.15 +
    #   unigram </s> = -1.1
    want = (-0.30103 - 0.2 + (-0.08 + -0.15 + -1.1)) * ln10
    assert got == pytest.approx(want, rel=1e-6)


def test_device_matches_host(tables, tmp_path):
    """Accumulating device score_step over a sequence == host scorer."""
    from espnet_tpu.decode.ngram import (NgramScorer, score_sentence_host)
    scorer = NgramScorer(tables)
    dev = {k: (jnp.asarray(v.astype(np.int32) if v.dtype == np.int64
                           else v) if isinstance(v, np.ndarray) else v)
           for k, v in tables.items()}
    eos = TOKENS.index("<sos/eos>")
    for ids in ([1, 2], [2, 1, 3], [3, 3, 2], [1, 2, 3, 1]):
        ctx = scorer.init_carry(dev, rows=1)
        seq = [eos] + ids + [eos]
        total = 0.0
        for step in range(len(seq) - 1):
            logp, ctx = scorer.score_step(
                dev, jnp.asarray([seq[step]], jnp.int32),
                jnp.asarray(step), ctx)
            total += float(logp[0, seq[step + 1]])
        want = score_sentence_host(tables, ids)
        assert total == pytest.approx(want, rel=1e-5), ids


def test_beam_search_ngram_fusion(tmp_path):
    """Beam search with a heavily-biased ngram prefers its favorite
    token over the (random) model's choice."""
    import jax

    from espnet_tpu.decode.beam_search import (BeamSearchConfig,
                                               batch_beam_search)
    from espnet_tpu.decode.ngram import NgramScorer
    from espnet_tpu.models.asr import ASRModel
    model = ASRModel(
        vocab_size=len(TOKENS), token_list=tuple(TOKENS),
        frontend_conf=None,
        encoder="transformer",
        encoder_conf={"output_size": 16, "attention_heads": 2,
                      "linear_units": 32, "num_blocks": 1,
                      "input_layer": "linear", "input_size": 8},
        decoder="transformer",
        decoder_conf={"attention_heads": 2, "linear_units": 32,
                      "num_blocks": 1},
        ctc_weight=0.3)
    T, D = 12, 8
    feats = np.random.RandomState(0).randn(1, T, D).astype(np.float32)
    flens = np.asarray([T], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, flens,
                        np.asarray([[1, 2]], np.int32),
                        np.asarray([2], np.int32))
    enc, enc_lens = model.apply(params, feats, flens, deterministic=True,
                                method=model.encode)
    # ngram that strongly prefers "c c c ... </s>"
    arpa = tmp_path / "bias.arpa"
    arpa.write_text("""\\data\\
ngram 1=3

\\1-grams:
-9\t<s>
-0.01\tc
-0.5\t</s>

\\end\\
""")
    scorer, dev = NgramScorer.from_file(arpa, TOKENS)
    base = batch_beam_search(
        model, params, enc, enc_lens,
        BeamSearchConfig(beam_size=3, ctc_weight=0.0, nbest=1))[0][0][0]
    fused = batch_beam_search(
        model, params, enc, enc_lens,
        BeamSearchConfig(beam_size=3, ctc_weight=0.0, ngram_weight=30.0,
                         nbest=1),
        ngram=scorer, ngram_params=dev)[0][0][0]
    c = TOKENS.index("c")
    assert all(t == c for t in fused), fused
    assert fused != base or all(t == c for t in base)


def test_rescore_nbest(tables):
    from espnet_tpu.decode.ngram import rescore_nbest, score_sentence_host
    nbest = [([1, 2], -1.0), ([3, 3], -0.5)]
    out = rescore_nbest(tables, nbest, weight=1.0)
    scores = {tuple(i): s for i, s in out}
    assert scores[(1, 2)] == pytest.approx(
        -1.0 + score_sentence_host(tables, [1, 2]))
    assert out[0][1] >= out[1][1]


def test_nbest_lm_rescoring():
    """fst/lm_rescore.py contract: LM rescoring re-ranks the n-best by
    am + w * lm + bonus * len; lm_sequence_logp matches a manual chain."""
    import jax
    from espnet_tpu.decode.rescore import lm_sequence_logp, rescore_nbest
    from espnet_tpu.models.lm import TransformerLM
    V = 9
    lm = TransformerLM(vocab_size=V, embed_unit=8, att_unit=16, head=2,
                       unit=32, layer=1, dropout_rate=0.0)
    seqs = [[1, 2, 3], [4, 5]]
    params = lm.init(jax.random.PRNGKey(0),
                     np.zeros((1, 4), np.int32), np.asarray([4], np.int32))
    lp = lm_sequence_logp(lm, params, seqs, sos_eos_id=V - 1)
    # manual: feed [sos, tokens...] and sum target logps incl. eos
    for si, s in enumerate(seqs):
        inp = np.asarray([[V - 1] + s], np.int32)
        logits = lm.apply(params, jnp.asarray(inp),
                          jnp.asarray([len(s) + 1], np.int32))
        logp = jax.nn.log_softmax(np.asarray(logits), axis=-1)[0]
        want = sum(logp[t, tok] for t, tok in enumerate(s + [V - 1]))
        np.testing.assert_allclose(lp[si], want, rtol=1e-4)
    nbest = [([1, 2, 3], -5.0), ([4, 5], -5.0)]
    out = rescore_nbest(nbest, lm, params, sos_eos_id=V - 1,
                        lm_weight=1.0)
    assert {tuple(i) for i, _ in out} == {(1, 2, 3), (4, 5)}
    scores = [s for _, s in out]
    assert scores == sorted(scores, reverse=True)
    # strong length bonus must rank the longer hyp first
    out2 = rescore_nbest(nbest, lm, params, sos_eos_id=V - 1,
                         lm_weight=0.0, length_bonus=100.0)
    assert list(out2[0][0]) == [1, 2, 3]
