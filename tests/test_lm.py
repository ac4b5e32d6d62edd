"""LM tests: step/full consistency, training, perplexity, fusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.lm import LanguageModel, SequentialRNNLM, TransformerLM


@pytest.mark.parametrize("lm_type,conf", [
    ("transformer", {"embed_unit": 16, "att_unit": 16, "head": 2,
                     "unit": 32, "layer": 2, "dropout_rate": 0.0}),
    ("seq_rnn", {"unit": 16, "nlayers": 2, "dropout_rate": 0.0}),
])
def test_lm_step_matches_full(lm_type, conf):
    model = LanguageModel(vocab_size=9, lm_type=lm_type, lm_conf=conf)
    text = jnp.asarray([[1, 2, 3, 4]])
    tlens = jnp.asarray([4])
    params = model.init(jax.random.PRNGKey(0), text, tlens)
    # teacher-forced logits on [sos, 1, 2, 3, 4]
    x = jnp.asarray([[8, 1, 2, 3, 4]])
    logits = model.apply(params, x, jnp.asarray([5]),
                         method=lambda m, a, l: m.lm(a, l))
    ref = jax.nn.log_softmax(logits[0, -1], axis=-1)

    state = model.apply(params, 1, 8, method=model.init_carry)
    for step, tok in enumerate([8, 1, 2, 3, 4]):
        logp, state = model.apply(params, jnp.asarray([tok]), step, state,
                                  method=model.score_step)
    np.testing.assert_allclose(np.asarray(logp[0]), np.asarray(ref),
                               atol=1e-4)


def test_lm_loss_and_ppl():
    model = LanguageModel(vocab_size=9, lm_type="transformer",
                          lm_conf={"embed_unit": 16, "att_unit": 16,
                                   "head": 2, "unit": 32, "layer": 1})
    text = jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]])
    tlens = jnp.asarray([3, 2])
    params = model.init(jax.random.PRNGKey(0), text, tlens)
    loss, stats, w = model.apply(params, text, tlens)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(stats["ppl"]), np.exp(float(loss)),
                               rtol=1e-5)


def test_lm_task_train_and_ppl(tmp_path):
    # tiny text corpus
    (tmp_path / "train_text").write_text(
        "".join(f"u{i} AB AB AB\n" for i in range(8)))
    (tmp_path / "valid_text").write_text("v0 AB AB\nv1 AB\n")
    (tmp_path / "tokens.txt").write_text(
        "<blank>\n<unk>\nA\nB\n<space>\n<sos/eos>\n")
    from espnet_tpu.tasks.lm import LMTask
    cfg, final = LMTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(tmp_path / "tokens.txt"),
        "lm_conf": {"embed_unit": 16, "att_unit": 16, "head": 2,
                    "unit": 32, "layer": 1, "dropout_rate": 0.0},
        "optim_conf": {"lr": 0.05},
        "batch_type": "unsorted", "batch_size": 8, "max_epoch": 5,
        "train_data_path_and_name_and_type": [
            f"{tmp_path}/train_text,text,text"],
        "valid_data_path_and_name_and_type": [
            f"{tmp_path}/valid_text,text,text"],
    })
    from espnet_tpu.bin.lm_calc_perplexity import calc_perplexity
    ppl = calc_perplexity(
        tmp_path / "exp" / "config.yaml",
        tmp_path / "exp" / "valid.loss.best",
        [f"{tmp_path}/valid_text,text,text"])
    assert ppl < 5.0  # 6-token vocab, highly regular text


def test_beam_search_with_lm_fusion():
    """Shallow fusion runs and changes scores."""
    from espnet_tpu.decode.beam_search import (BeamSearchConfig,
                                               batch_beam_search)
    from espnet_tpu.models.asr import ASRModel
    model = ASRModel(
        vocab_size=8, frontend_conf=None, encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear", input_size=5),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1),
        ctc_weight=0.3)
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 16, 5), jnp.float32)
    flens = jnp.asarray([16])
    params = model.init(jax.random.PRNGKey(0), feats, flens,
                        jnp.asarray([[1, 2]]), jnp.asarray([2]))
    enc, enc_lens = model.apply(params, feats, flens, method=model.encode)
    lm = LanguageModel(vocab_size=8, lm_type="seq_rnn",
                       lm_conf={"unit": 12, "nlayers": 1})
    lm_params = lm.init(jax.random.PRNGKey(1), jnp.asarray([[1, 2]]),
                        jnp.asarray([2]))
    res_nolm = batch_beam_search(model, params, enc, enc_lens,
                                 BeamSearchConfig(beam_size=2, ctc_weight=0.3))
    res_lm = batch_beam_search(model, params, enc, enc_lens,
                               BeamSearchConfig(beam_size=2, ctc_weight=0.3,
                                                lm_weight=0.5),
                               lm=lm, lm_params=lm_params)
    assert res_lm[0][0][1] != res_nolm[0][0][1]
