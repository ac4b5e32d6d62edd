"""Transducer model + search tests, incl. a mini-corpus e2e train/decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.decode.transducer_search import (TransducerSearchConfig,
                                                 decode_transducer)
from espnet_tpu.models.transducer import TransducerModel


def tiny_model(**kw):
    cfg = dict(
        vocab_size=7,
        frontend_conf=None,
        encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear", input_size=5),
        decoder="rnn",
        decoder_conf=dict(hidden_size=12),
        joint_conf=dict(joint_space_size=12),
    )
    cfg.update(kw)
    return TransducerModel(**cfg)


def batch():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 15, 5), jnp.float32)
    flens = jnp.asarray([15, 10])
    text = jnp.asarray([[1, 2, 3], [4, 5, 0]])
    tlens = jnp.asarray([3, 2])
    return feats, flens, text, tlens


@pytest.mark.parametrize("decoder", ["rnn", "stateless"])
def test_transducer_forward_and_grad(decoder):
    model = tiny_model(decoder=decoder,
                       decoder_conf=(dict(hidden_size=12) if decoder == "rnn"
                                     else dict(embed_size=12)))
    f, fl, t, tl = batch()
    params = model.init(jax.random.PRNGKey(0), f, fl, t, tl)
    loss, stats, w = model.apply(params, f, fl, t, tl)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(p, f, fl, t, tl)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_transducer_aux_ctc():
    model = tiny_model(aux_ctc_weight=0.3)
    f, fl, t, tl = batch()
    params = model.init(jax.random.PRNGKey(0), f, fl, t, tl)
    loss, stats, _ = model.apply(params, f, fl, t, tl)
    assert "loss_aux_ctc" in stats


def test_greedy_and_beam_search_run():
    model = tiny_model()
    f, fl, t, tl = batch()
    params = model.init(jax.random.PRNGKey(0), f, fl, t, tl)
    enc, enc_lens = model.apply(params, f, fl, method=model.encode)
    res_g = decode_transducer(model, params, enc, enc_lens,
                              TransducerSearchConfig(search_type="greedy"))
    assert len(res_g) == 2
    res_b = decode_transducer(model, params, enc, enc_lens,
                              TransducerSearchConfig(beam_size=3, nbest=2))
    assert len(res_b) == 2
    for hyps in res_b:
        assert 1 <= len(hyps) <= 2
        for ids, score in hyps:
            assert all(i != 0 for i in ids)  # no blanks in output


def test_beam_prefix_merge_no_duplicates():
    """After recombination the beam must not contain duplicate live
    hypotheses; merged scores >= best unmerged path score."""
    model = tiny_model()
    f, fl, t, tl = batch()
    params = model.init(jax.random.PRNGKey(0), f, fl, t, tl)
    enc, enc_lens = model.apply(params, f, fl, method=model.encode)
    res = decode_transducer(model, params, enc, enc_lens,
                            TransducerSearchConfig(beam_size=4, nbest=4,
                                                   score_norm=False))
    for hyps in res:
        seqs = [tuple(ids) for ids, _ in hyps]
        assert len(seqs) == len(set(seqs))
        assert all(np.isfinite(s) for _, s in hyps)


def test_transducer_e2e_mini(tmp_path):
    """Train on the tone corpus, expect greedy decode to learn it."""
    from tests.mini_corpus import make_corpus
    from espnet_tpu.tasks.asr_transducer import ASRTransducerTask
    from espnet_tpu.utils.metrics import error_rate
    corpus = make_corpus(tmp_path / "mini", n_train=16, n_valid=4)
    cfg, params = ASRTransducerTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(corpus / "tokens.txt"),
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 20,
                          "fs": 8000},
        "encoder": "transformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 48, "num_blocks": 1,
                         "input_layer": "conv2d2"},
        "decoder": "stateless",
        "decoder_conf": {"embed_size": 16},
        "joint_conf": {"joint_space_size": 24},
        "optim_conf": {"lr": 0.02},
        "batch_type": "unsorted", "batch_size": 8, "max_epoch": 25,
        "log_interval": 10,
        "train_data_path_and_name_and_type": [
            f"{corpus}/train/wav.scp,speech,sound",
            f"{corpus}/train/text,text,text"],
        "valid_data_path_and_name_and_type": [
            f"{corpus}/valid/wav.scp,speech,sound",
            f"{corpus}/valid/text,text,text"],
    })
    model = ASRTransducerTask.build_model(cfg)
    from espnet_tpu.data.fileio import SoundScpReader, read_2columns_text
    from espnet_tpu.text.tokenizer import TokenIDConverter
    reader = SoundScpReader(corpus / "train" / "wav.scp")
    texts = read_2columns_text(corpus / "train" / "text")
    conv = TokenIDConverter(str(corpus / "tokens.txt"))
    refs, hyps = [], []
    for k in list(reader.keys())[:6]:
        _, audio = reader[k]
        sp = jnp.asarray(audio)[None]
        sl = jnp.asarray([len(audio)])
        enc, enc_lens = model.apply(params, sp, sl, method=model.encode)
        res = decode_transducer(model, params, enc, enc_lens,
                                TransducerSearchConfig(search_type="greedy"))
        toks = conv.ids2tokens(res[0][0][0])
        hyps.append("".join(" " if t == "<space>" else t for t in toks))
        refs.append(texts[k])
    rate = error_rate([list(r) for r in refs], [list(h) for h in hyps])
    assert rate["err_rate"] < 0.6, (refs, hyps)
