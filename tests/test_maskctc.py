"""MaskCTC tests: training loss + iterative decode."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.maskctc import MaskCTCModel


def tiny():
    return MaskCTCModel(
        vocab_size=10,  # last id = <mask>, second-to-last = sos/eos
        frontend_conf=None,
        encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear", input_size=5),
        decoder=None,
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1),
        ctc_weight=0.3, sos=8, eos=8)


def batch():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 18, 5), jnp.float32)
    flens = jnp.asarray([18, 12])
    text = jnp.asarray([[1, 2, 3], [4, 5, 0]])
    tlens = jnp.asarray([3, 2])
    return feats, flens, text, tlens


def test_maskctc_train():
    model = tiny()
    f, fl, t, tl = batch()
    params = model.init(jax.random.PRNGKey(0), f, fl, t, tl)
    loss, stats, _ = model.apply(
        params, f, fl, t, tl, deterministic=False,
        rngs={"mlm_mask": jax.random.PRNGKey(1),
              "dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))
    assert "loss_mlm" in stats and "acc_mlm" in stats
    g = jax.grad(lambda p: model.apply(
        p, f, fl, t, tl, deterministic=False,
        rngs={"mlm_mask": jax.random.PRNGKey(1),
              "dropout": jax.random.PRNGKey(2)})[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_maskctc_decode():
    model = tiny()
    f, fl, t, tl = batch()
    params = model.init(jax.random.PRNGKey(0), f, fl, t, tl)
    enc, enc_lens = model.apply(params, f, fl, method=model.encode)
    tokens, n_tok = model.apply(params, enc, enc_lens,
                                method=model.maskctc_decode)
    tokens, n_tok = np.asarray(tokens), np.asarray(n_tok)
    assert tokens.shape[0] == 2
    # no mask tokens survive in the valid region
    for b in range(2):
        assert (tokens[b, :n_tok[b]] != model.mask_id).all()


def test_partially_ar_decode():
    """AR span-beam decode (beam_search_partially_AR.py role): fills
    every masked slot with a real token, leaves high-confidence CTC
    tokens frozen, and with beam=1 equals the MLM's greedy argmax fill
    applied left-to-right."""
    model = tiny()
    f, fl, t, tl = batch()
    params = model.init(jax.random.PRNGKey(0), f, fl, t, tl)
    enc, enc_lens = model.apply(params, f, fl, method=model.encode)
    tokens, n_tok = model.apply(params, enc, enc_lens, beam_size=3,
                                method=model.partially_ar_decode)
    tokens, n_tok = np.asarray(tokens), np.asarray(n_tok)
    assert tokens.shape[0] == 2
    for b in range(2):
        seg = tokens[b, :n_tok[b]]
        assert (seg != model.mask_id).all()
        assert (seg != 0).all()  # blank never filled in
    # greedy CTC canvas length is shared with maskctc_decode
    t2, n2 = model.apply(params, enc, enc_lens,
                         method=model.maskctc_decode)
    assert (np.asarray(n2) == n_tok).all()
