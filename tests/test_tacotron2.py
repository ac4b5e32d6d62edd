"""Tacotron2 tests: forward loss, grads, AR inference."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.tacotron2 import Tacotron2


def tiny():
    return Tacotron2(idim=8, odim=6, embed_dim=16, elayers_convs=1,
                     econv_chans=16, econv_kernel=3, blstm_units=16,
                     prenet_units=8, dlayers_units=16, att_dim=8,
                     postnet_layers=2, postnet_chans=8, dropout_rate=0.0,
                     max_frames=20)


def test_tacotron2_forward():
    model = tiny()
    text = jnp.asarray([[1, 2, 3, 0]]); tl = jnp.asarray([3])
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 12, 6), jnp.float32)
    fl = jnp.asarray([10])
    params = model.init({"params": jax.random.PRNGKey(0)}, text, tl, feats,
                        fl)
    loss, stats, w = model.apply(params, text, tl, feats, fl)
    assert np.isfinite(float(loss))
    for k in ("l1_loss", "mse_loss", "bce_loss"):
        assert k in stats

    g = jax.grad(lambda p: model.apply(p, text, tl, feats, fl)[0])(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_tacotron2_inference():
    model = tiny()
    text = jnp.asarray([[1, 2, 3]]); tl = jnp.asarray([3])
    feats = jnp.zeros((1, 12, 6)); fl = jnp.asarray([12])
    params = model.init({"params": jax.random.PRNGKey(0)}, text, tl, feats,
                        fl)
    mel, olens = model.apply(params, text, tl, method=model.inference,
                             max_frames=15)
    assert mel.shape == (1, 15, 6)
    assert 1 <= int(olens[0]) <= 15
    assert np.isfinite(np.asarray(mel)).all()
