"""SpeechLM tests: loss/grad, generation, codec round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.codec import CodecModel
from espnet_tpu.models.speechlm import SpeechLM


def test_speechlm_train_and_generate():
    model = SpeechLM(vocab_sizes=(16, 16), d_model=16, heads=2, units=32,
                     layers=1, dropout_rate=0.0)
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 16, (2, 12, 2)), jnp.int32)
    lens = jnp.asarray([12, 9])
    params = model.init(jax.random.PRNGKey(0), tokens, lens)
    loss, stats, _ = model.apply(params, tokens, lens)
    assert np.isfinite(float(loss)) and "ppl" in stats
    g = jax.grad(lambda p: model.apply(p, tokens, lens)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
    out = model.apply(params, tokens[:, :4], jnp.asarray([4, 4]), 3,
                      jax.random.PRNGKey(1), method=model.generate)
    assert out.shape == (2, 7, 2)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 16).all()


def test_speechlm_over_codec_codes():
    """Full chain: wav -> codec codes -> speechlm loss; continuation ->
    codec decode."""
    codec = CodecModel(fs=8000, channels=8, strides=(2, 4), code_dim=16,
                       num_quantizers=2, codebook_size=16)
    wav = jnp.asarray(np.random.RandomState(0).randn(1, 512) * 0.3,
                      jnp.float32)
    cparams = codec.init(jax.random.PRNGKey(0), wav)
    codes = codec.apply(cparams, wav, method=codec.encode)  # (1, 64, 2)
    lm = SpeechLM(vocab_sizes=(16, 16), d_model=16, heads=2, units=32,
                  layers=1, dropout_rate=0.0)
    lens = jnp.asarray([codes.shape[1]])
    lparams = lm.init(jax.random.PRNGKey(1), codes, lens)
    loss, _, _ = lm.apply(lparams, codes, lens)
    assert np.isfinite(float(loss))
    cont = lm.apply(lparams, codes[:, :16], jnp.asarray([16]), 8,
                    jax.random.PRNGKey(2), method=lm.generate)
    wav_out = codec.apply(cparams, cont, method=codec.decode)
    assert wav_out.shape[1] == 24 * 8
    assert np.isfinite(np.asarray(wav_out)).all()


def test_delay_pattern_roundtrip():
    """MusicGen delay interleave: shift-by-stream and exact inverse."""
    from espnet_tpu.models.speechlm import delay_pattern, undelay_pattern
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 9, (2, 5, 3)).astype(np.int32)
    d = delay_pattern(jnp.asarray(codes), pad=0)
    assert d.shape == (2, 7, 3)
    # stream q appears shifted by q
    np.testing.assert_array_equal(np.asarray(d[:, 2:7, 2]), codes[:, :, 2])
    back = undelay_pattern(d)
    np.testing.assert_array_equal(np.asarray(back), codes)


def test_multimodal_vocabulary_packing():
    from espnet_tpu.models.speechlm import MultimodalVocabulary
    v = MultimodalVocabulary({"text": 10, "codec_q0": 16, "codec_q1": 16})
    assert v.size == 3 + 10 + 16 + 16
    t = v.encode("text", np.asarray([0, 9]))
    c = v.encode("codec_q0", np.asarray([0, 15]))
    assert t.tolist() == [3, 12]
    assert c.tolist() == [13, 28]
    assert v.modality_of(13) == "codec_q0"
    assert v.modality_of(1) == "special"
    np.testing.assert_array_equal(
        np.asarray(v.decode("codec_q0", c)), [0, 15])
    seq = v.build_sequence(("text", np.asarray([1, 2])),
                           ("codec_q0", np.asarray([3])))
    assert seq.tolist() == [1, 4, 5, 16, 2]  # bos text+3 codec+13 eos
