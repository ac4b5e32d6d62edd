"""S2ST unit-pipeline test: translation model + codec synthesis."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.codec import CodecModel
from espnet_tpu.models.s2st import Speech2Speech, UnitTranslationModel


def test_speech2speech_pipeline():
    model = UnitTranslationModel(
        vocab_size=20,  # units 0..15 at offset 1, plus specials
        frontend_conf=dict(n_fft=128, hop_length=64, n_mels=10),
        encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="conv2d2"),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1),
        ctc_weight=0.3)
    sp = jnp.asarray(np.random.RandomState(0).randn(1, 2000), jnp.float32)
    sl = jnp.asarray([2000])
    tx = jnp.asarray([[2, 3, 4]]); tl = jnp.asarray([3])
    params = model.init(jax.random.PRNGKey(0), sp, sl, tx, tl)
    loss, _, _ = model.apply(params, sp, sl, tx, tl)
    assert np.isfinite(float(loss))

    codec = CodecModel(fs=8000, channels=8, strides=(2, 4), code_dim=16,
                       num_quantizers=2, codebook_size=16)
    wav = jnp.asarray(np.random.RandomState(1).randn(1, 256) * 0.3,
                      jnp.float32)
    cparams = codec.init(jax.random.PRNGKey(1), wav)

    s2s = Speech2Speech(model, params, codec, cparams, beam_size=2,
                        maxlenratio=0.3)
    wavs = s2s(np.asarray(sp[0]))
    assert len(wavs) == 1
    assert wavs[0].ndim == 1 and len(wavs[0]) > 0
    assert np.isfinite(wavs[0]).all()
