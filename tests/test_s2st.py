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


def test_spectral_s2st_translatotron():
    """Translatotron-style direct speech->spectrogram S2ST: synthesis +
    aux ST CE + aux ASR CTC losses, and AR spectral inference."""
    import jax
    from espnet_tpu.models.s2st import SpectralS2STModel
    model = SpectralS2STModel(
        src_vocab_size=7, tgt_vocab_size=9,
        frontend_conf=dict(n_fft=128, hop_length=64, n_mels=20),
        encoder="transformer",
        encoder_conf=dict(output_size=32, attention_heads=2,
                          linear_units=64, num_blocks=1),
        synthesizer_conf=dict(prenet_units=16, dlayers_units=32,
                              att_dim=16, postnet_layers=2,
                              postnet_chans=16, max_frames=12),
        tgt_feats_conf=dict(n_fft=128, hop_length=64, n_mels=20))
    B = 2
    batch = dict(
        src_speech=np.random.RandomState(0).randn(B, 1600).astype(np.float32),
        src_speech_lengths=np.asarray([1600, 1200], np.int32),
        tgt_speech=np.random.RandomState(1).randn(B, 1600).astype(np.float32),
        tgt_speech_lengths=np.asarray([1600, 800], np.int32),
        tgt_text=np.ones((B, 4), np.int32),
        tgt_text_lengths=np.asarray([4, 2], np.int32),
        src_text=np.ones((B, 3), np.int32),
        src_text_lengths=np.asarray([3, 2], np.int32))
    params = model.init(jax.random.PRNGKey(0), **batch)
    loss, stats, w = model.apply(params, **batch)
    assert np.isfinite(float(loss))
    for k in ("synth_l1_loss", "loss_st", "loss_asr_ctc"):
        assert np.isfinite(float(stats[k])), k
    mel, olens = model.apply(
        params, batch["src_speech"], batch["src_speech_lengths"],
        max_frames=8, method=model.inference)
    assert mel.shape == (B, 8, 20)
    assert int(olens.max()) <= 8


def test_translatotron2_model():
    """Translatotron2 (s2st/synthesizer/translatotron2.py:20 role):
    NAR duration-upsampled synthesis over target-phoneme decoder
    states; forward + grad finite, Gaussian upsampling covers tokens."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.models.s2st import (GaussianUpsampling,
                                        Translatotron2Model)
    up = GaussianUpsampling()
    hs = jnp.asarray(np.eye(3, 4)[None], jnp.float32)      # (1, 3, 4)
    d = jnp.asarray([[2, 2, 2]], jnp.int32)
    p = up.init(jax.random.PRNGKey(0), hs, d, 6)
    out = up.apply(p, hs, d, 6)
    # frame 1 belongs to token 0, frame 3 to token 1 (soft)
    assert float(out[0, 0, 0]) > 0.5 and float(out[0, 3, 1]) > 0.5
    rng = np.random.RandomState(0)
    model = Translatotron2Model(
        tgt_vocab_size=6,
        frontend_conf={"n_fft": 256, "hop_length": 128, "n_mels": 20},
        encoder="transformer",
        encoder_conf={"output_size": 16, "attention_heads": 2,
                      "linear_units": 32, "num_blocks": 1,
                      "input_layer": "linear"},
        synthesizer_conf={"layers": 1, "units": 16,
                          "duration_chans": 16},
        tgt_feats_conf={"n_fft": 256, "hop_length": 128, "n_mels": 12})
    b = {"src_speech": jnp.asarray(rng.randn(2, 3000) * 0.1, jnp.float32),
         "src_speech_lengths": jnp.asarray([3000, 2600], jnp.int32),
         "tgt_speech": jnp.asarray(rng.randn(2, 3000) * 0.1, jnp.float32),
         "tgt_speech_lengths": jnp.asarray([3000, 2600], jnp.int32),
         "tgt_text": jnp.asarray([[1, 2, 1], [2, 1, -1]], jnp.int32),
         "tgt_text_lengths": jnp.asarray([3, 2], jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), **b)
    loss, stats, _ = model.apply(params, **b)
    assert np.isfinite(float(loss)) and "synth_l1" in stats
    g = jax.grad(lambda p: model.apply(p, **b)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_unity_two_pass_model():
    """UnitY (unity_synthesizer.py role): text first pass + unit second
    pass over first-pass hidden states; both CEs train."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.models.s2st import UnityS2STModel
    rng = np.random.RandomState(0)
    model = UnityS2STModel(
        tgt_vocab_size=6, unit_vocab_size=10,
        frontend_conf={"n_fft": 256, "hop_length": 128, "n_mels": 20},
        encoder="transformer",
        encoder_conf={"output_size": 16, "attention_heads": 2,
                      "linear_units": 32, "num_blocks": 1,
                      "input_layer": "linear"})
    b = {"src_speech": jnp.asarray(rng.randn(2, 3000) * 0.1, jnp.float32),
         "src_speech_lengths": jnp.asarray([3000, 2600], jnp.int32),
         "tgt_text": jnp.asarray([[1, 2, 1], [2, 1, -1]], jnp.int32),
         "tgt_text_lengths": jnp.asarray([3, 2], jnp.int32),
         "units": jnp.asarray([[3, 4, 5, 3], [4, 3, -1, -1]], jnp.int32),
         "units_lengths": jnp.asarray([4, 2], jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), **b)
    loss, stats, _ = model.apply(params, **b)
    assert np.isfinite(float(loss))
    assert "unit_ce" in stats and "text_ce" in stats
    g = jax.grad(lambda p: model.apply(p, **b)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
