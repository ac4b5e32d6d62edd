"""Whisper flax implementation vs HuggingFace torch (random weights)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_whisper():
    cfg = transformers.WhisperConfig(
        vocab_size=64, num_mel_bins=16, d_model=32,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=48, decoder_ffn_dim=48,
        max_source_positions=40, max_target_positions=16,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1)
    torch.manual_seed(0)
    return transformers.WhisperModel(cfg).eval(), cfg


def test_encoder_parity(tiny_whisper):
    import jax
    import jax.numpy as jnp

    from espnet_tpu.frontends.whisper import (WhisperEncoder,
                                              convert_whisper_torch)
    hf, cfg = tiny_whisper
    T = 80  # mel frames (HF expects max_source_positions*2)
    mel = np.random.RandomState(0).randn(2, cfg.num_mel_bins, T) \
        .astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    enc = WhisperEncoder(n_mels=cfg.num_mel_bins, d_model=cfg.d_model,
                         n_heads=2, n_layers=2, ffn_dim=48,
                         max_positions=cfg.max_source_positions)
    params = convert_whisper_torch(hf.encoder, n_layers=2)
    got, olens = enc.apply(params, jnp.asarray(mel.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_decoder_parity(tiny_whisper):
    import jax.numpy as jnp

    from espnet_tpu.frontends.whisper import (WhisperDecoder,
                                              convert_whisper_torch)
    hf, cfg = tiny_whisper
    B, U, Te = 2, 5, 8
    enc = np.random.RandomState(1).randn(B, Te, cfg.d_model) \
        .astype(np.float32) * 0.3
    toks = np.asarray([[1, 5, 9, 3, 2], [4, 4, 7, 0, 1]], np.int64)
    with torch.no_grad():
        ref_h = hf.decoder(
            input_ids=torch.from_numpy(toks),
            encoder_hidden_states=torch.from_numpy(enc)
        ).last_hidden_state.numpy()
        ref_logits = ref_h @ hf.decoder.embed_tokens.weight.numpy().T
    dec = WhisperDecoder(vocab_size=cfg.vocab_size, d_model=cfg.d_model,
                         n_heads=2, n_layers=2, ffn_dim=48,
                         max_positions=cfg.max_target_positions)
    params = convert_whisper_torch(hf.decoder, n_layers=2, decoder=True)
    got = dec.apply(params, jnp.asarray(toks.astype(np.int32)),
                    jnp.asarray(enc))
    np.testing.assert_allclose(np.asarray(got), ref_logits, atol=3e-4,
                               rtol=3e-3)


def test_whisper_frontend_shapes():
    import jax
    import jax.numpy as jnp

    from espnet_tpu.frontends.whisper import WhisperFrontend
    fe = WhisperFrontend(n_mels=16, d_model=32, n_heads=2, n_layers=1,
                         ffn_dim=48, fs=8000)
    speech = jnp.asarray(
        np.random.RandomState(0).randn(2, 4000) * 0.1, jnp.float32)
    lens = jnp.asarray([4000, 3000], jnp.int32)
    params = fe.init(jax.random.PRNGKey(0), speech, lens)
    out, olens = fe.apply(params, speech, lens)
    assert out.ndim == 3 and out.shape[-1] == 32
    assert int(olens[1]) <= int(olens[0])


def test_whisper_frontend_in_asr_model():
    import jax
    import jax.numpy as jnp

    from espnet_tpu.models.asr import ASRModel
    m = ASRModel(
        vocab_size=6, frontend="whisper",
        frontend_conf={"n_mels": 16, "d_model": 32, "n_heads": 2,
                       "n_layers": 1, "ffn_dim": 48, "fs": 8000},
        encoder="transformer",
        encoder_conf={"output_size": 16, "attention_heads": 2,
                      "linear_units": 32, "num_blocks": 1,
                      "input_layer": "linear"},
        decoder=None, ctc_weight=1.0)
    speech = jnp.asarray(
        np.random.RandomState(0).randn(2, 4000) * 0.1, jnp.float32)
    lens = jnp.asarray([4000, 3200], jnp.int32)
    text = jnp.asarray([[1, 2], [3, 1]], jnp.int32)
    tlens = jnp.asarray([2, 2], jnp.int32)
    params = m.init(jax.random.PRNGKey(0), speech, lens, text, tlens)
    loss, stats, w = m.apply(params, speech, lens, text, tlens)
    assert np.isfinite(float(loss))
