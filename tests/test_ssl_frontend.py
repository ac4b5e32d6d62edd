"""SSL frontend + torch->flax conversion parity (VERDICT r1 missing #2:
wav2vec2/HuBERT frontend scaffolding, random-weight unit tests)."""

import jax
import numpy as np
import pytest


def test_wav2vec2_frontend_matches_hf_torch():
    """Flax Wav2Vec2Frontend with converted random HF weights must match
    transformers.Wav2Vec2Model outputs."""
    torch = pytest.importorskip("torch")
    tr = pytest.importorskip("transformers")
    from espnet_tpu.frontends.ssl_frontend import (Wav2Vec2Frontend,
                                                   convert_wav2vec2_torch,
                                                   load_into)
    cfg = tr.Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16), conv_kernel=(10, 3),
        conv_stride=(5, 2), num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        feat_extract_norm="group", do_stable_layer_norm=False,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0)
    tm = tr.Wav2Vec2Model(cfg).eval()
    S = 800
    x = np.random.RandomState(0).randn(2, S).astype(np.float32) * 0.1
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).last_hidden_state.numpy()

    fe = Wav2Vec2Frontend(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_conv_pos_embeddings=16, num_conv_pos_groups=2,
        layer_selection="last")
    lens = np.full((2,), S, np.int32)
    template = fe.init(jax.random.PRNGKey(0), x, lens)
    conv = convert_wav2vec2_torch(tm, num_layers=2, layer_selection="last")
    params = load_into(fe, conv, template)
    got, out_lens = fe.apply(params, x, lens)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_wav2vec2_frontend_weighted_sum_and_lengths():
    from espnet_tpu.frontends.ssl_frontend import Wav2Vec2Frontend
    fe = Wav2Vec2Frontend(hidden_size=16, num_layers=1, num_heads=2,
                          intermediate_size=24, conv_dim=(8, 8),
                          conv_kernel=(10, 3), conv_stride=(5, 2),
                          num_conv_pos_embeddings=8, num_conv_pos_groups=2,
                          layer_selection="weighted_sum")
    x = np.random.RandomState(1).randn(2, 640).astype(np.float32)
    lens = np.asarray([640, 400], np.int32)
    params = fe.init(jax.random.PRNGKey(0), x, lens)
    feats, olens = fe.apply(params, x, lens)
    assert feats.shape[0] == 2 and feats.shape[2] == 16
    assert int(olens[1]) < int(olens[0])
    # padded region zeroed
    assert float(np.abs(np.asarray(
        feats[1, int(olens[1]):])).max()) == 0.0
