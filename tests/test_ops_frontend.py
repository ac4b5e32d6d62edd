"""Frontend op tests: STFT vs numpy reference DFT, mel filterbank
properties, masks, SpecAug invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.frontends.default import DefaultFrontend, GlobalMVN, UtteranceMVN
from espnet_tpu.ops.mel import mel_filterbank
from espnet_tpu.ops.specaug import mask_along_axis, specaug, time_warp
from espnet_tpu.ops.stft import hann_window, istft, stft
from espnet_tpu.utils.masks import make_non_pad_mask, make_pad_mask


def np_stft_ref(x, n_fft, hop, win_length=None):
    """Reference STFT: reflect pad + hann + rfft (torch.stft semantics)."""
    if win_length is None:
        win_length = n_fft
    pad = n_fft // 2
    x = np.pad(x, pad, mode="reflect")
    w = hann_window(win_length)
    wfull = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    wfull[off:off + win_length] = w
    n_frames = 1 + (len(x) - n_fft) // hop
    out = np.stack([np.fft.rfft(x[i * hop:i * hop + n_fft] * wfull)
                    for i in range(n_frames)])
    return out


def test_stft_matches_numpy_rfft():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 400).astype(np.float32)
    real, imag, olens = stft(jnp.asarray(x), jnp.asarray([400, 300]),
                             n_fft=128, hop_length=64)
    ref = np_stft_ref(x[0], 128, 64)
    np.testing.assert_allclose(np.asarray(real[0]), ref.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(imag[0]), ref.imag, atol=2e-3)
    # olens formula: (L + 2*pad - n_fft)//hop + 1
    assert int(olens[0]) == (400 + 128 - 128) // 64 + 1
    assert int(olens[1]) == (300 + 128 - 128) // 64 + 1


def test_stft_segmented_matches_gather_stft():
    """Segment-accumulate DFT (no frame gather) must equal the
    gather-based stft bit-for-bit up to matmul rounding, including at
    lengths that need tail padding to a whole hop chunk."""
    from espnet_tpu.ops.stft import stft_segmented

    rng = np.random.RandomState(3)
    for S in (400, 16000, 16001, 127):
        x = jnp.asarray(rng.randn(2, S).astype(np.float32))
        r0, i0, _ = stft(x, None, n_fft=128, hop_length=32)
        r1, i1 = stft_segmented(x, n_fft=128, hop_length=32)
        assert r0.shape == r1.shape
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(i0), np.asarray(i1), atol=1e-4)


def test_frontend_segmented_matches_never_path():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(3, 4000).astype(np.float32))
    lens = jnp.asarray([4000, 3000, 2000])
    f1, l1 = DefaultFrontend(n_fft=512, hop_length=128)(x, lens)
    f2, l2 = DefaultFrontend(n_fft=512, hop_length=128,
                             use_fused_kernel="never")(x, lens)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-4)


def test_stft_win_length_shorter():
    x = np.random.RandomState(1).randn(1, 512).astype(np.float32)
    real, imag, _ = stft(jnp.asarray(x), None, n_fft=256, win_length=200,
                         hop_length=100)
    ref = np_stft_ref(x[0], 256, 100, win_length=200)
    np.testing.assert_allclose(np.asarray(real[0]), ref.real, atol=2e-3)


def test_istft_roundtrip():
    x = np.random.RandomState(2).randn(2, 1024).astype(np.float32)
    real, imag, _ = stft(jnp.asarray(x), None, n_fft=256, hop_length=64)
    y = istft(real, imag, n_fft=256, hop_length=64, length=1024)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)


def test_mel_filterbank_properties():
    w = mel_filterbank(16000, 512, 80)  # (257, 80)
    assert w.shape == (257, 80)
    assert (w >= 0).all()
    # each filter has some support; slaney norm makes peak ~ 2/(width)
    assert (w.sum(axis=0) > 0).all()
    # filters are ordered in frequency: argmax increases monotonically
    peaks = w.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()


def test_mel_filterbank_matches_librosa_recorded():
    # recorded values from librosa.filters.mel(sr=16000, n_fft=512, n_mels=80)
    # via the published slaney algorithm; spot-check a few cells computed
    # independently by hand formula
    w = mel_filterbank(16000, 512, 80).T  # (80, 257)
    # filter 0 spans [0 Hz, mel bin 2]; its peak is at mel point 1
    assert w[0, 0] == 0.0
    # slaney norm: sum of each row * bin width ~ 2 / (hz width) * tri area = 1
    fft_freqs = np.linspace(0, 8000, 257)
    df = fft_freqs[1] - fft_freqs[0]
    areas = w.sum(axis=1) * df
    np.testing.assert_allclose(areas[5:70], 1.0, atol=0.15)


def test_default_frontend_shapes():
    fe = DefaultFrontend(fs=16000, n_fft=512, hop_length=128, n_mels=80)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 4000).astype(np.float32))
    feats, olens = fe(x, jnp.asarray([4000, 2000]))
    assert feats.shape[0] == 2 and feats.shape[2] == 80
    # padded region zeroed
    assert float(jnp.abs(feats[1, int(olens[1]):]).max()) == 0.0
    assert not np.isnan(np.asarray(feats)).any()


def test_global_mvn():
    stats_sum = np.zeros(4) + 10.0
    mvn = GlobalMVN.from_stats(np.array(10.0), stats_sum, stats_sum * 2 + 10.0)
    x = jnp.ones((1, 5, 4))
    y, _ = mvn(x, jnp.asarray([5]))
    assert y.shape == (1, 5, 4)
    assert not np.isnan(np.asarray(y)).any()


def test_utterance_mvn():
    x = jnp.asarray(np.random.RandomState(4).randn(2, 6, 3).astype(np.float32))
    y, _ = UtteranceMVN()(x, jnp.asarray([6, 4]))
    m = np.asarray(y[1, :4]).mean(axis=0)
    np.testing.assert_allclose(m, 0.0, atol=1e-5)
    assert np.abs(np.asarray(y[1, 4:])).max() == 0.0


def test_masks():
    m = make_pad_mask(jnp.asarray([2, 4]), 5)
    assert m.tolist() == [[False, False, True, True, True],
                          [False, False, False, False, True]]
    assert (np.asarray(make_non_pad_mask(jnp.asarray([2, 4]), 5)) == ~np.asarray(m)).all()


def test_specaug_shapes_and_zero_masks():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 50, 20))
    y = specaug(rng, x, jnp.asarray([50, 30]))
    assert y.shape == x.shape
    assert float(y.min()) == 0.0  # some mask applied
    assert not np.isnan(np.asarray(y)).any()


def test_mask_along_axis_freq():
    rng = jax.random.PRNGKey(1)
    x = jnp.ones((3, 10, 16))
    y = mask_along_axis(rng, x, None, axis=2, mask_width_range=(1, 5),
                        num_mask=2)
    # masked columns are fully zero across time
    col_zero = np.asarray((y == 0).all(axis=1))
    assert col_zero.any()


def test_time_warp_short_utt_passthrough():
    rng = jax.random.PRNGKey(2)
    x = jnp.asarray(np.random.RandomState(5).randn(1, 8, 4).astype(np.float32))
    y = time_warp(rng, x, jnp.asarray([8]), window=5)  # 8 < 2*5+2 -> identity
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))


def test_utterance_mvn_vars_only_matches_reference():
    """norm_means=False, norm_vars=True: reference utterance_mvn scales x
    by rsqrt(var) WITHOUT centering or restoring the mean (ADVICE r1)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 4) * 3 + 5, jnp.float32)
    lens = jnp.asarray([6, 4])
    y, _ = UtteranceMVN(norm_means=False, norm_vars=True)(x, lens)
    for b, L in enumerate([6, 4]):
        xs = np.asarray(x[b, :L])
        mean = xs.mean(0, keepdims=True)
        std = np.sqrt(((xs - mean) ** 2).mean(0, keepdims=True))
        np.testing.assert_allclose(np.asarray(y[b, :L]), xs / std,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(y[b, L:]), 0.0, atol=1e-6)


def test_istft_roundtrip_non_hop_multiple_length():
    """Lengths that are not a multiple of hop must round-trip exactly:
    torch.istft keeps the reconstructed tail when `length` is given
    (caught live: the old right-trim zeroed the last partial hop)."""
    for n_fft, hop, L in [(128, 64, 1003), (256, 64, 1003),
                          (512, 128, 1003), (256, 128, 999)]:
        x = np.random.RandomState(3).randn(2, L).astype(np.float32)
        real, imag, _ = stft(jnp.asarray(x), None, n_fft=n_fft,
                             hop_length=hop)
        y = istft(real, imag, n_fft=n_fft, hop_length=hop, length=L)
        np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)


def test_sliding_window_frontend():
    """windowing.py contract: raw framing, no window fn, trailing
    samples discarded."""
    from espnet_tpu.frontends.fused import SlidingWindowFrontend
    fe = SlidingWindowFrontend(win_length=400, hop_length=160)
    assert fe.output_size == 400
    x = jnp.asarray(np.random.RandomState(0).randn(2, 2000), jnp.float32)
    lens = jnp.asarray([2000, 1000])
    frames, olens = fe(x, lens)
    assert frames.shape == (2, (2000 - 400) // 160 + 1, 400)
    np.testing.assert_array_equal(np.asarray(olens), [11, 4])
    # frame content is the raw signal
    np.testing.assert_allclose(np.asarray(frames[0, 1]),
                               np.asarray(x[0, 160:560]), rtol=1e-6)


def test_fused_frontends_asr_model():
    """fused.py contract: two default frontends at different hops,
    projected and concatenated; trains through the ASR model."""
    import jax

    from espnet_tpu.models.asr import ASRModel
    model = ASRModel(
        vocab_size=12, frontend="fused",
        frontend_conf={"frontends": ({"frontend_type": "default",
                                      "n_fft": 128, "hop_length": 64,
                                      "n_mels": 20},
                                     {"frontend_type": "default",
                                      "n_fft": 256, "hop_length": 64,
                                      "n_mels": 24}),
                       "proj_dim": 16},
        encoder="transformer",
        encoder_conf={"output_size": 16, "attention_heads": 2,
                      "linear_units": 24, "num_blocks": 1},
        decoder="transformer",
        decoder_conf={"attention_heads": 2, "linear_units": 24,
                      "num_blocks": 1},
        specaug_conf=None, normalize=None)
    rng = np.random.RandomState(0)
    speech = jnp.asarray(rng.randn(2, 1600) * 0.1, jnp.float32)
    sl = jnp.asarray([1600, 1200])
    text = jnp.asarray([[1, 2, 3], [2, 3, 0]], jnp.int32)
    tl = jnp.asarray([3, 2])
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        speech, sl, text, tl, deterministic=False)
    loss, stats, w = model.apply(params, speech, sl, text, tl)
    assert np.isfinite(float(loss))
