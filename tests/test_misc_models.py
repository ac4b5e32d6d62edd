"""Tests: monotonic align vs brute-force DP, HuBERT SSL, codec RVQ."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.codec import CodecModel
from espnet_tpu.models.ssl import HubertModel, span_mask
from espnet_tpu.ops.monotonic_align import maximum_path


def np_maximum_path(value, S, T):
    """Reference Viterbi DP (double loop)."""
    score = np.full((S, T), -np.inf)
    back = np.zeros((S, T), bool)
    score[0, 0] = value[0, 0]
    for t in range(1, T):
        for s in range(min(t + 1, S)):
            stay = score[s, t - 1]
            adv = score[s - 1, t - 1] if s > 0 else -np.inf
            if adv > stay:
                score[s, t] = adv + value[s, t]
                back[s, t] = True
            else:
                score[s, t] = stay + value[s, t]
    path = np.zeros((S, T))
    s = S - 1
    for t in range(T - 1, -1, -1):
        path[s, t] = 1
        if t > 0 and back[s, t]:
            s -= 1
    return path


def test_maximum_path_matches_bruteforce():
    rng = np.random.RandomState(0)
    B, S, T = 3, 5, 11
    value = rng.randn(B, S, T).astype(np.float32)
    tl = np.asarray([5, 3, 4])
    fl = np.asarray([11, 8, 4])
    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(tl),
                                   jnp.asarray(fl)))
    for b in range(B):
        ref = np_maximum_path(value[b, :tl[b], :fl[b]], tl[b], fl[b])
        np.testing.assert_allclose(path[b, :tl[b], :fl[b]], ref,
                                   err_msg=f"b={b}")
        # zero outside valid region
        assert path[b, :, fl[b]:].sum() == 0


def test_maximum_path_is_valid_alignment():
    rng = np.random.RandomState(1)
    value = rng.randn(2, 4, 9).astype(np.float32)
    tl = np.asarray([4, 2]); fl = np.asarray([9, 6])
    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(tl),
                                   jnp.asarray(fl)))
    for b in range(2):
        p = path[b, :tl[b], :fl[b]]
        assert (p.sum(axis=0) == 1).all()       # each frame one token
        s_idx = p.argmax(axis=0)
        assert (np.diff(s_idx) >= 0).all()       # monotone
        assert s_idx[0] == 0 and s_idx[-1] == tl[b] - 1
        assert (p.sum(axis=1) >= 1).all()        # surjective


def test_span_mask():
    rng = jax.random.PRNGKey(0)
    m = span_mask(rng, 4, 100, jnp.asarray([100, 80, 100, 50]),
                  mask_prob=0.1, mask_length=5)
    m = np.asarray(m)
    assert m.shape == (4, 100)
    assert m[1, 80:].sum() == 0  # no masks beyond length
    assert m.sum() > 0


def test_hubert_model():
    model = HubertModel(
        num_classes=10,
        frontend_conf=dict(n_fft=128, hop_length=64, n_mels=12),
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear"))
    sp = jnp.asarray(np.random.RandomState(0).randn(2, 2048), jnp.float32)
    sl = jnp.asarray([2048, 1500])
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 10, (2, 40)))
    ll = jnp.asarray([33, 24])
    params = model.init(jax.random.PRNGKey(0), sp, sl, labels, ll)
    loss, stats, _ = model.apply(
        params, sp, sl, labels, ll, deterministic=False,
        rngs={"mask": jax.random.PRNGKey(1),
              "dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))
    assert "acc_masked" in stats
    enc, olens = model.apply(params, sp, sl, method=model.encode)
    assert enc.shape[0] == 2


def test_codec_roundtrip():
    model = CodecModel(fs=8000, channels=8, strides=(2, 4), code_dim=16,
                       num_quantizers=2, codebook_size=16)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 512) * 0.3,
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), wav)
    loss, stats, _ = model.apply(params, wav)
    assert np.isfinite(float(loss))
    codes = model.apply(params, wav, method=model.encode)
    assert codes.shape == (2, 64, 2)  # 512 / 8
    assert codes.dtype == jnp.int32 or codes.dtype == jnp.int64
    recon = model.apply(params, codes, method=model.decode)
    assert recon.shape == (2, 512)
    # gradient flows through straight-through quantizer to encoder
    g = jax.grad(lambda p: model.apply(p, wav)[0])(params)
    enc_leaves = jax.tree_util.tree_leaves(g["params"]["encoder"])
    assert any(float(jnp.abs(l).max()) > 0 for l in enc_leaves)


def test_spk_eer_valid_hook(tmp_path):
    """SpkTask's per-epoch EER-on-trials validation hook
    (spk_trainer.py role): embeds trial utts, scores cosine, reports
    eer/min_dcf."""
    import jax
    from espnet_tpu.data.fileio import write_wav
    from espnet_tpu.tasks.spk import SpeakerTask

    rng = np.random.RandomState(0)
    wavdir = tmp_path / "wav"
    wavdir.mkdir()
    lines = []
    for u in ("a", "b", "c"):
        w = rng.randn(3000).astype(np.float32) * 0.1
        write_wav(wavdir / f"{u}.wav", 16000, w)
        lines.append(f"{u} {wavdir}/{u}.wav")
    (tmp_path / "wav.scp").write_text("\n".join(lines) + "\n")
    (tmp_path / "trials").write_text("1 a b\n0 a c\n1 b c\n")
    cfg = dict(SpeakerTask.task_defaults())
    cfg.update(valid_trial=str(tmp_path / "trials"),
               valid_trial_scp=str(tmp_path / "wav.scp"),
               frontend_conf={"n_fft": 256, "hop_length": 128, "n_mels": 20},
               encoder_conf={"channels": 16, "num_blocks": 1},
               embed_dim=8, n_spk=2)
    model = SpeakerTask.build_model(cfg)
    fn = SpeakerTask.build_extra_valid_fn(cfg, model)
    assert fn is not None
    params = model.init(jax.random.PRNGKey(0),
                        **SpeakerTask.example_batch(cfg))
    stats = fn(params, 1)
    assert 0.0 <= stats["eer"] <= 1.0
    assert 0.0 <= stats["min_dcf"] <= 1.0
    assert SpeakerTask.build_extra_valid_fn({}, model) is None


@pytest.mark.parametrize("ctype", ["encodec", "dac"])
def test_codec_variants_roundtrip(ctype):
    """Encodec (LSTM bottleneck + SEANet units + ms-STFT loss) and DAC
    (snake + factorized L2 codebooks) variants train and roundtrip
    (gan_codec/{encodec,dac} contract)."""
    model = CodecModel(codec_type=ctype, channels=8,
                       strides=(2, 2, 4), code_dim=16,
                       num_quantizers=2, codebook_size=16)
    wav = np.random.RandomState(0).randn(2, 1600).astype(np.float32) * 0.3
    params = model.init(jax.random.PRNGKey(0), wav)
    loss, stats, _ = model.apply(params, wav)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(p, wav)[0])(params)
    assert all(np.all(np.isfinite(x))
               for x in jax.tree_util.tree_leaves(g))
    codes = model.apply(params, wav[:, :1600 // 16 * 16],
                        method=model.encode)
    assert codes.shape[-1] == 2
    out = model.apply(params, codes, method=model.decode)
    assert out.shape[0] == 2
