"""Fused Pallas log-mel kernel: interpret-mode parity vs the XLA ops."""

import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.mel import log_mel
from espnet_tpu.ops.pallas.logmel_kernel import fused_logmel
from espnet_tpu.ops.stft import stft_power


def test_fused_logmel_matches_xla_ops():
    x = np.random.RandomState(0).randn(2, 20000).astype(np.float32)
    out = fused_logmel(jnp.asarray(x), fs=16000, n_fft=512, hop_length=128,
                       n_mels=80, interpret=True)
    p, _ = stft_power(jnp.asarray(x), None, n_fft=512, hop_length=128)
    ref = log_mel(p, fs=16000, n_fft=512, n_mels=80)
    T = ref.shape[1]
    assert out.shape[1] >= T and out.shape[2] == 80
    np.testing.assert_allclose(np.asarray(out[:, :T]), np.asarray(ref),
                               atol=1e-5)


def test_fused_logmel_small_config():
    x = np.random.RandomState(1).randn(1, 3000).astype(np.float32)
    out = fused_logmel(jnp.asarray(x), fs=8000, n_fft=128, hop_length=64,
                       n_mels=20, interpret=True)
    p, _ = stft_power(jnp.asarray(x), None, n_fft=128, hop_length=64)
    ref = log_mel(p, fs=8000, n_fft=128, n_mels=20)
    T = ref.shape[1]
    np.testing.assert_allclose(np.asarray(out[:, :T]), np.asarray(ref),
                               atol=1e-5)
