"""Benchmark: batched hybrid ASR decode RTF on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the north-star path (BASELINE.md): frontend -> Conformer
encoder -> on-device batched CTC/attention beam search, on synthetic
16 kHz audio. Metric = inverse RTF (seconds of audio processed per
wall-second per chip; higher is better).

vs_baseline: ESPnet publishes no in-tree RTF; a typical published
espnet2 GPU decode RTF for comparable Conformer+BatchBeamSearch setups
is ~0.1 (10x realtime) — used as the nominal baseline.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_INV_RTF = 10.0  # nominal reference: RTF 0.1 on GPU


def main():
    import jax
    import jax.numpy as jnp
    from espnet_tpu.decode.beam_search import BeamSearchConfig, _beam_search_device
    from espnet_tpu.models.asr import ASRModel
    import functools

    model = ASRModel(
        vocab_size=256,
        frontend_conf=dict(n_fft=512, hop_length=128, n_mels=80),
        encoder="conformer",
        encoder_conf=dict(output_size=256, attention_heads=4,
                          linear_units=1024, num_blocks=12,
                          cnn_module_kernel=15),
        decoder_conf=dict(attention_heads=4, linear_units=1024, num_blocks=6),
        ctc_weight=0.3)

    B, secs, fs = 8, 10.0, 16000
    S = int(secs * fs)
    rng = np.random.RandomState(0)
    speech = rng.randn(B, S).astype(np.float32) * 0.1
    speech_lengths = np.full((B,), S, np.int32)
    params = model.init(jax.random.PRNGKey(0), speech[:1], speech_lengths[:1],
                        np.ones((1, 8), np.int32), np.asarray([8], np.int32))

    config = BeamSearchConfig(beam_size=10, ctc_weight=0.3, maxlenratio=0.15)

    encode = jax.jit(lambda p, s, sl: model.apply(
        p, s, sl, deterministic=True, method=model.encode))

    enc, enc_lens = encode(params, speech, speech_lengths)
    Tenc = enc.shape[1]
    maxlen = max(int(config.maxlenratio * Tenc), 2)
    search = jax.jit(functools.partial(
        _beam_search_device, model=model, config=config, maxlen=maxlen,
        lm=None))

    def decode_once():
        enc, enc_lens = encode(params, speech, speech_lengths)
        y, l, s, _steps = search(params, enc, enc_lens, None)
        jax.block_until_ready(s)

    decode_once()  # compile
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        decode_once()
    dt = (time.perf_counter() - t0) / n_iter
    audio_secs = B * secs
    inv_rtf = audio_secs / dt
    print(json.dumps({
        "metric": "asr_decode_audio_secs_per_sec",
        "value": round(inv_rtf, 2),
        "unit": "audio_s/s per chip (Conformer-12L beam10 hybrid)",
        "vs_baseline": round(inv_rtf / BASELINE_INV_RTF, 2),
    }))


if __name__ == "__main__":
    main()
