"""hyp_primer forcing + reporter plots."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.decode.beam_search import BeamSearchConfig, batch_beam_search
from espnet_tpu.models.asr import ASRModel
from espnet_tpu.train.reporter import Reporter


def test_hyp_primer_forced():
    model = ASRModel(
        vocab_size=8, frontend_conf=None, encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear", input_size=5),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1),
        ctc_weight=0.0)
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 16, 5), jnp.float32)
    flens = jnp.asarray([16])
    params = model.init(jax.random.PRNGKey(0), feats, flens,
                        jnp.asarray([[1, 2]]), jnp.asarray([2]))
    enc, el = model.apply(params, feats, flens, method=model.encode)
    res = batch_beam_search(model, params, enc, el,
                            BeamSearchConfig(beam_size=2, ctc_weight=0.0,
                                             hyp_primer=(3, 5),
                                             maxlenratio=0.5))
    ids = res[0][0][0]
    assert ids[:2] == [3, 5]


def test_reporter_plot(tmp_path):
    r = Reporter()
    for e in (1, 2, 3):
        r.set_epoch(e)
        sub = r.start_epoch("train", e)
        sub.register({"loss": 3.0 / e})
        r.finish_epoch(sub)
    r.matplotlib_plot(tmp_path)
    assert (tmp_path / "loss.png").exists()
