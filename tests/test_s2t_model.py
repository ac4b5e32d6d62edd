"""S2T (OWSM-style) prev-conditioned multitask model
(espnet2/s2t/espnet_model.py:411-447 semantics)."""

import jax
import numpy as np
import pytest

SOS, EOS, SOP, NA, IGN = 9, 9, 8, 7, -1


def _ref_io(text, lt, prev, lp):
    """Reference-semantics python loop (espnet_model.py:421-447)."""
    ys_in, ys_out, lens = [], [], []
    for y, n, p, m in zip(text, lt, prev, lp):
        y, p = list(y[:n]), list(p[:m])
        if NA in p:
            yi = [SOS] + y
            yo = y + [EOS]
        else:
            yi = [SOP] + p + [SOS] + y
            yo = [IGN] * (len(p) + 1) + y + [EOS]
        lens.append(len(yi))
        ys_in.append(yi)
        ys_out.append(yo)
    M = text.shape[1] + prev.shape[1] + 2
    return (np.array([r + [EOS] * (M - len(r)) for r in ys_in]),
            np.array([r + [IGN] * (M - len(r)) for r in ys_out]),
            np.array(lens))


def test_build_conditioned_io_matches_reference_loop():
    from espnet_tpu.models.s2t import build_conditioned_io
    rng = np.random.RandomState(0)
    B, Lt, Lp = 5, 6, 4
    text = rng.randint(1, 7, (B, Lt)).astype(np.int32)
    lt = np.array([6, 3, 1, 5, 2], np.int32)
    prev = rng.randint(1, 7, (B, Lp)).astype(np.int32)
    prev[1, 1] = NA  # row 1: prev unavailable
    prev[4, 0] = NA  # row 4: prev unavailable
    lp = np.array([4, 3, 2, 0, 1], np.int32)
    got_in, got_out, got_len = build_conditioned_io(
        text, lt, prev, lp, SOS, EOS, SOP, NA, IGN)
    ref_in, ref_out, ref_len = _ref_io(text, lt, prev, lp)
    np.testing.assert_array_equal(np.asarray(got_len), ref_len)
    for b in range(B):
        n = ref_len[b]
        np.testing.assert_array_equal(np.asarray(got_in)[b, :n],
                                      ref_in[b, :n], err_msg=f"row {b} in")
        # scored region: everything up to and including <eos>
        np.testing.assert_array_equal(np.asarray(got_out)[b, :n],
                                      ref_out[b, :n], err_msg=f"row {b} out")
        assert np.all(np.asarray(got_out)[b, n:] == IGN)


def test_s2t_model_forward_and_task():
    from espnet_tpu.tasks.misc import S2TTask
    tokens = ["<blank>", "a", "b", "c", "<na>", "<sop>", "<sos/eos>"]
    cfg = dict(S2TTask.task_defaults())
    cfg.update(token_list=tokens, frontend="none",
               encoder="transformer",
               encoder_conf=dict(output_size=16, attention_heads=2,
                                 linear_units=32, num_blocks=1,
                                 input_layer="linear", input_size=5),
               decoder_conf=dict(attention_heads=2, linear_units=32,
                                 num_blocks=1),
               model_conf={"ctc_weight": 0.3})
    model = S2TTask.build_model(cfg)
    assert model.sop_id == 5 and model.na_id == 4
    batch = {
        "speech": np.random.RandomState(0).randn(2, 12, 5).astype(np.float32),
        "speech_lengths": np.full((2,), 12, np.int32),
        "text": np.ones((2, 4), np.int32),
        "text_lengths": np.array([4, 2], np.int32),
        "text_prev": np.array([[2, 3], [4, 0]], np.int32),  # row1 has <na>
        "text_prev_lengths": np.array([2, 1], np.int32),
        "text_ctc": np.ones((2, 4), np.int32),
        "text_ctc_lengths": np.array([4, 2], np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)
    loss, stats, w = model.apply(params, **batch)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(stats["loss_ctc"]))
    assert float(w) == 2.0


def test_s2t_preprocessor_tokenizes_all_text_fields():
    from espnet_tpu.tasks.misc import S2TTask
    cfg = dict(S2TTask.task_defaults())
    cfg.update(token_list=["<blank>", "a", "b", "<space>", "<sos/eos>"],
               token_type="char")
    fn = S2TTask.build_preprocess_fn(cfg, train=False)
    out = fn("u1", {"text": "ab", "text_prev": "ba", "text_ctc": "aa"})
    assert out["text"].tolist() == [1, 2]
    assert out["text_prev"].tolist() == [2, 1]
    assert out["text_ctc"].tolist() == [1, 1]
