"""HuggingFace interop (espnet2 parity rows: text/hugging_face_tokenizer,
asr/decoder/hugging_face_transformers_decoder.py, asr/frontend/
huggingface.py, lm/huggingface_pretrained_opt_lm.py).

Offline environment: everything builds from local files / architecture
configs — no hub downloads. The HF flax modules nest inside the repo's
flax models, so the whole stack trains through the one Trainer path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_tokenizer_file(tmp_path):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    vocab = {"[UNK]": 0, "hello": 1, "world": 2, "the": 3, "cat": 4}
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    p = tmp_path / "tokenizer.json"
    tok.save(str(p))
    return p


def test_hugging_face_tokenizer_local_file(tmp_path):
    from espnet_tpu.text.tokenizer import build_tokenizer
    p = _tiny_tokenizer_file(tmp_path)
    tok = build_tokenizer("hugging_face", bpemodel=str(p))
    toks = tok.text2tokens("hello world")
    assert toks == ["hello", "world"]
    assert tok.tokens2text(toks) == "hello world"


def test_hugging_face_tokenizer_hub_name_raises():
    from espnet_tpu.text.tokenizer import HuggingFaceTokenizer
    with pytest.raises(RuntimeError, match="offline"):
        HuggingFaceTokenizer("bert-base-uncased")


def test_hf_decoder_forward_and_score_step_consistency():
    """Teacher-forced logits and the step-wise scorer agree position by
    position (the batch_score re-runs-prefix contract)."""
    from espnet_tpu.nn.hf_decoder import HuggingFaceDecoder
    V, D = 11, 16
    dec = HuggingFaceDecoder(
        vocab_size=V, encoder_output_size=D,
        hf_config={"d_model": 16, "decoder_layers": 1,
                   "decoder_attention_heads": 2, "decoder_ffn_dim": 32,
                   "dropout": 0.0})
    rng = np.random.RandomState(0)
    B, Tenc, L = 2, 7, 4
    mem = jnp.asarray(rng.randn(B, Tenc, D), jnp.float32)
    mlens = jnp.asarray([7, 5], jnp.int32)
    ys = jnp.asarray(rng.randint(0, V, (B, L)), jnp.int32)
    ylens = jnp.asarray([L, L], jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), mem, mlens, ys, ylens)
    logits = dec.apply(params, mem, mlens, ys, ylens)
    assert logits.shape == (B, L, V)
    # step-wise scoring over the same prefix
    state = dec.apply(params, mem, mlens, batch=B, maxlen=L,
                      method=dec.init_state)
    for t in range(L):
        lp, state = dec.apply(params, ys[:, t], t, state,
                              method=dec.score_step)
        ref = jax.nn.log_softmax(logits[:, t], axis=-1)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ref),
                                   atol=1e-4)


def test_asr_model_with_hf_decoder_trains():
    from espnet_tpu.models.asr import ASRModel
    model = ASRModel(
        vocab_size=8, ctc_weight=0.3,
        frontend_conf={"n_fft": 128, "hop_length": 64, "n_mels": 20},
        encoder="transformer",
        encoder_conf={"output_size": 16, "attention_heads": 2,
                      "linear_units": 32, "num_blocks": 1},
        decoder="hugging_face",
        decoder_conf={"hf_config": {"d_model": 16, "decoder_layers": 1,
                                    "decoder_attention_heads": 2,
                                    "decoder_ffn_dim": 32}})
    rng = np.random.RandomState(0)
    b = {"speech": jnp.asarray(rng.randn(2, 2000) * 0.1, jnp.float32),
         "speech_lengths": jnp.asarray([2000, 1500], jnp.int32),
         "text": jnp.asarray([[1, 2, 3], [4, 5, -1]], jnp.int32),
         "text_lengths": jnp.asarray([3, 2], jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), **b)
    loss, stats, w = model.apply(params, **b)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(p, **b)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_asr_model_with_hf_frontend():
    from espnet_tpu.models.asr import ASRModel
    model = ASRModel(
        vocab_size=8, ctc_weight=1.0, decoder=None,
        frontend="hugging_face",
        frontend_conf={"hf_config": {"hidden_size": 32,
                                     "num_hidden_layers": 1,
                                     "num_attention_heads": 2,
                                     "intermediate_size": 64,
                                     "conv_dim": (16, 16),
                                     "conv_kernel": (10, 3),
                                     "conv_stride": (5, 2)}},
        encoder="transformer",
        encoder_conf={"output_size": 16, "attention_heads": 2,
                      "linear_units": 32, "num_blocks": 1})
    rng = np.random.RandomState(0)
    b = {"speech": jnp.asarray(rng.randn(2, 2000) * 0.1, jnp.float32),
         "speech_lengths": jnp.asarray([2000, 1500], jnp.int32),
         "text": jnp.asarray([[1, 2, 3], [4, 5, -1]], jnp.int32),
         "text_lengths": jnp.asarray([3, 2], jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), **b)
    loss, stats, w = model.apply(params, **b)
    assert np.isfinite(float(loss))


def test_hf_lm_nll_and_scorer():
    from espnet_tpu.models.lm import LanguageModel
    V = 9
    lm = LanguageModel(vocab_size=V, lm_type="hugging_face",
                       lm_conf={"hf_config": {"n_embd": 16, "n_layer": 1,
                                              "n_head": 2,
                                              "vocab_size": V}})
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, V - 1, (2, 5)), jnp.int32)
    tl = jnp.asarray([5, 3], jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), text, tl)
    loss, stats, w = lm.apply(params, text, tl)
    assert np.isfinite(float(loss))
    # scorer protocol: step-wise scoring runs and reorders
    state = lm.apply(params, 2, 8, method=lm.init_carry)
    lp0, state = lm.apply(params, text[:, 0], 0, state,
                          method=lm.score_step)
    lp1, state = lm.apply(params, text[:, 1], 1, state,
                          method=lm.score_step)
    assert lp0.shape == (2, V) and np.isfinite(np.asarray(lp1)).all()
    # select_state reorders rows
    state2 = lm.apply(params, state, jnp.asarray([1, 0]),
                      method=lm.select_state)
    np.testing.assert_array_equal(np.asarray(state2["ys"][0]),
                                  np.asarray(state["ys"][1]))
