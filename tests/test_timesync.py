"""Time-synchronous CTC prefix beam search vs a literal dict-based
reference implementation (beam_search_timesync.py semantics)."""

import math

import numpy as np
import pytest


def ref_ctc_prefix_beam(logp, beam, blank=0):
    """Classic dict-based CTC prefix beam search (Hannun et al.), the
    python-object analogue of the reference's per-frame prefix dicts."""
    def lse(*xs):
        m = max(xs)
        if m == -math.inf:
            return -math.inf
        return m + math.log(sum(math.exp(x - m) for x in xs))

    T, V = logp.shape
    beams = {(): (0.0, -math.inf)}  # prefix -> (p_b, p_nb)
    for t in range(T):
        new = {}

        def add(pref, pb, pnb):
            opb, opnb = new.get(pref, (-math.inf, -math.inf))
            new[pref] = (lse(opb, pb), lse(opnb, pnb))

        for pref, (pb, pnb) in beams.items():
            last = pref[-1] if pref else None
            # stay: blank, or repeat last
            add(pref, lse(pb, pnb) + logp[t, blank],
                (pnb + logp[t, last]) if last is not None else -math.inf)
            for v in range(V):
                if v == blank:
                    continue
                base = pb if v == last else lse(pb, pnb)
                add(pref + (v,), -math.inf, base + logp[t, v])
        beams = dict(sorted(new.items(),
                            key=lambda kv: -lse(*kv[1]))[:beam])
    return sorted(((list(p), lse(*v)) for p, v in beams.items()),
                  key=lambda h: -h[1])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_reference_impl(seed):
    """With identical beam and no token pruning, the on-device scan must
    reproduce the dict reference: same prefixes, same log probs."""
    from espnet_tpu.decode.timesync import ctc_prefix_beam_search
    rng = np.random.RandomState(seed)
    T, V, beam = 7, 5, 6
    logits = rng.randn(1, T, V).astype(np.float32) * 2.0
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    pre, plen, scores = ctc_prefix_beam_search(
        logp, np.asarray([T]), beam=beam, width=V, blank=0)
    ref = ref_ctc_prefix_beam(logp[0], beam, blank=0)
    got = [(pre[0, k, :plen[0, k]].tolist(), float(scores[0, k]))
           for k in range(beam)]
    got = [g for g in got if g[1] > -1e9]
    for (g_ids, g_s), (r_ids, r_s) in zip(got, ref[:len(got)]):
        assert g_ids == r_ids, (got, ref)
        assert g_s == pytest.approx(r_s, rel=1e-4, abs=1e-4)


def test_length_masking():
    """Frames past the true length must not change the result."""
    from espnet_tpu.decode.timesync import ctc_prefix_beam_search
    rng = np.random.RandomState(3)
    T, V = 6, 4
    logits = rng.randn(1, T, V).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    full = np.concatenate(
        [logp, rng.randn(1, 4, V).astype(np.float32)], axis=1)
    a = ctc_prefix_beam_search(logp, np.asarray([T]), beam=4, width=V)
    b = ctc_prefix_beam_search(full, np.asarray([T]), beam=4, width=V)
    np.testing.assert_allclose(a[2], b[2], atol=1e-5)
    assert (a[0][:, :, :a[0].shape[2]] ==
            b[0][:, :, :a[0].shape[2]]).all()


def test_timesync_hybrid_rescoring():
    """BeamSearchTimeSync end-to-end on a tiny hybrid model."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.decode.timesync import BeamSearchTimeSync
    from espnet_tpu.models.asr import ASRModel
    tokens = ("<blank>", "a", "b", "c", "<sos/eos>")
    model = ASRModel(
        vocab_size=5, token_list=tokens, frontend_conf=None,
        encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=1,
                          input_layer="linear", input_size=6),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1),
        ctc_weight=0.5)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 10, 6),
                        jnp.float32)
    flens = jnp.asarray([10, 8])
    params = model.init(jax.random.PRNGKey(0), feats, flens,
                        jnp.asarray([[1, 2], [2, 1]]), jnp.asarray([2, 2]))
    enc, enc_lens = model.apply(params, feats, flens, method=model.encode)
    bs = BeamSearchTimeSync(model, params, beam_size=4, ctc_weight=0.5)
    results = bs(enc, enc_lens, nbest=2)
    assert len(results) == 2
    for hyps in results:
        assert hyps and all(np.isfinite(s) for _, s in hyps)
        # eos/blank-free token ids
        for ids, _ in hyps:
            assert all(0 <= t < 5 for t in ids)
