"""ChunkIterFactory tests."""

import functools

import numpy as np

from espnet_tpu.data.batching import common_collate_fn
from espnet_tpu.data.iterator import ChunkIterFactory


class FakeDS:
    def __init__(self):
        rng = np.random.RandomState(0)
        self.data = {f"u{i}": {
            "speech_mix": rng.randn(3000 + 500 * i).astype(np.float32),
            "speech_ref1": rng.randn(3000 + 500 * i).astype(np.float32),
        } for i in range(5)}

    def __getitem__(self, k):
        return k, self.data[k]


def test_chunk_iter_shapes_and_determinism():
    ds = FakeDS()
    f = ChunkIterFactory(ds, list(ds.data), common_collate_fn,
                         chunk_length=1000, batch_size=2,
                         num_chunks_per_utt=2, seed=7)
    batches = list(f.build_iter(epoch=1))
    assert sum(b[1]["speech_mix"].shape[0] for b in batches) == 10
    for uids, b in batches:
        assert b["speech_mix"].shape[1] == 1000
        assert b["speech_ref1"].shape[1] == 1000
    # reproducible per epoch
    b2 = list(f.build_iter(epoch=1))
    np.testing.assert_allclose(batches[0][1]["speech_mix"],
                               b2[0][1]["speech_mix"])
    # different epoch -> different chunks
    b3 = list(f.build_iter(epoch=2))
    assert not np.allclose(batches[0][1]["speech_mix"],
                           b3[0][1]["speech_mix"])


def test_multiple_iter_factory_chains_shards():
    """MultipleIterFactory: lazily-built shards chained per epoch,
    shard order shuffled by (seed, epoch)."""
    from espnet_tpu.data.iterator import MultipleIterFactory

    class _F:
        def __init__(self, tag):
            self.tag = tag

        def build_iter(self, epoch, shuffle=None):
            for i in range(2):
                yield ([f"{self.tag}{i}"], {"x": np.ones((1, 2))})

    mf = MultipleIterFactory([lambda: _F("a"), lambda: _F("b")],
                             shuffle=False)
    keys = [uids[0] for uids, _ in mf.build_iter(1)]
    assert keys == ["a0", "a1", "b0", "b1"]
    mf2 = MultipleIterFactory([lambda: _F("a"), lambda: _F("b")],
                              shuffle=True, seed=3)
    k1 = [u[0] for u, _ in mf2.build_iter(1)]
    k2 = [u[0] for u, _ in mf2.build_iter(1)]
    assert k1 == k2  # deterministic per epoch
    assert sorted(k1) == ["a0", "a1", "b0", "b1"]
