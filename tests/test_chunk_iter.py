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
