"""_PhaseConv2d (stride-2 conv as shifted strided-slice matmuls) must be
a drop-in for nn.Conv: same param tree, same outputs, same gradients —
checkpoints trained either way stay interchangeable."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.nn.subsampling import Conv2dSubsampling, _PhaseConv2d

pytestmark = pytest.mark.smoke


def test_phaseconv_matches_nnconv():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 21, 40, 3)
                    .astype(np.float32))
    ref = nn.Conv(16, (3, 3), strides=(2, 2), padding="VALID")
    new = _PhaseConv2d(16, (3, 3), (2, 2))
    p = ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(ref.apply(p, x)),
                               np.asarray(new.apply(p, x)),
                               rtol=1e-4, atol=1e-4)
    gr = jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2))(p)
    gn = jax.grad(lambda p: jnp.sum(new.apply(p, x) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("rate", [2, 4, 6, 8])
def test_subsampling_rates_still_run(rate):
    sub = Conv2dSubsampling(odim=8, rate=rate)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 50, 20)
                    .astype(np.float32))
    lens = jnp.asarray([50, 31], np.int32)
    p = sub.init(jax.random.PRNGKey(0), x, lens)
    y, ol = sub.apply(p, x, lens)
    assert y.ndim == 3 and y.shape[-1] == 8
    assert int(ol[0]) >= int(ol[1]) > 0
