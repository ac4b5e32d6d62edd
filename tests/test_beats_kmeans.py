"""BEATs masked patch prediction + k-means unit tooling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_patchify_roundtrip_shapes():
    from espnet_tpu.models.beats import patchify
    x = jnp.arange(2 * 12 * 8, dtype=jnp.float32).reshape(2, 12, 8)
    p, nt, nf = patchify(x, 4, 4)
    assert p.shape == (2, 3 * 2, 16)
    # first patch = rows 0-3, cols 0-3
    first = np.asarray(x[0, :4, :4]).reshape(-1)
    np.testing.assert_array_equal(np.asarray(p[0, 0]), first)


def test_random_projection_tokenizer_deterministic():
    from espnet_tpu.models.beats import RandomProjectionTokenizer
    tok = RandomProjectionTokenizer(codebook_size=32, code_dim=8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 16), jnp.float32)
    p = tok.init(jax.random.PRNGKey(0), x)
    a = tok.apply(p, x)
    b = tok.apply(p, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (2, 10)
    assert int(jnp.max(a)) < 32
    # labels use a decent part of the codebook
    assert len(np.unique(np.asarray(a))) > 3


def test_beats_loss_grads_and_frozen_tokenizer():
    import optax

    from espnet_tpu.models.beats import BeatsModel
    m = BeatsModel(frontend_conf={"n_fft": 128, "hop_length": 64,
                                  "n_mels": 16, "fs": 8000},
                   patch_t=2, patch_f=8,
                   encoder_conf={"output_size": 32, "attention_heads": 2,
                                 "linear_units": 48, "num_blocks": 1},
                   codebook_size=16, mask_ratio=0.5)
    speech = jnp.asarray(np.random.RandomState(0).randn(2, 2000) * 0.1,
                         jnp.float32)
    lens = jnp.asarray([2000, 1500], jnp.int32)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "mask": jax.random.PRNGKey(1)}, speech, lens)

    def loss_fn(p):
        loss, stats, w = m.apply(
            p, speech, lens, deterministic=False,
            rngs={"mask": jax.random.PRNGKey(2),
                  "dropout": jax.random.PRNGKey(3)})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert float(optax.global_norm(grads)) > 0
    # tokenizer params get ZERO gradient (frozen by stop_gradient)
    tg = grads["params"]["tokenizer"]
    assert all(float(jnp.abs(g).max()) == 0.0
               for g in jax.tree_util.tree_leaves(tg))
    # encode API
    enc, valid = m.apply(params, speech, lens, method=m.encode)
    assert enc.ndim == 3 and valid.shape == enc.shape[:2]


def test_beats_task_example_compiles():
    from espnet_tpu.tasks.ssl import BeatsTask
    cfg = BeatsTask.default_config()
    cfg.update({"frontend_conf": {"n_fft": 128, "hop_length": 64,
                                  "n_mels": 16, "fs": 8000},
                "patch_t": 2, "patch_f": 8, "codebook_size": 16,
                "encoder_conf": {"output_size": 32, "attention_heads": 2,
                                 "linear_units": 48, "num_blocks": 1}})
    m = BeatsTask.build_model(cfg)
    ex = BeatsTask.example_batch(cfg)
    p = m.init({"params": jax.random.PRNGKey(0),
                "mask": jax.random.PRNGKey(1)}, **ex)
    loss, stats, w = m.apply(p, **ex)
    assert np.isfinite(float(loss))


def test_kmeans_recovers_clusters():
    from espnet_tpu.utils.kmeans import fit_kmeans, kmeans_labels
    rng = np.random.RandomState(0)
    true_centers = np.asarray([[0, 0], [10, 0], [0, 10], [10, 10]],
                              np.float32)
    x = np.concatenate([c + rng.randn(200, 2).astype(np.float32) * 0.3
                        for c in true_centers])
    centers, inertia = fit_kmeans(x, 4, n_iter=30, batch_size=400)
    assert inertia < 1.0
    # every true center has a fitted center nearby
    for c in true_centers:
        assert np.min(np.sum((centers - c) ** 2, axis=1)) < 0.5
    labs = kmeans_labels(x, centers)
    # points from the same blob share labels
    assert len(np.unique(labs[:200])) == 1


def test_dump_km_labels(tmp_path):
    from espnet_tpu.utils.kmeans import dump_km_labels, fit_kmeans
    rng = np.random.RandomState(1)
    x = rng.randn(500, 4).astype(np.float32)
    centers, _ = fit_kmeans(x, 8, n_iter=5, batch_size=250)
    feats = [("u1", rng.randn(7, 4)), ("u2", rng.randn(3, 4))]
    n = dump_km_labels(iter(feats), centers, tmp_path / "labels.txt")
    assert n == 2
    lines = (tmp_path / "labels.txt").read_text().splitlines()
    assert lines[0].startswith("u1 ") and len(lines[0].split()) == 8
    assert all(0 <= int(t) < 8 for t in lines[1].split()[1:])


def test_beats_tokenizer_train_bin(tmp_path):
    """beats_tokenizer_train: centers + label dump from a feature scp."""
    from espnet_tpu.bin.beats_tokenizer_train import train_tokenizer
    rng = np.random.RandomState(0)
    d = tmp_path / "feats"
    d.mkdir()
    lines = []
    for i in range(4):
        np.save(d / f"u{i}.npy", rng.randn(20, 6).astype(np.float32))
        lines.append(f"u{i} {d}/u{i}.npy")
    (tmp_path / "feats.scp").write_text("\n".join(lines) + "\n")
    cpath = train_tokenizer(tmp_path / "tok", str(tmp_path / "feats.scp"),
                            n_clusters=4, n_iter=3)
    centers = np.load(cpath)
    assert centers.shape == (4, 6)
    labels = (tmp_path / "tok" / "labels").read_text().splitlines()
    assert len(labels) == 4
    assert all(0 <= int(t) < 4 for t in labels[0].split()[1:])
