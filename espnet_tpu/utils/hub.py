"""External-hub interop surfaces (offline-clean stubs).

The reference integrates three network-backed hubs that cannot work in
an offline TPU image; each surface here exists so that reference
configs fail LEGIBLY (one-line actionable error naming the exact pip
package / alternative) instead of with an AttributeError deep in task
construction:

- S3prlFrontend    (espnet2/asr/frontend/s3prl.py): torch-hub SSL
  upstreams. Offline alternative: frontend `wav2vec2`
  (frontends/ssl_frontend.py) loads converted local checkpoints.
- AsteroidModel_Converter (espnet2/enh/separator/asteroid_models.py):
  asteroid pretrained separation models. Offline alternative: the 22
  in-repo separators (models/enh/separators.py).
- ModelZoo tag resolution (espnet_model_zoo.downloader used by
  bin/asr_inference.py:680-708): hub tag -> packed model dir. Offline
  alternative: pass a local packed dir (bin/pack.py output).
"""

from __future__ import annotations

from pathlib import Path


class OfflineHubError(ImportError):
    """A hub-backed feature was requested in an offline environment."""


class S3prlFrontend:
    """Stub of the s3prl torch-hub frontend (asr/frontend/s3prl.py).

    Raises at construction with the pip name and the offline-capable
    in-repo alternative.
    """

    def __init__(self, *args, **kwargs):
        raise OfflineHubError(
            "S3prlFrontend needs the `s3prl` package and torch-hub "
            "downloads (pip install s3prl), which are unavailable in "
            "this offline TPU image. Use frontend `wav2vec2` "
            "(espnet_tpu/frontends/ssl_frontend.py) with a locally "
            "converted checkpoint instead.")


class AsteroidModel_Converter:
    """Stub of the asteroid pretrained-separator wrapper
    (enh/separator/asteroid_models.py)."""

    def __init__(self, *args, **kwargs):
        raise OfflineHubError(
            "AsteroidModel_Converter needs the `asteroid` package "
            "(pip install asteroid) and hub downloads, which are "
            "unavailable in this offline TPU image. Use one of the "
            "22 in-repo separators (models/enh/separators.py: tcn, "
            "tfgridnet, bsrnn, dprnn, ...) instead.")


def resolve_model_tag(model_tag: str) -> Path:
    """Resolve a model tag to a packed model directory.

    Local directories resolve directly (bin/pack.py layout). Hub tags
    (espnet/<user>_<corpus>_... via espnet_model_zoo.downloader,
    bin/asr_inference.py:680-708) need network access; raise with the
    pip name so reference commands fail legibly.
    """
    p = Path(model_tag)
    if p.exists():
        return p
    raise OfflineHubError(
        f"model_tag {model_tag!r} is not a local packed-model directory; "
        "resolving hub tags needs `espnet_model_zoo` (pip install "
        "espnet_model_zoo) and network access, unavailable in this "
        "offline TPU image. Pack a local model with "
        "`python -m espnet_tpu.bin.pack` and pass its directory.")
