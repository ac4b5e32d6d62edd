"""gan_codec_train CLI (contract: espnet2/bin/gan_codec_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.ssl import CodecTask


def main(argv=None):
    CodecTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
