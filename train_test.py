#!/usr/bin/env python
"""Fit then test in one process (reference ``train_test.py:7-18``)."""

import sys

from main import cli_main


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    # strip an accidental subcommand; we drive both phases ourselves
    if argv and argv[0] in ("fit", "test", "validate"):
        argv = argv[1:]
    model, data, trainer, ckpt = cli_main(["fit", *argv], run=False)
    state = trainer.fit(model, data, ckpt_path=ckpt)
    trainer._eval_loop(model, state, data, "test", trainer.limit_test_batches)


if __name__ == "__main__":
    main()
