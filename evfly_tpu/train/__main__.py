"""CLI: ``python -m evfly_tpu.train --config configs/config.txt``.

Mirrors ``python learner/learner.py --config ...`` (learner.py:1274-1286).
"""

from ..configs import argparsing
from .learner import Learner


def main():
    args = argparsing()
    print(args)
    if args.device == "cpu":
        # honor `device = cpu` before the first backend use — env vars can't
        # (the axon sitecustomize rewrites jax_platforms at interpreter
        # start; only a config update sticks, see tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")
    learner = Learner(args)
    try:
        learner.train_loop()
    except KeyboardInterrupt:
        print("[MAIN] Keyboard interrupt detected, exiting.")
        learner.logfile.close()


if __name__ == "__main__":
    main()
