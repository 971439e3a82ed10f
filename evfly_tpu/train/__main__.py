"""CLI: ``python -m evfly_tpu.train --config configs/config.txt``.

Mirrors ``python learner/learner.py --config ...`` (learner.py:1274-1286).
"""

from ..configs import argparsing
from .learner import Learner


def main():
    args = argparsing()
    print(args)
    learner = Learner(args)
    try:
        learner.train_loop()
    except KeyboardInterrupt:
        print("[MAIN] Keyboard interrupt detected, exiting.")
        learner.logfile.close()


if __name__ == "__main__":
    main()
