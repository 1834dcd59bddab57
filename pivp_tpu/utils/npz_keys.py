"""Checkpoint inspector: list the keys (and shapes) of an npz checkpoint.

Capability of the reference's models/npz_keys.py (prints the key list of
a Chainer checkpoint), extended with shapes/dtypes and a total-parameter
count. Works on both this framework's flat-pytree checkpoints and
reference-layout exports.

Usage: python -m pivp_tpu.utils.npz_keys CHECKPOINT.npz
"""

from __future__ import annotations

import sys

import numpy as np


def describe(path: str) -> str:
    lines = []
    total = 0
    with np.load(path) as data:
        for key in sorted(data.keys()):
            arr = data[key]
            total += arr.size
            lines.append(f"{key}  {arr.shape}  {arr.dtype}")
    lines.append(f"-- {len(lines)} arrays, {total:,} parameters")
    return "\n".join(lines)


def main() -> None:
    if len(sys.argv) != 2:
        print(__doc__)
        raise SystemExit(1)
    try:
        print(describe(sys.argv[1]))
    except BrokenPipeError:  # piped into head/less
        pass


if __name__ == "__main__":
    main()
