"""Probe round-2c: isolate the 1-pass (DEFAULT) wins with threefry RNG.

probe3 measured (v0 threefry/HIGH: 194.5, rbg all-DEFAULT: 214.2, rbg alone
LOSES ~4%): the win is the cotangent pass count, not the RNG. Variants here:
  v4  threefry + quad=HIGH + bwd=DEFAULT
  v5  threefry + quad=DEFAULT + bwd=DEFAULT
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from precision_probe3 import measure  # noqa: E402


def main():
    import jax

    print("platform:", jax.devices()[0].platform, flush=True)
    measure("v4_bwd1pass", quad="high", bwd="default")
    measure("v5_all1pass", quad="default", bwd="default")
    measure("v0_again")


if __name__ == "__main__":
    main()
