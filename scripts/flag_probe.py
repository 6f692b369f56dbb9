"""Probe which XLA TPU compiler options exist (via compiler_options errors).

Usage: python scripts/flag_probe.py name1=val1 name2=val2 ...
Prints OK/NO per name using a trivial jitted program (fast compiles).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp


def main() -> None:
    x = jnp.ones((8, 8))
    f = jax.jit(lambda a: a @ a)
    lowered = f.lower(x)
    for tok in sys.argv[1:]:
        name, _, val = tok.lstrip("-").partition("=")
        try:
            lowered.compile(compiler_options={name: val})
            print(f"OK  {name}={val}")
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"NO  {name}: {msg}")


if __name__ == "__main__":
    main()
