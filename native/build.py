#!/usr/bin/env python
"""Build libtexgs_io.so (plain g++, no external deps)."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def build(verbose: bool = True) -> str:
    src = os.path.join(HERE, "texgs_io.cpp")
    out = os.path.join(HERE, "libtexgs_io.so")
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", out]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    build()
