#!/usr/bin/env python
"""CLI shim (parity with the reference repo layout: /root/reference/viewer.py)."""
from texgs.tools.viewer import main

if __name__ == "__main__":
    main()
