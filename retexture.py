#!/usr/bin/env python
"""CLI shim (parity with the reference repo layout: /root/reference/retexture.py)."""
from texgs.tools.retexture import main

if __name__ == "__main__":
    main()
