#!/usr/bin/env python
"""CLI shim (parity with the reference repo layout: /root/reference/extract_texture.py)."""
from texgs.tools.extract_texture import main

if __name__ == "__main__":
    main()
