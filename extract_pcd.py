#!/usr/bin/env python
"""CLI shim (parity with the reference repo layout: /root/reference/extract_pcd.py)."""
from texgs.tools.extract_pcd import main

if __name__ == "__main__":
    main()
