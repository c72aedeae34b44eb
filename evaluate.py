#!/usr/bin/env python
"""CLI shim for texgs.tools.evaluate."""
from texgs.tools.evaluate import main

if __name__ == "__main__":
    main()
