#!/usr/bin/env python3
"""Convert a hoomd-schema GSD trajectory into per-frame VTK .vtu files.

Thin wrapper over :mod:`tpgsd.vtu` (also exposed as ``tpgsd convert``);
capability parity with the reference converter (reference:
test_pgsd2vtu.py and pgsd/doc/pgsd.tex:1226-1265), no pyevtk needed.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from tpgsd.vtu import DEFAULT_FIELDS, convert, main, write_vtu  # noqa: F401

if __name__ == "__main__":
    sys.exit(main())
