"""Compatibility shim: the reference PGSD package layout over tpgsd.

Lets code written against the reference (``import pgsd.fl``,
``pgsd.hoomd.open(...)``, ``pgsd.pypgsd.PGSDFile``) run on tpgsd
unchanged (reference package: pgsd/pgsd/__init__.py).  New code should
import :mod:`tpgsd` directly.
"""

import sys

import tpgsd
import tpgsd.fl as fl  # noqa: F401
import tpgsd.hoomd as hoomd  # noqa: F401
import tpgsd.pypgsd as pypgsd  # noqa: F401
from tpgsd.version import version  # noqa: F401

__version__ = tpgsd.__version__

# submodule aliases so "import pgsd.fl" binds to the tpgsd modules
sys.modules[__name__ + ".fl"] = fl
sys.modules[__name__ + ".hoomd"] = hoomd
sys.modules[__name__ + ".pypgsd"] = pypgsd
