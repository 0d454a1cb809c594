"""Load the reference package (read-only oracle) despite its broken top-level
``__init__.py`` (the SyntaxError register call, ``pde_control_gym/__init__.py:11-14``).

We insert a stub parent module whose ``__path__`` points into the reference
tree so submodule imports resolve without executing the broken init. Used by
parity tests only; the reference code is never shipped.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference/pde_control_gym"


def load_reference_module(dotted: str):
    if "pde_control_gym" not in sys.modules:
        stub = types.ModuleType("pde_control_gym")
        stub.__path__ = [REFERENCE_ROOT]
        sys.modules["pde_control_gym"] = stub
    import importlib

    return importlib.import_module(dotted)
