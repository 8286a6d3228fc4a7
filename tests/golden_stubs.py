"""Shared sys.modules stubbing for the reference golden tests.

Several golden test files import reference code (untrusted, reviewed before
import) that depends on packages absent from this environment (diffusers,
pytorch_lightning, rembg, torchvision, cupy, pytorch3d, ...).  Each file
stubs what its reference slice needs — but the stubs are mutually
incompatible (one file's bare ``diffusers`` module is not a package, so a
later file's ``from diffusers.loaders import ...`` fails if it only installs
stubs when ``diffusers`` is absent).

The fix is snapshot-and-replace: every fixture installs its OWN stubs
unconditionally via :func:`override`, and restores whatever was in
``sys.modules`` before (including "nothing") on teardown.  Run order and
cross-file leakage then cannot matter.
"""
from __future__ import annotations

import sys
import types


def make_module(name: str, **attrs) -> types.ModuleType:
    """Build a stub module WITHOUT inserting it into sys.modules."""
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def override(stubs: dict):
    """Install ``stubs`` into sys.modules unconditionally, returning a
    ``restore()`` callable that puts back the prior state (removing names
    that were absent before)."""
    saved = {name: sys.modules.get(name) for name in stubs}
    sys.modules.update(stubs)

    def restore():
        for name, prev in saved.items():
            if prev is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = prev

    return restore
