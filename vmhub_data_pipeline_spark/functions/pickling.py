"""Closure-shipping helper for Python-worker operators.

Any operator that runs Python on executors (mapInPandas workers) must not
assume this package is importable there — the driver contract imports us
from a repo path, not an installed wheel, and executors spawn with their
own sys.path. Registering the defining module for by-value pickling makes
pyspark's vendored cloudpickle serialize the referenced classes/functions
INTO the task closure instead of by module reference.
"""

from __future__ import annotations

import importlib
import sys
from types import ModuleType


def ship_module_by_value(module_name: str) -> None:
    """Best-effort: register ``module_name`` for by-value pickling with
    pyspark's vendored cloudpickle (the one Spark actually serializes
    closures with) and, if present, the standalone cloudpickle."""
    mod: ModuleType | None = sys.modules.get(module_name)
    if mod is None:
        return
    for cp_name in ("pyspark.cloudpickle", "cloudpickle"):
        try:
            cp = importlib.import_module(cp_name)
            cp.register_pickle_by_value(mod)
        except Exception:
            pass  # with the package installed on workers this is moot
