"""Shared column-expression helpers (all JVM-side built-ins, no Python UDFs)."""

from .exact import davg, dsum, quant, sql_davg, sql_dsum  # noqa: F401
from .urls import url_form_encode, url_path_quote  # noqa: F401
