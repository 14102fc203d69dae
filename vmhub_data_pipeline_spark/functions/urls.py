"""URL quoting as a JVM-side column expression (SURVEY §2 P8).

The reference URL-encodes a path segment with Python's ``urllib.parse.quote``
before interpolating it into a request path
(reference: src/api/vmhub_client.py:120, ``quote(cnpj)``). Spark's built-in
``url_encode`` implements ``java.net.URLEncoder`` — form-encoding, not path
quoting — and the two disagree on exactly four points for ASCII input:

  =============  ==================  =======================
  char           URLEncoder          urllib.parse.quote
  =============  ==================  =======================
  space          ``+``               ``%20``
  ``/``          ``%2F``             literal (safe='/')
  ``*``          literal             ``%2A``
  ``~``          ``%7E``             literal
  =============  ==================  =======================

Both UTF-8-encode non-ASCII and emit uppercase hex, so patching those four
cases on top of ``url_encode`` yields exact ``quote()`` parity while staying
inside whole-stage codegen (no Python UDF). The patches cannot collide with
legitimate encoder output: ``+`` and literal ``*`` appear in URLEncoder
output only for space/``*`` themselves (input ``+`` and input-as-data ``*``
are ``%2B``/literal), and ``%2F``/``%7E`` only for ``/``/``~``.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def url_path_quote(col: Column | str) -> Column:
    """``urllib.parse.quote(s)`` (default ``safe='/'``) as a column expr."""
    c = F.url_encode(F.col(col) if isinstance(col, str) else col)
    c = F.replace(c, F.lit("+"), F.lit("%20"))
    c = F.replace(c, F.lit("%2F"), F.lit("/"))
    c = F.replace(c, F.lit("*"), F.lit("%2A"))
    c = F.replace(c, F.lit("%7E"), F.lit("~"))
    return c


def url_form_encode(col: Column | str) -> Column:
    """``application/x-www-form-urlencoded`` encoding (Spark built-in)."""
    return F.url_encode(F.col(col) if isinstance(col, str) else col)
