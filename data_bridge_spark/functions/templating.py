"""Parameterized-query templating: the reference's ``::key::`` grammar.

Re-implements the reference's SQL templating (reference
``app/utils/extractor.py:57-120``) engine-independently:

- scalar params  → one SQL literal           (``extractor.py:63-66,72-74``)
- list params    → comma-joined IN list      (``extractor.py:68-71``)
- ``step:<name>``  → value pulled from a prior step's output
                                             (``extractor.py:107-114``)
- ``macro:<name>`` → registered function     (``extractor.py:115-117``)

Differences from the reference (intended-semantics fixes, SURVEY.md §2E):
the missing-comma ``SyntaxError`` at ``extractor.py:73`` obviously isn't
reproduced, values render as *safely quoted literals* instead of JDBC
``?`` binds (works identically in ``spark.sql`` and DuckDB), and the
``YYYYMMDD`` macro uses ``%Y%m%d`` (the reference's ``%Y%M%D`` at
``macros.py:15`` is year-minute-dd/mm/yy).
"""

from __future__ import annotations

import datetime as dt
import re
from collections.abc import Callable, Mapping
from typing import Any

__all__ = ["render_sql", "resolve_params", "sql_literal", "MACROS", "register_macro"]

_PLACEHOLDER = re.compile(r"::([A-Za-z_][A-Za-z0-9_]*)::")


def _school_year(today: dt.date | None = None) -> int:
    """Reference ``macros.py:4-11``: after July the school year is year+1."""
    today = today or dt.date.today()
    return today.year + 1 if today.month > 7 else today.year


def _yyyymmdd(today: dt.date | None = None) -> str:
    """Reference ``macros.py:13-16`` (intended semantics: %Y%m%d)."""
    return (today or dt.date.today()).strftime("%Y%m%d")


MACROS: dict[str, Callable[[], Any]] = {
    "SCHOOL_YEAR": _school_year,
    "YYYYMMDD": _yyyymmdd,
    "TODAY": lambda: dt.date.today().isoformat(),
}


def register_macro(name: str, fn: Callable[[], Any]) -> None:
    MACROS[name] = fn


def sql_literal(value: Any) -> str:
    """Render a Python value as a portable ANSI SQL literal."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, dt.datetime):
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    if isinstance(value, dt.date):
        return f"DATE '{value.isoformat()}'"
    if isinstance(value, (list, tuple)):
        if not value:
            # empty IN-list: `IN (NULL)` matches nothing, which is the
            # sane semantics for an empty id list (and stays parseable)
            return "NULL"
        return ", ".join(sql_literal(v) for v in value)
    s = str(value).replace("'", "''")
    return f"'{s}'"


def resolve_params(
    params: Mapping[str, Any],
    step_outputs: Mapping[str, Any] | None = None,
) -> dict[str, Any]:
    """Resolve ``step:``/``macro:`` indirections to concrete values.

    Mirrors reference ``extractor.py:107-120``: a string value
    ``"step:<name>"`` reads a prior step's output, ``"macro:<name>"``
    calls a registered macro; anything else passes through.
    """
    out: dict[str, Any] = {}
    for key, value in params.items():
        if isinstance(value, str) and value.startswith("step:"):
            name = value[5:]
            if step_outputs is None or name not in step_outputs:
                raise KeyError(f"param {key!r} references unknown step output {name!r}")
            out[key] = step_outputs[name]
        elif isinstance(value, str) and value.startswith("macro:"):
            name = value[6:]
            if name not in MACROS:
                raise KeyError(f"param {key!r} references unknown macro {name!r}")
            out[key] = MACROS[name]()
        else:
            out[key] = value
    return out


def render_sql(
    sql: str,
    params: Mapping[str, Any] | None = None,
    step_outputs: Mapping[str, Any] | None = None,
) -> str:
    """Replace every ``::key::`` placeholder with a rendered literal.

    Lists expand to ``a, b, c`` so ``IN (::ids::)`` works exactly like the
    reference's dynamic IN expansion (``extractor.py:68-71``). Unknown
    placeholders raise (the reference would silently ship broken SQL).
    """
    resolved = resolve_params(params or {}, step_outputs)

    def sub(match: re.Match[str]) -> str:
        key = match.group(1)
        if key not in resolved:
            raise KeyError(f"no value supplied for placeholder ::{key}::")
        return sql_literal(resolved[key])

    return _PLACEHOLDER.sub(sub, sql)
