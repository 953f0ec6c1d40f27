"""``@{field}`` template interpolation -> Column expressions.

Morphline ``setValues``/``addValues``/log commands interpolate field
references into strings: ``"@{a}-@{b}"`` (e.g. reference
config/cloudsolr.conf:52-56 uses ``"@{_topic}-@{_kafkaPartition}"``-style
ids) and ``@{}`` means "the whole record" (used by logInfo ``args : ["@{}"]``).

Compilation rules (all native Column expressions — no UDFs):
- a value that is exactly ``@{field}``      -> ``col(field)`` (type preserved)
- a string containing ``@{...}`` fragments  -> ``concat(...)`` of lits and casts
- ``@{}``                                   -> ``to_json(struct("*"))``
- any other scalar                          -> ``lit(value)``
- a list                                    -> ``array(...)`` of the above
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, functions as F

_TEMPLATE_RE = re.compile(r"@\{([^{}]*)\}")


def colref(name: str) -> Column:
    """Column reference that tolerates dots and other specials in field names."""
    if "`" in name:
        return F.col(name)
    return F.col("`" + name + "`")


def whole_record() -> Column:
    return F.to_json(F.struct("*"))


def template_to_column(value: Any) -> Column:
    """Compile a spec value (scalar / template string / list) to a Column."""
    if isinstance(value, list):
        return F.array(*[template_to_column(v) for v in value])
    if not isinstance(value, str):
        return F.lit(value)
    m = _TEMPLATE_RE.fullmatch(value)
    if m:  # pure reference: keep the source type
        name = m.group(1)
        return whole_record() if name == "" else colref(name)
    parts: list[Column] = []
    pos = 0
    for m in _TEMPLATE_RE.finditer(value):
        if m.start() > pos:
            parts.append(F.lit(value[pos : m.start()]))
        name = m.group(1)
        parts.append(whole_record() if name == "" else colref(name).cast("string"))
        pos = m.end()
    if pos < len(value):
        parts.append(F.lit(value[pos:]))
    if not parts:
        return F.lit(value)
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def has_template(value: Any) -> bool:
    return isinstance(value, str) and _TEMPLATE_RE.search(value) is not None
