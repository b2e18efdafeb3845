"""JSON schema subset -> regex (outlines-style construction).

Supported: type object (fixed `properties`, respecting `required`), string
(with enum), integer, number, boolean, null, array (items), enum of
primitives, anyOf.  Additional constraints (patterns, bounds) are ignored —
the grammar guarantees well-formedness, not value ranges.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict

WS = r"[ \n\t]{0,2}"  # bounded: unbounded ws lets a greedy model loop on whitespace
STRING_RE = r'"[^"\\\x00-\x1f]*"'
# digit runs are BOUNDED so a grammar-masked greedy decode must eventually
# close the value (an unbounded \d* lets a looping model burn its budget on
# one integer); 15 digits covers every int53
INT_RE = r"-?(0|[1-9]\d{0,14})"
NUM_RE = r"-?(0|[1-9]\d{0,14})(\.\d{1,15})?([eE][+-]?\d{1,3})?"
BOOL_RE = r"(true|false)"
NULL_RE = r"null"


def _lit(value: Any) -> str:
    return re.escape(json.dumps(value))


def schema_to_regex(schema: Dict[str, Any]) -> str:
    if not isinstance(schema, dict):
        raise ValueError("schema must be an object")
    if "const" in schema:
        return _lit(schema["const"])
    if "enum" in schema:
        return "(" + "|".join(_lit(v) for v in schema["enum"]) + ")"
    if "anyOf" in schema:
        return "(" + "|".join(schema_to_regex(s) for s in schema["anyOf"]) + ")"
    t = schema.get("type")
    if t == "string":
        return STRING_RE
    if t == "integer":
        return INT_RE
    if t == "number":
        return NUM_RE
    if t == "boolean":
        return BOOL_RE
    if t == "null":
        return NULL_RE
    if t == "array":
        item = schema_to_regex(schema.get("items", {"type": "string"}))
        return (
            r"\[" + WS + "(" + item + "(" + WS + "," + WS + item + ")*)?" + WS + r"\]"
        )
    if t == "object" or "properties" in schema:
        props = schema.get("properties", {})
        required = set(schema.get("required", list(props.keys())))
        parts = []
        first = True
        for name, sub in props.items():
            entry = (
                _lit(name) + WS + ":" + WS + schema_to_regex(sub)
            )
            sep = "" if first else WS + "," + WS
            if name in required:
                parts.append(sep + entry)
                first = False
            else:
                # optional property (with separator folded in)
                parts.append("(" + sep + entry + ")?")
                if first:
                    # an optional first property complicates separators;
                    # treat as required-separator-optional approximation
                    first = False
        body = "".join(parts)
        return r"\{" + WS + body + WS + r"\}"
    raise ValueError(f"unsupported schema: {schema}")
