"""Byte-identical fast path for ``json.dumps(obj, ensure_ascii=False,
indent=2)``.

The doc_json contract (K3) pins those exact dumps arguments
(ocr_service.py:158-176), and CPython disables its C encoder whenever
``indent`` is set — the stdlib walks the document through a pure-Python
generator yielding hundreds of string fragments per document (measured
~24% of flagship extraction wall).  This module re-implements ONLY the
subset the document envelope needs (str/int/float/bool/None/list/tuple/
dict-with-str-keys, insertion order, no NaN) with a list-append walk and
the stdlib's own C string escaper, and is differential-tested against
``json.dumps`` for byte equality.

Any value outside that subset raises TypeError — fall back to
``json.dumps`` if the envelope ever grows exotic types.
"""

from __future__ import annotations

from json.encoder import encode_basestring as _esc  # C escaper (non-ascii ok)

__all__ = ["dumps_indent2"]


def dumps_indent2(obj) -> str:
    """Exact ``json.dumps(obj, ensure_ascii=False, indent=2)`` bytes."""
    parts: list = []
    _walk(obj, "\n", parts)
    return "".join(parts)


def _walk(o, nl: str, parts: list) -> None:
    # nl = "\n" + current indentation
    t = type(o)
    if t is str:
        parts.append(_esc(o))
    elif t is int:
        parts.append(repr(o))
    elif t is bool or o is None:  # bool before int would shadow; dicts of
        # the envelope never hold bools, but keep dumps parity anyway
        parts.append("true" if o is True else "false" if o is False else "null")
    elif t is float:
        parts.append(repr(o) if o == o and o not in (float("inf"), float("-inf"))
                     else _bad_float(o))
    elif t is list or t is tuple:
        if not o:
            parts.append("[]")
            return
        inner = nl + "  "
        parts.append("[")
        for k, v in enumerate(o):
            parts.append("," + inner if k else inner)
            _walk(v, inner, parts)
        parts.append(nl + "]")
    elif t is dict:
        if not o:
            parts.append("{}")
            return
        inner = nl + "  "
        parts.append("{")
        first = True
        for k, v in o.items():
            if type(k) is not str:
                raise TypeError(f"non-str dict key {k!r}")
            parts.append(inner if first else "," + inner)
            first = False
            parts.append(_esc(k))
            parts.append(": ")
            _walk(v, inner, parts)
        parts.append(nl + "}")
    elif isinstance(o, bool):  # subclass fallbacks, json.dumps semantics
        parts.append("true" if o else "false")
    elif isinstance(o, int):
        parts.append(int.__repr__(o))  # dumps uses int.__repr__ on subclasses
    elif isinstance(o, float):
        parts.append(float.__repr__(o))
    elif isinstance(o, str):
        parts.append(_esc(o))
    else:
        raise TypeError(f"unsupported type {t.__name__} for dumps_indent2")


def _bad_float(o: float) -> str:
    # json.dumps(allow_nan=True) spells these NaN/Infinity/-Infinity
    if o != o:
        return "NaN"
    return "Infinity" if o > 0 else "-Infinity"
