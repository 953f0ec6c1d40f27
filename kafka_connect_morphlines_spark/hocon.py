"""Minimal HOCON parser for pipeline specs.

The reference authors every pipeline in HOCON (Typesafe Config) — e.g.
``/root/reference/config/cloudsolr.conf``, ``src/test/resources/.../transform.conf``
— and resolves ``${?ENV_VAR}`` substitutions plus ``include`` indirection at
compile time (MorphlineTransform.java:166-195, morphlines-include.conf:1).

This module implements the subset of HOCON those specs actually use, from the
public HOCON spec (github.com/lightbend/config/blob/main/HOCON.md):

- ``//`` and ``#`` comments
- unquoted keys (with dotted-path expansion) and unquoted string values
- ``:`` or ``=`` key separators; separator-free object values (``key { ... }``)
- nested objects and arrays; optional commas (newline-separated elements)
- duplicate object keys merge; duplicate scalar keys: last wins
- ``${path}`` and ``${?path}`` substitutions (config paths and env vars)
- ``include "file"`` (relative to the including file)
- triple-quoted strings, value concatenation on a single line

No external dependency (pyhocon is not available in the image).
"""

from __future__ import annotations

import os
import re
from typing import Any


class HoconError(ValueError):
    pass


_UNQUOTED_END = set('$"{}[]:=,+#`^?!@*&\\')


class _Parser:
    def __init__(self, text: str, base_dir: str | None = None):
        self.text = text
        self.pos = 0
        self.n = len(text)
        self.base_dir = base_dir or "."

    # --- low level ---------------------------------------------------------
    def _peek(self) -> str:
        return self.text[self.pos] if self.pos < self.n else ""

    def _skip_ws(self, newlines: bool = True) -> None:
        while self.pos < self.n:
            c = self.text[self.pos]
            if c == "#" or self.text.startswith("//", self.pos):
                while self.pos < self.n and self.text[self.pos] != "\n":
                    self.pos += 1
            elif c.isspace() and (newlines or c != "\n"):
                self.pos += 1
            else:
                break

    def _skip_inline_ws(self) -> None:
        self._skip_ws(newlines=False)

    def _error(self, msg: str) -> HoconError:
        line = self.text.count("\n", 0, self.pos) + 1
        return HoconError(f"{msg} at line {line}")

    # --- values ------------------------------------------------------------
    def parse_root(self) -> dict[str, Any]:
        self._skip_ws()
        if self._peek() == "{":
            obj = self.parse_object()
        else:
            obj = self._parse_object_body(stop="")
        self._skip_ws()
        if self.pos < self.n:
            raise self._error("trailing content")
        return obj

    def parse_object(self) -> dict[str, Any]:
        assert self._peek() == "{"
        self.pos += 1
        obj = self._parse_object_body(stop="}")
        if self._peek() != "}":
            raise self._error("expected '}'")
        self.pos += 1
        return obj

    def _parse_object_body(self, stop: str) -> dict[str, Any]:
        obj: dict[str, Any] = {}
        while True:
            self._skip_ws()
            c = self._peek()
            if c == "" or c == stop:
                return obj
            if c == ",":
                self.pos += 1
                continue
            if self.text.startswith("include", self.pos):
                save = self.pos
                self.pos += len("include")
                self._skip_inline_ws()
                if self._peek() in "\"'":
                    path = self._parse_quoted()
                    self._merge(obj, self._load_include(path))
                    continue
                self.pos = save  # "include" used as a plain key
            key = self._parse_key()
            self._skip_inline_ws()
            c = self._peek()
            if c in ":=":
                self.pos += 1
                if self._peek() == "=":  # `:=` / `+=` not supported beyond this
                    self.pos += 1
                self._skip_inline_ws()
                value = self.parse_value()
            elif c == "{":
                value = self.parse_object()
            else:
                raise self._error(f"expected ':', '=' or '{{' after key {key!r}")
            self._assign(obj, key.split("."), value)

    def _parse_key(self) -> str:
        if self._peek() in "\"'":
            return self._parse_quoted()
        start = self.pos
        while self.pos < self.n:
            c = self.text[self.pos]
            if c.isspace() or c in ":={,}[]#" or self.text.startswith("//", self.pos):
                break
            self.pos += 1
        if start == self.pos:
            raise self._error("expected key")
        return self.text[start : self.pos]

    def parse_array(self) -> list[Any]:
        assert self._peek() == "["
        self.pos += 1
        out: list[Any] = []
        while True:
            self._skip_ws()
            c = self._peek()
            if c == "]":
                self.pos += 1
                return out
            if c == ",":
                self.pos += 1
                continue
            if c == "":
                raise self._error("unterminated array")
            out.append(self.parse_value())

    def parse_value(self) -> Any:
        """Parse a value; handles same-line concatenation of string chunks."""
        parts: list[Any] = []
        while True:
            self._skip_inline_ws()
            c = self._peek()
            if c == "" or c == "\n" or c in ",}]" or c == "#" or self.text.startswith("//", self.pos):
                break
            if c == "{":
                parts.append(self.parse_object())
            elif c == "[":
                parts.append(self.parse_array())
            elif c in "\"'":
                parts.append(self._parse_quoted())
            elif c == "$":
                parts.append(self._parse_substitution())
            else:
                parts.append(self._parse_unquoted_chunk())
        if not parts:
            raise self._error("expected value")
        if len(parts) == 1:
            return parts[0]
        # value concatenation: stringify and join (whitespace already consumed
        # between chunks; HOCON preserves it but our specs never rely on that)
        return " ".join(str(p) for p in parts)

    def _parse_quoted(self) -> str:
        q = self.text[self.pos]
        if self.text.startswith('"""', self.pos):
            end = self.text.find('"""', self.pos + 3)
            if end < 0:
                raise self._error("unterminated triple-quoted string")
            s = self.text[self.pos + 3 : end]
            self.pos = end + 3
            return s
        self.pos += 1
        out = []
        while self.pos < self.n:
            c = self.text[self.pos]
            if c == "\\":
                nxt = self.text[self.pos + 1 : self.pos + 2]
                mapping = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", '"': '"', "'": "'", "\\": "\\", "/": "/"}
                if nxt == "u":
                    cp = int(self.text[self.pos + 2 : self.pos + 6], 16)
                    self.pos += 6
                    # combine UTF-16 surrogate pairs (JSON encodes astral
                    # chars as two \u escapes)
                    if 0xD800 <= cp <= 0xDBFF and self.text.startswith("\\u", self.pos):
                        lo = int(self.text[self.pos + 2 : self.pos + 6], 16)
                        if 0xDC00 <= lo <= 0xDFFF:
                            cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                            self.pos += 6
                    out.append(chr(cp))
                    continue
                out.append(mapping.get(nxt, nxt))
                self.pos += 2
                continue
            if c == q:
                self.pos += 1
                return "".join(out)
            if c == "\n":
                raise self._error("newline in quoted string")
            out.append(c)
            self.pos += 1
        raise self._error("unterminated string")

    def _parse_substitution(self) -> Any:
        m = re.match(r"\$\{(\??)([^}]*)\}", self.text[self.pos :])
        if not m:
            raise self._error("malformed ${...} substitution")
        self.pos += m.end()
        return _Sub(m.group(2).strip(), optional=bool(m.group(1)))

    def _parse_unquoted_chunk(self) -> Any:
        start = self.pos
        while self.pos < self.n:
            c = self.text[self.pos]
            if c == "\n" or c in ",}]{[" or c in "\"'$" or c == "#" or self.text.startswith("//", self.pos):
                break
            self.pos += 1
        raw = self.text[start : self.pos].strip()
        if raw == "":
            raise self._error("expected value")
        return _coerce(raw)

    # --- structure helpers --------------------------------------------------
    def _assign(self, obj: dict[str, Any], path: list[str], value: Any) -> None:
        cur = obj
        for k in path[:-1]:
            nxt = cur.get(k)
            if not isinstance(nxt, dict):
                nxt = {}
                cur[k] = nxt
            cur = nxt
        k = path[-1]
        if isinstance(value, dict) and isinstance(cur.get(k), dict):
            self._merge(cur[k], value)
        else:
            cur[k] = value

    def _merge(self, dst: dict[str, Any], src: dict[str, Any]) -> None:
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                self._merge(dst[k], v)
            else:
                dst[k] = v

    def _load_include(self, path: str) -> dict[str, Any]:
        full = path if os.path.isabs(path) else os.path.join(self.base_dir, path)
        with open(full, encoding="utf-8") as f:
            sub = _Parser(f.read(), base_dir=os.path.dirname(full))
        return sub.parse_root()


class _Sub:
    """Unresolved ``${path}`` / ``${?path}`` substitution."""

    def __init__(self, path: str, optional: bool):
        self.path = path
        self.optional = optional

    def __repr__(self) -> str:  # used by value concatenation
        return "${" + ("?" if self.optional else "") + self.path + "}"


def _coerce(raw: str) -> Any:
    low = raw.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("null", "none"):
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def _lookup(root: Any, path: str) -> Any:
    cur = root
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            raise KeyError(path)
        cur = cur[part]
    return cur


def _resolve(node: Any, root: dict[str, Any], env: dict[str, str]) -> Any:
    if isinstance(node, _Sub):
        try:
            return _resolve(_lookup(root, node.path), root, env)
        except KeyError:
            if node.path in env:
                return _coerce(env[node.path])
            if node.optional:
                return None
            raise HoconError(f"unresolved substitution ${{{node.path}}}") from None
    if isinstance(node, dict):
        return {k: _resolve(v, root, env) for k, v in node.items() if not isinstance(v, _Sub) or not _is_dropped(v, root, env)}
    if isinstance(node, list):
        return [_resolve(v, root, env) for v in node]
    return node


def _is_dropped(sub: _Sub, root: dict[str, Any], env: dict[str, str]) -> bool:
    """``${?missing}`` assigned to a key drops the key entirely (HOCON spec)."""
    if not sub.optional:
        return False
    try:
        _lookup(root, sub.path)
        return False
    except KeyError:
        return sub.path not in env


def loads(text: str, base_dir: str | None = None, env: dict[str, str] | None = None) -> dict[str, Any]:
    """Parse HOCON text into a plain dict, resolving substitutions."""
    tree = _Parser(text, base_dir=base_dir).parse_root()
    return _resolve(tree, tree, dict(os.environ if env is None else env))


def load(path: str, env: dict[str, str] | None = None) -> dict[str, Any]:
    with open(path, encoding="utf-8") as f:
        return loads(f.read(), base_dir=os.path.dirname(os.path.abspath(path)), env=env)
