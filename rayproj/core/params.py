"""proj-string parameter list.

Mirrors the reference's ``paralist`` + ``pj_param`` typed access
(/root/reference/src/proj_internal.h:229, src/param.cpp semantics):
a proj-string is an ordered list of ``key`` / ``key=value`` tokens; typed
getters interpret values as flag / int / float / string / radians (DMS)
/ bool. First occurrence of a key wins.
"""

from __future__ import annotations

import re

from .dms import dms_to_rad
from .errors import ERR_INVALID_BOOLEAN_PARAM, ProjError

# atoi: optional whitespace, optional sign, leading digits; else 0
_ATOI_RE = re.compile(r"^\s*([+-]?\d+)")


class Params:
    def __init__(self, pairs: list[tuple[str, str | None]]):
        # ordered; first occurrence wins on lookup (reference list search order)
        self.pairs = list(pairs)
        self._index: dict[str, str | None] = {}
        for k, v in pairs:
            if k not in self._index:
                self._index[k] = v

    @classmethod
    def parse(cls, projstring: str) -> "Params":
        pairs: list[tuple[str, str | None]] = []
        for tok in cls._tokenize(projstring):
            tok = tok.lstrip("+")
            if not tok:
                continue
            if "=" in tok:
                k, v = tok.split("=", 1)
                pairs.append((k, v))
            else:
                pairs.append((tok, None))
        return cls(pairs)

    @staticmethod
    def _tokenize(projstring: str) -> list[str]:
        """Whitespace split honoring the reference's quoted values
        (internal.cpp pj_shrink/pj_trim_argc): a ``"`` right after
        ``=`` opens a string in which spaces are literal and ``\"\"``
        is an escaped quote; the enclosing quotes are stripped from
        the stored value (``+nadgrids="./dir "" x/f"`` →
        ``./dir " x/f``)."""
        s = projstring  # tabs split tokens via isspace, but only
        # OUTSIDE quoted strings — quoted bytes are preserved verbatim
        toks: list[str] = []
        cur: list[str] = []
        in_string = False
        i, n = 0, len(s)
        while i < n:
            c = s[i]
            if in_string:
                if c == '"' and i + 1 < n and s[i + 1] == '"':
                    cur.append('"')
                    i += 2
                    continue
                if c == '"':
                    in_string = False
                    i += 1
                    continue
                cur.append(c)
            elif c == '"' and cur and cur[-1] == "=":
                in_string = True
            elif c.isspace():
                if cur:
                    toks.append("".join(cur))
                    cur = []
            else:
                cur.append(c)
            i += 1
        if cur:
            toks.append("".join(cur))
        return toks

    def has(self, key: str) -> bool:
        return key in self._index

    def raw(self, key: str) -> str | None:
        return self._index.get(key)

    def str_(self, key: str, default: str | None = None) -> str | None:
        v = self._index.get(key)
        if v is None:
            return default if not self.has(key) else ""
        return v

    def float_(self, key: str, default: float = 0.0) -> float:
        v = self._index.get(key)
        if v is None:
            return default
        return float(v)

    def int_(self, key: str, default: int = 0) -> int:
        """pj_param 'i' type = atoi (param.cpp:203): leading integer,
        0 on non-numeric text ('+lsat=inf' -> 0 -> the op's own range
        check rejects it) — never a conversion exception."""
        v = self._index.get(key)
        if v is None:
            return default
        m = _ATOI_RE.match(v)
        return int(m.group(1)) if m else 0

    def rad(self, key: str, default: float = 0.0) -> float:
        """Angle given in degrees / DMS → radians (pj_param 'r' type)."""
        v = self._index.get(key)
        if v is None:
            return default
        return dms_to_rad(v)

    def bool_(self, key: str, default: bool = False) -> bool:
        """pj_param 'b' type: bare flag = True; T/t/F/f prefixes accepted."""
        if not self.has(key):
            return default
        v = self._index[key]
        if v is None or v == "":
            return True
        if v[0] in "TtYy1":
            return True
        if v[0] in "FfNn0":
            return False
        raise ProjError(ERR_INVALID_BOOLEAN_PARAM, f"{v!r} for +{self._index}")

    def without(self, *keys: str) -> "Params":
        drop = set(keys)
        return Params([(k, v) for k, v in self.pairs if k not in drop])

    def merged_defaults(self, other: "Params") -> "Params":
        """Append entries of `other` whose keys we don't have (inheritance)."""
        extra = [(k, v) for k, v in other.pairs if k not in self._index]
        return Params(self.pairs + extra)

    def __repr__(self) -> str:
        toks = [f"+{k}" if v is None else f"+{k}={v}" for k, v in self.pairs]
        return " ".join(toks)
