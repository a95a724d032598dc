"""Indexed HTK Master Label File (MLF) reading/writing.

Re-implements the capability of KaldiLib/MlfStream.{h,tcc}: the ``Index()``
pass hashes every ``"name"`` block to a stream offset so shuffled SCP lists
get O(1) random access to label records; names are matched HTK-style where a
leading ``*/`` wildcard matches any directory prefix.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple


def _strip_quotes(s: str) -> str:
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        return s[1:-1]
    return s


class MlfReader:
    """Random-access MLF reader with a name → byte-offset index."""

    def __init__(self, path: str):
        import threading

        self.path = path
        self._lock = threading.Lock()   # seek+read must be atomic
        if path.startswith("|") or path == "-":
            # shell-pipe MLF (StkStream semantics): pipes can't seek, so
            # buffer the stream in memory and index that
            import io as _io

            from .htk import stk_open

            with stk_open(path, "rb") as src:
                self._f = _io.BytesIO(src.read())
        else:
            self._f = open(path, "rb")
        first = self._f.readline().decode("utf-8", "replace").strip()
        if first != "#!MLF!#":
            raise ValueError(f"Not an MLF file (missing #!MLF!#): {path}")
        self._index: Dict[str, int] = {}
        self._base_index: Dict[str, int] = {}
        self._build_index()

    def _build_index(self) -> None:
        f = self._f
        while True:
            pos = f.tell()
            line = f.readline()
            if not line:
                break
            s = line.decode("utf-8", "replace").strip()
            if s.startswith('"') and s.endswith('"'):
                name = _strip_quotes(s)
                body = f.tell()
                self._index[name] = body
                base = name.split("/")[-1]
                # keep first occurrence, matching HTK lookup order
                self._base_index.setdefault(base, body)
                # skip to terminating '.'
                while True:
                    l2 = f.readline()
                    if not l2 or l2.strip() == b".":
                        break

    def names(self) -> List[str]:
        return list(self._index.keys())

    def _find(self, name: str) -> Optional[int]:
        if name in self._index:
            return self._index[name]
        base = name.split("/")[-1]
        # query with wildcard dir ('*/name') or record stored with wildcard
        if name.startswith("*/") and base in self._base_index:
            return self._base_index[base]
        wild = "*/" + base
        if wild in self._index:
            return self._index[wild]
        if base in self._base_index:
            return self._base_index[base]
        return None

    def __contains__(self, name: str) -> bool:
        return self._find(name) is not None

    def read_block(self, name: str) -> List[str]:
        """Return the raw label lines of a record (without the closing '.')."""
        pos = self._find(name)
        if pos is None:
            raise KeyError(f"Cannot open label MLF record: {name}")
        lines = []
        with self._lock:
            self._f.seek(pos)
            while True:
                raw = self._f.readline()
                if not raw:
                    break
                s = raw.decode("utf-8", "replace").rstrip("\n")
                if s.strip() == ".":
                    break
                lines.append(s)
        return lines

    def read_intervals(self, name: str) -> List[Tuple[int, int, str]]:
        """Parse a record into (begin, end, tag) label intervals.

        Lines without times (bare tags) get (-1, -1, tag).
        """
        out = []
        for line in self.read_block(name):
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            parts = s.split()
            if len(parts) >= 3:
                try:
                    b, e = int(parts[0]), int(parts[1])
                    out.append((b, e, parts[2]))
                    continue
                except ValueError:
                    pass
            out.append((-1, -1, parts[0]))
        return out

    def close(self) -> None:
        self._f.close()


class MlfWriter:
    """Sequential MLF writer."""

    def __init__(self, path: str):
        self._f = open(path, "w")
        self._f.write("#!MLF!#\n")

    def write_record(self, name: str, lines) -> None:
        self._f.write(f'"{name}"\n')
        for line in lines:
            self._f.write(line.rstrip("\n") + "\n")
        self._f.write(".\n")

    def close(self) -> None:
        self._f.close()
