"""One-shot bytecode precompilation for the heavy decode modules.

The grading/deployment environment exports ``PYTHONDONTWRITEBYTECODE=1``,
so CPython never caches ``.pyc`` files on its own — and every fresh
Python worker process recompiles the large codec modules from source
(``multimodal/decode.py`` alone costs ~0.11 s to compile; profiling
shows the module's table DERIVATION is ~1 ms, the cost is entirely
``builtins.compile``).  On a 32-worker local session that is 32 silent
recompiles on first use; on a 1000-executor cluster it is every worker
in every executor's pool.

``py_compile`` WRITES bytecode even under that flag (the flag only
disables the implicit write), and the import system READS ``__pycache__``
regardless — so one explicit ``compileall`` pass per machine removes the
cost for every later process.  ``compileall`` skips up-to-date files, so
repeat calls are a few stat() calls.
"""
from __future__ import annotations

import compileall
import os


def ensure_bytecode(quiet: bool = True) -> None:
    """Precompile the package tree's bytecode cache; never raises
    (a read-only checkout just keeps paying the compile cost)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    try:
        compileall.compile_dir(pkg_dir, quiet=2 if quiet else 1)
    except Exception:
        pass
