"""Build-on-import for the C++ symbolic core (``_symcore``).

The compiled extension is NOT committed to version control (a platform
binary in git is unreviewable and silently goes stale when the source
changes). Instead the first ``from .utils import _symcore`` triggers a
one-shot g++ build of ``_symcore.cpp`` into the package directory; a
rebuild happens whenever the source is newer than the binary. Pure-Python
fallbacks exist at every call site (symbolic.py / refactor.py), so a
missing compiler only costs speed, never correctness.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_symcore.cpp")


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, "_symcore" + suffix)


def ensure_symcore() -> bool:
    """Compile ``_symcore.cpp`` if the binary is missing or stale.

    Returns True when an up-to-date binary exists afterwards. Never raises:
    any failure (no compiler, read-only tree, ...) leaves the Python
    fallbacks in charge.
    """
    so = _so_path()
    try:
        if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
            return True
    except OSError:
        return False
    try:
        import numpy

        inc_py = sysconfig.get_paths()["include"]
        inc_np = numpy.get_include()
        tmp = so + f".build-{os.getpid()}"
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3", "-std=c++17", "-shared", "-fPIC",
            f"-I{inc_py}", f"-I{inc_np}",
            _SRC, "-o", tmp,
        ]
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        os.replace(tmp, so)  # atomic: concurrent builders race benignly
        return True
    except Exception as e:  # noqa: BLE001 — opportunistic build only
        print(
            f"tpu_sparse_lu: _symcore build skipped ({type(e).__name__}); "
            "using Python fallbacks for symbolic analysis",
            file=sys.stderr,
        )
        try:
            if os.path.exists(tmp):
                os.remove(tmp)
        except Exception:
            pass
        return False
