"""Builder/loader for the native .bin decoder extension.

Compiles ``src/fastbin.cpp`` with the system toolchain on first use (cached
next to this file), linking against the system liblz4. Falls back cleanly
to the pure-Python path when no compiler is available.
"""

import importlib.util
import os
import subprocess
import sysconfig

from sbmc_tpu.utils.logging import get_logger

LOG = get_logger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "src", "fastbin.cpp")
_OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "_native_build")

_module = None
_tried = False


def _build():
    os.makedirs(_OUT_DIR, exist_ok=True)
    out = os.path.join(_OUT_DIR, "_fastbin.so")
    if os.path.exists(out) and (os.path.getmtime(out)
                                >= os.path.getmtime(_SRC)):
        return out
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-I", include, _SRC, "-o", out + ".tmp", "-l:liblz4.so.1",
           "-lpthread"]
    subprocess.check_output(cmd, stderr=subprocess.STDOUT)
    os.replace(out + ".tmp", out)
    return out


def get():
    """Return the native module, or None if unavailable."""
    global _module, _tried
    if _module is not None or _tried:
        return _module
    _tried = True
    if os.environ.get("SBMC_DISABLE_NATIVE"):
        return None
    try:
        path = _build()
        spec = importlib.util.spec_from_file_location("_fastbin", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _module = mod
    except Exception as e:  # no compiler / no liblz4: pure-python fallback
        LOG.debug("native fastbin unavailable (%s); using python decoder", e)
        _module = None
    return _module
