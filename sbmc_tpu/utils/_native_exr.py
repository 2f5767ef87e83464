"""Builder/loader for the OpenEXRCore reader bridge (src/fastexr.cpp).

Optional: extends :mod:`sbmc_tpu.utils.exr` with full-compression reading
(PIZ, PXR24, DWA, ...) via the system libOpenEXRCore. Falls back cleanly
when headers/libs or a compiler are missing.
"""

import importlib.util
import os
import subprocess
import sysconfig

from sbmc_tpu.utils.logging import get_logger

LOG = get_logger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "src", "fastexr.cpp")
_OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "_native_build")

_module = None
_tried = False


def _build():
    os.makedirs(_OUT_DIR, exist_ok=True)
    out = os.path.join(_OUT_DIR, "_fastexr.so")
    if os.path.exists(out) and (os.path.getmtime(out)
                                >= os.path.getmtime(_SRC)):
        return out
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-I", include, "-I", "/usr/include/Imath", _SRC, "-o",
           out + ".tmp", "-l:libOpenEXRCore-3_1.so.30"]
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
        spec = importlib.util.spec_from_file_location("_fastexr", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _module = mod
    except Exception as e:
        LOG.debug("native exr reader unavailable (%s)", e)
        _module = None
    return _module
