"""On-demand build of the native OT library.

The reference ships a prebuilt libot.so with no build script in the repo
(SURVEY.md §2.2 last row); here the build is owned by the framework: the
shared object is compiled once from the shipped source with g++ -O3 and
cached next to it (or in SPADOT_NATIVE_CACHE).
"""
import os
import subprocess
import threading

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "ot_cpu.cpp")
_lock = threading.Lock()


def _lib_path(libname):
    cache_dir = os.environ.get("SPADOT_NATIVE_CACHE", _DIR)
    return os.path.join(cache_dir, libname)


def lib_path():
    return _lib_path("libspadot_ot.so")


def _ensure(src, libname, force=False):
    path = _lib_path(libname)
    with _lock:
        if force or not os.path.exists(path) or (
            os.path.getmtime(path) < os.path.getmtime(src)
        ):
            cmd = [
                "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                "-march=native", "-funroll-loops",
                src, "-o", path,
            ]
            subprocess.run(cmd, check=True, capture_output=True)
    return path


def ensure_built(force=False):
    return _ensure(_SRC, "libspadot_ot.so", force)


def ensure_built_louvain(force=False):
    return _ensure(
        os.path.join(_DIR, "louvain_cpu.cpp"), "libspadot_louvain.so", force
    )
