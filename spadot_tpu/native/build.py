"""On-demand build of the native OT library.

The reference ships a prebuilt libot.so with no build script in the repo
(SURVEY.md §2.2 last row); here the build is owned by the framework: the
shared object is compiled once from the shipped source with g++ -O3 and
cached next to it (or in SPADOT_NATIVE_CACHE).
"""
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(__file__), "ot_cpu.cpp")
_lock = threading.Lock()


def lib_path():
    cache_dir = os.environ.get("SPADOT_NATIVE_CACHE", os.path.dirname(__file__))
    return os.path.join(cache_dir, "libspadot_ot.so")


def ensure_built(force=False):
    path = lib_path()
    with _lock:
        if force or not os.path.exists(path) or (
            os.path.getmtime(path) < os.path.getmtime(_SRC)
        ):
            cmd = [
                "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                "-march=native", "-funroll-loops",
                _SRC, "-o", path,
            ]
            subprocess.run(cmd, check=True, capture_output=True)
    return path
