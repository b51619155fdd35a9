"""Build fdn_native.so from loader.cc with g++ (no pybind11 in this
image; the library exposes a plain C ABI consumed via ctypes).

The build is lazy and cached: a sidecar .srchash records the sha256 of
loader.cc the .so was built from, so staleness survives git checkouts
(which reset mtimes). Failure is non-fatal — callers fall back to the
cv2 path.
"""

import hashlib
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "loader.cc")
SO = os.path.join(_DIR, "fdn_native.so")
HASHFILE = SO + ".srchash"


def _src_hash():
    with open(SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def build(force=False, quiet=True):
    """Compile loader.cc -> fdn_native.so. Returns the .so path or None."""
    src_hash = _src_hash()
    if not force and os.path.exists(SO) and os.path.exists(HASHFILE):
        with open(HASHFILE) as f:
            if f.read().strip() == src_hash:
                return SO
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
        SRC, "-o", SO, "-lpng", "-ljpeg",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=300)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        if not quiet:
            raise RuntimeError(f"fdn_native build failed:\n{proc.stderr}")
        return None
    with open(HASHFILE, "w") as f:
        f.write(src_hash + "\n")
    return SO


if __name__ == "__main__":
    path = build(force=True, quiet=False)
    print(f"built {path}")
