"""Optical-flow IO (.flo read/write) — parity with reference
basicsr/utils/flow_util.py (a BasicSR vestige unused by FDN but part of
the utils surface)."""

import numpy as np

_FLO_MAGIC = 202021.25


def flowread(path):
    with open(path, "rb") as f:
        magic = np.frombuffer(f.read(4), np.float32)[0]
        if magic != _FLO_MAGIC:
            raise ValueError(f"invalid .flo magic in {path}")
        w = int(np.frombuffer(f.read(4), np.int32)[0])
        h = int(np.frombuffer(f.read(4), np.int32)[0])
        data = np.frombuffer(f.read(h * w * 2 * 4), np.float32)
    return data.reshape(h, w, 2).copy()


def flowwrite(flow, path):
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        f.write(np.float32(_FLO_MAGIC).tobytes())
        f.write(np.int32(w).tobytes())
        f.write(np.int32(h).tobytes())
        f.write(flow.astype(np.float32).tobytes())
